"""Deduplication families over the ``documents`` table.

- exact:        content-hash groupby (hash-partition + per-group min)
- MinHash+LSH:  shingle -> minhash signature -> band buckets -> candidate
                pairs -> exact-Jaccard verification
- SimHash:      64-bit simhash + banded near-pair search with Hamming
                verification

All candidate generation is groupby-bucket based (no all-pairs scan); the
verification joins are ``bucketed_join``s over narrow projections, so each
family scales past one node.  Seeds are fixed -> byte-deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Min

from webgraph_ray.functions.joins import bucketed_join
from webgraph_ray.stages.text import TOKEN_RE

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    docs: ray.data.Dataset, num_buckets: int | None = None
) -> ray.data.Dataset:
    """(text_md5, canonical_doc_id = min doc_id, dup_count) — the
    hash-partition + per-group-first pattern (analog of the reference's
    drop_duplicates dedups, /root/reference/code/run.py:151,155).

    Scale shape (the house bucket pattern): a native
    ``groupby("text_md5")`` is a sort-based shuffle on a key whose
    cardinality ~= row count.  Instead each batch pre-combines its own
    duplicates (map-side partial: one (md5, min_doc, cnt) row per distinct
    hash in the batch), the shuffle moves ``num_buckets`` hash groups, and
    the per-bucket combine is one C-path pandas groupby."""
    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = num_buckets or default_num_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        digests = [hashlib.md5(t.encode("utf-8")) for t in df["text"]]
        out = pd.DataFrame(
            {
                "text_md5": [h.hexdigest() for h in digests],
                "__b": np.frombuffer(
                    b"".join(h.digest()[:8] for h in digests)
                    or b"",
                    dtype=np.uint64,
                ).astype(np.int64)
                % nb
                if digests
                else np.empty(0, np.int64),
                "doc_id": df["doc_id"].to_numpy(np.int64),
            }
        )
        comb = (
            out.groupby(["__b", "text_md5"], sort=False)["doc_id"]
            .agg(["min", "size"])
            .reset_index()
        )
        return comb.rename(
            columns={"min": "canonical_doc_id", "size": "dup_count"}
        ).astype({"canonical_doc_id": np.int64, "dup_count": np.int64})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("text_md5", sort=False)
            .agg(
                canonical_doc_id=("canonical_doc_id", "min"),
                dup_count=("dup_count", "sum"),
            )
            .reset_index()
        )
        return out.astype({"canonical_doc_id": np.int64, "dup_count": np.int64})

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash (primitives shared with the DuckDB oracle:
# webgraph_ray/functions/texthash.py — char-k-gram shingles, exact
# mod-2^31-1 arithmetic, rational threshold compare)
# ---------------------------------------------------------------------------


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def minhash_lsh_dedup(
    docs: ray.data.Dataset,
    threshold: float = 0.7,
    num_perm: int | None = None,
    bands: int | None = None,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """Near-duplicate pairs (doc_a < doc_b) with exact-Jaccard >= threshold
    over char-k-gram shingle-hash sets.

    Pipeline: per-batch shingle+sign -> explode to (band_id, band_hash,
    doc_id) -> groupby band bucket -> within-bucket pairs -> pair dedup ->
    exact-Jaccard verify via two bucketed joins against the shingle table.
    The threshold compare is integer (``inter*den >= num*uni``) so the
    DuckDB oracle (texthash.minhash_pairs_sql) reproduces the output
    exactly.

    Buckets larger than ``max_bucket`` are NOT truncated (round-1 silently
    dropped their tail): pairs are generated chunk-grid-wise so peak memory
    per step is bounded by ``max_bucket^2`` while every pair is still
    emitted.  A duplicate *cluster* of n docs inherently produces n(n-1)/2
    output pairs — at extreme cluster sizes the pair representation itself
    is the bottleneck, and the right tool is ``exact_dedup`` /
    cluster-representative output, not pair truncation.
    """
    from webgraph_ray.functions import texthash as th

    num_perm = num_perm or th.NUM_PERM
    bands = bands or th.BANDS
    a, b = th.perm_params(num_perm)
    num, den = th.threshold_ratio(threshold)

    def sign(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, band_ids, band_hashes = [], [], []
        band_range = np.arange(bands, dtype=np.int64)
        for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"]):
            sh = th.shingle_set(text)
            if len(sh) == 0:
                continue  # no shingles -> cannot pair (oracle skips too)
            bv = th.band_values(th.minhash_signature(sh, a, b), bands)
            doc_ids.append(np.full(bands, doc_id, dtype=np.int64))
            band_ids.append(band_range)
            band_hashes.append(bv)
        if not doc_ids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "band_id": pd.Series(dtype="int64"),
                    "band_hash": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(doc_ids),
                "band_id": np.concatenate(band_ids),
                "band_hash": np.concatenate(band_hashes),
            }
        )

    bands_ds = docs.map_batches(sign, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy(dtype=np.int64))
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
            )
        if n <= max_bucket:
            i, j = np.triu_indices(n, k=1)
            return pd.DataFrame({"doc_a": ids[i], "doc_b": ids[j]})
        # chunk-grid pair generation: bounded peak memory, no pairs dropped
        chunks = [ids[s : s + max_bucket] for s in range(0, n, max_bucket)]
        outs_a, outs_b = [], []
        for ci, ca in enumerate(chunks):
            i, j = np.triu_indices(len(ca), k=1)
            outs_a.append(ca[i])
            outs_b.append(ca[j])
            for cb in chunks[ci + 1 :]:
                aa, bb = np.meshgrid(ca, cb, indexing="ij")
                outs_a.append(aa.ravel())
                outs_b.append(bb.ravel())
        return pd.DataFrame(
            {"doc_a": np.concatenate(outs_a), "doc_b": np.concatenate(outs_b)}
        )

    # pair dedup across bands: bucket-hash distinct — NOT
    # groupby(doc_a, doc_b).aggregate(), which is sort-based and collapses
    # at high pair cardinality (round-1 pitfall list)
    from webgraph_ray.functions.shuffle import bucket_distinct

    cand = bucket_distinct(
        bands_ds.groupby(["band_id", "band_hash"]).map_groups(
            bucket_pairs, batch_format="pandas"
        ),
        ["doc_a", "doc_b"],
    )

    # shingle table for verification; sets travel as binary blobs (int64
    # little-endian) — arrow-native, unlike object columns of ndarrays,
    # which Ray's tensor extension cannot shuffle
    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "shingles": [th.shingle_set(t).tobytes() for t in df["text"]],
            }
        )

    shing = docs.map_batches(shingle_rows, batch_format="pandas")
    sa = shing.map_batches(
        lambda df: df.rename(columns={"doc_id": "doc_a", "shingles": "sh_a"}),
        batch_format="pandas",
    )
    sb = shing.map_batches(
        lambda df: df.rename(columns={"doc_id": "doc_b", "shingles": "sh_b"}),
        batch_format="pandas",
    )
    j1 = bucketed_join(cand, sa, keys=["doc_a"])
    j2 = bucketed_join(j1, sb, keys=["doc_b"])

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
        keep = np.zeros(len(df), dtype=bool)
        jac = np.zeros(len(df), dtype=np.float64)
        for idx, (x, y) in enumerate(zip(df["sh_a"], df["sh_b"])):
            ga = np.frombuffer(x, dtype=np.int64)
            gb = np.frombuffer(y, dtype=np.int64)
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            uni = len(ga) + len(gb) - inter
            keep[idx] = inter * den >= num * uni  # exact integer compare
            jac[idx] = inter / uni if uni else 1.0
        out = pd.DataFrame(
            {"doc_a": df["doc_a"], "doc_b": df["doc_b"], "jaccard": jac}
        )
        return out[keep].reset_index(drop=True)

    return j2.map_batches(verify, batch_format="pandas")


def jaccard_dup_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    broadcast_threshold: int = 100_000,
    approx_fallback: bool = False,
    mode: str = "jaccard",
) -> ray.data.Dataset:
    """Exact char-gram Jaccard near-duplicate pairs (doc_a < doc_b).

    ``mode="containment"`` switches the criterion to Broder's one-sided
    CONTAINMENT ``|A∩B| / min(|A|, |B|)`` — "the smaller document is
    mostly inside the other" — which catches quotes / subsets whose
    symmetric resemblance sits below every Jaccard threshold.  MinHash
    LSH approximates resemblance, NOT containment, so the above-gate
    ``approx_fallback`` is refused in containment mode (loud raise).

    Below ``broadcast_threshold`` docs: the shingle table is broadcast once
    (``ray.put``) as an exploded inverted index and every batch computes
    ALL its pair-intersection counts with one C-path merge + groupby per
    batch — exact all-pairs, no Python pair loop, no shuffle.  Integer
    rational threshold compare keeps the DuckDB oracle exact.

    Above the gate the exact all-pairs contract cannot hold (pair space is
    quadratic); by default this raises so the caller makes the recall
    trade explicitly.  ``approx_fallback=True`` delegates to
    ``minhash_lsh_dedup`` (same threshold + shingle universe, LSH recall
    < 1) — use that entry point directly, or register the approximate
    variant under its own query name, rather than treating the fallback
    output as exact."""
    from webgraph_ray.functions import texthash as th

    assert mode in ("jaccard", "containment"), mode
    if docs.count() > broadcast_threshold:
        if mode == "containment":
            # exact scale path: bucketed inverted-index self-join (no
            # broadcast, hot-shingle skew gate) — MinHash-LSH is NOT a
            # valid fallback here (it approximates resemblance)
            return _containment_pairs_bucketed(docs, threshold)
        if not approx_fallback:
            raise ValueError(
                "jaccard_dup_pairs is exact all-pairs and gated at "
                f"{broadcast_threshold} docs; for larger inputs call "
                "minhash_lsh_dedup (approximate recall) or pass "
                "approx_fallback=True to accept that trade explicitly"
            )
        import logging

        logging.getLogger(__name__).warning(
            "jaccard_dup_pairs: input exceeds broadcast_threshold=%d; "
            "falling back to MinHash-LSH (recall < 1, NOT exact all-pairs)",
            broadcast_threshold,
        )
        return minhash_lsh_dedup(docs, threshold=threshold).select_columns(
            ["doc_a", "doc_b"]
        )
    num, den = th.threshold_ratio(threshold)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, shingles = [], []
        for doc_id, text in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            sh = th.shingle_set(text)
            if len(sh) == 0:
                continue
            ids.append(np.full(len(sh), doc_id, dtype=np.int64))
            shingles.append(sh)
        if not ids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "shingle": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {"doc_id": np.concatenate(ids), "shingle": np.concatenate(shingles)}
        )

    side = docs.map_batches(explode, batch_format="pandas").to_pandas()
    sizes = side.groupby("doc_id", sort=False).size()
    import ray as _ray

    ref = _ray.put((side, sizes))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        side_df, side_sizes = _ray.get(ref)
        mine = explode(df)
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
            }
        )
        if len(mine) == 0:
            return empty
        # inverted-index join: one merge on the shingle hash yields every
        # (batch_doc, side_doc) co-occurrence; groupby size = |intersection|
        m = mine.merge(side_df, on="shingle", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if len(m) == 0:
            return empty
        inter = (
            m.groupby(["doc_id_a", "doc_id_b"], sort=False)
            .size()
            .reset_index(name="inter")
        )
        my_sizes = mine.groupby("doc_id", sort=False).size()
        ia = inter["inter"].to_numpy(np.int64)
        sa = my_sizes.reindex(inter["doc_id_a"]).to_numpy(np.int64)
        sb = side_sizes.reindex(inter["doc_id_b"]).to_numpy(np.int64)
        if mode == "containment":
            keep = ia * den >= num * np.minimum(sa, sb)
        else:
            uni = sa + sb - ia
            keep = ia * den >= num * uni  # exact integer compare
        return pd.DataFrame(
            {
                "doc_a": inter["doc_id_a"].to_numpy(np.int64)[keep],
                "doc_b": inter["doc_id_b"].to_numpy(np.int64)[keep],
            }
        )

    return docs.map_batches(pairs, batch_format="pandas")


def _containment_pairs_bucketed(
    docs: ray.data.Dataset,
    threshold: float,
    max_shingle_docs: int = 256,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact containment pairs WITHOUT a broadcast: explode distinct
    (doc_id, shingle) rows, ONE shingle-hash bucket groupby enumerating
    per-shingle doc pairs (a hot shingle held by > ``max_shingle_docs``
    docs fails loudly — C(d,2) pair volume is the skew hazard, same gate
    convention as substring_dup_pairs), ONE pair-hash bucket combine to
    exact intersection counts, then two bucketed joins attach the per-doc
    shingle-set sizes for the ``|A∩B| >= t * min(|A|,|B|)`` filter.
    Bit-identical to the broadcast path (pytest path-equality pin)."""
    import ray as _ray

    from webgraph_ray.functions import texthash as th
    from webgraph_ray.functions.joins import bucketed_join

    if num_buckets is None:
        num_buckets = max(2, int(_ray.cluster_resources().get("CPU", 4)))
    num, den = th.threshold_ratio(threshold)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, shingles = [], []
        for doc_id, text in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            sh = th.shingle_set(text)
            if len(sh) == 0:
                continue
            ids.append(np.full(len(sh), doc_id, dtype=np.int64))
            shingles.append(sh)
        if not ids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "shingle": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {"doc_id": np.concatenate(ids), "shingle": np.concatenate(shingles)}
        )

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    ).materialize()

    # per-doc shingle-set sizes (owner-bucket reduce, O(docs) rows)
    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).size().reset_index(name="sz")
        g["__b"] = (g["doc_id"].to_numpy(np.int64) % num_buckets).astype(
            np.int32
        )
        return g

    sizes = (
        rows.map_batches(size_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: g.groupby("doc_id", sort=False, as_index=False)["sz"]
            .sum()
            .astype({"sz": np.int64}),
            batch_format="pandas",
        )
    )

    def sh_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            __s=(
                df["shingle"].to_numpy(np.int64) % num_buckets
            ).astype(np.int32)
        )

    def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shingle", "doc_id"], kind="mergesort")
        s = g["shingle"].to_numpy(np.int64)
        d = g["doc_id"].to_numpy(np.int64)
        _, starts = np.unique(s, return_index=True)
        bounds = np.append(starts, len(s))
        widths = np.diff(bounds)
        if len(widths) and int(widths.max()) > max_shingle_docs:
            raise ValueError(
                f"containment: a shingle is held by {int(widths.max())} "
                f"docs (> max_shingle_docs={max_shingle_docs}); pair "
                "volume is quadratic in that count — drop boilerplate "
                "shingles or raise the gate explicitly"
            )
        us, ws = [], []
        for st, en in zip(bounds[:-1], bounds[1:]):
            k = en - st
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            us.append(d[st + i])
            ws.append(d[st + j])
        if not us:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "inter": pd.Series(dtype="int64"),
                }
            )
        pair = np.stack([np.concatenate(us), np.concatenate(ws)], axis=1)
        uniq, inv = np.unique(pair, axis=0, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame(
            {"doc_a": uniq[:, 0], "doc_b": uniq[:, 1], "inter": cnt}
        )

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(np.uint64)
        b = df["doc_b"].to_numpy(np.uint64)
        mix = a * np.uint64(0x9E3779B97F4A7C15) + b
        return df.assign(__p=(mix % np.uint64(num_buckets)).astype(np.int32))

    inter = (
        rows.map_batches(sh_bucket, batch_format="pandas")
        .groupby("__s")
        .map_groups(pair_partial, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pandas")
        .groupby("__p")
        .map_groups(
            lambda g: g.groupby(["doc_a", "doc_b"], sort=False, as_index=False)[
                "inter"
            ]
            .sum()
            .astype({"inter": np.int64}),
            batch_format="pandas",
        )
    )

    sa = sizes.map_batches(
        lambda df: df.rename(columns={"doc_id": "doc_a", "sz": "sa"}),
        batch_format="pandas",
    )
    sb = sizes.map_batches(
        lambda df: df.rename(columns={"doc_id": "doc_b", "sz": "sb"}),
        batch_format="pandas",
    )
    j = bucketed_join(inter, sa, keys=["doc_a"], how="inner")
    j = bucketed_join(j, sb, keys=["doc_b"], how="inner")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        ia = df["inter"].to_numpy(np.int64)
        mn = np.minimum(
            df["sa"].to_numpy(np.int64), df["sb"].to_numpy(np.int64)
        )
        m = ia * den >= num * mn
        return df.loc[m, ["doc_a", "doc_b"]].astype(np.int64)

    return j.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# duplicate substring spans (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better": verbatim-repeated token runs are
# the dedup unit, not whole-document similarity)
# ---------------------------------------------------------------------------


def wgram_table(texts, doc_ids, window: int):
    """Distinct (gram, doc_id) rows of a batch: every run of ``window``
    consecutive whitespace tokens, space-joined — all Arrow C (one
    ``utf8_split_whitespace`` explode + ``window`` shifted takes +
    ``binary_join_element_wise`` + hash-distinct).  A doc repeating its
    own boilerplate internally still contributes ONE row per gram
    (map-side combine)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from webgraph_ray.stages.text import _explode_ws_tokens

    W = int(window)
    empty = pa.table(
        {
            "gram": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
        }
    )
    if len(texts) == 0:
        return empty
    doc_idx, flat = _explode_ws_tokens(texts)
    n = len(flat)
    if n < W:
        return empty
    # window starts that stay inside one document: position-in-doc
    # arithmetic over the flat token array (doc_idx is sorted)
    starts = np.flatnonzero(np.r_[True, np.diff(doc_idx) != 0])
    lens = np.diff(np.r_[starts, n])
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    valid = pos <= np.repeat(lens, lens) - W
    idx = np.flatnonzero(valid)
    if len(idx) == 0:
        return empty
    parts = [flat.take(pa.array(idx + k, pa.int64())) for k in range(W)]
    grams = pc.binary_join_element_wise(*parts, " ")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_np = doc_ids.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        doc_np = np.asarray(doc_ids, dtype=np.int64)
    out = pa.table({"gram": grams, "doc_id": pa.array(doc_np[doc_idx[idx]])})
    return out.group_by(["gram", "doc_id"]).aggregate([])


def substring_dup_pairs(
    docs: ray.data.Dataset,
    window: int = 8,
    num_buckets: int | None = None,
    max_gram_docs: int = 256,
) -> ray.data.Dataset:
    """Exact duplicate-substring pairs: (doc_a < doc_b) iff the two docs
    share at least one verbatim run of ``window`` consecutive whitespace
    tokens.  This is the span-level dedup criterion of Lee et al. 2022 —
    it catches shared boilerplate paragraphs between documents whose
    OVERALL similarity is far below any Jaccard/MinHash threshold, the
    case whole-document methods structurally miss.  (Lee et al. use 50
    BPE tokens at corpus scale; ``window`` is the same knob.)

    Scale shape: token windows are built per batch entirely in Arrow C
    (one ``utf8_split_whitespace`` explode + ``window`` shifted takes +
    ``binary_join_element_wise``), each batch pre-distincts its own
    (gram, doc) pairs with an Arrow hash group-by (map-side combine),
    the ONE shuffle moves ``num_buckets`` SipHash-bucket groups (the
    house bucket pattern — the gram STRING stays the exact group key
    inside a bucket, so bucketing never changes semantics), a per-bucket
    C-path self-merge enumerates co-occurring doc pairs, and one
    ``bucket_distinct`` collapses pairs discovered via different grams.
    Hot grams (boilerplate shared by > ``max_gram_docs`` docs) fail
    LOUDLY: pair output is inherently quadratic in a gram's doc count,
    so past the gate the caller must either raise ``window`` or switch
    to cluster semantics (``dup_clusters`` over these pairs).

    The DuckDB mirror groups on the identical space-joined gram string
    (``array_to_string(tokens[i : i+window-1], ' ')``) — no hash
    mirroring needed."""
    import pyarrow as pa

    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.shuffle import (
        bucket_distinct,
        default_num_buckets,
    )

    if window < 2:
        raise ValueError("window must be >= 2 tokens")
    nb = num_buckets or default_num_buckets()
    W = int(window)

    def explode_grams(t: pa.Table) -> pa.Table:
        out = wgram_table(t["text"], t["doc_id"], W)
        if out.num_rows == 0:
            return out.append_column("__b", pa.array([], pa.int64()))
        b = np.abs(
            hash_keys(out["gram"].to_numpy(zero_copy_only=False))
        ) % np.int64(nb)
        return out.append_column("__b", pa.array(b, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["gram", "doc_id"]]
        if len(g):
            vc = g["gram"].value_counts()
            if int(vc.iloc[0]) > max_gram_docs:
                raise ValueError(
                    f"substring_dup_pairs: a {W}-token span is shared by "
                    f"{int(vc.iloc[0])} docs (> max_gram_docs="
                    f"{max_gram_docs}); pair output would be quadratic — "
                    "raise window, raise max_gram_docs explicitly, or use "
                    "dup_clusters semantics for boilerplate this hot"
                )
        m = g.merge(g, on="gram", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = (
            m[["doc_id_a", "doc_id_b"]]
            .drop_duplicates()
            .rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"})
        )
        return out.astype({"doc_a": np.int64, "doc_b": np.int64})

    pairs = (
        docs.map_batches(explode_grams, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )
    # the same pair can surface via different grams in different buckets
    return bucket_distinct(pairs, ["doc_a", "doc_b"], num_buckets=nb)


def substring_pairs_sql(window: int = 8) -> str:
    """DuckDB mirror of ``substring_dup_pairs`` (same \\S+ tokens, same
    space-joined gram keys, 1-based inclusive list slice)."""
    W = int(window)
    return f"""
    WITH ss_toks AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
    ),
    ss_grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i.i : i.i + {W - 1}], ' ') AS gram
        FROM ss_toks, unnest(range(1, len(t) - {W} + 2)) AS i(i)
        WHERE len(t) >= {W}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM ss_grams a JOIN ss_grams b USING (gram)
    WHERE a.doc_id < b.doc_id
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_value(text: str) -> int:
    """31-bit simhash (exact-arithmetic token hashes; shared with the
    DuckDB oracle, texthash.simhash_sql)."""
    from webgraph_ray.functions.texthash import simhash_value as _sv

    return _sv(TOKEN_RE.findall(text))


def simhash(docs: ray.data.Dataset) -> ray.data.Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": df["text"].map(simhash_value).astype(np.int64),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


# chunk boundaries for the 31-bit simhash banding: 4 chunks (8/8/8/7 bits);
# any pair within Hamming distance 3 shares at least one chunk
_SIM_CHUNKS = [(0, 8), (8, 8), (16, 8), (24, 7)]


def simhash_dup_pairs(
    docs: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """Near-pairs by banding the simhash into 4 chunks, then
    Hamming-verifying within chunk buckets (vectorized popcount)."""
    from webgraph_ray.functions.texthash import popcount64

    sh = simhash(docs)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy(np.int64)
        parts = []
        for c, (shift, width) in enumerate(_SIM_CHUNKS):
            chunk = (h >> shift) & ((1 << width) - 1)
            parts.append(
                pd.DataFrame(
                    {
                        "chunk_id": np.int64(c),
                        "chunk_val": chunk,
                        "doc_id": df["doc_id"],
                        "simhash": df["simhash"],
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "hamming": pd.Series(dtype="int64"),
                }
            )
        ids = g["doc_id"].to_numpy(np.int64)
        hs = g["simhash"].to_numpy(np.int64)
        i, j = np.triu_indices(len(ids), k=1)
        ham = popcount64(hs[i] ^ hs[j])
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[i][keep], "doc_b": ids[j][keep], "hamming": ham[keep]}
        )

    pairs = (
        sh.map_batches(explode, batch_format="pandas")
        .groupby(["chunk_id", "chunk_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# decontamination (train/benchmark n-gram overlap)
# ---------------------------------------------------------------------------

DECON_NGRAM = 5
DECON_BENCH_MOD = 20
# distinct benchmark shingles the broadcast path will hold per worker;
# benchmark suites are tiny next to a training corpus, so the broadcast
# shape (ray.put once, read in every task) is the 100-TB design — the
# gate fails loudly if someone points the "benchmark" side at a corpus
DECON_BROADCAST_LIMIT = 5_000_000


def _shingle_strings(texts, n: int):
    """All n-token tab-joined shingles of a batch of texts plus the row
    index each came from.  C-path end to end: one whitespace explode, n
    Arrow slices, one ``binary_join_element_wise`` — no per-row Python.
    Exact string identity (no hashing), so the DuckDB mirror is the same
    ``chr(9)``-join and there are no collision caveats."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from webgraph_ray.stages.text import _explode_ws_tokens

    doc_idx, flat = _explode_ws_tokens(texts)
    m = len(flat) - n + 1
    if m <= 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parts = [flat.slice(j, m) for j in range(n)]
    sh = pc.binary_join_element_wise(*parts, "\t")
    same = doc_idx[:m] == doc_idx[n - 1 :]
    return doc_idx[:m][same], sh.filter(pa.array(same))


def _mod_filter(docs: "ray.data.Dataset", mod: int, keep_zero: bool):
    import pyarrow as pa

    def f(t: "pa.Table") -> "pa.Table":
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        mask = (did % mod == 0) if keep_zero else (did % mod != 0)
        return t.filter(pa.array(mask))

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class _DeconScorer:
    """Actor-pool stage: the benchmark shingle set is fetched from plasma
    ONCE per actor (zero-copy Arrow) and every batch runs one ``is_in``
    membership scan + a distinct-(doc, shingle) count."""

    def __init__(self, bench_ref, n: int):
        import ray as _ray

        self.bench = _ray.get(bench_ref)
        self.n = n

    def __call__(self, t):
        import pyarrow as pa
        import pyarrow.compute as pc

        nrows = t.num_rows
        counts = np.zeros(nrows, np.int64)
        doc_idx, sh = _shingle_strings(t["text"], self.n)
        if len(sh) and len(self.bench):
            hit = pc.is_in(sh, value_set=self.bench).to_numpy(
                zero_copy_only=False
            )
            if hit.any():
                d = doc_idx[hit]
                enc = pc.dictionary_encode(sh.filter(pa.array(hit)))
                if isinstance(enc, pa.ChunkedArray):
                    enc = enc.combine_chunks()
                codes = enc.indices.to_numpy(zero_copy_only=False)
                order = np.lexsort((codes, d))
                ds_, cs_ = d[order], codes[order]
                new = np.concatenate(
                    ([True], (ds_[1:] != ds_[:-1]) | (cs_[1:] != cs_[:-1]))
                )
                counts = np.bincount(
                    ds_[new], minlength=nrows
                ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_contaminated_shingles": pa.array(counts),
                "contaminated": pa.array((counts > 0).astype(np.int64)),
            }
        )


def decontaminate(
    docs: ray.data.Dataset,
    n: int = DECON_NGRAM,
    bench_mod: int = DECON_BENCH_MOD,
    broadcast_limit: int = DECON_BROADCAST_LIMIT,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Benchmark decontamination (the published train/test-overlap
    practice: flag training documents sharing any token n-gram with an
    evaluation set).  The 'benchmark' here is the deterministic held-out
    slice ``doc_id % bench_mod == 0``; output is one row per NON-benchmark
    document: (doc_id, n_contaminated_shingles = distinct n-gram shingles
    shared with any benchmark doc, contaminated flag).

    Scale shape: the benchmark side reduces to a distinct-shingle Arrow
    array on the driver (benchmarks are small by construction — gated at
    ``broadcast_limit`` with a loud error), ships to plasma ONCE via
    ``ray.put``, and the corpus streams through an actor-pool
    ``map_batches`` doing one vectorized ``is_in`` per batch.  No shuffle
    touches the corpus."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray as _ray

    def bench_batch(t: "pa.Table") -> "pa.Table":
        _, sh = _shingle_strings(t["text"], n)
        u = pc.unique(sh)
        return pa.table({"g": pc.cast(u, pa.string())})

    parts = []
    for b in (
        _mod_filter(docs, bench_mod, keep_zero=True)
        .map_batches(bench_batch, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        parts.append(b["g"].combine_chunks() if isinstance(b["g"], pa.ChunkedArray) else b["g"])
        total = sum(len(p) for p in parts)
        if total > 4 * broadcast_limit:
            raise ValueError(
                f"decontaminate: benchmark shingle stream exceeds "
                f"{4 * broadcast_limit} pre-dedup entries; the benchmark "
                f"slice looks like a corpus — use a bucketed join instead"
            )
    bench = (
        pc.unique(pa.concat_arrays(parts))
        if parts
        else pa.array([], pa.string())
    )
    if len(bench) > broadcast_limit:
        raise ValueError(
            f"decontaminate: {len(bench)} distinct benchmark shingles "
            f"exceed broadcast_limit={broadcast_limit}; use a bucketed "
            f"join for a benchmark this large"
        )
    ref = _ray.put(bench)
    return _mod_filter(docs, bench_mod, keep_zero=False).map_batches(
        _DeconScorer,
        fn_constructor_args=(ref, n),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or (1, 8),
    )


# ---------------------------------------------------------------------------
# duplicate clusters: near-dup pairs -> connected components -> canonical id
# ---------------------------------------------------------------------------


def dup_clusters(
    docs: ray.data.Dataset,
    threshold: float = 0.7,
    work_dir: str | None = None,
) -> ray.data.Dataset:
    """(doc_id, cluster_id): the deliverable a dedup pipeline actually
    materializes — every document labeled with the smallest doc_id of its
    near-duplicate cluster (connected components over the MinHash+LSH
    pair graph; singletons map to themselves).

    Scale shape: the pair graph is tiny next to the corpus (only
    near-dup docs appear), so components run on the BSP engine over the
    pair edges; canonicalization and the singleton fill ride two
    small bucket shuffles over <= one row per document."""
    import os
    import shutil
    import tempfile

    from webgraph_ray.graph.engine import GraphEngine

    pairs = minhash_lsh_dedup(docs, threshold=threshold).materialize()
    doc_ids = docs.select_columns(["doc_id"])

    if pairs.count() == 0:
        def own(df: pd.DataFrame) -> pd.DataFrame:
            d = df["doc_id"].astype(np.int64)
            return pd.DataFrame({"doc_id": d, "cluster_id": d})

        return doc_ids.map_batches(own, batch_format="pandas")

    def as_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["doc_a"].astype(np.int64),
                "dst": df["doc_b"].astype(np.int64),
                "weight": np.int64(1),
            }
        )

    own_work = work_dir is None
    if own_work:
        work_dir = tempfile.mkdtemp(prefix="dup_clusters_")
    eng = GraphEngine(
        os.path.join(work_dir, "cc"), num_parts=None, actor_num_cpus=0
    )
    eng.build(pairs.map_batches(as_edges, batch_format="pandas"),
              symmetrize=True)
    try:
        cc = eng.components().to_pandas()  # (vertex_id = doc_id, component)
    finally:
        eng.shutdown()
        if own_work:
            shutil.rmtree(work_dir, ignore_errors=True)
    # canonical = min doc_id per component (label semantics independent);
    # the pair graph is small by construction, so this reduce is driver-side
    canon = (
        cc.groupby("component")["vertex_id"].transform("min").astype(np.int64)
    )
    mapping = pd.DataFrame(
        {"doc_id": cc["vertex_id"].astype(np.int64), "cluster_id": canon}
    )
    import ray as _ray

    ref = _ray.put(mapping)

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(ref)
        out = df[["doc_id"]].astype(np.int64).merge(m, on="doc_id", how="left")
        miss = out["cluster_id"].isna()
        out.loc[miss, "cluster_id"] = out.loc[miss, "doc_id"]
        out["cluster_id"] = out["cluster_id"].astype(np.int64)
        return out

    return doc_ids.map_batches(fill, batch_format="pandas")
