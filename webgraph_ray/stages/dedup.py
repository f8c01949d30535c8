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
from ray.data.aggregate import Count, Min

from webgraph_ray.functions.hashing import hash_keys
from webgraph_ray.functions.joins import bucketed_join
from webgraph_ray.stages.text import TOKEN_RE

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(text_md5, canonical_doc_id = min doc_id, dup_count) — the
    hash-partition + per-group-first pattern (analog of the reference's
    drop_duplicates dedups, /root/reference/code/run.py:151,155)."""

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "text_md5": df["text"].map(
                    lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
                ),
                "doc_id": df["doc_id"],
            }
        )

    return (
        docs.map_batches(hashed, batch_format="pandas")
        .groupby("text_md5")
        .aggregate(
            Min("doc_id", alias_name="canonical_doc_id"),
            Count(alias_name="dup_count"),
        )
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique 64-bit hashes of token k-shingles."""
    toks = TOKEN_RE.findall(text)
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.array([], dtype=np.uint64)
    return np.unique(hash_keys(np.array(shingles, dtype=object)).view(np.uint64))


def _perm_params(num_perm: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide minhash of a shingle-hash set (universal hashing mod
    2^61-1; python-int matmul avoided via float-safe 128-bit emulation is
    unnecessary: numpy uint64 wraps, which is a valid hash family here as
    long as both sides use the same arithmetic)."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n_shingles): wrap-around uint64 arithmetic, deterministic
    vals = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def minhash_lsh_dedup(
    docs: ray.data.Dataset,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """Near-duplicate pairs (doc_a < doc_b, jaccard >= threshold).

    Pipeline: per-batch shingle+sign -> explode to (band_id, band_hash,
    doc_id) -> groupby band bucket -> within-bucket pairs (buckets above
    ``max_bucket`` docs are truncated with a warning — a production run
    would salt them) -> pair dedup -> exact-Jaccard verify via two
    bucketed joins against the shingle table.
    """
    a, b = _perm_params(num_perm, seed)
    rows_per_band = num_perm // bands

    # combine a band's rows into one 64-bit value with a wrap-around
    # polynomial (deterministic across processes)
    powers = np.uint64(0x9E3779B97F4A7C15) ** np.arange(
        rows_per_band, dtype=np.uint64
    )

    def sign(df: pd.DataFrame) -> pd.DataFrame:
        out_hash = []
        for text in df["text"]:
            sh = shingle_hashes(text, shingle_k)
            sig = minhash_signature(sh, a, b)
            bands_view = sig.reshape(bands, rows_per_band)
            bh = (bands_view * powers[None, :]).sum(axis=1, dtype=np.uint64)
            out_hash.append(bh.view(np.int64))
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), bands),
                "band_id": np.tile(np.arange(bands, dtype=np.int64), len(df)),
                "band_hash": np.concatenate(out_hash),
            }
        )

    bands_ds = docs.map_batches(sign, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy(dtype=np.int64))
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
            )
        if len(ids) > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "minhash LSH bucket with %d docs truncated to %d; "
                "pairs beyond the cap are lost — raise max_bucket or salt "
                "the bucket",
                len(ids),
                max_bucket,
            )
            ids = ids[:max_bucket]
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[i], "doc_b": ids[j]})

    cand = (
        bands_ds.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["doc_a", "doc_b"])
    )

    # shingle table for verification; sets travel as binary blobs (uint64
    # little-endian) — arrow-native, unlike object columns of ndarrays,
    # which Ray's tensor extension cannot shuffle
    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "shingles": [
                    shingle_hashes(t, shingle_k).tobytes() for t in df["text"]
                ],
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
        jac = [
            jaccard(
                np.frombuffer(x, dtype=np.uint64), np.frombuffer(y, dtype=np.uint64)
            )
            for x, y in zip(df["sh_a"], df["sh_b"])
        ]
        out = pd.DataFrame(
            {"doc_a": df["doc_a"], "doc_b": df["doc_b"], "jaccard": jac}
        )
        return out[out["jaccard"] >= threshold].reset_index(drop=True)

    return j2.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    toks = TOKEN_RE.findall(text)
    if not toks:
        return 0
    hs = hash_keys(np.array(toks, dtype=object)).view(np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] >= 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(np.array([out], dtype=np.uint64).view(np.int64)[0])


def simhash(docs: ray.data.Dataset) -> ray.data.Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": df["text"].map(simhash64).astype(np.int64),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def simhash_dup_pairs(
    docs: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """Near-pairs by banding the 64-bit simhash into 4 x 16-bit chunks
    (any pair within Hamming distance 3 shares at least one chunk),
    then Hamming-verifying within chunk buckets."""
    sh = simhash(docs)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy(np.int64).view(np.uint64)
        parts = []
        for c in range(4):
            chunk = ((h >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
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
        hs = g["simhash"].to_numpy(np.int64).view(np.uint64)
        i, j = np.triu_indices(len(ids), k=1)
        x = hs[i] ^ hs[j]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
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
