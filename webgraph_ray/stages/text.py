"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline primitives: token counting, quality
scoring, language identification (n-gram/stopword heuristic), and document
fingerprinting.  All are vectorized ``map_batches`` stages; the regex work
uses compiled patterns held in an actor pool (``concurrency=``) mirroring
the reference's compile-once filter-list rules
(/root/reference/code/labelling/filterlists.py:61-91).

Every SQL-mirrorable definition is kept in lockstep with the DuckDB
oracles in __ray_entry__.py (token = ``\\S+`` run, stopword lists shared).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

TOKEN_RE = re.compile(r"\S+")

# tiny per-language stopword lists (shared verbatim with the SQL oracle)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
}
LONG_TOKEN_LEN = 5


# BPE-style pre-tokenizer: letter runs, digit runs, punctuation runs —
# the GPT-2-ish split shape, restricted to syntax shared by Python re and
# DuckDB RE2 so the SQL oracle uses the identical pattern string.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
BPE_TOKEN_RE = re.compile(BPE_TOKEN_PATTERN)


def _explode_ws_tokens(texts, lower: bool = False):
    """(doc_idx, tokens) — all ``\\S+`` runs of a batch of texts as ONE
    flat Arrow string array plus the row index each token came from.
    Tokenization runs entirely in Arrow C++ (``utf8_split_whitespace`` +
    flatten + empty-token filter, equivalent to ``findall(\\S+)``); no
    per-row Python.  The downstream counters (unique, stopword membership,
    length buckets) then run as one C-path kernel over the flat array —
    the explode-to-Arrow idiom the round-3 review asked for on the
    100-TB text path.  ``texts`` may be an Arrow array (zero-copy from the
    block) or any sequence."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(np.asarray(texts, dtype=object), pa.string())
    if lower:
        arr = pc.utf8_lower(arr)
    lists = pc.utf8_split_whitespace(arr)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    doc_idx = np.repeat(np.arange(len(arr), dtype=np.int64), counts)
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    mask = nonempty.to_numpy(zero_copy_only=False)
    return doc_idx[mask], flat.filter(nonempty)


def _unique_per_doc(doc_idx: np.ndarray, codes: np.ndarray, n_docs: int):
    """Count distinct code values per doc (exact): unique (doc, code)
    pairs via one sort-free combined-key pass."""
    if not len(doc_idx):
        return np.zeros(n_docs, dtype=np.int64)
    k = int(codes.max()) + 1
    uniq = np.unique(doc_idx * np.int64(k) + codes)
    return np.bincount(uniq // k, minlength=n_docs).astype(np.int64)


def bpe_token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    # the BPE split needs a real regex (no Arrow kernel); the per-token
    # unique count is still C-path: explode + factorize + bincount
    toks = df["text"].str.findall(BPE_TOKEN_RE)
    n_tok = toks.str.len().to_numpy(np.int64)
    doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), n_tok)
    flat = toks.explode().dropna()
    codes = pd.factorize(flat)[0] if len(flat) else np.empty(0, np.int64)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_bpe_tokens": n_tok,
            "n_unique_bpe_tokens": _unique_per_doc(
                doc_idx, codes.astype(np.int64), len(df)
            ),
        }
    )


def token_stats_batch(t: pa.Table) -> pa.Table:
    """Zero-copy Arrow stage: the text column never converts to Python
    objects — tokenize/flatten/encode are all Arrow C++ kernels."""
    import pyarrow.compute as pc

    n = t.num_rows
    doc_idx, tokens = _explode_ws_tokens(t["text"])
    if len(tokens):
        enc = pc.dictionary_encode(tokens)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        codes = np.empty(0, np.int64)
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pa.array(np.bincount(doc_idx, minlength=n).astype(np.int64)),
            "n_unique_tokens": pa.array(_unique_per_doc(doc_idx, codes, n)),
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        }
    )


def quality_batch(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = t.num_rows
    doc_idx, tokens = _explode_ws_tokens(t["text"])
    n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
    # hash tokens once; membership + length tests run on the tiny
    # dictionary and broadcast back through the codes
    if len(tokens):
        enc = pc.dictionary_encode(tokens)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        stop_v = pc.is_in(
            enc.dictionary,
            value_set=pa.array(list(STOPWORDS["en"]), pa.string()),
        ).to_numpy(zero_copy_only=False)
        long_v = pc.greater_equal(
            pc.utf8_length(enc.dictionary), LONG_TOKEN_LEN
        ).to_numpy(zero_copy_only=False)
        stop_mask, long_mask = stop_v[codes], long_v[codes]
    else:
        stop_mask = long_mask = np.zeros(0, dtype=bool)
    n_stop = np.bincount(doc_idx[stop_mask], minlength=n).astype(np.int64)
    n_long = np.bincount(doc_idx[long_mask], minlength=n).astype(np.int64)
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pa.array(n_tokens),
            "n_long_tokens": pa.array(n_long),
            "n_stop_tokens": pa.array(n_stop),
            "stop_pct": pa.array(100 * n_stop // np.maximum(n_tokens, 1)),
            "is_short": pc.cast(
                pc.less(pc.utf8_length(t["text"]), 100), pa.int64()
            ),
        }
    )


def lang_id_batch(t: pa.Table) -> pa.Table:
    """Stopword-vote language id; ties and zero evidence -> 'unknown'.
    The vote order for ties is deterministic: highest count wins, and among
    equal counts the language earlier in STOPWORDS order wins only if
    strictly greater than all others (else 'unknown')."""
    import pyarrow.compute as pc

    n = t.num_rows
    doc_idx, tokens = _explode_ws_tokens(t["text"])
    langs = list(STOPWORDS)
    # hash the token strings ONCE (dictionary encode), then run the
    # per-language membership test on the tiny dictionary — 4 stopword
    # scans over distinct tokens instead of 4 over every token
    if len(tokens):
        enc = pc.dictionary_encode(tokens)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = pc.utf8_lower(enc.dictionary)
    else:
        codes = np.empty(0, np.int64)
        vocab = pa.array([], pa.string())
    cols = []
    for lang in langs:
        in_vocab = pc.is_in(
            vocab, value_set=pa.array(list(STOPWORDS[lang]), pa.string())
        ).to_numpy(zero_copy_only=False)
        m = in_vocab[codes] if len(codes) else np.zeros(0, dtype=bool)
        cols.append(np.bincount(doc_idx[m], minlength=n).astype(np.int64))
    mat = np.stack(cols, axis=1)
    best = mat.argmax(axis=1)
    best_score = mat.max(axis=1)
    # 'unknown' when zero evidence or a tie for the max
    tie = (mat == best_score[:, None]).sum(axis=1) > 1
    pred = np.where(
        (best_score == 0) | tie, "unknown", np.array(langs, dtype=object)[best]
    )
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "pred_lang": pa.array(pred.astype(object), pa.string()),
        }
    )


def _repetition_from_codes(
    doc_idx: np.ndarray, codes: np.ndarray, n_docs: int
) -> tuple[np.ndarray, np.ndarray]:
    """Gopher-style repetition signals from the exploded token stream:

    - ``top_bigram_pct``: share (integer pct, floor) of a doc's word-bigram
      occurrences taken by its single most frequent bigram
    - ``dup_trigram_pct``: share of a doc's word-trigram occurrences that
      are repeats (occurrences beyond the first of each distinct trigram)

    Pure C-path: adjacency masks + one lexsort per n-gram order + run-length
    group counts.  No combined-key multiplication, so no int64 overflow at
    any vocabulary size.  ``doc_idx`` must be non-decreasing with each
    doc's tokens contiguous and in order (what ``_explode_ws_tokens``
    yields)."""
    top_bigram_pct = np.zeros(n_docs, dtype=np.int64)
    dup_trigram_pct = np.zeros(n_docs, dtype=np.int64)

    def ngram_groups(k: int):
        """(gram_doc, group_id sorted by doc, counts per group) for
        order-k grams, or None when there are none."""
        if len(codes) < k:
            return None
        same = doc_idx[k - 1 :] == doc_idx[: len(doc_idx) - k + 1]
        if not same.any():
            return None
        d = doc_idx[: len(doc_idx) - k + 1][same]
        cols = [codes[i : len(codes) - k + 1 + i][same] for i in range(k)]
        order = np.lexsort((*reversed(cols), d))
        ds = d[order]
        diff = ds[1:] != ds[:-1]
        for c in cols:
            cs = c[order]
            diff |= cs[1:] != cs[:-1]
        new = np.concatenate(([True], diff))
        grp = np.cumsum(new) - 1
        cnt = np.bincount(grp)
        return ds, ds[new], cnt

    bg = ngram_groups(2)
    if bg is not None:
        ds, gdoc, cnt = bg
        top_c = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top_c, gdoc, cnt)
        n_bg = np.bincount(ds, minlength=n_docs).astype(np.int64)
        top_bigram_pct = 100 * top_c // np.maximum(n_bg, 1)
    tg = ngram_groups(3)
    if tg is not None:
        ds, gdoc, cnt = tg
        n_tg = np.bincount(ds, minlength=n_docs).astype(np.int64)
        d_tg = np.bincount(gdoc, minlength=n_docs).astype(np.int64)
        dup_trigram_pct = 100 * (n_tg - d_tg) // np.maximum(n_tg, 1)
    return top_bigram_pct, dup_trigram_pct


def repetition_batch(t: pa.Table) -> pa.Table:
    """Per-document repetition quality signals (the Gopher-rule family:
    'fraction of characters in the most common n-gram' / 'fraction of
    duplicated n-grams', here over whitespace tokens with exact integer
    percentages so the DuckDB oracle is bit-stable)."""
    import pyarrow.compute as pc

    n = t.num_rows
    doc_idx, tokens = _explode_ws_tokens(t["text"])
    if len(tokens):
        enc = pc.dictionary_encode(tokens)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        codes = np.empty(0, np.int64)
    top_bg, dup_tg = _repetition_from_codes(doc_idx, codes, n)
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "top_bigram_pct": pa.array(top_bg),
            "dup_trigram_pct": pa.array(dup_tg),
        }
    )


def doc_hashes_batch(df: pd.DataFrame) -> pd.DataFrame:
    md5 = df["text"].map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
    return pd.DataFrame({"doc_id": df["doc_id"], "text_md5": md5})


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Winnowed document fingerprints: rolling char-k-gram hashes (fully
    vectorized numpy — replaces the round-1 per-byte Python loop), distinct
    trailing-window minima per document, one row per selected fingerprint.
    Exact-arithmetic definition shared with the DuckDB oracle
    (webgraph_ray/functions/texthash.py)."""
    from webgraph_ray.functions.texthash import fingerprint_set

    ids, fps = [], []
    for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"]):
        f = fingerprint_set(text)
        if len(f):
            ids.append(np.full(len(f), doc_id, dtype=np.int64))
            fps.append(f)
    if not ids:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "fingerprint": pd.Series(dtype="int64"),
            }
        )
    return pd.DataFrame(
        {"doc_id": np.concatenate(ids), "fingerprint": np.concatenate(fps)}
    )


def _stage(fn, fmt="pandas"):
    def run(docs: ray.data.Dataset) -> ray.data.Dataset:
        if fmt == "pyarrow":
            return docs.map_batches(
                fn, batch_format="pyarrow", zero_copy_batch=True
            )
        return docs.map_batches(fn, batch_format="pandas")

    return run


token_stats = _stage(token_stats_batch, fmt="pyarrow")
bpe_token_stats = _stage(bpe_token_stats_batch)
quality_scores = _stage(quality_batch, fmt="pyarrow")
lang_id = _stage(lang_id_batch, fmt="pyarrow")
doc_hashes = _stage(doc_hashes_batch)
fingerprints = _stage(fingerprint_batch)
repetition_scores = _stage(repetition_batch, fmt="pyarrow")


def doc_features_batch(t: pa.Table) -> pa.Table:
    """All per-document text features in ONE pass over each batch: token
    stats, quality scores, language id and BPE token stats share the text
    column (and the whitespace explode where applicable), so fusing them
    avoids re-reading the documents table four times.  Every component
    batch function preserves input row order, so the outputs align
    positionally — a column concat, not a join."""
    ts = token_stats_batch(t)
    qs = quality_batch(t)
    li = lang_id_batch(t)
    rp = repetition_batch(t)
    bp = pa.Table.from_pandas(
        bpe_token_stats_batch(t.to_pandas()), preserve_index=False
    )
    return pa.table(
        {
            "doc_id": ts["doc_id"],
            "n_tokens": ts["n_tokens"],
            "n_unique_tokens": ts["n_unique_tokens"],
            "n_chars": ts["n_chars"],
            "n_long_tokens": qs["n_long_tokens"],
            "n_stop_tokens": qs["n_stop_tokens"],
            "stop_pct": qs["stop_pct"],
            "is_short": qs["is_short"],
            "pred_lang": li["pred_lang"],
            "top_bigram_pct": rp["top_bigram_pct"],
            "dup_trigram_pct": rp["dup_trigram_pct"],
            "n_bpe_tokens": pa.array(
                bp["n_bpe_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
            ),
            "n_unique_bpe_tokens": pa.array(
                bp["n_unique_bpe_tokens"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            ),
        }
    )


doc_features = _stage(doc_features_batch, fmt="pyarrow")


# ---------------------------------------------------------------------------
# tf/df relevance: top-k characteristic terms per document.
#
# Integer-exact tf-idf analog: score_fp = (tf * TFIDF_SCALE) // df — for a
# fixed corpus this orders terms identically to tf-idf's tf * log(N/df)
# wherever df differs, and being pure integer floor arithmetic it is
# bit-stable against the DuckDB mirror (no float log association issues).
# Two stages, both mergeable:
#   1. document frequency: per-batch (term, #docs-containing) partials —
#      bounded by the batch vocabulary — reduced on the driver (at corpus
#      scale this reduce becomes a bucket-hash groupby; the partial shape
#      is what matters: one row per distinct term per block, never one per
#      occurrence).
#   2. scoring: df rides as a ray.put broadcast; each batch computes term
#      frequencies and keeps its own docs' top-k — no shuffle at all,
#      because a document's tf is local to its row.
# ---------------------------------------------------------------------------

TFIDF_SCALE = 1 << 20


def tfidf_topk(docs: ray.data.Dataset, k: int = 3) -> pd.DataFrame:
    """(doc_id, term_rank, term, score_fp): each document's ``k`` most
    characteristic terms by the exact-integer tf/df score (ties broken by
    term text)."""
    import ray as _ray

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = (
            df[["doc_id"]]
            .assign(term=df["text"].str.findall(TOKEN_RE))
            .explode("term")
            .dropna(subset=["term"])
            .drop_duplicates(["doc_id", "term"])
        )
        vc = pairs["term"].value_counts()
        return pd.DataFrame(
            {"term": vc.index.to_numpy(), "cnt": vc.to_numpy(np.int64)}
        )

    parts = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(df_partial, batch_format="pandas")
        .to_pandas()
    )
    dfreq = parts.groupby("term", sort=False)["cnt"].sum()
    df_ref = _ray.put(dfreq)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        dfr = _ray.get(df_ref)
        tf = (
            batch[["doc_id"]]
            .assign(term=batch["text"].str.findall(TOKEN_RE))
            .explode("term")
            .dropna(subset=["term"])
            .groupby(["doc_id", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        if tf.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "term_rank": pd.Series([], dtype=np.int64),
                    "term": pd.Series([], dtype=object),
                    "score_fp": pd.Series([], dtype=np.int64),
                }
            )
        tf["score_fp"] = (
            tf["tf"].to_numpy(np.int64) * TFIDF_SCALE
        ) // dfr.reindex(tf["term"]).to_numpy(np.int64)
        tf = tf.sort_values(
            ["doc_id", "score_fp", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = tf.groupby("doc_id", sort=False).head(k).copy()
        top["term_rank"] = top.groupby("doc_id", sort=False).cumcount() + 1
        return top[["doc_id", "term_rank", "term", "score_fp"]].astype(
            {"doc_id": np.int64, "term_rank": np.int64, "score_fp": np.int64}
        )

    out = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(
        ["doc_id", "term_rank"], kind="mergesort"
    ).reset_index(drop=True)


def tfidf_topk_sql(k: int = 3, doc_table: str = "documents") -> str:
    """DuckDB mirror: same tokenization, same integer floor score, same
    (score desc, term asc) tie-break."""
    return f"""
WITH occ AS MATERIALIZED (
    SELECT doc_id, t AS term
    FROM {doc_table}, unnest(regexp_extract_all(text, '\\S+')) AS u(t)
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM occ GROUP BY 1),
scored AS (
    SELECT tf.doc_id, tf.term, (tf.tf * {TFIDF_SCALE}) // dfreq.df AS score_fp,
           row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY (tf.tf * {TFIDF_SCALE}) // dfreq.df DESC, tf.term
           ) AS rn
    FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, CAST(rn AS BIGINT) AS term_rank, term,
       CAST(score_fp AS BIGINT) AS score_fp
FROM scored WHERE rn <= {k}
ORDER BY doc_id, term_rank"""


# ---------------------------------------------------------------------------
# BM25 term scoring: the ranked-retrieval scorer over the same token
# universe as tfidf_topk.  Integer-exact BM25 analog (house convention,
# like the PMI and tf/df scores): the Robertson idf's log is dropped in
# favor of the raw rational (N - df + 0.5)/(df + 0.5) — a monotone
# per-term transform — and the whole score is floor arithmetic:
#
#   idf_fp   = ((2*(N - df) + 1) * IDF_SCALE) // (2*df + 1)
#   tf_part  = (44*TT*tf*TP_SCALE) // (20*TT*tf + 6*TT + 18*dl*N)
#              [= tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
#               k1 = 6/5, b = 3/4, avgdl = TT/N, multiplied through so
#               every quantity is an exact integer]
#   score_fp = (idf_fp * tf_part) // IDF_SCALE
#
# Same two-pass shape as tfidf_topk: one streaming pass for the
# mergeable per-block df partials (plus the two corpus scalars N and TT
# riding the same partials as null-term meta rows — no extra scan), then
# a shuffle-free broadcast scoring pass keeping each batch's own docs'
# top-k.
# ---------------------------------------------------------------------------

BM25_IDF_SCALE = 1 << 16
BM25_TP_SCALE = 1 << 14


def bm25_idf(n_docs: int, df):
    """Integerized idf kernel: ((2(N-df)+1) * IDF_SCALE) // (2df+1) —
    the log-free rational (N-df+0.5)/(df+0.5), scaled and floored."""
    df = np.asarray(df, dtype=np.int64)
    return ((2 * (n_docs - df) + 1) * BM25_IDF_SCALE) // (2 * df + 1)


def bm25_tf_part(tt: int, n_docs: int, dl, tf):
    """Integerized tf/length-normalization kernel:
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with k1=6/5, b=3/4,
    avgdl=TT/N, multiplied through to exact floor arithmetic."""
    dl = np.asarray(dl, dtype=np.int64)
    tf = np.asarray(tf, dtype=np.int64)
    return (44 * tt * tf * BM25_TP_SCALE) // (
        20 * tt * tf + 6 * tt + 18 * dl * n_docs
    )


def bm25_topk(docs: ray.data.Dataset, k: int = 3) -> pd.DataFrame:
    """(doc_id, term_rank, term, score_fp): each document's ``k``
    top-scoring terms under the integerized BM25 (ties broken by term
    text).  Docs with zero tokens emit no rows."""
    import ray as _ray

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(TOKEN_RE)
        pairs = (
            df[["doc_id"]]
            .assign(term=toks)
            .explode("term")
            .dropna(subset=["term"])
            .drop_duplicates(["doc_id", "term"])
        )
        vc = pairs["term"].value_counts()
        out = pd.DataFrame(
            {
                "term": vc.index.to_numpy(dtype=object),
                "cnt": vc.to_numpy(np.int64),
                "meta": "",
            }
        )
        meta = pd.DataFrame(
            {
                "term": pd.Series([None, None], dtype=object),
                "cnt": np.array(
                    [len(df), int(toks.str.len().sum())], dtype=np.int64
                ),
                "meta": ["n", "tt"],
            }
        )
        return pd.concat([out, meta], ignore_index=True)

    parts = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(df_partial, batch_format="pandas")
        .to_pandas()
    )
    dfreq = (
        parts[parts["meta"] == ""].groupby("term", sort=False)["cnt"].sum()
    )
    N = int(parts.loc[parts["meta"] == "n", "cnt"].sum())
    TT = int(parts.loc[parts["meta"] == "tt", "cnt"].sum())
    df_ref = _ray.put((dfreq, N, TT))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        dfr, n_docs, tt = _ray.get(df_ref)
        toks = batch["text"].str.findall(TOKEN_RE)
        tf = (
            batch[["doc_id"]]
            .assign(term=toks)
            .explode("term")
            .dropna(subset=["term"])
            .groupby(["doc_id", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        if tf.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "term_rank": pd.Series([], dtype=np.int64),
                    "term": pd.Series([], dtype=object),
                    "score_fp": pd.Series([], dtype=np.int64),
                }
            )
        dl_map = pd.Series(
            toks.str.len().to_numpy(np.int64), index=batch["doc_id"]
        )
        dl = dl_map.reindex(tf["doc_id"]).to_numpy(np.int64)
        tfv = tf["tf"].to_numpy(np.int64)
        dfv = dfr.reindex(tf["term"]).to_numpy(np.int64)
        # int64 headroom: the largest product is 44*TT*tf*TP_SCALE
        # (the SQL mirror's BIGINT errors loudly on the same bound) —
        # fail loudly rather than wrap silently, house convention
        tfmax = int(tfv.max())
        if 44 * tt * tfmax * BM25_TP_SCALE >= 2**63:
            raise ValueError(
                f"bm25_topk: int64 headroom exceeded "
                f"(total_tokens={tt}, max tf={tfmax}); lower "
                f"BM25_TP_SCALE or score per shard"
            )
        idf_fp = bm25_idf(n_docs, dfv)
        tf_part = bm25_tf_part(tt, n_docs, dl, tfv)
        tf["score_fp"] = (idf_fp * tf_part) // BM25_IDF_SCALE
        tf = tf.sort_values(
            ["doc_id", "score_fp", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = tf.groupby("doc_id", sort=False).head(k).copy()
        top["term_rank"] = top.groupby("doc_id", sort=False).cumcount() + 1
        return top[["doc_id", "term_rank", "term", "score_fp"]].astype(
            {"doc_id": np.int64, "term_rank": np.int64, "score_fp": np.int64}
        )

    out = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        # an all-empty Ray result can lose its columns entirely
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "term_rank": pd.Series([], dtype=np.int64),
                "term": pd.Series([], dtype=object),
                "score_fp": pd.Series([], dtype=np.int64),
            }
        )
    return out.sort_values(
        ["doc_id", "term_rank"], kind="mergesort"
    ).reset_index(drop=True)


def bm25_topk_sql(k: int = 3, doc_table: str = "documents") -> str:
    """DuckDB mirror: same tokenization, same integer floors, same
    (score desc, term asc) tie-break."""
    return f"""
WITH occ AS MATERIALIZED (
    SELECT doc_id, t AS term
    FROM {doc_table}, unnest(regexp_extract_all(text, '\\S+')) AS u(t)
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM occ GROUP BY 1),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM occ GROUP BY 1),
meta AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM {doc_table}) AS n,
           (SELECT CAST(count(*) AS BIGINT) FROM occ) AS tt
),
scored AS (
    SELECT tf.doc_id, tf.term,
           ((((2 * (m.n - d.df) + 1) * {BM25_IDF_SCALE}) // (2 * d.df + 1))
            * ((44 * m.tt * tf.tf * {BM25_TP_SCALE})
               // (20 * m.tt * tf.tf + 6 * m.tt + 18 * dl.dl * m.n))
           ) // {BM25_IDF_SCALE} AS score_fp
    FROM tf
    JOIN dfreq d USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN meta m
),
ranked AS (
    SELECT doc_id, term, score_fp,
           row_number() OVER (
               PARTITION BY doc_id ORDER BY score_fp DESC, term
           ) AS rn
    FROM scored
)
SELECT doc_id, CAST(rn AS BIGINT) AS term_rank, term,
       CAST(score_fp AS BIGINT) AS score_fp
FROM ranked WHERE rn <= {k}
ORDER BY doc_id, term_rank"""


# ---------------------------------------------------------------------------
# composite quality filter: signals -> deterministic keep/drop decision
# ---------------------------------------------------------------------------

QF_MIN_TOKENS = 15
QF_MIN_STOP_PCT = 2
QF_MAX_TOP_BIGRAM_PCT = 9
QF_MAX_DUP_TRIGRAM_PCT = 4
QF_REASONS = ("too_short", "repetitive", "low_stopword", "non_english")


def quality_filter_batch(t: pa.Table) -> pa.Table:
    """Gopher-style document filter: the fused doc_features signals feed a
    deterministic FIRST-MATCH rule chain (too_short -> repetitive ->
    low_stopword -> non_english), yielding (doc_id, keep, reject_reason)
    with reject_reason = '' for kept docs.  One pass per batch, no
    shuffle; the rule order and thresholds are mirrored verbatim in the
    SQL oracle."""
    f = doc_features_batch(t)
    n = f["n_tokens"].to_numpy(zero_copy_only=False)
    stop = f["stop_pct"].to_numpy(zero_copy_only=False)
    bg = f["top_bigram_pct"].to_numpy(zero_copy_only=False)
    tg = f["dup_trigram_pct"].to_numpy(zero_copy_only=False)
    lang = np.asarray(f["pred_lang"].to_pylist(), dtype=object)
    conds = [
        n < QF_MIN_TOKENS,
        (bg > QF_MAX_TOP_BIGRAM_PCT) | (tg > QF_MAX_DUP_TRIGRAM_PCT),
        stop < QF_MIN_STOP_PCT,
        lang != "en",
    ]
    reason = np.select(conds, list(QF_REASONS), default="")
    return pa.table(
        {
            "doc_id": f["doc_id"],
            "keep": pa.array((reason == "").astype(np.int64)),
            "reject_reason": pa.array(reason.astype(object), pa.string()),
        }
    )


quality_filter = _stage(quality_filter_batch, fmt="pyarrow")


# ---------------------------------------------------------------------------
# PII detection / redaction (beyond-reference curation op)
#
# Both sides of the parity contract run RE2 (Arrow's replace/count kernels
# and DuckDB's regexp functions), so a single shared pattern string gives
# identical leftmost non-overlapping match semantics.  Placeholders carry
# no digits or '@', so the sequential email -> ipv4 -> phone replacement
# order can't re-match its own output.  The driver fixtures contain no
# PII-shaped strings (vacuous gate row), so this stage is pinned by the
# DuckDB-mirror pytest on planted PII instead of a queries() entry.
# ---------------------------------------------------------------------------

PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d() -]{7,}\d", "<PHONE>"),
)


def redact_pii_batch(t: pa.Table) -> pa.Table:
    """Zero-copy Arrow: classes apply sequentially in PII_PATTERNS order —
    each class counts and replaces on the text AFTER the previous class's
    replacement, so an email's digit-bearing parts are never double-counted
    as an IP or phone."""
    import pyarrow.compute as pc

    text = t["text"]
    cols = {"doc_id": pc.cast(t["doc_id"], pa.int64())}
    red = text
    for name, pat, repl in PII_PATTERNS:
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(red, pat), pa.int64()
        )
        red = pc.replace_substring_regex(red, pat, repl)
    cols["redacted_text"] = red
    cols["n_chars_redacted"] = pc.cast(pc.utf8_length(red), pa.int64())
    return pa.table(cols)


redact_pii = _stage(redact_pii_batch, fmt="pyarrow")


def redact_pii_sql(table: str = "documents") -> str:
    """Exact DuckDB mirror: same RE2 patterns, same sequential precedence
    (each class counts on the text AFTER the previous replacements)."""
    expr = "text"
    selects = ["doc_id"]
    for name, pat, repl in PII_PATTERNS:
        pat_sql = pat.replace("'", "''")
        selects.append(
            f"CAST(len(regexp_extract_all({expr}, '{pat_sql}')) AS BIGINT)"
            f" AS n_{name}"
        )
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    selects.append(f"{expr} AS redacted_text")
    selects.append(f"CAST(length({expr}) AS BIGINT) AS n_chars_redacted")
    return f"SELECT {', '.join(selects)} FROM {table}"


# ---------------------------------------------------------------------------
# Collocation mining — corpus-level phrase discovery (the tokenizer /
# phrase-vocabulary pre-pass of an LLM data pipeline): rank adjacent token
# bigrams by a PMI-equivalent exact-integer score.  PMI(a,b) =
# log(p(ab)/(p(a)p(b))) ranks identically to c_ab/(c_a*c_b) for a fixed
# corpus (the occurrence totals are constants), so the score
#     score_fp = (c_ab * COLLOC_SCALE) // (c_a * c_b)
# is a float-free monotone transform — bit-stable against the DuckDB
# mirror.  Both count tables are mergeable map-side partials (one row per
# distinct gram per block, never one per occurrence); the driver-side
# reduce is vocabulary-bounded, and at corpus scale it becomes the same
# bucket-hash groupby the tf-idf df reduce documents above.  Overflow
# bound: c_ab * COLLOC_SCALE must stay < 2^63 (c_ab <= ~9.2e6 at this
# scale constant); shard the count reduce and drop to log-space floats
# beyond that.
# ---------------------------------------------------------------------------

COLLOC_SCALE = 10**12


def _inbatch_bigrams(doc_idx: np.ndarray, flat):
    """Indices of bigram START positions that stay inside one document of
    an `_explode_ws_tokens` output (each batch row is a whole document, so
    bigrams never span documents or batches)."""
    n = len(flat)
    if n < 2:
        return np.empty(0, dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, np.diff(doc_idx) != 0])
    lens = np.diff(np.r_[starts, n])
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    return np.flatnonzero(pos <= np.repeat(lens, lens) - 2)


def _gram_count_partial(t: pa.Table) -> pa.Table:
    """Mergeable per-block (gram, cnt, kind) count partials over \\S+
    tokens: kind 0 = unigram occurrences, kind 1 = in-document adjacent
    bigram occurrences (shared by collocations and lm_scores)."""
    import pyarrow.compute as pc

    texts = t["text"]
    doc_idx, flat = _explode_ws_tokens(texts)
    n = len(flat)
    gs, cs, ks = [], [], []
    if n:
        vc = pc.value_counts(flat)
        gs.append(vc.field("values"))
        cs.append(vc.field("counts").cast(pa.int64()))
        ks.append(pa.array(np.zeros(len(vc), np.int64)))  # 0 = unigram
    idx = _inbatch_bigrams(doc_idx, flat)
    if len(idx):
        grams = pc.binary_join_element_wise(
            flat.take(pa.array(idx, pa.int64())),
            flat.take(pa.array(idx + 1, pa.int64())),
            " ",
        )
        vc = pc.value_counts(grams)
        gs.append(vc.field("values"))
        cs.append(vc.field("counts").cast(pa.int64()))
        ks.append(pa.array(np.ones(len(vc), np.int64)))  # 1 = bigram
    if not gs:
        return pa.table(
            {
                "gram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "gram": pa.concat_arrays([g.cast(pa.string()) for g in gs]),
            "cnt": pa.concat_arrays(cs),
            "kind": pa.concat_arrays(ks),
        }
    )


def collocations(
    docs: ray.data.Dataset, k: int = 20, min_count: int = 5
) -> pd.DataFrame:
    """(rank, bigram, pair_count, score_fp): the corpus's top-``k``
    adjacent-token bigrams by the PMI-equivalent integer score, among
    bigrams occurring at least ``min_count`` times (the standard
    collocation support filter — rare pairs have unstable PMI).  Ties
    break by bigram text; bigrams never span documents."""
    parts = (
        docs.select_columns(["text"])
        .map_batches(_gram_count_partial, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "rank": pd.Series(dtype="int64"),
                "bigram": pd.Series(dtype="object"),
                "pair_count": pd.Series(dtype="int64"),
                "score_fp": pd.Series(dtype="int64"),
            }
        )
    agg = parts.groupby(["kind", "gram"], sort=False)["cnt"].sum()
    uni = agg.loc[0] if 0 in agg.index.get_level_values(0) else pd.Series(dtype="int64")
    bi = agg.loc[1] if 1 in agg.index.get_level_values(0) else pd.Series(dtype="int64")
    bi = bi[bi >= min_count]
    if not len(bi):
        return pd.DataFrame(
            {
                "rank": pd.Series(dtype="int64"),
                "bigram": pd.Series(dtype="object"),
                "pair_count": pd.Series(dtype="int64"),
                "score_fp": pd.Series(dtype="int64"),
            }
        )
    grams = bi.index.to_numpy()
    left = np.array([g.split(" ", 1)[0] for g in grams])
    right = np.array([g.rsplit(" ", 1)[-1] for g in grams])
    c_ab = bi.to_numpy(np.int64)
    c_a = uni.loc[left].to_numpy(np.int64)
    c_b = uni.loc[right].to_numpy(np.int64)
    score = (c_ab * COLLOC_SCALE) // (c_a * c_b)
    out = pd.DataFrame(
        {"bigram": grams, "pair_count": c_ab, "score_fp": score}
    ).sort_values(
        ["score_fp", "bigram"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out.reset_index(drop=True)


def collocations_sql(
    k: int = 20, min_count: int = 5, doc_table: str = "documents"
) -> str:
    """DuckDB mirror: same \\S+ tokens, same in-document adjacency, same
    integer floor score and (score desc, bigram asc) tie-break."""
    return f"""
WITH co_l AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM {doc_table}
),
co_uni AS (
    SELECT t AS gram, CAST(count(*) AS BIGINT) AS c
    FROM co_l, unnest(l) AS u(t) GROUP BY 1
),
co_bi AS (
    SELECT bg AS bigram, CAST(count(*) AS BIGINT) AS c_ab
    FROM co_l, unnest(list_transform(
            generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i + 1]
         )) AS u(bg)
    GROUP BY 1 HAVING count(*) >= {min_count}
),
co_scored AS (
    SELECT b.bigram, b.c_ab,
           (b.c_ab * {COLLOC_SCALE}) // (ua.c * ub.c) AS score_fp
    FROM co_bi b
    JOIN co_uni ua ON ua.gram = split_part(b.bigram, ' ', 1)
    JOIN co_uni ub ON ub.gram = split_part(b.bigram, ' ', 2)
)
SELECT CAST(row_number() OVER (ORDER BY score_fp DESC, bigram) AS BIGINT)
           AS rank,
       bigram,
       CAST(c_ab AS BIGINT) AS pair_count,
       CAST(score_fp AS BIGINT) AS score_fp
FROM co_scored
ORDER BY score_fp DESC, bigram
LIMIT {k}"""


# ---------------------------------------------------------------------------
# Bigram language-model fluency score: the KenLM-perplexity analog of a
# pretraining quality pipeline, in house exact-integer convention.  The
# corpus itself is the LM: p(b|a) ~ c(ab)/c(a) over in-document adjacent
# \S+ tokens, each bigram occurrence scoring the exact fixed point
# (c_ab * LM_SCALE) // c_a <= LM_SCALE (c(a) counts every occurrence of
# `a`, including document-final ones, so the ratio never exceeds 1).  A
# document's fluency is the floor-average over its bigram occurrences;
# its WORST transition (lowest per-occurrence score, ties by bigram
# text) is reported alongside — the actionable signal for curation.
# ---------------------------------------------------------------------------

LM_SCALE = 1 << 20
#: loud scale gate: the corpus gram vocabulary is broadcast to the
#: scoring pass; above this the scale path is a gram-hash bucketed join
#: (score pass shuffled by bigram), which this operator refuses to do
#: silently.
LM_MAX_VOCAB = 20_000_000


def lm_scores(docs: ray.data.Dataset, max_vocab: int = LM_MAX_VOCAB) -> pd.DataFrame:
    """(doc_id, n_bigrams, worst_bigram, lm_fp) for every document with at
    least one in-document adjacent bigram: ``lm_fp`` is the floor-average
    per-occurrence conditional-probability fixed point and
    ``worst_bigram`` the document's lowest-scoring transition.

    Same two-pass shape as tfidf/bm25 below the vocabulary gate: ONE
    streaming pass of mergeable per-block (gram, kind, cnt) partials
    (shared kernel with :func:`collocations`), reduced once on the driver
    (vocabulary-bounded), then a ``ray.put``-broadcast shuffle-free
    scoring pass — each batch scores only its own documents.  ABOVE the
    gate (counted on the partial rows, which upper-bound the vocabulary,
    so the driver never materializes an over-gate count table) the scale
    path takes over: counts reduce through a gram-hash bucket groupby
    and the per-occurrence rows score through TWO gram-key bucketed
    joins (bigram then first-token) plus one doc-bucket re-aggregation —
    three bounded shuffles instead of a broadcast, bit-identical output
    (pytest-pinned)."""
    pc_ds = (
        docs.select_columns(["text"])
        .map_batches(_gram_count_partial, batch_format="pyarrow")
        .materialize()
    )
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "n_bigrams": pd.Series(dtype="int64"),
            "worst_bigram": pd.Series(dtype="object"),
            "lm_fp": pd.Series(dtype="int64"),
        }
    )
    if pc_ds.count() == 0:
        return empty
    if pc_ds.count() > max_vocab:
        return _lm_scores_joined(docs, pc_ds, empty)
    parts = pc_ds.to_pandas()
    agg = parts.groupby(["kind", "gram"], sort=False)["cnt"].sum()
    uni = agg.loc[0] if 0 in agg.index.get_level_values(0) else pd.Series(dtype="int64")
    bi = agg.loc[1] if 1 in agg.index.get_level_values(0) else pd.Series(dtype="int64")
    if not len(bi):
        return empty
    import ray as _ray

    counts_ref = _ray.put((uni, bi))

    def score(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        u, b = _ray.get(counts_ref)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx, flat = _explode_ws_tokens(t["text"])
        idx = _inbatch_bigrams(doc_idx, flat)
        if not len(idx):
            return empty
        firsts = flat.take(pa.array(idx, pa.int64()))
        grams = pc.binary_join_element_wise(
            firsts, flat.take(pa.array(idx + 1, pa.int64())), " "
        )
        gram_np = np.asarray(grams.cast(pa.string()), dtype=object)
        c_ab = b.reindex(gram_np).to_numpy(np.int64)
        c_a = u.reindex(np.asarray(firsts.cast(pa.string()), dtype=object)).to_numpy(np.int64)
        fp = (c_ab * LM_SCALE) // c_a
        d = pd.DataFrame(
            {"doc_id": doc_ids[doc_idx[idx]], "bg": gram_np, "fp": fp}
        ).sort_values(["doc_id", "fp", "bg"], kind="mergesort")
        per = d.groupby("doc_id", sort=False)["fp"].agg(n="size", s="sum")
        worst = d.drop_duplicates("doc_id", keep="first")
        out = worst.merge(per, on="doc_id")
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(np.int64),
                "n_bigrams": out["n"].to_numpy(np.int64),
                "worst_bigram": out["bg"].to_numpy(),
                "lm_fp": (
                    out["s"].to_numpy(np.int64) // out["n"].to_numpy(np.int64)
                ),
            }
        )

    out = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def _lm_occurrence_rows(t: pa.Table) -> pd.DataFrame:
    """One row per in-document adjacent bigram occurrence:
    (doc_id, bg, a)."""
    import pyarrow.compute as pc

    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx, flat = _explode_ws_tokens(t["text"])
    idx = _inbatch_bigrams(doc_idx, flat)
    if not len(idx):
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "bg": pd.Series(dtype="object"),
                "a": pd.Series(dtype="object"),
            }
        )
    firsts = flat.take(pa.array(idx, pa.int64()))
    grams = pc.binary_join_element_wise(
        firsts, flat.take(pa.array(idx + 1, pa.int64())), " "
    )
    return pd.DataFrame(
        {
            "doc_id": doc_ids[doc_idx[idx]],
            "bg": np.asarray(grams.cast(pa.string()), dtype=object),
            "a": np.asarray(firsts.cast(pa.string()), dtype=object),
        }
    )


def _lm_scores_joined(
    docs: ray.data.Dataset, pc_ds: ray.data.Dataset, empty: pd.DataFrame
) -> pd.DataFrame:
    """The over-gate scale path of :func:`lm_scores`: distributed count
    reduce + two gram-key bucketed joins + one doc-bucket re-aggregation.
    Bit-identical to the broadcast path (same floors, same tie-break)."""
    import ray as _ray

    from webgraph_ray.functions.joins import bucketed_join
    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = default_num_buckets()

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        # process-stable hash: the same gram must land in the same bucket
        # from every worker (builtin hash() is per-process randomized)
        from webgraph_ray.functions.hashing import hash_keys

        h = np.abs(hash_keys(df["gram"].to_numpy(dtype=object)))
        return df.assign(__b=(h % nb).astype(np.int32))

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["kind", "gram"], sort=False, as_index=False)["cnt"]
            .sum()
            .astype({"cnt": np.int64})
        )
        return out

    counts = (
        pc_ds.map_batches(_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(_reduce, batch_format="pandas")
        .materialize()
    )
    bi_c = counts.map_batches(
        lambda df: df.loc[df["kind"] == 1, ["gram", "cnt"]].rename(
            columns={"gram": "bg", "cnt": "c_ab"}
        ),
        batch_format="pandas",
    )
    uni_c = counts.map_batches(
        lambda df: df.loc[df["kind"] == 0, ["gram", "cnt"]].rename(
            columns={"gram": "a", "cnt": "c_a"}
        ),
        batch_format="pandas",
    )
    occ = docs.select_columns(["doc_id", "text"]).map_batches(
        _lm_occurrence_rows, batch_format="pyarrow"
    )
    j = bucketed_join(occ, bi_c, keys=["bg"], how="inner")
    j = bucketed_join(j, uni_c, keys=["a"], how="inner")

    def _score_rows(df: pd.DataFrame) -> pd.DataFrame:
        fp = (
            df["c_ab"].to_numpy(np.int64) * LM_SCALE
        ) // df["c_a"].to_numpy(np.int64)
        out = df[["doc_id", "bg"]].copy()
        out["fp"] = fp
        out["__d"] = (out["doc_id"].to_numpy(np.int64) % nb).astype(np.int32)
        return out

    def _per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "fp", "bg"], kind="mergesort")
        per = g.groupby("doc_id", sort=False)["fp"].agg(n="size", s="sum")
        worst = g.drop_duplicates("doc_id", keep="first")
        out = worst.merge(per, on="doc_id")
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(np.int64),
                "n_bigrams": out["n"].to_numpy(np.int64),
                "worst_bigram": out["bg"].to_numpy(),
                "lm_fp": (
                    out["s"].to_numpy(np.int64) // out["n"].to_numpy(np.int64)
                ),
            }
        )

    out = (
        j.map_batches(_score_rows, batch_format="pandas")
        .groupby("__d")
        .map_groups(_per_doc, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return empty
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def lm_scores_sql(doc_table: str = "documents") -> str:
    """DuckDB mirror: same \S+ tokens, same in-document adjacency, same
    per-occurrence floor score, floor-average and (fp asc, bigram asc)
    worst-transition pick."""
    return f"""
WITH lm_l AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM {doc_table}
),
lm_uni AS (
    SELECT t AS gram, CAST(count(*) AS BIGINT) AS c
    FROM lm_l, unnest(l) AS u(t) GROUP BY 1
),
lm_occ AS MATERIALIZED (
    SELECT doc_id, bg, split_part(bg, ' ', 1) AS a
    FROM lm_l, unnest(list_transform(
            generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i + 1]
         )) AS u(bg)
),
lm_bi AS (
    SELECT bg, CAST(count(*) AS BIGINT) AS c_ab FROM lm_occ GROUP BY 1
),
lm_scored AS (
    SELECT o.doc_id, o.bg,
           (b.c_ab * {LM_SCALE}) // ua.c AS fp
    FROM lm_occ o
    JOIN lm_bi b ON b.bg = o.bg
    JOIN lm_uni ua ON ua.gram = o.a
),
lm_ranked AS (
    SELECT doc_id, bg, fp,
           row_number() OVER (PARTITION BY doc_id ORDER BY fp, bg) AS rn,
           CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n,
           CAST(sum(fp) OVER (PARTITION BY doc_id)
                // count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS avg_fp
    FROM lm_scored
)
SELECT doc_id, n AS n_bigrams, bg AS worst_bigram, avg_fp AS lm_fp
FROM lm_ranked WHERE rn = 1
ORDER BY doc_id"""


def vocab_topk(
    docs: ray.data.Dataset, k: int = 1000, max_vocab: int = LM_MAX_VOCAB
) -> pd.DataFrame:
    """(rank, token, count): the corpus's top-``k`` \\S+ tokens by
    occurrence count (ties by token text) — the vocabulary pre-pass of a
    tokenizer pipeline.  ONE streaming pass of the shared mergeable
    gram-count partials (:func:`_gram_count_partial`, unigram rows only),
    reduced once on the driver below the gate (counted on partial rows);
    ABOVE it the distributed top-k shape takes over: token-hash bucket
    groupby (every token wholly in one bucket) -> per-bucket exact sums +
    per-bucket top-k -> the driver merges only #buckets * k rows.
    Bit-identical across paths (pytest-pinned)."""
    pc_ds = (
        docs.select_columns(["text"])
        .map_batches(_gram_count_partial, batch_format="pyarrow")
        .materialize()
    )
    empty = pd.DataFrame(
        {
            "rank": pd.Series(dtype="int64"),
            "token": pd.Series(dtype="object"),
            "count": pd.Series(dtype="int64"),
        }
    )
    if pc_ds.count() == 0:
        return empty
    if pc_ds.count() <= max_vocab:
        parts = pc_ds.to_pandas()
        uni = parts[parts["kind"] == 0]
        if not len(uni):
            return empty
        agg = uni.groupby("gram", sort=False)["cnt"].sum().reset_index()
    else:
        from webgraph_ray.functions.hashing import hash_keys
        from webgraph_ray.functions.shuffle import default_num_buckets

        nb = default_num_buckets()

        def _bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["kind"] == 0]
            h = np.abs(hash_keys(df["gram"].to_numpy(dtype=object)))
            return df.assign(__b=(h % nb).astype(np.int32))

        def _bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
            a = g.groupby("gram", sort=False)["cnt"].sum().reset_index()
            return a.sort_values(
                ["cnt", "gram"], ascending=[False, True], kind="mergesort"
            ).head(k)

        agg = (
            pc_ds.map_batches(_bucket, batch_format="pandas")
            .groupby("__b")
            .map_groups(_bucket_topk, batch_format="pandas")
            .to_pandas()
        )
        if not len(agg):
            return empty
    agg = agg.sort_values(
        ["cnt", "gram"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(agg) + 1, dtype=np.int64),
            "token": agg["gram"].to_numpy(),
            "count": agg["cnt"].to_numpy(np.int64),
        }
    )


def vocab_topk_sql(k: int = 1000, doc_table: str = "documents") -> str:
    """DuckDB mirror: same tokens, same (count desc, token asc) order."""
    return f"""
SELECT CAST(row_number() OVER (ORDER BY c DESC, gram) AS BIGINT) AS rank,
       gram AS token,
       CAST(c AS BIGINT) AS count
FROM (
    SELECT t AS gram, count(*) AS c
    FROM {doc_table}, unnest(regexp_extract_all(text, '\\S+')) AS u(t)
    GROUP BY 1
)
ORDER BY c DESC, gram
LIMIT {k}"""


# ---------------------------------------------------------------------------
# DSIR importance weights — Data Selection via Importance Resampling
# (Xie et al. 2023): score every document by how much its token unigram
# distribution resembles a TARGET distribution relative to the raw corpus.
# Here the target is the sub-corpus whose ``lang`` column equals
# ``target_lang`` (the high-resource-language selection shape); the
# per-gram signal is the Laplace-smoothed probability ratio kept as a
# log-free fixed point so DuckDB mirrors it bit-for-bit:
#
#     s_g = (S * (tc_g + 1) * (R + V)) // ((rc_g + 1) * (T + V))
#
# (tc/rc = target/raw occurrence counts of gram g, T/R their totals, V
# the distinct-gram count; the products exceed int64 at design scale, so
# both engines use arbitrary-precision ints — Python int / HUGEINT).  A
# document reports the floor-average of its occurrences' s_g (the
# linear-ratio surrogate of DSIR's summed log-ratio — same ranking
# monotonicity per occurrence, no floats), its token count and its
# highest-scoring token (tie -> smaller token).
# Reference analog: none (WebGraph has no corpus selection); sibling of
# the lm/tfidf/bm25 term-scoring family and the same two-pass,
# vocabulary-gated shape: mergeable per-block count partials + broadcast
# scoring below the gate, gram-hash bucket reduce + ONE gram-key
# bucketed join + one doc-bucket re-aggregation above it (bit-identical,
# pytest-pinned).
# ---------------------------------------------------------------------------

DSIR_SCALE = 1 << 20
DSIR_MAX_VOCAB = 20_000_000
DSIR_TARGET_LANG = "en"


def _dsir_empty() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "n_tokens": pd.Series(dtype="int64"),
            "top_term": pd.Series(dtype="object"),
            "dsir_fp": pd.Series(dtype="int64"),
        }
    )


def _dsir_gram_scores(rc, tc, R: int, T: int, V: int) -> list:
    """Python-int fixed-point ratio per gram (intermediates > int64)."""
    S = DSIR_SCALE
    return [
        (S * (int(t) + 1) * (R + V)) // ((int(r) + 1) * (T + V))
        for r, t in zip(rc, tc)
    ]


def _dsir_doc_rows(doc_ids, doc_idx, toks, s) -> pd.DataFrame:
    """Per-doc floor-average + argmax-term from occurrence scores."""
    d = pd.DataFrame(
        {"doc_id": doc_ids[doc_idx], "tok": toks, "s": s}
    ).sort_values(["doc_id", "s", "tok"], ascending=[True, False, True],
                  kind="mergesort")
    per = d.groupby("doc_id", sort=False)["s"].agg(n="size", ssum="sum")
    best = d.drop_duplicates("doc_id", keep="first")
    out = best.merge(per, on="doc_id")
    return pd.DataFrame(
        {
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "n_tokens": out["n"].to_numpy(np.int64),
            "top_term": out["tok"].to_numpy(),
            "dsir_fp": out["ssum"].to_numpy(np.int64)
                       // out["n"].to_numpy(np.int64),
        }
    )


def dsir_scores(
    docs: ray.data.Dataset,
    target_lang: str = DSIR_TARGET_LANG,
    max_vocab: int = DSIR_MAX_VOCAB,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """(doc_id, n_tokens, top_term, dsir_fp) for every doc with >=1 token."""
    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.joins import bucketed_join
    from webgraph_ray.functions.shuffle import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def count_partial(t: pa.Table) -> pd.DataFrame:
        doc_idx, flat = _explode_ws_tokens(t["text"])
        if not len(flat):
            return pd.DataFrame(
                {
                    "gram": pd.Series(dtype="object"),
                    "rc": pd.Series(dtype="int64"),
                    "tc": pd.Series(dtype="int64"),
                }
            )
        langs = np.asarray(t["lang"].to_numpy(zero_copy_only=False), dtype=object)
        toks = np.asarray(flat.cast(pa.string()), dtype=object)
        is_t = (langs[doc_idx] == target_lang).astype(np.int64)
        df = pd.DataFrame({"gram": toks, "tc": is_t})
        return (
            df.groupby("gram", sort=False)
            .agg(rc=("tc", "size"), tc=("tc", "sum"))
            .reset_index()
        )

    parts = (
        docs.select_columns(["lang", "text"])
        .map_batches(count_partial, batch_format="pyarrow")
        .materialize()
    )
    if parts.count() == 0:
        return _dsir_empty()

    if parts.count() <= max_vocab:
        # broadcast path: vocabulary-bounded reduce on the driver, then a
        # ray.put-broadcast shuffle-free scoring pass
        pdf = parts.to_pandas()
        agg = pdf.groupby("gram", sort=False)[["rc", "tc"]].sum()
        R, T, V = int(agg["rc"].sum()), int(agg["tc"].sum()), len(agg)
        s = pd.Series(
            np.array(
                _dsir_gram_scores(agg["rc"], agg["tc"], R, T, V), dtype=np.int64
            ),
            index=agg.index,
        )
        import ray as _ray

        ref = _ray.put(s)

        def score(t: pa.Table) -> pd.DataFrame:
            sm = _ray.get(ref)
            doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            doc_idx, flat = _explode_ws_tokens(t["text"])
            if not len(flat):
                return _dsir_empty()
            toks = np.asarray(flat.cast(pa.string()), dtype=object)
            sv = sm.reindex(toks).to_numpy(np.int64)
            return _dsir_doc_rows(doc_ids, doc_idx, toks, sv)

        out = (
            docs.select_columns(["doc_id", "text"])
            .map_batches(score, batch_format="pyarrow")
            .to_pandas()
        )
        return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)

    # ----- scale path: gram-hash bucket reduce + ONE gram-key bucketed
    # join + doc-bucket re-aggregation (no whole-vocabulary driver table)
    def tag_gram(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__b"] = (
            hash_keys(out["gram"].to_numpy(object)) % num_buckets
        ).astype(np.int32)
        return out

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("gram", sort=False)[["rc", "tc"]].sum().reset_index()
        )

    red = (
        parts.map_batches(tag_gram, batch_format="pandas")
        .groupby("__b")
        .map_groups(sum_bucket, batch_format="pandas")
        .materialize()
    )
    R, T, V = int(red.sum("rc")), int(red.sum("tc")), int(red.count())

    def score_map(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "gram": df["gram"].to_numpy(object),
                "s": np.array(
                    _dsir_gram_scores(df["rc"], df["tc"], R, T, V),
                    dtype=np.int64,
                ),
            }
        )

    sc = red.map_batches(score_map, batch_format="pandas")

    def occ_rows(t: pa.Table) -> pd.DataFrame:
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx, flat = _explode_ws_tokens(t["text"])
        return pd.DataFrame(
            {
                "doc_id": doc_ids[doc_idx],
                "gram": np.asarray(flat.cast(pa.string()), dtype=object),
            }
        )

    occ = docs.select_columns(["doc_id", "text"]).map_batches(
        occ_rows, batch_format="pyarrow"
    )
    j = bucketed_join(occ, sc, keys=["gram"], num_buckets=num_buckets)

    # map-side per-doc partials (sum/count merge by addition; the argmax
    # merges by the same (s desc, tok asc) rule), ONE doc-bucket combine
    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(
            ["doc_id", "s", "gram"], ascending=[True, False, True],
            kind="mergesort",
        )
        per = d.groupby("doc_id", sort=False)["s"].agg(n="size", ssum="sum")
        best = d.drop_duplicates("doc_id", keep="first")
        out = best.merge(per, on="doc_id")[["doc_id", "gram", "s", "n", "ssum"]]
        out["__b"] = (out["doc_id"].to_numpy(np.int64) % num_buckets).astype(
            np.int32
        )
        return out

    def doc_combine(g: pd.DataFrame) -> pd.DataFrame:
        sums = g.groupby("doc_id", sort=False)[["n", "ssum"]].sum()
        best = g.sort_values(
            ["doc_id", "s", "gram"], ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("doc_id", keep="first")
        out = best.merge(sums, on="doc_id", suffixes=("_p", ""))
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(np.int64),
                "n_tokens": out["n"].to_numpy(np.int64),
                "top_term": out["gram"].to_numpy(),
                "dsir_fp": out["ssum"].to_numpy(np.int64)
                           // out["n"].to_numpy(np.int64),
            }
        )

    out = (
        j.map_batches(doc_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(doc_combine, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def dsir_scores_sql(
    target_lang: str = DSIR_TARGET_LANG, doc_table: str = "documents"
) -> str:
    """DuckDB mirror: identical Laplace fixed-point ratio over HUGEINT."""
    S = DSIR_SCALE
    return f"""
WITH ds_toks AS MATERIALIZED (
    SELECT doc_id, lang, unnest(regexp_extract_all(text, '\\S+')) AS t
    FROM {doc_table}
),
ds_rc AS MATERIALIZED (
    SELECT t, count(*) AS rc,
           count(*) FILTER (WHERE lang = '{target_lang}') AS tc
    FROM ds_toks GROUP BY 1
),
ds_tot AS (
    SELECT sum(rc) AS R, sum(tc) AS T, count(*) AS V FROM ds_rc
),
ds_sc AS MATERIALIZED (
    SELECT r.t,
           (CAST({S} AS HUGEINT) * (r.tc + 1) * (tot.R + tot.V))
               // ((r.rc + 1) * (tot.T + tot.V)) AS s
    FROM ds_rc r CROSS JOIN ds_tot tot
),
ds_j AS MATERIALIZED (
    SELECT o.doc_id, o.t, sc.s FROM ds_toks o JOIN ds_sc sc ON sc.t = o.t
),
ds_per AS (
    SELECT doc_id, count(*) AS n, sum(s) AS ssum FROM ds_j GROUP BY 1
),
ds_top AS (
    SELECT doc_id, t FROM (
        SELECT doc_id, t,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY s DESC, t ASC) AS rn
        FROM ds_j) WHERE rn = 1
)
SELECT p.doc_id,
       CAST(p.n AS BIGINT) AS n_tokens,
       tp.t AS top_term,
       CAST(p.ssum // p.n AS BIGINT) AS dsir_fp
FROM ds_per p JOIN ds_top tp USING (doc_id)
ORDER BY doc_id"""
