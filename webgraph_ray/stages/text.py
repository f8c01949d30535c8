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


def bpe_token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = df["text"].str.findall(BPE_TOKEN_RE)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_bpe_tokens": toks.str.len().astype(np.int64),
            "n_unique_bpe_tokens": toks.map(lambda t: len(set(t))).astype(
                np.int64
            ),
        }
    )


def token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = df["text"].str.findall(TOKEN_RE)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": toks.str.len().astype(np.int64),
            "n_unique_tokens": toks.map(lambda t: len(set(t))).astype(np.int64),
            "n_chars": df["text"].str.len().astype(np.int64),
        }
    )


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = df["text"].str.findall(TOKEN_RE)
    n_tokens = toks.str.len().astype(np.int64)
    en = frozenset(STOPWORDS["en"])
    n_stop = toks.map(lambda t: sum(w in en for w in t)).astype(np.int64)
    n_long = toks.map(
        lambda t: sum(len(w) >= LONG_TOKEN_LEN for w in t)
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens,
            "n_long_tokens": n_long,
            "n_stop_tokens": n_stop,
            "stop_pct": (100 * n_stop // n_tokens.clip(lower=1)).astype(np.int64),
            "is_short": (df["text"].str.len() < 100).astype(np.int64),
        }
    )


def lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Stopword-vote language id; ties and zero evidence -> 'unknown'.
    The vote order for ties is deterministic: highest count wins, and among
    equal counts the language earlier in STOPWORDS order wins only if
    strictly greater than all others (else 'unknown')."""
    toks = df["text"].str.lower().str.findall(TOKEN_RE)
    scores = {
        lang: toks.map(lambda t, s=frozenset(ws): sum(w in s for w in t)).astype(int)
        for lang, ws in STOPWORDS.items()
    }
    langs = list(STOPWORDS)
    mat = np.stack([scores[l] for l in langs], axis=1)
    best = mat.argmax(axis=1)
    best_score = mat.max(axis=1)
    # 'unknown' when zero evidence or a tie for the max
    tie = (mat == best_score[:, None]).sum(axis=1) > 1
    pred = np.where(
        (best_score == 0) | tie, "unknown", np.array(langs, dtype=object)[best]
    )
    return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": pred})


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


def _stage(fn):
    def run(docs: ray.data.Dataset) -> ray.data.Dataset:
        return docs.map_batches(fn, batch_format="pandas")

    return run


token_stats = _stage(token_stats_batch)
bpe_token_stats = _stage(bpe_token_stats_batch)
quality_scores = _stage(quality_batch)
lang_id = _stage(lang_id_batch)
doc_hashes = _stage(doc_hashes_batch)
fingerprints = _stage(fingerprint_batch)


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
