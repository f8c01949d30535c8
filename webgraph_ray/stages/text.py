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
