"""Integerized BM25 term scoring: brute-force recount, rare-term-wins
ranking, length normalization direction, partition invariance, DuckDB
parity."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.stages.text import (
    BM25_IDF_SCALE,
    BM25_TP_SCALE,
    bm25_topk,
    bm25_topk_sql,
)


def _docs_ds(texts, nparts=1):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
        }
    )
    ds = ray.data.from_pandas(df)
    return ds.repartition(nparts) if nparts > 1 else ds


FIXTURE = [
    "the cat sat on the mat",
    "the dog sat on the log the the",
    "zebra stripes zebra",
    "the the the the",
    "cat dog zebra",
    "",
]


def _brute(texts, k=3):
    rows = []
    toks = [t.split() for t in texts]
    N = len(texts)
    TT = sum(len(t) for t in toks)
    df = {}
    for t in toks:
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    for d, t in enumerate(toks):
        dl = len(t)
        tf = {}
        for term in t:
            tf[term] = tf.get(term, 0) + 1
        scored = []
        for term, f in tf.items():
            idf = ((2 * (N - df[term]) + 1) * BM25_IDF_SCALE) // (
                2 * df[term] + 1
            )
            tp = (44 * TT * f * BM25_TP_SCALE) // (
                20 * TT * f + 6 * TT + 18 * dl * N
            )
            scored.append((d, term, (idf * tp) // BM25_IDF_SCALE))
        scored.sort(key=lambda r: (-r[2], r[1]))
        for rank, (d_, term, s) in enumerate(scored[:k], 1):
            rows.append((d_, rank, term, s))
    return pd.DataFrame(
        rows, columns=["doc_id", "term_rank", "term", "score_fp"]
    )


def test_brute_force_and_partition_invariance():
    ref = _brute(FIXTURE)
    for nparts in (1, 4):
        got = bm25_topk(_docs_ds(FIXTURE, nparts))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), ref, check_dtype=False
        )


def test_rare_term_outranks_common():
    """In 'cat dog zebra' every tf/dl is equal, so ranking is pure idf:
    zebra (df=2) must outrank cat/dog (df=3 each is wrong — cat df=2,
    dog df=2, zebra df=2 in the fixture) — use a sharper fixture."""
    texts = ["common common rare", "common filler", "common other"]
    got = bm25_topk(_docs_ds(texts))
    doc0 = got[got["doc_id"] == 0]
    # 'rare' (df=1) beats 'common' (df=3) despite lower tf
    assert doc0.iloc[0]["term"] == "rare"


def test_length_normalization_direction():
    """Same tf and df: the shorter document scores the term higher."""
    texts = ["topic", "topic filler filler filler filler filler"]
    got = bm25_topk(_docs_ds(texts))
    s_short = int(
        got[(got["doc_id"] == 0) & (got["term"] == "topic")]["score_fp"].iloc[0]
    )
    s_long = int(
        got[(got["doc_id"] == 1) & (got["term"] == "topic")]["score_fp"].iloc[0]
    )
    assert s_short > s_long


def test_duckdb_parity():
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": np.arange(len(FIXTURE), dtype=np.int64),
                "text": FIXTURE,
            }
        ),
    )
    exp = con.execute(bm25_topk_sql()).df()
    con.close()
    got = bm25_topk(_docs_ds(FIXTURE, 3))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.reset_index(drop=True),
        check_dtype=False,
    )


def test_empty_corpus():
    got = bm25_topk(_docs_ds(["", "", ""]))
    assert len(got) == 0
