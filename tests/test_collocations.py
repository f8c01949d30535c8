"""Collocation mining (PMI-equivalent integer score over adjacent bigrams)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

from webgraph_ray.stages.text import COLLOC_SCALE, collocations, collocations_sql


def _corpus(seed=12, n=300, planted=0.4):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for _ in range(n):
        toks = list(rng.choice(vocab, size=rng.integers(2, 30)))
        if rng.random() < planted:
            toks += ["new", "york"]
        texts.append(" ".join(toks))
    texts += ["", "solo"]  # empty + one-token docs contribute no bigrams
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    return ray.data.from_pandas(df).repartition(6), df


def test_collocations_planted_pair_oracle_and_blocking_invariance():
    ds, df = _corpus()
    got = collocations(ds, k=20, min_count=5)
    # the planted pair dominates the PMI-equivalent score
    assert got["bigram"].iloc[0] == "new york"

    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(collocations_sql(k=20, min_count=5)).df()
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int64", "pair_count": "int64", "score_fp": "int64"}),
        exp.astype({"rank": "int64", "pair_count": "int64", "score_fp": "int64"}),
    )

    other = collocations(ds.repartition(1), k=20, min_count=5)
    assert got.equals(other)


def test_collocations_bruteforce_counts():
    # pair_count and score match a direct python recount
    ds, df = _corpus(seed=3, n=120)
    got = collocations(ds, k=50, min_count=2)
    uni: dict = {}
    bi: dict = {}
    for t in df["text"]:
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[f"{a} {b}"] = bi.get(f"{a} {b}", 0) + 1
    for _, r in got.iterrows():
        g = r["bigram"]
        a, b = g.split(" ")
        assert bi[g] == r["pair_count"]
        assert (bi[g] * COLLOC_SCALE) // (uni[a] * uni[b]) == r["score_fp"]


def test_collocations_never_span_documents():
    # boundary bigram ("end start") must NOT appear even across many docs
    texts = ["alpha end"] * 30 + ["start beta"] * 30
    df = pd.DataFrame(
        {"doc_id": np.arange(60, dtype=np.int64), "text": texts}
    )
    ds = ray.data.from_pandas(df).repartition(1)  # adjacent rows, one block
    got = collocations(ds, k=50, min_count=1)
    assert "end start" not in set(got["bigram"])
    assert {"alpha end", "start beta"} <= set(got["bigram"])


def test_collocations_empty_and_below_support():
    empty = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                      "text": pd.Series(dtype="object")})
    )
    assert len(collocations(empty, k=10, min_count=1)) == 0
    # all bigrams unique -> nothing clears min_count=2
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": ["a b", "c d", "e f"]})
    got = collocations(ray.data.from_pandas(df), k=10, min_count=2)
    assert len(got) == 0
