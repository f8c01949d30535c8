"""DSIR importance weights: Ray vs the HUGEINT DuckDB mirror on both the
broadcast and the bucketed-join scale path, plus semantics pins."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from webgraph_ray.stages.text import (
    DSIR_SCALE,
    dsir_scores,
    dsir_scores_sql,
)


def _docs(seed=3, n=120):
    rng = np.random.default_rng(seed)
    en_words = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    de_words = ["der", "hund", "katze", "auf", "matte", "the", "on"]
    rows = []
    for i in range(n):
        lang = "en" if rng.random() < 0.6 else "de"
        words = en_words if lang == "en" else de_words
        k = int(rng.integers(0, 9))
        rows.append(
            (i, " ".join(rng.choice(words, size=k)) if k else "", lang)
        )
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def _oracle(docs):
    con = duckdb.connect()
    con.register("documents", docs)
    return con.execute(dsir_scores_sql()).df()


@pytest.mark.parametrize("max_vocab", [20_000_000, 0])
def test_dsir_matches_oracle_both_paths(max_vocab):
    docs = _docs()
    got = dsir_scores(
        ray.data.from_pandas(docs).repartition(6), max_vocab=max_vocab
    ).reset_index(drop=True)
    exp = _oracle(docs)
    pd.testing.assert_frame_equal(
        got, exp.astype({"n_tokens": np.int64, "dsir_fp": np.int64})
    )
    # empty docs carry no row
    n_empty = int((docs["text"] == "").sum())
    assert len(got) == len(docs) - n_empty


def test_dsir_ranks_target_like_docs_higher():
    # a doc of purely target-exclusive words must outscore a doc of purely
    # non-target-exclusive words
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "alpha beta", "alpha beta", "alpha beta",
                "zeta eta", "zeta eta", "alpha zeta",
            ],
            "lang": ["en", "en", "en", "de", "de", "de"],
        }
    )
    out = dsir_scores(ray.data.from_pandas(docs)).set_index("doc_id")
    assert out.loc[0, "dsir_fp"] > out.loc[3, "dsir_fp"]
    # mixed doc 5: its most-target-like token is the en-heavy one
    assert out.loc[5, "top_term"] == "alpha"
    # uniform-ratio sanity: scores are positive fixed points
    assert (out["dsir_fp"] > 0).all()
    assert DSIR_SCALE == 1 << 20
