"""Sequence packing: distributed ordered prefix scan vs DuckDB window
functions, partitioning invariance, and window-boundary semantics."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

from webgraph_ray.stages.pack import sequence_pack, sequence_pack_sql


def _docs(seed=11, n=300):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 30))
        if i % 17 == 0:
            texts.append("")  # empty doc: 0 tokens
        elif i % 13 == 0:
            texts.append("  \t \n ")  # whitespace-only: 0 tokens
        else:
            texts.append(" ".join(f"w{v}" for v in rng.integers(0, 50, size=k)))
    return pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "text": texts}
    )


def _norm(df):
    return (
        df.sort_values("doc_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in df.columns if c != "text"})
    )


def test_sequence_pack_matches_duckdb_oracle():
    df = _docs()
    got = sequence_pack(
        ray.data.from_pandas(df).repartition(7), budget=16
    ).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(sequence_pack_sql(budget=16)).df()
    pd.testing.assert_frame_equal(
        _norm(got)[list(exp.columns)], _norm(exp), check_dtype=False
    )


def test_sequence_pack_partitioning_invariant():
    df = _docs(seed=3)
    a = sequence_pack(
        ray.data.from_pandas(df).repartition(3), budget=32, num_buckets=2
    ).to_pandas()
    b = sequence_pack(
        ray.data.from_pandas(df).repartition(13), budget=32, num_buckets=9
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_dtype=False)


def test_sequence_pack_boundary_semantics():
    # budget 4: doc0 fills window 0 exactly, doc1 straddles 1-2,
    # doc2 is empty (spans 1 window at its start position), doc3 follows
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b c d", "e f g h i j", "", "k"],
        }
    )
    out = (
        sequence_pack(ray.data.from_pandas(df), budget=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["global_start"].tolist() == [0, 4, 10, 10]
    assert out["pack_id"].tolist() == [0, 1, 2, 2]
    assert out["pack_pos"].tolist() == [0, 0, 2, 2]
    assert out["n_packs_spanned"].tolist() == [1, 2, 1, 1]
