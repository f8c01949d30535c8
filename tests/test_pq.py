"""Product quantization: exact-int64 codebooks/codes/ADC vs the unrolled
DuckDB oracle, partitioning invariance, and the compression contract."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

from webgraph_ray.stages.pq import (
    PQ_M,
    pq_ann_sql,
    pq_ann_topk,
    pq_codes,
    pq_codes_sql,
)


def _embs(n=160, dim=64, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.normal(size=(n, dim)).round(4)),
        }
    )


def test_pq_codes_match_duckdb():
    df = _embs()
    got = (
        pq_codes(ray.data.from_pandas(df).repartition(4), k=16)
        .to_pandas()
        .sort_values(["vec_id", "subspace"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    con = duckdb.connect()
    con.register("embeddings", df)
    exp = (
        con.execute(pq_codes_sql(k=16))
        .df()
        .sort_values(["vec_id", "subspace"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert got["code"].between(0, 15).all()
    assert len(got) == len(df) * PQ_M  # 8 codes/vector vs 512 raw bytes


def test_pq_ann_matches_duckdb_and_partitioning():
    df = _embs(seed=9)
    qids = [0, 3, 7]
    con = duckdb.connect()
    con.register("embeddings", df)
    exp = (
        con.execute(pq_ann_sql(qids, k=5, ksub=16))
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    for parts in (2, 9):
        got = (
            pq_ann_topk(
                ray.data.from_pandas(df).repartition(parts), qids, k=5, ksub=16
            )
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)
    assert (exp.groupby("query_id").size() == 5).all()
    assert not (exp["neighbor_id"] == exp["query_id"]).any()


def test_pq_shrunken_codebook_when_fewer_vectors_than_codes():
    # default ksub=256 with only 60 vectors: both sides fall back to a
    # 60-entry codebook (LIMIT k of the id-ordered rows), codes stay valid
    df = _embs(n=60, seed=1)
    qids = [2, 5]
    got = (
        pq_ann_topk(ray.data.from_pandas(df).repartition(3), qids, k=4)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", df)
    exp = (
        con.execute(pq_ann_sql(qids, k=4))
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, exp)
