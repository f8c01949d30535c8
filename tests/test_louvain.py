"""Louvain-style synchronous modularity refinement: Ray vs the unrolled
HUGEINT DuckDB mirror on both paths, refinement-improves-Q check, and
partitioning invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from webgraph_ray.graph.community import (
    MODULARITY_SCALE,
    community_modularity,
    louvain_refine,
    louvain_refine_sql,
)
from tests.test_community import _edges


def _seed_labels(edges: pd.DataFrame) -> pd.DataFrame:
    # deterministic coarse seed: community = first character of the key
    vs = sorted(set(edges["src_key"]) | set(edges["dst_key"]))
    return pd.DataFrame(
        {"vertex_key": vs, "label": [v[0] for v in vs]}
    )


def _oracle(edges: pd.DataFrame, seed: pd.DataFrame | None = None) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("edges_raw", edges)
    seed_select = None
    if seed is not None:
        con.register("seed_raw", seed)
        seed_select = "SELECT vertex_key AS v, label AS lbl FROM seed_raw"
    return (
        con.execute(
            louvain_refine_sql(
                "WITH edges AS (SELECT * FROM edges_raw)",
                seed_select=seed_select,
            )
        )
        .df()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )


def test_louvain_matches_oracle_lpa_seed():
    # full integration: LPA seed on both engines (broadcast path)
    edges = _edges()
    got = (
        louvain_refine(ray.data.from_pandas(edges).repartition(5))
        .to_pandas()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _oracle(edges))


@pytest.mark.parametrize("threshold", [5_000_000, 0])
def test_louvain_matches_oracle_both_paths(threshold):
    # move phase against an explicit seed partition (skips the LPA chain
    # on both engines; threshold=0 forces every join onto the scale path)
    edges = _edges()
    seed = _seed_labels(edges)
    got = (
        louvain_refine(
            ray.data.from_pandas(edges).repartition(5),
            labels=ray.data.from_pandas(seed),
            broadcast_threshold=threshold,
        )
        .to_pandas()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _oracle(edges, seed))


def test_louvain_partitioning_invariant():
    edges = _edges(seed=9)
    seed = _seed_labels(edges)
    a = (
        louvain_refine(
            ray.data.from_pandas(edges).repartition(3),
            labels=ray.data.from_pandas(seed),
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    b = (
        louvain_refine(
            ray.data.from_pandas(edges).repartition(11),
            labels=ray.data.from_pandas(seed),
            num_buckets=7,
        )
        .to_pandas()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_louvain_improves_modularity_on_split_seed():
    # seed partition splits each triangle across two communities; the
    # move phase must strictly improve total modularity and recover the
    # two-clique partition (Q = 1/2)
    edges = pd.DataFrame(
        {
            "src_key": ["a1", "a2", "a3", "b1", "b2", "b3"],
            "dst_key": ["a2", "a3", "a1", "b2", "b3", "b1"],
        }
    )
    bad = pd.DataFrame(
        {
            "vertex_key": ["a1", "a2", "a3", "b1", "b2", "b3"],
            "label": ["p", "p", "q", "q", "r", "r"],
        }
    )
    eds = ray.data.from_pandas(edges)
    seed = ray.data.from_pandas(bad)

    def total_q(lab_ds):
        rows = community_modularity(eds, labels=lab_ds.materialize())
        return int(
            rows.loc[rows["vertex_key"] == "__total__", "label"].iloc[0]
        )

    q_bad = total_q(seed)
    refined = louvain_refine(eds, labels=ray.data.from_pandas(bad))
    q_ref = total_q(refined)
    assert q_ref > q_bad
    assert q_ref == MODULARITY_SCALE // 2
    out = refined.to_pandas().set_index("vertex_key")["label"]
    assert len({out["a1"], out["a2"], out["a3"]}) == 1
    assert len({out["b1"], out["b2"], out["b3"]}) == 1
    assert out["a1"] != out["b1"]
