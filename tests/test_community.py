"""Mode-LPA community detection: Ray composition vs the unrolled DuckDB
oracle on both execution paths (broadcast and join), plus semantics pins."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from webgraph_ray.graph.community import (
    COMMUNITY_ROUNDS,
    community_lpa,
    community_lpa_sql,
)


def _edges(seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    # two dense planted communities with a single bridge, a chain, a
    # self-loop-only vertex, and duplicated multiplicity rows
    for base in ("x", "y"):
        ks = [f"{base}{i}" for i in range(9)]
        for i in range(9):
            for j in range(i + 1, 9):
                if rng.random() < 0.6:
                    rows.append((ks[i], ks[j]))
    rows += [("x0", "y0"), ("z0", "z0")]
    rows += [(f"c{i}", f"c{i+1}") for i in range(6)]
    rows += rows[:7]
    return pd.DataFrame(rows, columns=["src_key", "dst_key"])


def _oracle(edges):
    con = duckdb.connect()
    con.register("edges_raw", edges)
    return (
        con.execute(community_lpa_sql("WITH edges AS (SELECT * FROM edges_raw)"))
        .df()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("threshold", [5_000_000, 0])
def test_community_matches_oracle_both_paths(threshold):
    edges = _edges()
    got = (
        community_lpa(
            ray.data.from_pandas(edges).repartition(5),
            broadcast_threshold=threshold,
        )
        .to_pandas()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _oracle(edges))


def test_community_partitioning_invariant():
    edges = _edges(seed=9)
    a = (
        community_lpa(ray.data.from_pandas(edges).repartition(3), num_buckets=4)
        .to_pandas()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    b = (
        community_lpa(ray.data.from_pandas(edges).repartition(11), num_buckets=7)
        .to_pandas()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_community_semantics_pins():
    # triangle + pendant + isolated self-loop: the clique converges to its
    # min label; the self-loop vertex keeps its own label
    edges = pd.DataFrame(
        {
            "src_key": ["b", "b", "c", "d", "e"],
            "dst_key": ["c", "d", "d", "b", "e"],
        }
    )
    out = (
        community_lpa(ray.data.from_pandas(edges))
        .to_pandas()
        .set_index("vertex_key")["label"]
        .to_dict()
    )
    assert out["e"] == "e"  # self-loop only: no und neighbor, keeps label
    assert out["b"] == out["c"] == out["d"] == "b"
    assert COMMUNITY_ROUNDS >= 2
