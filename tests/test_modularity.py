"""Fixed-point Newman modularity of the mode-LPA partition: Ray
composition vs the HUGEINT DuckDB mirror on both label-attachment paths,
float cross-check vs networkx, and partitioning invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from webgraph_ray.graph.community import (
    MODULARITY_SCALE,
    community_lpa,
    community_modularity,
    community_modularity_sql,
)
from tests.test_community import _edges


def _oracle(edges: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("edges_raw", edges)
    return (
        con.execute(
            community_modularity_sql("WITH edges AS (SELECT * FROM edges_raw)")
        )
        .df()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("threshold", [5_000_000, 0])
def test_modularity_matches_oracle_both_paths(threshold):
    edges = _edges()
    got = (
        community_modularity(
            ray.data.from_pandas(edges).repartition(5),
            broadcast_threshold=threshold,
        )
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _oracle(edges))


def test_modularity_matches_networkx():
    nx = pytest.importorskip("networkx")
    edges = _edges(seed=11)
    labels = community_lpa(ray.data.from_pandas(edges)).materialize()
    rows = community_modularity(
        ray.data.from_pandas(edges), labels=labels
    ).set_index("vertex_key")["label"]
    total = int(rows["__total__"]) / MODULARITY_SCALE

    g = nx.Graph()
    for s, d in zip(edges["src_key"], edges["dst_key"]):
        if s != d:
            g.add_edge(s, d)
    lbl = labels.to_pandas().set_index("vertex_key")["label"].to_dict()
    parts = {}
    for v in g.nodes:
        parts.setdefault(lbl[v], set()).add(v)
    expected = nx.community.modularity(g, parts.values())
    # per-community double-floor loses < 1/S per community
    n_comms = len(rows) - 1
    assert abs(total - expected) <= (2 * n_comms + 2) / MODULARITY_SCALE


def test_modularity_partitioning_invariant():
    edges = _edges(seed=9)
    a = (
        community_modularity(
            ray.data.from_pandas(edges).repartition(3), num_buckets=4
        )
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    b = (
        community_modularity(
            ray.data.from_pandas(edges).repartition(11), num_buckets=7
        )
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_modularity_perfect_partition_bound():
    # two disjoint triangles: LPA converges to the two cliques; modularity
    # of a 2-block perfect partition = 1/2 exactly
    edges = pd.DataFrame(
        {
            "src_key": ["a1", "a2", "a3", "b1", "b2", "b3"],
            "dst_key": ["a2", "a3", "a1", "b2", "b3", "b1"],
        }
    )
    rows = community_modularity(ray.data.from_pandas(edges)).set_index(
        "vertex_key"
    )["label"]
    assert int(rows["__total__"]) == MODULARITY_SCALE // 2


# ---------------------------------------------------------------------------
# conductance metric (same aggregation, different floor)
# ---------------------------------------------------------------------------


def _cond_oracle(edges: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("edges_raw", edges)
    return (
        con.execute(
            community_modularity_sql(
                "WITH edges AS (SELECT * FROM edges_raw)",
                metric="conductance",
            )
        )
        .df()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("threshold", [5_000_000, 0])
def test_conductance_matches_oracle_both_paths(threshold):
    from webgraph_ray.graph.community import community_modularity_sql  # noqa

    edges = _edges()
    got = (
        community_modularity(
            ray.data.from_pandas(edges).repartition(5),
            broadcast_threshold=threshold,
            metric="conductance",
        )
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _cond_oracle(edges))


def test_conductance_pins():
    # two triangles joined by ONE bridge edge: each clique community has
    # vol 7 (6 internal endpoints + 1 bridge endpoint), cut 1, m = 7
    # pairs, conductance = S*1 // min(7, 14-7) = S // 7
    edges = pd.DataFrame(
        {
            "src_key": ["a1", "a2", "a3", "b1", "b2", "b3", "a1"],
            "dst_key": ["a2", "a3", "a1", "b2", "b3", "b1", "b1"],
        }
    )
    two = pd.DataFrame(
        {
            "vertex_key": ["a1", "a2", "a3", "b1", "b2", "b3"],
            "label": ["A", "A", "A", "B", "B", "B"],
        }
    )
    eds = ray.data.from_pandas(edges)
    rows = community_modularity(
        eds, labels=ray.data.from_pandas(two).materialize(),
        metric="conductance",
    ).set_index("vertex_key")["label"]
    assert int(rows["__max__"]) == MODULARITY_SCALE // 7
    assert int(rows["A"]) == MODULARITY_SCALE // 7
    assert int(rows["B"]) == MODULARITY_SCALE // 7
    # LPA itself merges across the bridge: one community holds every
    # endpoint, denominator 0 -> the -1 sentinel
    merged = community_modularity(eds, metric="conductance").set_index(
        "vertex_key"
    )["label"]
    assert int(merged["__max__"]) == -1
