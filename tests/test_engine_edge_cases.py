"""Engine edge cases: weighted edges, directed-components guard, tiny
graphs."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from webgraph_ray.graph import oracle
from webgraph_ray.graph.engine import GraphEngine


def _edges_ds(rows):
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["src", "dst", "weight"]).astype(
            {"src": np.int64, "dst": np.int64, "weight": np.int64}
        )
    )


def test_weighted_pagerank_matches_networkx(tmp_path):
    """Weights > 1 (edge multiplicity kept as weight, unlike the
    reference's last-wins collapse) must flow through out-strength and
    message scaling exactly as networkx does."""
    rows = [
        (1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 1), (4, 1, 5), (4, 2, 1),
        (5, 4, 2), (2, 5, 1),
    ]
    ds = _edges_ds(rows)
    eng = GraphEngine(str(tmp_path / "wpr"), num_parts=3)
    eng.build(ds)
    try:
        got = eng.pagerank(tol=1e-10).to_pandas().set_index("vertex_id")["score"]
        exp = oracle.pagerank_oracle(
            pd.DataFrame(rows, columns=["src", "dst", "weight"]), tol=1e-10
        )
        for v, s in exp.items():
            assert abs(got.loc[v] - s) < 1e-9, v
    finally:
        eng.shutdown()


def test_components_requires_symmetrized_build(tmp_path):
    ds = _edges_ds([(1, 2, 1), (2, 3, 1)])
    eng = GraphEngine(str(tmp_path / "dir"), num_parts=2)
    eng.build(ds, symmetrize=False)
    try:
        with pytest.raises(ValueError, match="symmetrize"):
            eng.components()
    finally:
        eng.shutdown()


def test_single_edge_graph(tmp_path):
    ds = _edges_ds([(7, 8, 1)])
    eng = GraphEngine(str(tmp_path / "tiny"), num_parts=2)
    eng.build(ds)
    try:
        pr = eng.pagerank(tol=1e-8).to_pandas()
        assert len(pr) == 2
        assert abs(pr["score"].sum() - 1.0) < 1e-9
        exp = oracle.pagerank_oracle(
            pd.DataFrame([(7, 8, 1)], columns=["src", "dst", "weight"]), tol=1e-8
        )
        g = pr.set_index("vertex_id")["score"]
        for v, s in exp.items():
            assert abs(g.loc[v] - s) < 1e-8
    finally:
        eng.shutdown()


def test_self_loop_handling(tmp_path):
    """Self-loops are legal edges for PageRank (networkx keeps them)."""
    rows = [(1, 1, 1), (1, 2, 1), (2, 1, 1)]
    ds = _edges_ds(rows)
    eng = GraphEngine(str(tmp_path / "loop"), num_parts=2)
    eng.build(ds)
    try:
        got = eng.pagerank(tol=1e-10).to_pandas().set_index("vertex_id")["score"]
        exp = oracle.pagerank_oracle(pd.DataFrame(rows, columns=["src", "dst", "weight"]), tol=1e-10)
        for v, s in exp.items():
            assert abs(got.loc[v] - s) < 1e-9
    finally:
        eng.shutdown()
