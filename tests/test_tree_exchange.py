"""Two-level (tree) exchange: every algorithm's output must be identical
to the default direct exchange, and the relay tier must measurably shrink
the number of message entries each receiver applies."""

import numpy as np
import pandas as pd
import pytest

from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges


@pytest.fixture(scope="module")
def tree_fixture(tmp_path_factory):
    ds = generate_transcripts(60, seed=31)
    return derive_edges(ds).materialize()


def _run(tmp_path, edges, algo, tree, symmetrize=False, P=4):
    eng = GraphEngine(
        str(tmp_path), num_parts=P, tree_combine=(2 if tree else 0)
    )
    eng.build(edges, symmetrize=symmetrize)
    try:
        if algo == "pagerank":
            out = eng.pagerank(tol=1e-10, max_iter=30).to_pandas()
        elif algo == "pagerank_fp":
            out = eng.pagerank_fixed(iters=6).to_pandas()
        elif algo == "components":
            out = eng.components().to_pandas()
        elif algo == "hopdist":
            # seed on the two smallest vertex ids, deterministic
            pdf = edges.to_pandas()
            ids = np.unique(
                np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()])
            )
            out = eng.hopdist(seeds=ids[:2]).to_pandas()
        elif algo == "kcore":
            out = eng.kcore(k=2).to_pandas()
        else:
            raise AssertionError(algo)
        metrics = {k: v for k, v in eng.metrics.items()}
        return out.sort_values(out.columns.tolist()).reset_index(drop=True), metrics
    finally:
        eng.shutdown()


@pytest.mark.parametrize(
    "algo,symmetrize",
    [
        ("pagerank", False),
        ("pagerank_fp", False),
        ("components", True),
        ("hopdist", True),
        ("kcore", True),
    ],
)
def test_tree_exchange_identical(tree_fixture, tmp_path, algo, symmetrize):
    base, _ = _run(tmp_path / "base", tree_fixture, algo, False, symmetrize)
    tree, _ = _run(tmp_path / "tree", tree_fixture, algo, True, symmetrize)
    pd.testing.assert_frame_equal(base, tree)


def test_tree_exchange_reduces_received_entries(tree_fixture, tmp_path):
    """PageRank (dense path): with G=2 groups over P=4 sources, each
    receiver applies group-combined partials — strictly fewer entries than
    the P direct slices (hub dsts shared across a group merge in flight)."""
    _, m_base = _run(tmp_path / "b", tree_fixture, "pagerank", False)
    _, m_tree = _run(tmp_path / "t", tree_fixture, "pagerank", True)
    recv_base = m_base["pagerank"].msgs_recv
    recv_tree = m_tree["pagerank"].msgs_recv
    assert recv_base > 0 and recv_tree > 0
    assert recv_tree < recv_base
