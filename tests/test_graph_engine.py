"""BSP graph engine: PageRank / components / label propagation vs the
networkx/numpy oracle, hub salting, checkpoint/resume."""

import os

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from webgraph_ray.graph.engine import GraphEngine, UNLABELED
from webgraph_ray.graph import oracle
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges


@pytest.fixture(scope="module")
def graph_fixture(tmp_path_factory):
    """Derived edge table from 40 synthetic conversations (has hubs,
    singleton chains, multi-component structure)."""
    ds = generate_transcripts(40, seed=23)
    edges = derive_edges(ds)
    pdf = edges.to_pandas()
    return edges.materialize(), pdf


def _engine(tmp_path, edges, num_parts, symmetrize=False, hub_threshold=1 << 17):
    eng = GraphEngine(
        str(tmp_path), num_parts=num_parts, hub_threshold=hub_threshold
    )
    eng.build(edges, symmetrize=symmetrize)
    return eng


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_parts", [1, 3])
def test_pagerank_matches_networkx(graph_fixture, tmp_path, num_parts):
    edges, pdf = graph_fixture
    eng = _engine(tmp_path / f"p{num_parts}", edges, num_parts)
    try:
        got = eng.pagerank(alpha=0.85, tol=1e-6).to_pandas()
        exp = oracle.pagerank_oracle(pdf, alpha=0.85, tol=1e-6)
        assert len(got) == len(exp)
        g = got.set_index("vertex_id")["score"]
        for vid, score in exp.items():
            assert abs(g.loc[vid] - score) < 1e-6, vid
        assert abs(g.sum() - 1.0) < 1e-9
        assert eng.metrics["pagerank"].converged
    finally:
        eng.shutdown()


def test_pagerank_hub_salting_same_result(graph_fixture, tmp_path):
    """Forcing tiny hub threshold exercises the salted-split path; results
    must be identical to the unsalted run."""
    edges, pdf = graph_fixture
    eng = _engine(tmp_path / "salted", edges, 3, hub_threshold=5)
    try:
        import json

        with open(os.path.join(eng.work_dir, "build_manifest.json")) as f:
            assert json.load(f)["num_hubs"] > 0, "fixture has no hubs to salt"
        got = eng.pagerank(alpha=0.85, tol=1e-6).to_pandas()
        exp = oracle.pagerank_oracle(pdf)
        g = got.set_index("vertex_id")["score"]
        for vid, score in exp.items():
            assert abs(g.loc[vid] - score) < 1e-6
    finally:
        eng.shutdown()


def test_pagerank_resume_identical(graph_fixture, tmp_path):
    """Kill after a few iterations; resume must produce byte-identical
    final scores (FIXTURES.md §5 determinism)."""
    edges, pdf = graph_fixture
    full = _engine(tmp_path / "full", edges, 2)
    try:
        ref = (
            full.pagerank(tol=1e-6, checkpoint_every=1)
            .to_pandas()
            .sort_values("vertex_id")
            .reset_index(drop=True)
        )
    finally:
        full.shutdown()

    # run 1: stop early by limiting max_iter (simulates a kill mid-algorithm)
    part = _engine(tmp_path / "resume", edges, 2)
    try:
        part.pagerank(tol=1e-6, max_iter=3, checkpoint_every=1)
    finally:
        part.shutdown()
    ck = GraphEngine(str(tmp_path / "resume"), num_parts=2).latest_checkpoint(
        "pagerank"
    )
    assert ck is not None and ck[0] == 3
    assert ck[1]["counters"]["edges_traversed"] > 0

    # run 2: fresh engine object, resume from checkpoint
    eng2 = GraphEngine(str(tmp_path / "resume"), num_parts=2)
    try:
        got = (
            eng2.pagerank(tol=1e-6, checkpoint_every=1, resume=True)
            .to_pandas()
            .sort_values("vertex_id")
            .reset_index(drop=True)
        )
        # resumed run skipped the first 3 iterations
        assert eng2.metrics["pagerank"].history[0]["iter"] == 4
        pd.testing.assert_frame_equal(got, ref)
    finally:
        eng2.shutdown()


# ---------------------------------------------------------------------------
# Connected components
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_parts", [1, 4])
def test_components_exact(graph_fixture, tmp_path, num_parts):
    edges, pdf = graph_fixture
    eng = _engine(tmp_path / f"cc{num_parts}", edges, num_parts, symmetrize=True)
    try:
        got = eng.components().to_pandas()
        exp = oracle.components_oracle(pdf)
        assert len(got) == len(exp)
        g = got.set_index("vertex_id")["component"]
        for vid, comp in exp.items():
            assert int(g.loc[vid]) == comp
        assert eng.metrics["components"].converged
    finally:
        eng.shutdown()


def test_components_partition_invariant(graph_fixture, tmp_path):
    edges, _ = graph_fixture
    a = _engine(tmp_path / "cc_a", edges, 1, symmetrize=True)
    b = _engine(tmp_path / "cc_b", edges, 5, symmetrize=True)
    try:
        ga = a.components().to_pandas().sort_values("vertex_id").reset_index(drop=True)
        gb = b.components().to_pandas().sort_values("vertex_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(ga, gb)
    finally:
        a.shutdown()
        b.shutdown()


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------


def test_labelprop_matches_oracle(graph_fixture, tmp_path):
    edges, pdf = graph_fixture
    # seeds = tool vertices
    tool_ids = np.unique(
        pdf.loc[pdf["dst_key"].str.startswith("tool:"), "dst"].to_numpy()
    )
    assert len(tool_ids) > 0
    eng = _engine(tmp_path / "lp", edges, 3, symmetrize=True)
    try:
        got = eng.labelprop(seeds=tool_ids).to_pandas()
        exp = oracle.labelprop_oracle(pdf, tool_ids)
        assert len(got) == len(exp)
        g = got.set_index("vertex_id")["label"]
        for vid, lab in exp.items():
            assert int(g.loc[vid]) == lab, vid
        # every vertex connected to a tool is labeled; isolated chains keep
        # the sentinel
        assert eng.metrics["labelprop"].converged
    finally:
        eng.shutdown()


def test_labelprop_resume(graph_fixture, tmp_path):
    edges, pdf = graph_fixture
    tool_ids = np.unique(
        pdf.loc[pdf["dst_key"].str.startswith("tool:"), "dst"].to_numpy()
    )
    ref_eng = _engine(tmp_path / "lp_full", edges, 2, symmetrize=True)
    try:
        ref = (
            ref_eng.labelprop(seeds=tool_ids)
            .to_pandas()
            .sort_values("vertex_id")
            .reset_index(drop=True)
        )
    finally:
        ref_eng.shutdown()
    eng = _engine(tmp_path / "lp_resume", edges, 2, symmetrize=True)
    try:
        # deliberate partial run (kill simulation): opt out of the
        # convergence guard; the resumed run below completes the fixpoint
        eng.labelprop(
            seeds=tool_ids, max_iter=2, checkpoint_every=1,
            require_convergence=False,
        )
    finally:
        eng.shutdown()
    eng2 = GraphEngine(str(tmp_path / "lp_resume"), num_parts=2)
    try:
        got = (
            eng2.labelprop(seeds=tool_ids, resume=True, checkpoint_every=1)
            .to_pandas()
            .sort_values("vertex_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)
    finally:
        eng2.shutdown()


def test_symmetrized_from_matches_full(graph_fixture, tmp_path):
    """build_symmetrized_from (reverse-and-append over the directed
    layout's parquet) must be indistinguishable from build(symmetrize=True)
    over the same edges: identical content fingerprint, identical
    per-partition terms, bit-identical components."""
    import json

    edges, pdf = graph_fixture
    P = 3
    directed = _engine(tmp_path / "directed", edges, P, symmetrize=False)
    directed.shutdown()
    full = _engine(tmp_path / "full_sym", edges, P, symmetrize=True)
    fast = GraphEngine(str(tmp_path / "fast_sym"), num_parts=P)
    fast.build_symmetrized_from(str(tmp_path / "directed"))
    try:
        with open(os.path.join(full.work_dir, "build_manifest.json")) as f:
            m_full = json.load(f)
        with open(os.path.join(fast.work_dir, "build_manifest.json")) as f:
            m_fast = json.load(f)
        assert m_fast["content_hash"] == m_full["content_hash"]
        assert m_fast["n_edges"] == m_full["n_edges"]
        assert m_fast["num_hubs"] == m_full["num_hubs"]
        assert {k: v[0] for k, v in m_fast["part_terms"].items()} == {
            k: v[0] for k, v in m_full["part_terms"].items()
        }
        assert {k: v[2] for k, v in m_fast["part_terms"].items()} == {
            k: v[2] for k, v in m_full["part_terms"].items()
        }
        # one live actor pool at a time: the 4-CPU test session cannot
        # host two P=3 pools simultaneously
        a = full.components().to_pandas().sort_values("vertex_id")
        full.shutdown()
        b = fast.components().to_pandas().sort_values("vertex_id")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )
    finally:
        full.shutdown()
        fast.shutdown()


def test_symmetrized_from_salted_hubs(graph_fixture, tmp_path):
    """Same equivalence with a hub threshold low enough to salt: the fast
    path must recompute the hub set from SYMMETRIZED strength."""
    import json

    edges, pdf = graph_fixture
    P = 3
    directed = _engine(
        tmp_path / "directed_h", edges, P, symmetrize=False, hub_threshold=5
    )
    directed.shutdown()
    full = _engine(tmp_path / "full_h", edges, P, symmetrize=True, hub_threshold=5)
    fast = GraphEngine(str(tmp_path / "fast_h"), num_parts=P, hub_threshold=5)
    fast.build_symmetrized_from(str(tmp_path / "directed_h"))
    try:
        with open(os.path.join(full.work_dir, "build_manifest.json")) as f:
            m_full = json.load(f)
        with open(os.path.join(fast.work_dir, "build_manifest.json")) as f:
            m_fast = json.load(f)
        assert m_full["num_hubs"] > 0, "fixture has no hubs to salt"
        assert m_fast["content_hash"] == m_full["content_hash"]
        assert m_fast["num_hubs"] == m_full["num_hubs"]
        a = full.components().to_pandas().sort_values("vertex_id")
        full.shutdown()
        b = fast.components().to_pandas().sort_values("vertex_id")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )
    finally:
        full.shutdown()
        fast.shutdown()


def test_min_label_delta_exchange(graph_fixture, tmp_path):
    """Delta exchange: components over BOTH exchange modes (fused single
    object / sliced per-destination) matches the oracle, and the sparse
    min-label scatter ships strictly fewer entries than the dense
    every-dst-every-iteration protocol."""
    edges, pdf = graph_fixture
    eng = _engine(tmp_path / "fused", edges, 3, symmetrize=True)
    try:
        got = eng.components().to_pandas().sort_values("vertex_id")
        m = eng.metrics["components"]
        assert m.msgs_dense > 0
        assert 0 < m.msgs_sent < m.msgs_dense  # the delta actually prunes
    finally:
        eng.shutdown()

    sl = GraphEngine(str(tmp_path / "sliced"), num_parts=3, fused_exchange=False)
    sl.build(edges, symmetrize=True)
    try:
        got_sl = sl.components().to_pandas().sort_values("vertex_id")
    finally:
        sl.shutdown()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), got_sl.reset_index(drop=True)
    )
    exp = oracle.components_oracle(pdf)
    g = got.set_index("vertex_id")["component"]
    for vid, comp in exp.items():
        assert g.loc[vid] == comp, vid


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance (min-plus propagation)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_parts", [1, 3])
def test_hopdist_matches_networkx(graph_fixture, tmp_path, num_parts):
    import networkx as nx

    edges, pdf = graph_fixture
    eng = _engine(tmp_path / f"hd{num_parts}", edges, num_parts, symmetrize=True)
    try:
        verts = np.unique(
            np.concatenate(
                [pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64)]
            )
        )
        seeds = verts[:3]
        got = eng.hopdist(seeds).to_pandas()
        g = nx.Graph()
        g.add_edges_from(zip(pdf["src"], pdf["dst"]))
        dist = nx.multi_source_dijkstra_path_length(g, set(seeds.tolist()), weight=None)
        got_map = dict(zip(got["vertex_id"].tolist(), got["distance"].tolist()))
        for v in verts:
            exp = dist.get(int(v))
            if exp is None:
                assert got_map[int(v)] == UNLABELED  # unreached sentinel
            else:
                assert got_map[int(v)] == exp, v
        assert eng.metrics["hopdist"].converged
        # distances only shrink: the delta exchange must have fired
        m = eng.metrics["hopdist"]
        assert m.msgs_sent <= m.msgs_dense
    finally:
        eng.shutdown()


def test_hopdist_delta_exchange_and_seed_zero(graph_fixture, tmp_path):
    edges, pdf = graph_fixture
    eng = _engine(tmp_path / "hd_seed", edges, 2, symmetrize=True)
    try:
        verts = np.unique(pdf["src"].to_numpy(np.int64))
        seeds = verts[-2:]
        got = eng.hopdist(seeds).to_pandas()
        g = dict(zip(got["vertex_id"].tolist(), got["distance"].tolist()))
        for s in seeds:
            assert g[int(s)] == 0
    finally:
        eng.shutdown()

def test_reversed_from_matches_full(graph_fixture, tmp_path):
    """build_reversed_from (per-partition swap-and-scatter over the
    directed layout's parquet) must be indistinguishable from build() over
    the swapped edge table: identical content fingerprint, identical
    per-partition terms, bit-identical PageRank."""
    import json

    import pyarrow as pa

    edges, pdf = graph_fixture
    P = 3
    directed = _engine(tmp_path / "rdirected", edges, P, symmetrize=False)
    directed.shutdown()

    def swap(b: pa.Table) -> pa.Table:
        return pa.table(
            {"src": b["dst"], "dst": b["src"], "weight": b["weight"]}
        )

    swapped = (
        edges.select_columns(["src", "dst", "weight"])
        .map_batches(swap, batch_format="pyarrow")
        .materialize()
    )
    full = _engine(tmp_path / "full_rev", swapped, P)
    fast = GraphEngine(str(tmp_path / "fast_rev"), num_parts=P)
    fast.build_reversed_from(str(tmp_path / "rdirected"))
    try:
        with open(os.path.join(full.work_dir, "build_manifest.json")) as f:
            m_full = json.load(f)
        with open(os.path.join(fast.work_dir, "build_manifest.json")) as f:
            m_fast = json.load(f)
        assert m_fast["content_hash"] == m_full["content_hash"]
        assert m_fast["n_edges"] == m_full["n_edges"]
        assert m_fast["num_hubs"] == m_full["num_hubs"]
        assert {k: v[0] for k, v in m_fast["part_terms"].items()} == {
            k: v[0] for k, v in m_full["part_terms"].items()
        }
        assert {k: v[2] for k, v in m_fast["part_terms"].items()} == {
            k: v[2] for k, v in m_full["part_terms"].items()
        }
        a = full.pagerank_fixed().to_pandas().sort_values("vertex_id")
        full.shutdown()
        b = fast.pagerank_fixed().to_pandas().sort_values("vertex_id")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )
    finally:
        full.shutdown()
        fast.shutdown()


def test_reversed_from_rejects_symmetrized(graph_fixture, tmp_path):
    edges, _ = graph_fixture
    sym = _engine(tmp_path / "sym_src", edges, 2, symmetrize=True)
    sym.shutdown()
    eng = GraphEngine(str(tmp_path / "rev_of_sym"), num_parts=2)
    with pytest.raises(ValueError):
        eng.build_reversed_from(str(tmp_path / "sym_src"))
