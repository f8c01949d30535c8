"""Fixed-point (int64) PageRank mode: exactness properties that make it
DuckDB-oracle-checkable, plus agreement with the float path."""

import numpy as np
import pytest

from webgraph_ray.graph.engine import GraphEngine, UNLABELED
from webgraph_ray.functions.oracles import PR_FP_ITERS, PR_FP_SCALE
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges


@pytest.fixture(scope="module")
def graph_fixture():
    ds = generate_transcripts(40, seed=23)
    edges = derive_edges(ds)
    return edges.materialize(), edges.to_pandas()


def _run_fp(tmp_path, edges, num_parts, iters=PR_FP_ITERS, hub_threshold=1 << 17):
    eng = GraphEngine(
        str(tmp_path), num_parts=num_parts, hub_threshold=hub_threshold
    )
    eng.build(edges)
    try:
        res = eng.pagerank_fixed(iters=iters, scale=PR_FP_SCALE).to_pandas()
    finally:
        eng.shutdown()
    return res.sort_values("vertex_id").reset_index(drop=True)


def test_fp_partition_invariant(graph_fixture, tmp_path):
    """Bit-exact across partition counts — the property the SQL oracle
    relies on (no summation-order sensitivity)."""
    edges, _ = graph_fixture
    a = _run_fp(tmp_path / "p1", edges, 1)
    b = _run_fp(tmp_path / "p3", edges, 3)
    assert np.array_equal(a["score_fp"].to_numpy(), b["score_fp"].to_numpy())
    assert np.array_equal(a["vertex_id"].to_numpy(), b["vertex_id"].to_numpy())


def test_fp_hub_salting_invariant(graph_fixture, tmp_path):
    edges, _ = graph_fixture
    a = _run_fp(tmp_path / "nohub", edges, 3)
    b = _run_fp(tmp_path / "hub", edges, 3, hub_threshold=4)
    assert np.array_equal(a["score_fp"].to_numpy(), b["score_fp"].to_numpy())


def test_fp_close_to_float_pagerank(graph_fixture, tmp_path):
    """Units/SCALE approximates the float stationary distribution."""
    edges, _ = graph_fixture
    fp = _run_fp(tmp_path / "fp", edges, 2, iters=60)
    eng = GraphEngine(str(tmp_path / "fl"), num_parts=2)
    eng.build(edges)
    try:
        fl = eng.pagerank(tol=1e-10).to_pandas()
    finally:
        eng.shutdown()
    fl = fl.sort_values("vertex_id").reset_index(drop=True)
    got = fp["score_fp"].to_numpy() / PR_FP_SCALE
    exp = fl["score"].to_numpy()
    # fixed-point floors lose a little mass; scores agree to ~1e-6 absolute
    np.testing.assert_allclose(got, exp, atol=2e-6)
    assert 0.99 < got.sum() <= 1.0 + 1e-12


def test_fp_mass_bounded(graph_fixture, tmp_path):
    edges, _ = graph_fixture
    fp = _run_fp(tmp_path / "mass", edges, 2)
    total = int(fp["score_fp"].sum())
    assert total <= PR_FP_SCALE  # floors only lose mass
    assert total >= PR_FP_SCALE * 0.98


def test_fp_checkpoint_resume_identical(graph_fixture, tmp_path):
    """Resume from a mid-run checkpoint reproduces the uninterrupted run
    bit-exactly (fingerprint-gated: same build)."""
    edges, _ = graph_fixture
    wd = str(tmp_path / "ck")
    eng = GraphEngine(wd, num_parts=2)
    eng.build(edges)
    full = eng.pagerank_fixed(iters=12, checkpoint_every=4).to_pandas()
    eng.shutdown()
    # fresh engine over the same build resumes from iter 12 checkpoint and
    # has nothing left to do; resuming with more iters continues exactly
    eng2 = GraphEngine(wd, num_parts=2)
    ck = eng2.latest_checkpoint("pagerank_fp")
    assert ck is not None and ck[0] == 12
    resumed = eng2.pagerank_fixed(iters=12, checkpoint_every=4, resume=True).to_pandas()
    eng2.shutdown()
    a = full.sort_values("vertex_id")["score_fp"].to_numpy()
    b = resumed.sort_values("vertex_id")["score_fp"].to_numpy()
    assert np.array_equal(a, b)


def test_labelprop_seed_labels(graph_fixture, tmp_path):
    """Explicit seed labels (rank-by-key) flow through to the fixpoint."""
    edges, pdf = graph_fixture
    eng = GraphEngine(str(tmp_path / "lp"), num_parts=2)
    eng.build(edges, symmetrize=True)
    try:
        import pandas as pd

        verts = pd.concat([pdf["src_key"], pdf["dst_key"]]).unique()
        tools = sorted(v for v in verts if v.startswith("tool:"))
        from webgraph_ray.functions.hashing import hash_keys

        ids = hash_keys(np.array(tools, dtype=object))
        ranks = np.arange(len(tools), dtype=np.int64)
        res = eng.labelprop(seeds=ids, seed_labels=ranks).to_pandas()
    finally:
        eng.shutdown()
    got = res.set_index("vertex_id")["label"]
    # every seed keeps its own rank
    for t, i, r in zip(tools, ids, ranks):
        assert got.loc[i] == r, t
    # labels are ranks or the sentinel
    valid = set(ranks.tolist()) | {int(UNLABELED), -1}
    assert set(got.unique().tolist()) <= valid


# ---------------------------------------------------------------------------
# Personalized (seeded) fixed-point PageRank
# ---------------------------------------------------------------------------


def _ppr_reference(pdf, seeds, iters, scale):
    """numpy mirror of the engine's exact seeded int64 arithmetic."""
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    w = pdf["weight"].to_numpy(np.int64)
    verts = np.unique(np.concatenate([src, dst]))
    pos = {int(v): i for i, v in enumerate(verts)}
    si = np.array([pos[int(v)] for v in src])
    di = np.array([pos[int(v)] for v in dst])
    out = np.zeros(len(verts), dtype=np.int64)
    np.add.at(out, si, w)
    out_div = np.maximum(out, 1)
    seed_idx = np.array([pos[int(v)] for v in seeds])
    S = len(seed_idx)
    x = np.zeros(len(verts), dtype=np.int64)
    x[seed_idx] = scale // S
    for _ in range(iters):
        dang = int(x[out == 0].sum())
        contrib = ((x // out_div)[si] * w * 17) // 20
        agg = np.zeros(len(verts), dtype=np.int64)
        np.add.at(agg, di, contrib)
        agg[seed_idx] += (3 * scale) // (20 * S) + (17 * dang) // (20 * S)
        x = agg
    return dict(zip(verts.tolist(), x.tolist()))


def _run_ppr(tmp_path, edges, seeds, num_parts, hub_threshold=1 << 17):
    eng = GraphEngine(
        str(tmp_path), num_parts=num_parts, hub_threshold=hub_threshold
    )
    eng.build(edges)
    try:
        res = eng.pagerank_fixed(
            iters=12, scale=PR_FP_SCALE, seeds=np.asarray(seeds, dtype=np.int64)
        ).to_pandas()
    finally:
        eng.shutdown()
    return res.sort_values("vertex_id").reset_index(drop=True)


def test_ppr_matches_numpy_reference(graph_fixture, tmp_path):
    edges, pdf = graph_fixture
    verts = np.unique(
        np.concatenate([pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64)])
    )
    seeds = verts[:5]
    got = _run_ppr(tmp_path / "ref", edges, seeds, 3)
    exp = _ppr_reference(pdf, seeds, iters=12, scale=PR_FP_SCALE)
    g = dict(zip(got["vertex_id"].tolist(), got["score_fp"].tolist()))
    assert g == exp
    # mass stays concentrated: non-seed-reachable vertices hold zero
    assert min(g.values()) >= 0


def test_ppr_partition_and_salting_invariant(graph_fixture, tmp_path):
    edges, pdf = graph_fixture
    verts = np.unique(
        np.concatenate([pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64)])
    )
    seeds = verts[-4:]
    a = _run_ppr(tmp_path / "p1", edges, seeds, 1)
    b = _run_ppr(tmp_path / "p4", edges, seeds, 4)
    c = _run_ppr(tmp_path / "hub", edges, seeds, 4, hub_threshold=4)
    assert np.array_equal(a["score_fp"].to_numpy(), b["score_fp"].to_numpy())
    assert np.array_equal(a["score_fp"].to_numpy(), c["score_fp"].to_numpy())
