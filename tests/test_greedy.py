"""Greedy mutation loop invariants (three styles, exact fixed-point
objective, greedy accept) and the delta (incremental) engine rebuild it
runs on: untouched partition files must be byte-identical hardlinks of the
base build, and the delta layout must be indistinguishable from a full
rebuild (same fingerprint, same PageRank)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webgraph_ray.functions.hashing import hash_keys
from webgraph_ray.graph.delta import delta_build
from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.pipelines.greedy import STYLES, greedy_mutation
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges

import ray.data


@pytest.fixture(scope="module")
def edges():
    return derive_edges(generate_transcripts(30, seed=9)).materialize()


def test_greedy_loop_invariants(edges):
    df = greedy_mutation(edges, rounds=3)
    assert len(df) > 0
    prev = None
    for r in sorted(df["round"].unique()):
        g = df[df["round"] == r]
        acc = g[g["accepted"]]
        assert len(acc) <= 1, r
        # candidate evaluation is complete: all three styles tried
        assert set(g["style"]) == set(STYLES)
        if len(acc):
            row = acc.iloc[0]
            assert row["obj_after_fp"] < row["obj_before_fp"]
            # accepted candidate is the round's minimum objective
            assert row["obj_after_fp"] == g["obj_after_fp"].min()
            if prev is not None:
                assert row["obj_before_fp"] == prev
            prev = row["obj_after_fp"]
    assert df["accepted"].sum() >= 2  # the loop makes real progress
    assert (df["n_delta_src"] >= 0).all()
    assert df["obj_before_fp"].dtype == np.int64
    assert df["obj_after_fp"].dtype == np.int64


def test_greedy_deterministic(edges):
    a = greedy_mutation(edges, rounds=2)
    b = greedy_mutation(edges, rounds=2)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# delta_build: incremental layout == full rebuild, untouched parts linked
# ---------------------------------------------------------------------------


def _keyed_edges(pairs):
    """(src_key, dst_key, w) triples -> narrow arrow table + keyed frame."""
    src_k = np.array([p[0] for p in pairs], dtype=object)
    dst_k = np.array([p[1] for p in pairs], dtype=object)
    w = np.array([p[2] for p in pairs], dtype=np.float64)
    return pa.table(
        {
            "src": pa.array(hash_keys(src_k)),
            "dst": pa.array(hash_keys(dst_k)),
            "weight": pa.array(w),
        }
    )


@pytest.fixture(scope="module")
def base_pairs():
    rng = np.random.default_rng(7)
    pairs = []
    for i in range(400):
        pairs.append((f"v{rng.integers(0, 60)}", f"v{rng.integers(0, 60)}", 1.0))
    return pairs


def _inode_map(root, layout):
    out = {}
    d = os.path.join(root, layout)
    for part in sorted(os.listdir(d)):
        pd_ = os.path.join(d, part)
        for f in sorted(os.listdir(pd_)):
            out[f"{part}/{f}"] = os.stat(os.path.join(pd_, f)).st_ino
    return out


def test_delta_build_matches_full(base_pairs, tmp_path):
    P = 4
    base_tbl = _keyed_edges(base_pairs)
    base_dir = str(tmp_path / "base")
    eng = GraphEngine(base_dir, num_parts=P)
    eng.build(ray.data.from_arrow(base_tbl))
    eng.shutdown()

    # delta: remove two existing rows, add two new ones (one brand-new
    # vertex enters the universe)
    removed = _keyed_edges([base_pairs[3], base_pairs[77]])
    added = _keyed_edges([("v1", "brand_new", 2.0), ("v2", "v5", 1.0)])

    out_dir = str(tmp_path / "delta")
    assert delta_build(base_dir, out_dir, removed, added)

    # full rebuild of the same mutated multiset
    keep = [p for i, p in enumerate(base_pairs) if i not in (3, 77)]
    keep += [("v1", "brand_new", 2.0), ("v2", "v5", 1.0)]
    full_dir = str(tmp_path / "full")
    eng2 = GraphEngine(full_dir, num_parts=P)
    eng2.build(ray.data.from_arrow(_keyed_edges(keep)))
    eng2.shutdown()

    with open(os.path.join(out_dir, "build_manifest.json")) as f:
        m_delta = json.load(f)
    with open(os.path.join(full_dir, "build_manifest.json")) as f:
        m_full = json.load(f)
    # content fingerprint identical: the delta layout IS the mutated graph
    assert m_delta["content_hash"] == m_full["content_hash"]
    assert m_delta["n_edges"] == m_full["n_edges"]
    assert m_delta["part_terms"] == m_full["part_terms"]

    # PageRank over the delta layout == over the full rebuild (bit-exact)
    a = GraphEngine(out_dir, num_parts=P)
    try:
        pr_a = a.pagerank_fixed(iters=10).to_pandas().sort_values("vertex_id")
    finally:
        a.shutdown()
    b = GraphEngine(full_dir, num_parts=P)
    try:
        pr_b = b.pagerank_fixed(iters=10).to_pandas().sort_values("vertex_id")
    finally:
        b.shutdown()
    pd.testing.assert_frame_equal(
        pr_a.reset_index(drop=True), pr_b.reset_index(drop=True)
    )


def test_delta_build_links_untouched_parts(base_pairs, tmp_path):
    """Partitions the delta does not touch must be HARDLINKS of the base
    files (byte-identical by construction, zero copy)."""
    P = 4
    base_dir = str(tmp_path / "base")
    eng = GraphEngine(base_dir, num_parts=P)
    eng.build(ray.data.from_arrow(_keyed_edges(base_pairs)))
    eng.shutdown()

    removed = _keyed_edges([base_pairs[0]])
    out_dir = str(tmp_path / "delta")
    assert delta_build(base_dir, out_dir, removed, None)

    r_src = int(removed["src"][0].as_py())
    with open(os.path.join(base_dir, "build_manifest.json")) as f:
        manifest = json.load(f)
    assert "part_terms" in manifest
    touched_edge_part = f"part={r_src % P}"

    base_inodes = _inode_map(base_dir, "edges")
    delta_inodes = _inode_map(out_dir, "edges")
    touched = untouched = 0
    for key, ino in delta_inodes.items():
        if key.startswith(touched_edge_part):
            touched += 1
            assert base_inodes.get(key) != ino, key  # rewritten, not linked
        else:
            untouched += 1
            assert base_inodes[key] == ino, key  # hardlink of the base file
    assert touched >= 1 and untouched >= 1


def test_delta_build_falls_back(base_pairs, tmp_path):
    """Removing a row that does not exist in the base cannot be applied
    incrementally -> returns False and leaves no output directory."""
    P = 2
    base_dir = str(tmp_path / "base")
    eng = GraphEngine(base_dir, num_parts=P)
    eng.build(ray.data.from_arrow(_keyed_edges(base_pairs)))
    eng.shutdown()

    ghost = _keyed_edges([("nope_a", "nope_b", 1.0)])
    out_dir = str(tmp_path / "delta")
    assert not delta_build(base_dir, out_dir, ghost, None)
    assert not os.path.exists(out_dir)
