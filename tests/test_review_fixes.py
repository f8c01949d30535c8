"""Regression tests for code-review findings."""

import os

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data

from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.stages import embed
from webgraph_ray.stages.edges import EXTRA_RULES, derive_edges
from webgraph_ray.schemas import EDGES


def test_matrix_respects_batch_slices(sf_dir):
    """ListArray slices must decode their own rows, not the parent buffer
    (map_batches hands out zero-copy Table slices)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    full = np.stack(ds.to_pandas()["embedding"].to_numpy()).astype(np.float64)

    seen = []

    def collect(t: pa.Table) -> pa.Table:
        m = embed._matrix(t)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        seen.append((vids.copy(), m))
        return t.select(["vec_id"])

    # tiny batch_size forces slicing of larger blocks
    ds.map_batches(collect, batch_format="pyarrow", batch_size=37).materialize()
    for vids, m in seen:
        assert m.shape == (len(vids), full.shape[1])
        np.testing.assert_array_equal(m, full[vids])


def test_direct_slice_decode():
    t = pa.table({"vec_id": [0, 1, 2, 3], "embedding": [[0.0, 1], [2, 3], [4, 5], [6, 7]]})
    sl = t.slice(2, 2)
    m = embed._matrix(sl)
    np.testing.assert_array_equal(m, [[4, 5], [6, 7]])


def test_rebuild_is_idempotent(tmp_path):
    """Re-running build into the same work_dir must not double edges."""
    edges = ray.data.from_pandas(
        pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1], "weight": [1, 1, 1]})
    )
    eng = GraphEngine(str(tmp_path / "re"), num_parts=2)
    eng.build(edges)
    eng.build(edges)  # second build into same dir
    eng.start()
    try:
        assert eng.total_edges == 3
        assert eng.N == 3
    finally:
        eng.shutdown()


def test_checkpoint_cadence_not_lcm(tmp_path):
    """checkpoint_every=5 with chain=4 must checkpoint at 5, 10, ... not 20."""
    edges = ray.data.from_pandas(
        pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 1], "weight": 1})
    )
    eng = GraphEngine(str(tmp_path / "cad"), num_parts=2)
    eng.build(edges)
    try:
        eng.pagerank(tol=0.0, max_iter=12, checkpoint_every=5, chain=4)
    finally:
        eng.shutdown()
    d = str(tmp_path / "cad" / "ckpt" / "pagerank")
    iters = sorted(
        int(s.split("=")[1]) for s in os.listdir(d) if s.startswith("iter=")
    )
    assert 5 in iters and 10 in iters and 12 in iters


def test_resume_rejects_different_build(tmp_path):
    """A checkpoint recorded against one build must not resume a rebuilt
    (different) graph."""
    e1 = ray.data.from_pandas(
        pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1], "weight": [1, 1, 1]})
    )
    e2 = ray.data.from_pandas(
        pd.DataFrame({"src": [1, 2, 3, 1], "dst": [2, 3, 1, 3], "weight": [1, 1, 1, 1]})
    )
    wd = str(tmp_path / "fp")
    eng = GraphEngine(wd, num_parts=2)
    eng.build(e1)
    eng.pagerank(tol=0.0, max_iter=3, checkpoint_every=1)
    eng.shutdown()
    eng2 = GraphEngine(wd, num_parts=2)
    eng2.build(e2)  # different graph, same work_dir
    assert eng2.latest_checkpoint("pagerank") is None  # stale ckpt rejected
    eng2.shutdown()


def test_extra_rules_execute():
    def self_loop_rule(narrow):
        def fn(t: pa.Table) -> pa.Table:
            from webgraph_ray.functions.hashing import hash_keys
            from webgraph_ray.stages.edges import turn_keys
            import pyarrow.compute as pc

            k = turn_keys(t["conv_id"], t["turn_idx"])
            ids = hash_keys(k.to_numpy(zero_copy_only=False))
            n = len(t)
            return pa.table(
                {
                    "src": pa.array(ids),
                    "dst": pa.array(ids),
                    "src_key": k,
                    "dst_key": k,
                    "edge_type": pa.array(["self"] * n, pa.string()),
                    "weight": pa.array(np.ones(n, dtype=np.int64)),
                    "conv_id": t["conv_id"],
                    "ts": t["ts"],
                },
                schema=EDGES,
            )

        return narrow.map_batches(fn, batch_format="pyarrow")

    EXTRA_RULES["self"] = self_loop_rule
    try:
        from webgraph_ray.sources.transcripts import generate_transcripts

        ds = generate_transcripts(5, seed=1)
        n_turns = ds.count()
        out = derive_edges(ds, rules=("self",)).to_pandas()
        assert len(out) == n_turns
        assert (out["edge_type"] == "self").all()
        both = derive_edges(ds, rules=("reply", "self")).to_pandas()
        assert set(both["edge_type"]) == {"reply", "self"}
    finally:
        del EXTRA_RULES["self"]
