"""Resumable edge materialization: atomic buckets, marker-gated skip,
kill/resume determinism."""

import json
import os

import pandas as pd
import pytest

from webgraph_ray.pipelines.materialize import (
    materialize_edges,
    read_edges,
    read_manifest,
    _manifest_path,
    _marker_path,
)
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges


def _canon(df):
    cols = ["src_key", "dst_key", "edge_type"]
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_materialize_and_read_roundtrip(tmp_path):
    ds = generate_transcripts(20, seed=17)
    out = str(tmp_path / "edges_out")
    manifest = materialize_edges(ds, out, num_buckets=8)
    assert manifest["complete"] and manifest["num_buckets"] == 8
    assert len(manifest["buckets"]) > 0
    got = _canon(read_edges(out).to_pandas())
    exp = _canon(derive_edges(ds).to_pandas())
    pd.testing.assert_frame_equal(got, exp)


def test_resume_after_kill_skips_finished_buckets(tmp_path):
    """Simulate the REAL kill state: some buckets fully written with their
    _SUCCESS markers, no consolidated manifest yet."""
    ds = generate_transcripts(20, seed=17)
    out = str(tmp_path / "edges_resume")
    full = materialize_edges(ds, out, num_buckets=8)

    # kill state: drop the consolidated manifest; wipe all but 3 buckets
    os.remove(_manifest_path(out))
    kept = sorted(full["buckets"])[:3]
    for b in full["buckets"]:
        if b not in kept:
            d = os.path.join(out, f"bucket={b}")
            for f in os.listdir(d):
                os.remove(os.path.join(d, f))

    before = {
        b: os.path.getmtime(os.path.join(out, f"bucket={b}", "data.parquet"))
        for b in kept
    }
    resumed = materialize_edges(ds, out, num_buckets=8)
    assert resumed["complete"]
    assert set(resumed["buckets"]) == set(full["buckets"])
    # finished buckets were not rewritten (markers made them durable)
    for b, mtime in before.items():
        assert (
            os.path.getmtime(os.path.join(out, f"bucket={b}", "data.parquet"))
            == mtime
        )
    got = _canon(read_edges(out).to_pandas())
    exp = _canon(derive_edges(ds).to_pandas())
    pd.testing.assert_frame_equal(got, exp)


def test_noop_when_complete_even_with_empty_buckets(tmp_path):
    """num_buckets far above the conv count leaves empty buckets; a
    completed manifest must still make the rerun a no-op."""
    ds = generate_transcripts(5, seed=3)
    out = str(tmp_path / "edges_done")
    m1 = materialize_edges(ds, out, num_buckets=64)
    assert len(m1["buckets"]) < 64  # some buckets genuinely empty
    mtime = os.path.getmtime(_manifest_path(out))
    m2 = materialize_edges(ds, out, num_buckets=64)
    assert m1 == m2


def test_num_buckets_mismatch_rejected(tmp_path):
    ds = generate_transcripts(10, seed=3)
    out = str(tmp_path / "edges_nb")
    materialize_edges(ds, out, num_buckets=4)
    with pytest.raises(ValueError, match="num_buckets"):
        materialize_edges(ds, out, num_buckets=8)
