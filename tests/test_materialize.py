"""Resumable edge materialization: atomic buckets, manifest-gated skip,
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
    assert len(manifest["buckets"]) > 0
    got = _canon(read_edges(out).to_pandas())
    exp = _canon(derive_edges(ds).to_pandas())
    pd.testing.assert_frame_equal(got, exp)


def test_resume_skips_finished_buckets(tmp_path):
    ds = generate_transcripts(20, seed=17)
    out = str(tmp_path / "edges_resume")
    full = materialize_edges(ds, out, num_buckets=8)

    # simulate a kill after 3 buckets: rewrite the manifest with only 3
    # entries and delete the other bucket dirs
    partial = {"buckets": dict(list(full["buckets"].items())[:3])}
    with open(_manifest_path(out), "w") as f:
        json.dump(partial, f)
    kept = set(partial["buckets"])
    for b in full["buckets"]:
        if b not in kept:
            p = os.path.join(out, f"bucket={b}", "data.parquet")
            os.remove(p)

    before = {
        b: os.path.getmtime(os.path.join(out, f"bucket={b}", "data.parquet"))
        for b in kept
    }
    resumed = materialize_edges(ds, out, num_buckets=8)
    assert set(resumed["buckets"]) == set(full["buckets"])
    # finished buckets were not rewritten
    for b, mtime in before.items():
        assert (
            os.path.getmtime(os.path.join(out, f"bucket={b}", "data.parquet"))
            == mtime
        )
    # final content identical to a single uninterrupted run
    got = _canon(read_edges(out).to_pandas())
    exp = _canon(derive_edges(ds).to_pandas())
    pd.testing.assert_frame_equal(got, exp)


def test_noop_when_complete(tmp_path):
    ds = generate_transcripts(10, seed=3)
    out = str(tmp_path / "edges_done")
    m1 = materialize_edges(ds, out, num_buckets=4)
    m2 = materialize_edges(ds, out, num_buckets=4)
    assert m1 == m2
