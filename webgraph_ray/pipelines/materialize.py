"""Resumable edge-table materialization.

The reference's append-mode CSV writers are its poor-man's resume
(/root/reference/code/run.py:190-218 — header-once + ``mode='a'``, which can
duplicate rows on rerun).  The scalable replacement: one output directory
per conversation-hash bucket.  Each bucket is written atomically by its
worker (temp file + rename) and then marked complete with a per-bucket
``_SUCCESS.json`` marker — so completion survives a driver kill at any
point.  A rerun scans the markers, SKIPS finished buckets, and finally
consolidates everything into ``_MANIFEST.json`` (which also pins
``num_buckets``; a rerun with a different bucket count is rejected instead
of silently duplicating rows).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from webgraph_ray.functions.hashing import hash_keys
from webgraph_ray.stages.edges import derive_edges


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_MANIFEST.json")


def _marker_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"bucket={bucket}", "_SUCCESS.json")


def read_manifest(out_dir: str) -> dict:
    """Consolidated manifest if present, else reconstructed from the
    per-bucket success markers (the kill-resume path)."""
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    manifest = {"buckets": {}, "complete": False}
    if os.path.isdir(out_dir):
        for sub in os.listdir(out_dir):
            if not sub.startswith("bucket="):
                continue
            mp = os.path.join(out_dir, sub, "_SUCCESS.json")
            if os.path.exists(mp):
                with open(mp) as f:
                    info = json.load(f)
                manifest["buckets"][sub.split("=", 1)[1]] = info
    return manifest


def _write_manifest(out_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(out_dir) + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(out_dir))


def _write_bucket_group(out_dir: str, todo: frozenset):
    """map_groups fn: each call receives ONE complete bucket (map_groups
    guarantees whole groups), writes it atomically in the worker, then
    drops the _SUCCESS marker — completion is durable per bucket, not per
    run.  Data never passes through the driver."""
    import pandas as pd

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        if bucket not in todo:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="int64"), "rows": pd.Series(dtype="int64")}
            )
        table = pa.Table.from_pandas(
            g.drop(columns=["bucket"]), preserve_index=False
        )
        d = os.path.join(out_dir, f"bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp.{uuid.uuid4().hex[:8]}")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(d, "data.parquet"))
        mtmp = os.path.join(d, f".stmp.{uuid.uuid4().hex[:8]}")
        with open(mtmp, "w") as f:
            json.dump({"rows": table.num_rows}, f)
        os.replace(mtmp, _marker_path(out_dir, bucket))  # marker LAST
        return pd.DataFrame({"bucket": [bucket], "rows": [table.num_rows]})

    return fn


def materialize_edges(
    transcripts: ray.data.Dataset,
    out_dir: str,
    num_buckets: int = 32,
) -> dict:
    """Derive and persist the edge table partitioned by conv-hash bucket,
    skipping buckets whose success marker already exists.  Returns the
    manifest.

    Deterministic: same input + same num_buckets => byte-identical bucket
    files, whether written in one run or across a kill/resume."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir)
    if "num_buckets" in manifest and manifest["num_buckets"] != num_buckets:
        raise ValueError(
            f"output was materialized with num_buckets="
            f"{manifest['num_buckets']}; rerunning with {num_buckets} would "
            "duplicate rows — use a fresh out_dir"
        )
    if manifest.get("complete"):
        return manifest
    done = {int(k) for k in manifest["buckets"]}
    todo = [b for b in range(num_buckets) if b not in done]

    if todo:
        edges = derive_edges(transcripts)

        def bucketed(t: pa.Table) -> pa.Table:
            conv = t["conv_id"].to_numpy(zero_copy_only=False)
            b = (hash_keys(conv) % num_buckets).astype(np.int32)
            return t.append_column("bucket", pa.array(b))

        # one grouped pass; each bucket is sorted (deterministic file
        # content regardless of block arrival order) and written atomically
        # IN the worker, marker last.  Only tiny (bucket, rows) rows reach
        # the driver.
        write_fn = _write_bucket_group(out_dir, frozenset(todo))
        results = (
            edges.map_batches(bucketed, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(
                lambda g: write_fn(
                    g.sort_values(
                        ["edge_type", "src_key", "dst_key"], kind="mergesort"
                    )
                ),
                batch_format="pandas",
            )
            .to_pandas()
        )
        for r in results.itertuples():
            manifest["buckets"][str(int(r.bucket))] = {"rows": int(r.rows)}

    # consolidate: record num_buckets and completion (empty buckets are
    # complete by definition once the run finished)
    manifest["num_buckets"] = num_buckets
    manifest["complete"] = True
    _write_manifest(out_dir, manifest)
    return manifest


def read_edges(out_dir: str) -> ray.data.Dataset:
    manifest = read_manifest(out_dir)
    paths = [
        os.path.join(out_dir, f"bucket={b}", "data.parquet")
        for b in sorted(map(int, manifest["buckets"]))
    ]
    return ray.data.read_parquet(paths)
