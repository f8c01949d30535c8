"""Resumable edge-table materialization.

The reference's append-mode CSV writers are its poor-man's resume
(/root/reference/code/run.py:190-218 — header-once + ``mode='a'``, which can
duplicate rows on rerun).  The scalable replacement: one output directory
per conversation-hash bucket, written atomically (temp file + rename), with
a per-bucket entry appended to a manifest only after the bucket completes.
A rerun reads the manifest and SKIPS finished buckets, so a killed job
resumes idempotently (overwrite-by-partition, never append).
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


def read_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return {"buckets": {}}
    with open(p) as f:
        return json.load(f)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(out_dir) + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(out_dir))


@ray.remote
def _write_bucket(out_dir: str, bucket: int, table: pa.Table) -> tuple[int, int]:
    d = os.path.join(out_dir, f"bucket={bucket}")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp.{uuid.uuid4().hex[:8]}")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(d, "data.parquet"))
    return bucket, table.num_rows


def materialize_edges(
    transcripts: ray.data.Dataset,
    out_dir: str,
    num_buckets: int = 32,
) -> dict:
    """Derive and persist the edge table partitioned by conv-hash bucket,
    skipping buckets the manifest already records.  Returns the manifest.

    Deterministic: same input + same num_buckets => byte-identical bucket
    files, whether written in one run or across a kill/resume."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir)
    done = {int(k) for k in manifest["buckets"]}
    todo = [b for b in range(num_buckets) if b not in done]
    if not todo:
        return manifest

    edges = derive_edges(transcripts)

    def bucketed(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        b = (hash_keys(conv) % num_buckets).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    # one grouped pass; each group becomes one atomic bucket file.  Sorting
    # inside the bucket makes the file content deterministic regardless of
    # block arrival order.
    grouped = (
        edges.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: g.sort_values(
                ["edge_type", "src_key", "dst_key"], kind="mergesort"
            ),
            batch_format="pandas",
        )
    )

    todo_set = set(todo)
    writes = []
    for ref in grouped.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        for b in np.unique(t["bucket"].to_numpy(zero_copy_only=False)):
            b = int(b)
            if b not in todo_set:
                continue  # resume: bucket already complete
            sub = t.filter(pa.compute.equal(t["bucket"], b)).drop_columns(
                ["bucket"]
            )
            writes.append(_write_bucket.remote(out_dir, b, sub))
    for bucket, rows in ray.get(writes):
        manifest["buckets"][str(bucket)] = {"rows": rows}
    _write_manifest(out_dir, manifest)
    return manifest


def read_edges(out_dir: str) -> ray.data.Dataset:
    manifest = read_manifest(out_dir)
    paths = [
        os.path.join(out_dir, f"bucket={b}", "data.parquet")
        for b in sorted(map(int, manifest["buckets"]))
    ]
    return ray.data.read_parquet(paths)
