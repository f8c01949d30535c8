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


def _write_bucket_group(out_dir: str, todo: frozenset):
    """map_groups fn: each call receives ONE complete bucket (map_groups
    guarantees whole groups), writes it atomically in the worker, and
    returns a single manifest row.  Data never passes through the driver,
    and a bucket can never be written twice by one run."""
    import pandas as pd

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        if bucket not in todo:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"), "rows": pd.Series(dtype="int64")})
        table = pa.Table.from_pandas(
            g.drop(columns=["bucket"]), preserve_index=False
        )
        d = os.path.join(out_dir, f"bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp.{uuid.uuid4().hex[:8]}")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(d, "data.parquet"))
        return pd.DataFrame({"bucket": [bucket], "rows": [table.num_rows]})

    return fn


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

    # one grouped pass; map_groups hands each bucket to exactly one call,
    # which sorts it (deterministic file content regardless of block
    # arrival order) and writes it atomically IN the worker.  Only tiny
    # (bucket, rows) manifest rows reach the driver.
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
    _write_manifest(out_dir, manifest)
    return manifest


def read_edges(out_dir: str) -> ray.data.Dataset:
    manifest = read_manifest(out_dir)
    paths = [
        os.path.join(out_dir, f"bucket={b}", "data.parquet")
        for b in sorted(map(int, manifest["buckets"]))
    ]
    return ray.data.read_parquet(paths)
