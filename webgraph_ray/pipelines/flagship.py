"""Flagship pipeline: events -> transcripts -> edges -> graph analytics.

The end-to-end analog of the reference's main pipeline
(/root/reference/code/run.py:234-292: build graph tables, then extract
per-node graph features) re-expressed as streaming Ray Data stages plus the
BSP engine: derive the edge table once, then run PageRank / components /
label propagation / triangles over it.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd

import ray.data

from webgraph_ray.functions.joins import bucketed_join
from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.graph.triangles import triangle_counts
from webgraph_ray.sources.transcripts import transcripts_from_events
from webgraph_ray.stages.edges import derive_edges
from webgraph_ray.stages.vertices import derive_vertices


def attach_keys(
    scores: ray.data.Dataset,
    vertices: ray.data.Dataset,
    num_buckets: int = 32,
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """(vertex_id, value...) -> add vertex_key.

    Below ``broadcast_threshold`` vertices the id->key mapping is broadcast
    (``ray.put`` once, C-path merge per batch — no shuffle); above it the
    partitioned hash join takes over."""
    import ray as _ray

    if vertices.count() <= broadcast_threshold:
        side = vertices.select_columns(["vertex_id", "vertex_key"]).to_pandas()
        ref = _ray.put(side)

        def join(df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(_ray.get(ref), on="vertex_id", how="inner")

        return scores.map_batches(join, batch_format="pandas")
    keys = vertices.map_batches(
        lambda df: df[["vertex_id", "vertex_key"]], batch_format="pandas"
    )
    return bucketed_join(scores, keys, keys=["vertex_id"], num_buckets=num_buckets)


def run_flagship(
    sf_dir: str, work_dir: str | None = None, top_k: int = 1000
) -> pd.DataFrame:
    """Full pass over one scale factor; returns a per-vertex summary frame
    (vertex_key, score, component, triangles) for the ``top_k`` PageRank
    vertices.

    Scale shape: the per-vertex tables (PageRank, components, triangles,
    keys) are assembled Ray-side with ONE vertex-id bucket shuffle
    (pad-union-pivot — the same single-shuffle assembly vertex_features
    uses), the symmetrized components layout is derived from the directed
    PageRank build's parquet (build_symmetrized_from — no second full
    build), and only per-bucket top-k survivors ever reach the driver
    (<= num_buckets * top_k rows), never a full per-vertex table."""
    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="webgraph_flagship_")
    transcripts = transcripts_from_events(os.path.join(sf_dir, "events.parquet"))
    edges = derive_edges(transcripts).materialize()
    vertices = derive_vertices(edges).materialize()
    from webgraph_ray.stages.vertices import audit_vertex_ids

    audit_vertex_ids(vertices)

    pr_dir = os.path.join(work_dir, "pr")
    eng = GraphEngine(pr_dir, num_parts=None)
    eng.build(edges)
    try:
        pr = eng.pagerank(tol=1e-6).materialize()
    finally:
        eng.shutdown()

    eng2 = GraphEngine(os.path.join(work_dir, "und"), num_parts=eng.P)
    eng2.build_symmetrized_from(pr_dir)
    try:
        cc = eng2.components().materialize()
    finally:
        eng2.shutdown()

    total, per_vertex = triangle_counts(edges)

    # ONE vertex-id bucket shuffle assembles the summary (pad-union-pivot;
    # chained hash joins would shuffle the accumulating table 3x).
    # ``component`` rides as object dtype: labels are full-range 64-bit
    # hashes, a float64 pad would round them past 2^53.
    num_cols = ["score", "triangles"]
    obj_cols = ["vertex_key", "component"]
    all_cols = ["vertex_id", *obj_cols, *num_cols]

    def padded(ds):
        def pad(df: pd.DataFrame) -> pd.DataFrame:
            out = df.reindex(columns=all_cols)
            for c in num_cols:
                out[c] = out[c].astype(np.float64)
            for c in obj_cols:
                out[c] = out[c].astype(object)
            return out

        return ds.map_batches(pad, batch_format="pandas")

    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = default_num_buckets()
    unioned = (
        padded(vertices.select_columns(["vertex_id", "vertex_key"]))
        .union(padded(pr))
        .union(padded(cc))
        .union(padded(per_vertex))
    )

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (df["vertex_id"].to_numpy(np.int64) % nb).astype(np.int32)
        return df

    def pivot_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("vertex_id", sort=False)[[*obj_cols, *num_cols]].first()
        out["triangles"] = out["triangles"].fillna(0.0)
        # only this bucket's top-k rows leave the worker; vertex_key
        # tie-break keeps the selection deterministic at the k boundary
        return (
            out.sort_values(["score", "vertex_key"], ascending=[False, True])
            .head(top_k)
            .reset_index(drop=True)
        )

    small = (
        unioned.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(pivot_topk, batch_format="pandas")
        .to_pandas()
    )
    out = (
        small.sort_values(["score", "vertex_key"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )
    out["component"] = out["component"].astype(np.int64)
    out["triangles"] = out["triangles"].astype(np.int64)
    out["total_triangles"] = total
    return out[
        ["vertex_key", "score", "component", "triangles", "total_triangles"]
    ]
