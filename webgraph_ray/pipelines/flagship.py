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


def run_flagship(sf_dir: str, work_dir: str | None = None) -> pd.DataFrame:
    """Full pass over one scale factor; returns a per-vertex summary frame
    (vertex_key, score, component, triangles) for the top PageRank vertices.
    """
    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="webgraph_flagship_")
    transcripts = transcripts_from_events(os.path.join(sf_dir, "events.parquet"))
    edges = derive_edges(transcripts).materialize()
    vertices = derive_vertices(edges).materialize()
    from webgraph_ray.stages.vertices import audit_vertex_ids

    audit_vertex_ids(vertices)

    eng = GraphEngine(os.path.join(work_dir, "pr"), num_parts=None)
    eng.build(edges)
    try:
        pr = eng.pagerank(tol=1e-6).to_pandas()
    finally:
        eng.shutdown()

    eng2 = GraphEngine(os.path.join(work_dir, "und"), num_parts=None)
    eng2.build(edges, symmetrize=True)
    try:
        cc = eng2.components().to_pandas()
    finally:
        eng2.shutdown()

    total, per_vertex = triangle_counts(edges)
    tri = per_vertex.to_pandas()

    vk = vertices.to_pandas()[["vertex_id", "vertex_key"]]
    out = (
        pr.merge(cc, on="vertex_id")
        .merge(tri, on="vertex_id", how="left")
        .merge(vk, on="vertex_id")
    )
    out["triangles"] = out["triangles"].fillna(0).astype(np.int64)
    out["total_triangles"] = total
    return out.sort_values("score", ascending=False).reset_index(drop=True)[
        ["vertex_key", "score", "component", "triangles", "total_triangles"]
    ]
