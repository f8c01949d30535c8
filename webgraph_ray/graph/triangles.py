"""Distributed triangle counting via degree-ordered orientation.

Same shuffle shape as the reference's 2-hop request-chain self-join
(/root/reference/code/features/utils.py:470-486) generalized to the
standard scalable triangle algorithm:

1. canonicalize to unique undirected edges (one groupby),
2. attach degrees (hash joins) and orient every edge from the
   lower-(degree, id) endpoint to the higher one — bounding each vertex's
   oriented out-adjacency (hub in-stars generate NO wedges),
3. enumerate wedges per oriented-source vertex (``groupby(lo)``),
4. close wedges with a hash-partitioned semi-join against the oriented
   edge set (``bucketed_join(..., "left_semi")``) — no broadcast of the
   edge set, so the step scales to edge tables that don't fit one node.
   (``Dataset.join`` is avoided: Ray 2.49's hash-shuffle join fails on
   empty partitions, see functions/joins.py.)

Total = number of closed wedges; per-vertex counts come from a
pre-combined groupby over the three corners of each closed wedge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from webgraph_ray.functions.joins import bucketed_join


def _canonical_batch(t: pa.Table) -> pa.Table:
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    # per-batch dedup (map-side combine before the global unique groupby)
    pair = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table({"a": pa.array(pair[:, 0]), "b": pa.array(pair[:, 1])})


def _deg_partials(t: pa.Table) -> pa.Table:
    ids = np.concatenate(
        [
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False),
        ]
    ).astype(np.int64)
    uniq, counts = np.unique(ids, return_counts=True)
    return pa.table({"vertex_id": pa.array(uniq), "deg": pa.array(counts.astype(np.int64))})


_WEDGE_SCHEMA = pa.schema(
    [pa.field("x", pa.int64()), pa.field("y", pa.int64()), pa.field("lo", pa.int64())]
)
_EMPTY_WEDGES = pa.table(
    {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()), "lo": pa.array([], pa.int64())},
    schema=_WEDGE_SCHEMA,
)


def _wedges_group(g: pd.DataFrame) -> pa.Table:
    """All rank-ordered pairs of out-neighbors of one oriented source."""
    if len(g) < 2:
        return _EMPTY_WEDGES
    g = g.sort_values(["deg_hi", "hi"], kind="mergesort")
    hi = g["hi"].to_numpy(dtype=np.int64)
    lo = int(g["lo"].iloc[0])
    i, j = np.triu_indices(len(hi), k=1)
    return pa.table(
        {
            "x": pa.array(hi[i]),
            "y": pa.array(hi[j]),
            "lo": pa.array(np.full(len(i), lo, dtype=np.int64)),
        },
        schema=_WEDGE_SCHEMA,
    )


def _corner_partials(t: pa.Table) -> pa.Table:
    ids = np.concatenate(
        [
            t["lo"].to_numpy(zero_copy_only=False),
            t["x"].to_numpy(zero_copy_only=False),
            t["y"].to_numpy(zero_copy_only=False),
        ]
    ).astype(np.int64)
    uniq, counts = np.unique(ids, return_counts=True)
    return pa.table(
        {"vertex_id": pa.array(uniq), "triangles": pa.array(counts.astype(np.int64))}
    )


def triangle_counts(
    edges: ray.data.Dataset, num_partitions: int | None = None
) -> tuple[int, ray.data.Dataset]:
    """Returns (total_triangles, per-vertex Dataset(vertex_id, triangles)).

    Per-vertex rows are emitted only for vertices in >=1 triangle (fill 0
    against the vertex table for the dense view).
    """
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    und = (
        edges.map_batches(_canonical_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"])
        .materialize()
    )

    deg = (
        und.map_batches(_deg_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vertex_id")
        .aggregate(Sum("deg", alias_name="deg"))
    )

    def _renamed(ds, mapping):
        return ds.map_batches(
            lambda df: df.rename(columns=mapping), batch_format="pandas"
        )

    dega = _renamed(deg, {"vertex_id": "a", "deg": "deg_a"})
    degb = _renamed(deg, {"vertex_id": "b", "deg": "deg_b"})
    withdeg = bucketed_join(
        bucketed_join(und, dega, keys=["a"], num_buckets=num_partitions),
        degb,
        keys=["b"],
        num_buckets=num_partitions,
    )

    def orient(df: pd.DataFrame) -> pa.Table:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        deg_a = df["deg_a"].to_numpy(dtype=np.int64)
        deg_b = df["deg_b"].to_numpy(dtype=np.int64)
        a_first = (deg_a < deg_b) | ((deg_a == deg_b) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        deg_hi = np.where(a_first, deg_b, deg_a)
        return pa.table(
            {"lo": pa.array(lo), "hi": pa.array(hi), "deg_hi": pa.array(deg_hi)}
        )

    oriented = withdeg.map_batches(orient, batch_format="pandas").materialize()

    wedges = oriented.groupby("lo").map_groups(_wedges_group, batch_format="pandas")

    closing = _renamed(oriented.select_columns(["lo", "hi"]), {"lo": "x", "hi": "y"})
    matched = bucketed_join(
        wedges, closing, keys=["x", "y"], how="left_semi", num_buckets=num_partitions
    ).materialize()

    total = matched.count()
    per_vertex = (
        matched.map_batches(_corner_partials, batch_format="pyarrow")
        .groupby("vertex_id")
        .aggregate(Sum("triangles", alias_name="triangles"))
    )
    return total, per_vertex
