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
from ray.data.aggregate import Sum

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


def _wedges_bucket(g: pd.DataFrame) -> pa.Table:
    """Rank-ordered out-neighbor pairs for every oriented source in one
    hash bucket of sources.  Bucket-level grouping keeps the Ray per-group
    overhead at O(num_buckets), not O(V); the inner per-source loop is
    microseconds of numpy."""
    if len(g) < 2:
        return _EMPTY_WEDGES
    g = g.sort_values(["lo", "deg_hi", "hi"], kind="mergesort")
    lo = g["lo"].to_numpy(dtype=np.int64)
    hi = g["hi"].to_numpy(dtype=np.int64)
    _, starts = np.unique(lo, return_index=True)
    bounds = np.append(starts, len(lo))
    xs, ys, ls = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        k = e - s
        if k < 2:
            continue
        i, j = np.triu_indices(k, k=1)
        xs.append(hi[s + i])
        ys.append(hi[s + j])
        ls.append(np.full(len(i), lo[s], dtype=np.int64))
    if not xs:
        return _EMPTY_WEDGES
    return pa.table(
        {
            "x": pa.array(np.concatenate(xs)),
            "y": pa.array(np.concatenate(ys)),
            "lo": pa.array(np.concatenate(ls)),
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
    edges: ray.data.Dataset,
    num_partitions: int | None = None,
    broadcast_threshold: int = 4_000_000,
) -> tuple[int, ray.data.Dataset]:
    """Returns (total_triangles, per-vertex Dataset(vertex_id, triangles)).

    Per-vertex rows are emitted only for vertices in >=1 triangle (fill 0
    against the vertex table for the dense view).

    When the deduped undirected edge set is below ``broadcast_threshold``
    rows, degree attach and wedge closing use a broadcast small side
    (``ray.put`` once, numpy/pandas probe per batch) instead of the
    partitioned hash join — the classic small-side optimization.  Above the
    threshold both steps fall back to ``bucketed_join`` (no broadcast, scales
    past single-node memory).  The default (~4M rows, ~100 MB with ids +
    degrees) keeps the driver materialization modest; the bucketed path is
    only ~2x slower where they overlap.
    """
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    def _pair_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        # mix both endpoints; single low-cardinality int key shuffles much
        # faster than a two-key groupby aggregate
        mix = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(
            np.uint64
        )
        bk = (mix % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("pair_bucket", pa.array(bk))

    def _dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    und = (
        edges.map_batches(_canonical_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_pair_bucket, batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(_dedup_bucket, batch_format="pandas")
        .materialize()
    )
    small = und.count() <= broadcast_threshold

    def _deg_bucket(t: pa.Table) -> pa.Table:
        p = _deg_partials(t)
        vid = p["vertex_id"].to_numpy(zero_copy_only=False)
        return p.append_column(
            "vb", pa.array((vid % num_partitions).astype(np.int32))
        )

    def _deg_reduce(g: pd.DataFrame) -> pd.DataFrame:
        vid = g["vertex_id"].to_numpy(np.int64)
        dv = g["deg"].to_numpy(np.int64)
        order = np.argsort(vid, kind="stable")
        vid, dv = vid[order], dv[order]
        uniq, starts = np.unique(vid, return_index=True)
        return pd.DataFrame(
            {"vertex_id": uniq, "deg": np.add.reduceat(dv, starts)}
        )

    # per-batch partials + owner-bucket numpy reduce (one low-cardinality
    # shuffle; Ray's high-cardinality groupby aggregate is far slower)
    deg = (
        und.map_batches(_deg_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vb")
        .map_groups(_deg_reduce, batch_format="pandas")
    )

    def _orient_arrays(a, b, deg_a, deg_b) -> pa.Table:
        a_first = (deg_a < deg_b) | ((deg_a == deg_b) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        deg_hi = np.where(a_first, deg_b, deg_a)
        return pa.table(
            {"lo": pa.array(lo), "hi": pa.array(hi), "deg_hi": pa.array(deg_hi)}
        )

    if small:
        # broadcast the degree table once; probe via searchsorted per batch
        dpdf = deg.to_pandas()
        dv = np.sort(dpdf["vertex_id"].to_numpy(dtype=np.int64))
        dd = dpdf.set_index("vertex_id")["deg"].loc[dv].to_numpy(dtype=np.int64)
        deg_ref = ray.put((dv, dd))

        def orient_bcast(t: pa.Table) -> pa.Table:
            verts, degs = ray.get(deg_ref)
            a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            deg_a = degs[np.searchsorted(verts, a)]
            deg_b = degs[np.searchsorted(verts, b)]
            return _orient_arrays(a, b, deg_a, deg_b)

        oriented = und.map_batches(
            orient_bcast, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
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
            return _orient_arrays(
                df["a"].to_numpy(dtype=np.int64),
                df["b"].to_numpy(dtype=np.int64),
                df["deg_a"].to_numpy(dtype=np.int64),
                df["deg_b"].to_numpy(dtype=np.int64),
            )

        oriented = withdeg.map_batches(orient, batch_format="pandas").materialize()

    def add_lo_bucket(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "lo_bucket", pa.array((lo % num_partitions).astype(np.int32))
        )

    wedges = (
        oriented.map_batches(add_lo_bucket, batch_format="pyarrow")
        .groupby("lo_bucket")
        .map_groups(_wedges_bucket, batch_format="pandas")
    )

    if small:
        # Broadcast the oriented edge set as a sorted array of packed
        # (lo_rank << 32 | hi_rank) keys: ranks come from the sorted vertex
        # vocabulary, so membership is one vectorized searchsorted per batch.
        opdf = oriented.to_pandas()
        e_lo = opdf["lo"].to_numpy(dtype=np.int64)
        e_hi = opdf["hi"].to_numpy(dtype=np.int64)
        vocab = np.unique(np.concatenate([e_lo, e_hi]))
        assert len(vocab) < (1 << 32), "rank packing needs < 2^32 vertices"
        packed = np.sort(
            (np.searchsorted(vocab, e_lo).astype(np.int64) << 32)
            | np.searchsorted(vocab, e_hi).astype(np.int64)
        )
        edge_ref = ray.put((vocab, packed))

        def probe(t: pa.Table) -> pa.Table:
            voc, pk = ray.get(edge_ref)
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(x) == 0:
                return t
            q = (np.searchsorted(voc, x).astype(np.int64) << 32) | np.searchsorted(
                voc, y
            ).astype(np.int64)
            idx = np.searchsorted(pk, q)
            ok = (idx < len(pk)) & (pk[np.minimum(idx, len(pk) - 1)] == q)
            return t.filter(pa.array(ok))

        matched = wedges.map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        closing = _renamed(
            oriented.select_columns(["lo", "hi"]), {"lo": "x", "hi": "y"}
        )
        matched = bucketed_join(
            wedges, closing, keys=["x", "y"], how="left_semi",
            num_buckets=num_partitions,
        ).materialize()

    total = matched.count()
    per_vertex = (
        matched.map_batches(_corner_partials, batch_format="pyarrow")
        .groupby("vertex_id")
        .aggregate(Sum("triangles", alias_name="triangles"))
    )
    return total, per_vertex
