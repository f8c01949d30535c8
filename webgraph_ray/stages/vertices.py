"""Vertex table derivation + degree aggregates.

Analog of the reference's node rows and node-dedup merge
(/root/reference/README.md:107-121, /root/reference/code/graph/graph_builder.py:26-64):
vertices are the union of edge endpoints, deduped by key, with ``first_ts``
the arg-min-by-time analog of the reference's first-setter
(/root/reference/code/graph/utils.py:46-75 — note the reference actually
keeps the *latest* setter due to its descending sort quirk; we take the true
minimum and mirror that in the SQL oracle as ``min(ts)``).

Both operators follow the pre-aggregate pattern (SURVEY.md §4: map-side
combine before the shuffle): per-batch partials via vectorized Arrow/pandas
kernels, then ONE ``groupby(vertex_key).aggregate(...)`` over the much
smaller partial rows.  The reference computes per-node degrees with O(V)
full-table scans per node (/root/reference/code/features/dataflow.py:158-159).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _vertex_partials(batch: pa.Table) -> pa.Table:
    """Per-batch: (vertex_key, first_ts) partial min over both endpoints."""
    df = pd.DataFrame(
        {
            "vertex_key": np.concatenate(
                [
                    batch["src_key"].to_numpy(zero_copy_only=False),
                    batch["dst_key"].to_numpy(zero_copy_only=False),
                ]
            ),
            "first_ts": np.concatenate(
                [batch["ts"].to_numpy(zero_copy_only=False)] * 2
            ),
        }
    )
    part = df.groupby("vertex_key", sort=False)["first_ts"].min().reset_index()
    return pa.Table.from_pandas(part, preserve_index=False)


def _classify(t: pa.Table) -> pa.Table:
    key = t["vertex_key"]
    is_tool = pc.starts_with(key, "tool:")
    is_conv = pc.starts_with(key, "conv:")
    vtype = pc.if_else(
        is_tool, pa.scalar("tool"), pc.if_else(is_conv, "conv", "turn")
    )
    # turn keys are "{conv_id}#{turn_idx}" -> conv_id is derivable from the key
    conv = pc.if_else(
        pc.or_(is_tool, is_conv),
        pa.scalar(None, pa.string()),
        pc.replace_substring_regex(key, "#.*$", ""),
    )
    from webgraph_ray.functions.hashing import hash_keys

    vid = pa.array(hash_keys(key.to_numpy(zero_copy_only=False)))
    return pa.table(
        {
            "vertex_id": vid,
            "vertex_key": key,
            "vertex_type": vtype,
            "conv_id": conv,
            "first_ts": pc.cast(t["first_ts"], pa.timestamp("us")),
        }
    )


def derive_vertices(edges: ray.data.Dataset) -> ray.data.Dataset:
    """edges -> deduped vertex table with first_ts.

    One shuffle: per-batch partial min (vectorized) -> groupby(vertex_key)
    Min.  Vertex type/conv attrs are recomputed from the key string, so no
    attribute-merge reduce is needed (contrast the reference's per-group
    priority vote, /root/reference/code/graph/graph_builder.py:26-64).
    """
    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = default_num_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (
            hash_keys(df["vertex_key"].to_numpy(dtype=object)) % nb
        ).astype(np.int32)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("vertex_key", sort=False)["first_ts"].min().reset_index()
        )

    agg = (
        edges.map_batches(
            _vertex_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
    )
    return agg.map_batches(_classify, batch_format="pyarrow")


def audit_vertex_ids(vertices: ray.data.Dataset) -> int:
    """Distributed birthday-collision audit: the vertex table has one row
    per distinct key, so the count of distinct vertex_ids must equal the
    row count — a SipHash collision would silently merge two vertices in
    every downstream algorithm.  Raises on mismatch; returns the vertex
    count.  One cheap pass (per-batch unique + bucket-hash distinct);
    callers that materialize the vertex table run it once per pipeline."""
    from webgraph_ray.functions.shuffle import bucket_distinct

    n_rows = vertices.count()
    ids = vertices.select_columns(["vertex_id"]).map_batches(
        lambda df: df.drop_duplicates("vertex_id"), batch_format="pandas"
    )
    n_ids = bucket_distinct(ids, ["vertex_id"]).count()
    if n_ids != n_rows:
        raise RuntimeError(
            f"vertex id collision: {n_rows} distinct keys -> {n_ids} distinct "
            "64-bit ids. Two vertices would silently merge downstream; widen "
            "the id (two int64 columns) or build an explicit dictionary "
            "(functions/hashing.py scale note)."
        )
    return n_rows


def _degree_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial (vertex_key, in_degree, out_degree) counts."""
    src = pd.Series(batch["src_key"].to_numpy(zero_copy_only=False))
    dst = pd.Series(batch["dst_key"].to_numpy(zero_copy_only=False))
    out_c = src.value_counts()
    in_c = dst.value_counts()
    merged = pd.concat(
        [out_c.rename("out_degree"), in_c.rename("in_degree")], axis=1
    ).fillna(0)
    return pa.table(
        {
            "vertex_key": pa.array(merged.index.to_numpy(dtype=object), pa.string()),
            "in_degree": pa.array(merged["in_degree"].to_numpy(np.int64)),
            "out_degree": pa.array(merged["out_degree"].to_numpy(np.int64)),
        }
    )


def degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-vertex in/out degree, string-keyed (oracle-checkable).

    Map-side combine -> bucket-hash groupby + vectorized pandas combine
    (a sort-based groupby().aggregate over high-cardinality string keys is
    several times slower — round-1 pitfall list).
    """
    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = default_num_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (
            hash_keys(df["vertex_key"].to_numpy(dtype=object)) % nb
        ).astype(np.int32)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("vertex_key", sort=False)[["in_degree", "out_degree"]]
            .sum()
            .reset_index()
        )

    return (
        edges.map_batches(
            _degree_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
    )
