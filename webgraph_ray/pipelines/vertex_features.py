"""Wide per-vertex feature table — the reference's feature-extraction
export (/root/reference/code/features/feature_extraction.py:56-105,
features.yaml:78-139: one row per classifiable node x ~64 numeric feature
columns) re-expressed as a join of global Ray Data aggregates instead of
per-visit per-node python.

Every ingredient is an oracle-checked stage (degrees, typed edge counts,
chain depth, rule labels, triangles, fixed-point PageRank, components) and
the assembled table has its own DuckDB oracle
(webgraph_ray/functions/oracles.py::vertex_features_sql), so the export a
model consumer would actually train on is driver-verified end to end.

All joins are bucketed hash joins on ONE reused partition key
(vertex_key); optional features (chain depth, triangles) left-join with
typed defaults (-1 / 0).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd

import ray.data

from webgraph_ray.functions.joins import bucketed_join
from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.graph.triangles import triangle_counts
from webgraph_ray.pipelines.flagship import attach_keys
from webgraph_ray.stages.features import (
    EDGE_TYPE_COUNT_COLS,
    chain_depth,
    edge_type_counts,
    rule_labels,
)
from webgraph_ray.stages.vertices import degrees

FEATURE_COLUMNS = (
    "vertex_key",
    "vertex_type",
    "in_degree",
    "out_degree",
    *EDGE_TYPE_COUNT_COLS,
    "chain_depth",
    "label",
    "triangles",
    "score_fp",
    "component_key",
)


def pagerank_fp_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    actor_num_cpus: float = 1.0,
    build_done=None,
) -> ray.data.Dataset:
    """(vertex_key, score_fp) — fixed-point PageRank with keys attached.

    ``build_done`` (a ``threading.Event``) is set as soon as the directed
    build's parquet is on disk — everything a dependent
    ``build_symmetrized_from`` needs — so a components run on another
    thread can overlap with the PageRank iterations instead of waiting for
    them."""
    from webgraph_ray.functions.oracles import PR_FP_ITERS, PR_FP_SCALE

    eng = GraphEngine(
        os.path.join(work_dir, "pr"), num_parts=None,
        actor_num_cpus=actor_num_cpus,
    )
    eng.build(edges, symmetrize=False)
    if build_done is not None:
        build_done.set()
    try:
        return attach_keys(
            eng.pagerank_fixed(iters=PR_FP_ITERS, scale=PR_FP_SCALE), vertices
        ).select_columns(["vertex_key", "score_fp"]).materialize()
    finally:
        eng.shutdown()


def components_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    directed_dir: str | None = None,
    actor_num_cpus: float = 1.0,
) -> ray.data.Dataset:
    """(vertex_key, component_key) — canonical min-key component labels.

    When ``directed_dir`` points at an existing DIRECTED build of the same
    edge table (vertex_features' PageRank layout), the symmetrized layout
    is derived from its parquet with one reverse-and-append pass per
    partition (GraphEngine.build_symmetrized_from) instead of re-running
    the whole Ray Data build pipeline a second time.

    Canonicalization is ONE component-hash bucket shuffle with a C-path
    per-group ``transform('min')`` (an aggregate + re-join would shuffle
    the table twice and pay the high-cardinality sort-aggregate tax)."""
    from webgraph_ray.functions.shuffle import default_num_buckets

    eng = GraphEngine(
        os.path.join(work_dir, "cc"), num_parts=None,
        actor_num_cpus=actor_num_cpus,
    )
    if directed_dir is not None:
        eng.build_symmetrized_from(directed_dir)
    else:
        eng.build(edges, symmetrize=True)
    try:
        cc = attach_keys(eng.components(), vertices)
        nb = default_num_buckets()

        def bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__b"] = (df["component"].to_numpy(np.int64) % nb).astype(
                np.int32
            )
            return df

        def canonize(g: pd.DataFrame) -> pd.DataFrame:
            out = g[["vertex_key"]].copy()
            out["component_key"] = g.groupby("component", sort=False)[
                "vertex_key"
            ].transform("min")
            return out

        return (
            cc.map_batches(bucket, batch_format="pandas")
            .groupby("__b")
            .map_groups(canonize, batch_format="pandas")
            .materialize()
        )
    finally:
        eng.shutdown()


def vertex_features(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str | None = None,
    pr: ray.data.Dataset | None = None,
    comp: ray.data.Dataset | None = None,
    tri: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Assemble the wide feature table (FEATURE_COLUMNS, one row per
    vertex).  ``pr``/``comp``/``tri`` accept precomputed (vertex_key,
    score_fp) / (vertex_key, component_key) / (vertex_id, triangles)
    tables so callers running the individual algorithm queries anyway can
    reuse them."""
    own_work = work_dir is None
    if own_work:
        work_dir = tempfile.mkdtemp(prefix="webgraph_vf_")

    base = vertices.select_columns(["vertex_key", "vertex_type"])

    deg = degrees(edges)
    etc = edge_type_counts(edges)
    chain = chain_depth(edges)
    labels = rule_labels(vertices)
    if tri is None:
        _, tri = triangle_counts(edges)
    tri_keyed = attach_keys(tri, vertices).select_columns(
        ["vertex_key", "triangles"]
    )

    try:
        # ONE shuffle assembles the wide table: every ingredient is padded
        # to the common schema, unioned, and pivoted per vertex-key bucket
        # (groupby.first skips the nulls).  Chained per-ingredient hash
        # joins would re-shuffle the accumulating table once per
        # ingredient — 7 shuffles and, for lazy inputs, repeated upstream
        # re-execution.
        num_cols = [
            "in_degree", "out_degree", *EDGE_TYPE_COUNT_COLS,
            "chain_depth", "triangles", "score_fp",
        ]
        str_cols = ["vertex_type", "label", "component_key"]
        all_cols = ["vertex_key", *num_cols, *str_cols]

        def padded(ds):
            def pad(df: pd.DataFrame) -> pd.DataFrame:
                out = df.reindex(columns=all_cols)
                for c in num_cols:
                    out[c] = out[c].astype(np.float64)  # NaN-able; exact < 2^53
                for c in str_cols:
                    out[c] = out[c].astype(object)
                return out

            return ds.map_batches(pad, batch_format="pandas")

        # The 8 ingredient pipelines are independent, but a single fused
        # 8-way-union execution schedules them poorly (measured at sf0.1:
        # 17.8s fused vs 7.7s when each branch materializes through its
        # own executor) — so materialize the branches concurrently from a
        # small thread pool, overlapping the cheap aggregates with the
        # expensive PageRank/components engine runs.  Each thread only
        # blocks on a Dataset.materialize(); Ray's global scheduler shares
        # the CPUs across the concurrent pipelines, on one box or many.
        import concurrent.futures as _cf
        import threading as _threading

        # components reuses the directed layout the PR build leaves behind
        # (ONE reverse-and-append pass per partition).  Only the BUILD is
        # the dependency — not the PageRank iterations — so the PR thread
        # signals an Event the moment its parquet is on disk and the
        # components thread overlaps with the iteration phase.  Both
        # engines are briefly alive at once, so their partition actors
        # reserve zero CPUs (the HITS pattern: a 2x-P reservation would
        # starve the concurrently-running ingredient pipelines' tasks).
        pr_build_done = _threading.Event()

        def _pr_job():
            if pr is not None:
                pr_build_done.set()
                return pr
            try:
                return pagerank_fp_keyed(
                    edges, vertices, work_dir,
                    actor_num_cpus=0, build_done=pr_build_done,
                )
            finally:
                # idempotent; a failed build must not hang the comp thread
                # (it will fail loudly on the missing parquet instead)
                pr_build_done.set()

        def _comp_job():
            if comp is not None:
                return comp
            directed_dir = None
            if pr is None:
                pr_build_done.wait()
                directed_dir = os.path.join(work_dir, "pr")
            return components_keyed(
                edges, vertices, work_dir,
                directed_dir=directed_dir, actor_num_cpus=0,
            )

        parts = [base, deg, etc, chain, labels, tri_keyed]
        with _cf.ThreadPoolExecutor(len(parts) + 2) as ex:
            fut_pr = ex.submit(_pr_job)
            fut_comp = ex.submit(_comp_job)
            mats = list(ex.map(lambda d: padded(d).materialize(), parts))
            pr, comp = fut_pr.result(), fut_comp.result()
            mats += list(
                ex.map(lambda d: padded(d).materialize(), [pr, comp])
            )

        unioned = mats[0]
        for m in mats[1:]:
            unioned = unioned.union(m)
        # the 8-way union fragments into many tiny blocks and the following
        # shuffle pays per-block overhead (round-1 pitfall: ~7x slower);
        # coalesce first (metadata-only repartition)
        import ray as _ray

        unioned = unioned.repartition(
            max(8, 2 * int(_ray.cluster_resources().get("CPU", 8)))
        )

        from webgraph_ray.functions.hashing import hash_keys
        from webgraph_ray.functions.shuffle import default_num_buckets

        nb = default_num_buckets()

        def bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__b"] = (
                hash_keys(df["vertex_key"].to_numpy(dtype=object)) % nb
            ).astype(np.int32)
            return df

        def pivot(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("vertex_key", sort=False)[num_cols + str_cols].first()
            out = out.reset_index()
            defaults = {c: 0.0 for c in num_cols}
            defaults["chain_depth"] = -1.0
            out = out.fillna(defaults)
            for c in num_cols:
                out[c] = out[c].astype(np.int64)
            return out[list(FEATURE_COLUMNS)]

        return (
            unioned.map_batches(bucket, batch_format="pandas")
            .groupby("__b")
            .map_groups(pivot, batch_format="pandas")
            .materialize()
        )
    finally:
        if own_work:
            shutil.rmtree(work_dir, ignore_errors=True)
