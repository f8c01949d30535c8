"""Katz centrality on the BSP engine, exact int64 fixed point.

``x_{t+1}(v) = SCALE + (sum over in-edges (u,w) of x_t(u) * w) // ALPHA_DEN``

with ``ALPHA_DEN = 2 * max weighted in-degree`` — i.e. attenuation
``alpha = 1 / ALPHA_DEN`` per unit of edge weight, which guarantees
``alpha * ||A||_inf <= 1/2`` so the iteration contracts and every label is
bounded by ``2 * SCALE`` (no normalization step needed, unlike HITS).
Every operation is integer floor arithmetic, so a fixed iteration count is
bit-exact under any partitioning / summation order and mirrors into an
unrolled DuckDB CTE chain (:func:`katz_fp_ctes`).

Scale shape: ONE forward engine layout (the same build PageRank uses); the
per-iteration message is the existing ``hits`` scatter kernel (per-dst sum
of gathered labels * weight — no new exchange path), followed by a dense
apply.  The attenuation bound ``ALPHA_DEN`` is computed with one
pre-aggregated bucket shuffle (per-batch per-dst partial sums, per-bucket
exact reduce, driver max over #buckets rows).

Reference analog: the centrality block of
/root/reference/code/features/structure.py:129-163 (Katz is the classic
companion of the degree/PageRank features there).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.pipelines.flagship import attach_keys

#: fixed-point unit for Katz labels (smaller than PageRank's 10^12: labels
#: reach 2*SCALE and segment sums reach ALPHA_DEN*SCALE, and the driver
#: asserts that product against 2^62).
KATZ_SCALE = 10**9
KATZ_ITERS = 6


def max_weighted_indegree(edges: ray.data.Dataset) -> int:
    """Exact ``max over v of sum of in-edge weights`` — per-batch per-dst
    partial sums, ONE bucket groupby of the (already tiny) partials with an
    exact per-bucket re-sum, driver max over #buckets rows.  Grouping is by
    the integer dst id (same cardinality as the key — the id<->key map is a
    bijection, so the SQL mirror's per-dst_key max agrees)."""
    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = default_num_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst", sort=False)["weight"].sum().reset_index()
        g["inw"] = g["weight"].astype(np.int64)
        g["__b"] = (g["dst"].to_numpy(np.int64) % nb).astype(np.int32)
        return g[["dst", "inw", "__b"]]

    def bucket_max(g: pd.DataFrame) -> pd.DataFrame:
        mx = g.groupby("dst", sort=False)["inw"].sum().max()
        return pd.DataFrame({"mx": [np.int64(mx)]})

    parts = (
        edges.select_columns(["dst", "weight"])
        .map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket_max, batch_format="pandas")
        .to_pandas()
    )
    return int(parts["mx"].max()) if len(parts) else 0


def katz_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    iters: int = KATZ_ITERS,
    scale: int = KATZ_SCALE,
    num_parts: int | None = None,
) -> pd.DataFrame:
    """(vertex_key, score_fp) — Katz centrality after ``iters`` exact
    fixed-point iterations over the forward layout."""
    max_inw = max_weighted_indegree(edges)
    alpha_den = max(2 * max_inw, 2)
    # label bound 2*scale; per-dst segment sums bounded by alpha_den*scale;
    # per-edge products by 2*scale*max_w <= alpha_den*scale
    assert alpha_den * scale < 2**62, (
        f"katz overflow bound violated: alpha_den={alpha_den}, scale={scale}"
    )

    eng = GraphEngine(os.path.join(work_dir, "katz"), num_parts=num_parts)
    eng.build(edges, symmetrize=False)
    try:
        eng.start()
        ray.get([a.init_state.remote("hits") for a in eng.actors])
        ray.get([a.set_uniform_labels.remote(scale) for a in eng.actors])
        for _ in range(iters):
            hub_ref = eng._initial_hub_ref("hits")
            outs = eng._exchange("hits", hub_ref)
            ray.get(
                [
                    eng.actors[q].apply_katz.remote(
                        scale, alpha_den, *[outs[i][q] for i in range(len(outs))]
                    )
                    for q in range(eng.P)
                ]
            )
        tables = ray.get([a.result_table.remote("hits") for a in eng.actors])
        res = ray.data.from_arrow(
            [
                pa.table(
                    {"vertex_id": t["vertex_id"], "score_fp": t["label"]}
                )
                for t in tables
            ]
        )
        return (
            attach_keys(res, vertices)
            .select_columns(["vertex_key", "score_fp"])
            .to_pandas()
            .sort_values("vertex_key", kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        eng.shutdown()


def katz_fp_ctes(
    iters: int = KATZ_ITERS,
    scale: int = KATZ_SCALE,
    edges_cte: str = "edges",
    prefix: str = "kz",
) -> str:
    """Unrolled DuckDB mirror (assumes an ``{edges_cte}`` CTE with
    src_key/dst_key/weight in scope), ending in ``{prefix}{iters}`` with
    columns (vertex_key, val).  All quantities positive, so BIGINT ``//``
    truncation == floor and the chain is bit-exact against the engine."""
    E, x = edges_cte, prefix
    parts = [
        f"""
, {x}_verts AS MATERIALIZED (
    SELECT DISTINCT vertex_key FROM (
        SELECT src_key AS vertex_key FROM {E}
        UNION ALL SELECT dst_key FROM {E}
    )
), {x}_aden AS (
    SELECT greatest(2 * max(inw), 2) AS aden FROM (
        SELECT dst_key, CAST(sum(weight) AS BIGINT) AS inw
        FROM {E} GROUP BY 1
    )
), {x}0 AS MATERIALIZED (
    SELECT vertex_key, CAST({scale} AS BIGINT) AS val FROM {x}_verts
)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
, {x}{i} AS MATERIALIZED (
    SELECT v.vertex_key,
           {scale} + CAST(coalesce(a.agg, 0) AS BIGINT) // d.aden AS val
    FROM {x}_verts v CROSS JOIN {x}_aden d
    LEFT JOIN (
        SELECT e.dst_key AS vertex_key, sum(s.val * e.weight) AS agg
        FROM {E} e
        JOIN {x}{p} s ON s.vertex_key = e.src_key
        GROUP BY 1
    ) a ON a.vertex_key = v.vertex_key
)"""
        )
    return "".join(parts)


# ---------------------------------------------------------------------------
# Eigenvector centrality: the un-damped, un-shifted power iteration — the
# forward half-step of HITS on a single layout with per-step L1
# normalization (labels * scale // total, exact int64).  Completes the
# classical spectral family beside PageRank (damped+teleport), Katz
# (additive shift) and HITS/SALSA (two-sided).
# ---------------------------------------------------------------------------

EIGEN_ITERS = 12
EIGEN_SCALE = 10**7


def eigenvector_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    iters: int = EIGEN_ITERS,
    scale: int = EIGEN_SCALE,
    num_parts: int | None = None,
) -> pd.DataFrame:
    """(vertex_key, score_fp) — right-eigenvector centrality (in-edge
    weighted sums) after ``iters`` normalized power steps."""
    from ray.data.aggregate import Max, Min

    agg = edges.select_columns(["weight"]).aggregate(
        Min("weight", alias_name="w_min"), Max("weight", alias_name="w_max")
    )
    max_w = max(abs(agg.get("w_min") or 0), abs(agg.get("w_max") or 0))
    # same bound as HITS: labels <= scale after each normalization, so the
    # next raw sums are <= scale * total_weight and label*scale < 2^62
    assert scale * scale * max(max_w, 1) < 2**62, (
        f"eigenvector overflow bound violated: scale={scale}, max |weight|={max_w}"
    )

    eng = GraphEngine(os.path.join(work_dir, "eigen"), num_parts=num_parts)
    eng.build(edges, symmetrize=False)
    try:
        eng.start()
        ray.get([a.init_state.remote("hits") for a in eng.actors])
        ray.get(
            [
                a.set_uniform_labels.remote(scale // max(eng.N, 1))
                for a in eng.actors
            ]
        )
        pending: list = []
        for _ in range(iters):
            hub_ref = eng._initial_hub_ref("hits")
            outs = eng._exchange("hits", hub_ref)
            applies = [
                eng.actors[q].apply_sum.remote(
                    *[outs[i][q] for i in range(len(outs))]
                )
                for q in range(eng.P)
            ]
            total = int(sum(ray.get(applies)))
            pending.extend(
                a.scale_labels.remote(scale, total) for a in eng.actors
            )
        ray.get(pending)  # surface normalization errors
        tables = ray.get([a.result_table.remote("hits") for a in eng.actors])
        res = ray.data.from_arrow(
            [
                pa.table(
                    {"vertex_id": t["vertex_id"], "score_fp": t["label"]}
                )
                for t in tables
            ]
        )
        return (
            attach_keys(res, vertices)
            .select_columns(["vertex_key", "score_fp"])
            .to_pandas()
            .sort_values("vertex_key", kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        eng.shutdown()


def eigen_fp_ctes(
    iters: int = EIGEN_ITERS,
    scale: int = EIGEN_SCALE,
    edges_cte: str = "edges",
    prefix: str = "ev",
) -> str:
    """Unrolled DuckDB mirror: per step one weighted in-sum aggregate and
    the same L1 normalization idiom as the HITS oracle (absent vertices
    contribute 0; a zero total zeroes the vector)."""
    E, x = edges_cte, prefix
    parts = [
        f"""
, {x}_verts AS MATERIALIZED (
    SELECT DISTINCT vertex_key FROM (
        SELECT src_key AS vertex_key FROM {E}
        UNION ALL SELECT dst_key FROM {E}
    )
), {x}_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {x}_verts)
, {x}0 AS MATERIALIZED (
    SELECT v.vertex_key, {scale} // n.n AS val
    FROM {x}_verts v CROSS JOIN {x}_n n
)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
, {x}_r{i} AS MATERIALIZED (
    SELECT e.dst_key AS vertex_key,
           sum(s.val * CAST(e.weight AS BIGINT)) AS v
    FROM {E} e JOIN {x}{p} s ON s.vertex_key = e.src_key
    GROUP BY 1
), {x}{i} AS MATERIALIZED (
    SELECT v.vertex_key,
           coalesce((r.v * {scale})
                    // (SELECT sum(v) FROM {x}_r{i}), 0) AS val
    FROM {x}_verts v LEFT JOIN {x}_r{i} r ON r.vertex_key = v.vertex_key
)"""
        )
    return "".join(parts)
