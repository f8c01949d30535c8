"""SALSA hubs & authorities, exact int64 fixed point.

Lempel-Moran's Stochastic Approach for Link-Structure Analysis: the HITS
alternation with each half-step a STOCHASTIC (degree-normalized) transfer
instead of a raw sum —

``a(v) = sum over in-edges (u,v) of (h(u) // wout(u)) * w``
``h(u) = sum over out-edges (u,v) of (a(v) // win(v)) * w``

(weighted form; ``wout``/``win`` are weighted out-/in-strengths).  Mass is
conserved up to floor losses, so unlike HITS there is NO normalization
step and every label stays bounded by the initial total ``SCALE`` — the
whole run is integer floor arithmetic, bit-exact under any partitioning,
and mirrors into an unrolled DuckDB CTE chain (:func:`salsa_sql`).

Scale shape: identical to HITS (graph/hits.py) — forward + reversed
layouts derived from ONE build's parquet, labels handed between the two
actor sets through plasma ObjectRefs; the per-half-step message is the
engine's ``salsa`` scatter kernel (the PageRank share gather without the
17/20 damping).  Reference analog: the centrality block of
/root/reference/code/features/structure.py:129-163 (SALSA is the
stochastic companion of the HITS scores there).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray
import ray.data

from ray.data.aggregate import Max, Min

from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.pipelines.flagship import attach_keys

SALSA_ITERS = 8
SALSA_SCALE = 10**12


def salsa_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    iters: int = SALSA_ITERS,
    scale: int = SALSA_SCALE,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(vertex_key, auth_fp, hub_fp) after ``iters`` alternating stochastic
    half-steps."""
    agg = edges.select_columns(["weight"]).aggregate(
        Min("weight", alias_name="w_min"), Max("weight", alias_name="w_max")
    )
    max_w = max(abs(agg.get("w_min") or 0), abs(agg.get("w_max") or 0))
    # per-edge product share * w <= scale * max_w; per-dst sums <= scale
    assert scale * max(max_w, 1) < 2**62, (
        f"salsa overflow bound violated: scale={scale}, max |weight|={max_w}"
    )

    fwd = GraphEngine(
        os.path.join(work_dir, "fwd"), num_parts=num_parts, actor_num_cpus=0
    )
    fwd.build(edges)
    rev = GraphEngine(
        os.path.join(work_dir, "rev"), num_parts=fwd.P, actor_num_cpus=0
    )
    import concurrent.futures as _cf

    def _rev_up():
        rev.build_reversed_from(os.path.join(work_dir, "fwd"))
        rev.start()

    with _cf.ThreadPoolExecutor(2) as _ex:
        _f = _ex.submit(fwd.start)
        _r = _ex.submit(_rev_up)
        _f.result()
        _r.result()
    assert fwd.N == rev.N, "forward/reverse vertex sets diverged"

    pending: list = []

    def half_step(eng: GraphEngine):
        hub_ref = eng._initial_hub_ref("salsa")
        outs = eng._exchange("salsa", hub_ref)
        ray.get(
            [
                eng.actors[q].apply_sum.remote(
                    *[outs[i][q] for i in range(len(outs))]
                )
                for q in range(eng.P)
            ]
        )

    def transfer(src_eng: GraphEngine, dst_eng: GraphEngine):
        refs = [a.get_labels.remote() for a in src_eng.actors]
        pending.extend(
            dst_eng.actors[q].set_labels.remote(refs[q])
            for q in range(dst_eng.P)
        )

    try:
        ray.get(
            [a.init_state.remote("salsa") for a in fwd.actors + rev.actors]
        )
        ray.get(
            [
                a.set_uniform_labels.remote(scale // max(fwd.N, 1))
                for a in fwd.actors
            ]
        )
        auth_tables = None
        for i in range(iters):
            half_step(fwd)  # fwd labels: hub -> auth
            if i == iters - 1:
                auth_tables = ray.get(
                    [a.result_table.remote("salsa") for a in fwd.actors]
                )
            transfer(fwd, rev)
            half_step(rev)  # rev labels: auth -> hub
            if i < iters - 1:
                transfer(rev, fwd)
        hub_tables = ray.get(
            [a.result_table.remote("salsa") for a in rev.actors]
        )
        ray.get(pending)  # surface any transfer errors
        parts = []
        for at, ht in zip(auth_tables, hub_tables):
            parts.append(
                pa.table(
                    {
                        "vertex_id": at["vertex_id"],
                        "auth_fp": at["label"],
                        "hub_fp": ht["label"],
                    }
                )
            )
        res = ray.data.from_arrow(parts)
        return (
            attach_keys(res, vertices)
            .select_columns(["vertex_key", "auth_fp", "hub_fp"])
            .materialize()
        )
    finally:
        fwd.shutdown()
        rev.shutdown()


def salsa_sql(
    edges_cte: str,
    iters: int = SALSA_ITERS,
    scale: int = SALSA_SCALE,
    prefix: str = "sl",
) -> str:
    """DuckDB mirror: same alternating stochastic integer half-steps (all
    quantities positive — BIGINT ``//`` truncation == floor)."""
    x = prefix
    return (
        edges_cte
        + salsa_ctes(iters, scale, prefix)
        + f"""
SELECT a.vertex_key,
       CAST(a.val AS BIGINT) AS auth_fp,
       CAST(h.val AS BIGINT) AS hub_fp
FROM {x}_a{iters} a JOIN {x}_h{iters} h USING (vertex_key)
ORDER BY 1"""
    )


def salsa_ctes(
    iters: int = SALSA_ITERS,
    scale: int = SALSA_SCALE,
    prefix: str = "sl",
) -> str:
    """CTE chain only (assumes an ``edges`` CTE in scope), ending in
    ``{prefix}_a{iters}`` / ``{prefix}_h{iters}``."""
    x = prefix
    parts = [
        f"""
, {x}_verts AS MATERIALIZED (
    SELECT DISTINCT vertex_key FROM (
        SELECT src_key AS vertex_key FROM edges
        UNION ALL SELECT dst_key FROM edges
    )
), {x}_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {x}_verts)
, {x}_outw AS MATERIALIZED (
    SELECT src_key, CAST(sum(weight) AS BIGINT) AS w FROM edges GROUP BY 1
), {x}_inw AS MATERIALIZED (
    SELECT dst_key, CAST(sum(weight) AS BIGINT) AS w FROM edges GROUP BY 1
), {x}_h0 AS MATERIALIZED (
    SELECT v.vertex_key, {scale} // n.n AS val
    FROM {x}_verts v CROSS JOIN {x}_n n
)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
, {x}_a{i} AS MATERIALIZED (
    SELECT v.vertex_key, CAST(coalesce(r.v, 0) AS BIGINT) AS val
    FROM {x}_verts v LEFT JOIN (
        SELECT e.dst_key AS vertex_key,
               sum((h.val // o.w) * CAST(e.weight AS BIGINT)) AS v
        FROM edges e
        JOIN {x}_h{p} h ON h.vertex_key = e.src_key
        JOIN {x}_outw o ON o.src_key = e.src_key
        GROUP BY 1
    ) r ON r.vertex_key = v.vertex_key
), {x}_h{i} AS MATERIALIZED (
    SELECT v.vertex_key, CAST(coalesce(r.v, 0) AS BIGINT) AS val
    FROM {x}_verts v LEFT JOIN (
        SELECT e.src_key AS vertex_key,
               sum((a.val // n.w) * CAST(e.weight AS BIGINT)) AS v
        FROM edges e
        JOIN {x}_a{i} a ON a.vertex_key = e.dst_key
        JOIN {x}_inw n ON n.dst_key = e.dst_key
        GROUP BY 1
    ) r ON r.vertex_key = v.vertex_key
)"""
        )
    return "".join(parts)
