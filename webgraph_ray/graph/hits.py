"""HITS (hubs & authorities) on the BSP engine: exact-integer alternating
power iteration over a forward and a reversed edge layout.

The engine's layout is direction-committed: edges are partitioned by src
owner and messages flow to dst owners.  HITS needs both directions —
auth = A^T hub (along edges), hub = A auth (against edges) — so the
orchestrator builds TWO layouts of the same edge table (forward, and with
src/dst swapped) over the SAME vertex->partition map (owner = id % P with
equal vertex sets, so partition q's owned array is identical in both).
Each half-step runs one exchange on its layout, L1-normalizes in exact
int64 (val * SCALE // total — no float log/sqrt, hence the bit-exact
DuckDB mirror), and hands the per-partition state arrays to the other
layout's actors as plasma ObjectRefs (zero-copy on a node, one object per
partition on a cluster — the same cost class as one message exchange).

Reference analog: link-analysis centrality over the per-visit graph
(/root/reference/code/features/structure.py:129-177 is the same family);
HITS adds the hub/authority decomposition PageRank doesn't give.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.graph.engine import GraphEngine

HITS_ITERS = 15
# SCALE bounds every intermediate: labels <= total <= SCALE*max_w, and the
# normalization product labels*SCALE <= SCALE^2*max_w must stay < 2^63 —
# at SCALE=1e7 that allows max edge weight ~9e4 (asserted at run time).
HITS_SCALE = 10**7


def hits(
    edges: ray.data.Dataset,
    work_dir: str,
    iters: int = HITS_ITERS,
    scale: int = HITS_SCALE,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(vertex_id, auth_fp, hub_fp) after ``iters`` alternating exact-int64
    half-steps with L1 normalization."""
    assert iters >= 1, "hits needs at least one iteration"
    from ray.data.dataset import MaterializedDataset

    if not isinstance(edges, MaterializedDataset):
        # three consumers below (weight scan, forward build, reversed
        # build) — a lazy input would re-execute its upstream each time
        edges = edges.materialize()
    # overflow bound: distributed min/max aggregate over the pruned weight
    # column (round 4 streamed every batch through the driver here)
    from ray.data.aggregate import Max, Min

    agg = edges.select_columns(["weight"]).aggregate(
        Min("weight", alias_name="w_min"), Max("weight", alias_name="w_max")
    )
    max_w = max(abs(agg.get("w_min") or 0), abs(agg.get("w_max") or 0))
    assert scale * scale * max(max_w, 1) < 2**62, (
        f"hits overflow bound violated: scale={scale}, max |weight|={max_w}"
    )

    # Both engines are alive at once: with the default num_cpus=1 per
    # actor the PAIR can reserve every cluster CPU (each engine's own
    # oversubscription guard only sees itself), and the final
    # from_arrow/attach_keys Ray Data tasks would deadlock.  Zero-CPU
    # actors keep 2P partition processes schedulable alongside task work;
    # concurrency is governed by the actor count.
    fwd = GraphEngine(
        os.path.join(work_dir, "fwd"), num_parts=num_parts, actor_num_cpus=0
    )
    fwd.build(edges)
    # the reversed layout is fully determined by the forward build's
    # parquet: derive it with raw per-partition reverse-and-scatter tasks
    # instead of a second full Ray Data build pipeline — and since that
    # derivation only reads fwd's PARQUET (not its actors), it overlaps
    # with fwd's actor startup on a second driver thread (both sides are
    # ray.get waits that release the GIL; measured 3.5s -> 2.0s at sf0.1)
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

    # Fire-and-forget refs (scale_labels / set_labels): per-actor task
    # ordering makes a driver barrier unnecessary for correctness — any
    # later task on the same actor queues behind them — but their errors
    # must still surface, so they are drained once after the loop.
    pending: list = []

    def half_step(eng: GraphEngine):
        """One exchange + L1 normalization on ``eng``; labels become the
        new per-dst sums.  The only driver barrier is the global-total
        reduction the normalization needs."""
        hub_ref = eng._initial_hub_ref("hits")
        outs = eng._exchange("hits", hub_ref)
        applies = [
            eng.actors[q].apply_sum.remote(*[outs[i][q] for i in range(len(outs))])
            for q in range(eng.P)
        ]
        total = int(sum(ray.get(applies)))
        pending.extend(a.scale_labels.remote(scale, total) for a in eng.actors)
        return total

    def transfer(src_eng: GraphEngine, dst_eng: GraphEngine):
        refs = [a.get_labels.remote() for a in src_eng.actors]
        pending.extend(
            dst_eng.actors[q].set_labels.remote(refs[q])
            for q in range(dst_eng.P)
        )

    try:
        ray.get(
            [a.init_state.remote("hits") for a in fwd.actors + rev.actors]
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
                    [a.result_table.remote("hits") for a in fwd.actors]
                )
            transfer(fwd, rev)
            half_step(rev)  # rev labels: auth -> hub
            if i < iters - 1:
                transfer(rev, fwd)
        hub_tables = ray.get(
            [a.result_table.remote("hits") for a in rev.actors]
        )
        ray.get(pending)  # surface any scale/transfer errors
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
        return ray.data.from_arrow(parts)
    finally:
        fwd.shutdown()
        rev.shutdown()


def hits_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    iters: int = HITS_ITERS,
    scale: int = HITS_SCALE,
) -> pd.DataFrame:
    from webgraph_ray.pipelines.flagship import attach_keys

    res = hits(edges, work_dir, iters=iters, scale=scale)
    out = (
        attach_keys(res, vertices)
        .select_columns(["vertex_key", "auth_fp", "hub_fp"])
        .to_pandas()
    )
    return out.sort_values("vertex_key", kind="mergesort").reset_index(
        drop=True
    )


def hits_sql(
    edges_cte: str,
    iters: int = HITS_ITERS,
    scale: int = HITS_SCALE,
    prefix: str = "ht",
) -> str:
    """DuckDB mirror: same alternating integer half-steps.  a_raw sums run
    over edges only; absent vertices contribute 0 to the total exactly as
    the Ray side's zero-filled agg arrays do."""
    x = prefix
    return (
        edges_cte
        + hits_ctes(iters, scale, prefix)
        + f"""
SELECT a.vertex_key,
       CAST(a.val AS BIGINT) AS auth_fp,
       CAST(h.val AS BIGINT) AS hub_fp
FROM {x}_a{iters} a JOIN {x}_h{iters} h USING (vertex_key)
ORDER BY 1"""
    )


def hits_ctes(
    iters: int = HITS_ITERS,
    scale: int = HITS_SCALE,
    prefix: str = "ht",
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
, {x}_h0 AS MATERIALIZED (
    SELECT v.vertex_key, {scale} // n.n AS val
    FROM {x}_verts v CROSS JOIN {x}_n n
)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
, {x}_ar{i} AS MATERIALIZED (
    SELECT e.dst_key AS vertex_key,
           sum(h.val * CAST(e.weight AS BIGINT)) AS v
    FROM edges e JOIN {x}_h{p} h ON h.vertex_key = e.src_key
    GROUP BY 1
), {x}_a{i} AS MATERIALIZED (
    SELECT v.vertex_key,
           coalesce((r.v * {scale})
                    // (SELECT sum(v) FROM {x}_ar{i}), 0) AS val
    FROM {x}_verts v LEFT JOIN {x}_ar{i} r ON r.vertex_key = v.vertex_key
), {x}_hr{i} AS MATERIALIZED (
    SELECT e.src_key AS vertex_key,
           sum(a.val * CAST(e.weight AS BIGINT)) AS v
    FROM edges e JOIN {x}_a{i} a ON a.vertex_key = e.dst_key
    GROUP BY 1
), {x}_h{i} AS MATERIALIZED (
    SELECT v.vertex_key,
           coalesce((r.v * {scale})
                    // (SELECT sum(v) FROM {x}_hr{i}), 0) AS val
    FROM {x}_verts v LEFT JOIN {x}_hr{i} r ON r.vertex_key = v.vertex_key
)"""
        )
    return "".join(parts)
