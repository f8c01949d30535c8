"""Sampled-source betweenness centrality (Brandes) on the BSP engine.

The reference computes per-visit centrality-style structure features with
networkx (/root/reference/code/features/structure.py:129-177); betweenness
is the canonical member of that family its per-node sweeps cannot reach at
scale.  The scalable estimator is Brandes' algorithm from a deterministic
source sample (Bader-style pivot sampling): for each sampled source s run
one level-synchronized BFS forward pass accumulating shortest-path counts
sigma, then one backward pass accumulating dependencies
delta[v] = sum over successors w of (sigma[v]/sigma[w]) * (1 + delta[w]),
and sum delta over sources.  Everything is exact int64 fixed-point
(delta in BW_SCALE units; the per-successor quota carries an extra
BW_SCALE2 factor through the floor divisions) so a DuckDB oracle with
identical arithmetic mirrors it bit-for-bit.

Engine mapping: the graph is reduced to its SIMPLE UNDIRECTED form
(distinct unordered pairs, both directions, weight 1, self-loops dropped)
— on that symmetric layout the reversed graph IS the forward graph, so
one build serves both passes, and every exchange is the existing "hits"
sum-scatter (per-dst sums of staged labels): forward rounds stage the
frontier's sigma, backward rounds stage the successor quotas.  Per-seed
cost is O(diameter) exchanges, each O(frontier-adjacent) work — no
full-edge-table rescans, no driver-side state beyond per-round counters.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.graph.engine import GraphEngine

# delta unit (1.0 == BW_SCALE) and the extra quota scale — shared with
# the SQL mirror (single source of truth).  Overflow bound: each staged
# quota is < (BW_SCALE + max_delta) * BW_SCALE2 and the receiver
# multiplies its incoming SUM by sigma_v — bw_apply_backward asserts the
# product stays under 2^62, and the forward pass asserts sigma < 2^40
# (both loud failures, mirrored by DuckDB's overflow errors).
from webgraph_ray.functions.oracles import BW_SQL_SCALE as BW_SCALE
from webgraph_ray.functions.oracles import BW_SQL_SCALE2 as BW_SCALE2
BW_MAX_SIGMA = 2**40
BW_MAX_LEVELS = 64


def simple_undirected(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(src, dst, weight=1) over the distinct undirected pairs of the
    input edge ids, both directions, self-loops dropped — the one shuffle
    (a two-int-column groupby) this operator performs."""

    def canon(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = b["src"]
        d = b["dst"]
        keep = pc.not_equal(s, d)
        a = pc.min_element_wise(s, d)
        z = pc.max_element_wise(s, d)
        return pa.table({"a": a, "b": z}).filter(keep)

    ded = (
        edges.select_columns(["src", "dst"])
        .map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
    )

    def both(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, z])),
                "dst": pa.array(np.concatenate([z, a])),
                "weight": pa.array(np.ones(2 * len(a), dtype=np.int64)),
            }
        )

    return ded.map_batches(both, batch_format="pyarrow")


def betweenness(
    edges: ray.data.Dataset,
    work_dir: str,
    seeds: np.ndarray,
    num_parts: int | None = None,
    max_levels: int = BW_MAX_LEVELS,
    hub_threshold: int | None = None,
) -> tuple[ray.data.Dataset, int]:
    """(vertex_id, bc_fp) over the simple undirected graph, bc_fp = the
    summed Brandes dependencies from the sampled ``seeds`` in BW_SCALE
    units; plus the deepest BFS level reached (the caller checks it
    against the oracle's unroll depth).  Seeds are processed in sorted-id
    order; the result is order-independent (a sum)."""
    simple = simple_undirected(edges)
    kw = {} if hub_threshold is None else {"hub_threshold": hub_threshold}
    eng = GraphEngine(os.path.join(work_dir, "bw"), num_parts=num_parts, **kw)
    eng.build(simple)
    eng.start()
    deepest = 0
    try:
        ray.get([a.init_state.remote("hits") for a in eng.actors])
        ray.get([a.bw_init.remote() for a in eng.actors])
        pending: list = []
        for sid in np.sort(np.asarray(seeds, dtype=np.int64)):
            ray.get([a.bw_seed.remote(int(sid)) for a in eng.actors])
            lmax = 0
            for level in range(1, max_levels + 1):
                if level > 1:
                    # per-actor task ordering sequences the stage before
                    # the scatter; errors drain through `pending`
                    pending.extend(
                        a.bw_stage_forward.remote(level) for a in eng.actors
                    )
                hub_ref = eng._initial_hub_ref("hits")
                outs = eng._exchange("hits", hub_ref)
                res = ray.get(
                    [
                        eng.actors[q].bw_apply_forward.remote(
                            level, *[outs[i][q] for i in range(len(outs))]
                        )
                        for q in range(eng.P)
                    ]
                )
                newly = sum(r[0] for r in res)
                sig_max = max(r[1] for r in res)
                assert sig_max < BW_MAX_SIGMA, (
                    "betweenness sigma overflow: path counts exceed the "
                    "fixed-point bound on this graph"
                )
                if newly == 0:
                    lmax = level - 1
                    break
            else:
                raise RuntimeError(
                    f"betweenness BFS did not converge in {max_levels} levels"
                )
            deepest = max(deepest, lmax)
            for level in range(lmax - 1, 0, -1):
                pending.extend(
                    a.bw_stage_backward.remote(level, BW_SCALE, BW_SCALE2)
                    for a in eng.actors
                )
                hub_ref = eng._initial_hub_ref("hits")
                outs = eng._exchange("hits", hub_ref)
                ray.get(
                    [
                        eng.actors[q].bw_apply_backward.remote(
                            level, BW_SCALE2, *[outs[i][q] for i in range(len(outs))]
                        )
                        for q in range(eng.P)
                    ]
                )
            pending.extend(a.bw_accumulate.remote() for a in eng.actors)
        ray.get(pending)  # surface stage/accumulate errors
        tables = ray.get([a.bw_result.remote() for a in eng.actors])
        return ray.data.from_arrow(tables), deepest
    finally:
        eng.shutdown()


def betweenness_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    seeds: np.ndarray,
    num_parts: int | None = None,
    max_levels: int = BW_MAX_LEVELS,
) -> tuple[pd.DataFrame, int]:
    """Key-attached (vertex_key, bc_fp), sorted by key."""
    from webgraph_ray.pipelines.flagship import attach_keys

    res, deepest = betweenness(
        edges, work_dir, seeds, num_parts=num_parts, max_levels=max_levels
    )
    out = (
        attach_keys(res, vertices)
        .select_columns(["vertex_key", "bc_fp"])
        .to_pandas()
        .sort_values("vertex_key", kind="mergesort")
        .reset_index(drop=True)
    )
    return out, deepest
