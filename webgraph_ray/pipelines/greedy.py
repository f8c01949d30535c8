"""Greedy adversarial mutation loop — the reference's
mutate -> re-extract -> re-classify -> greedy-accept cycle
(/root/reference/robustness/structure_mutation/greedy_mutation.py:162-334,
mutation styles in mutate_styles.py:16-393: add_node / remove_edge /
redistribute) re-expressed over the global edge table.

Objective: the adversary wants to reduce the maximum fixed-point PageRank
over tool vertices (the "dominant tool conceals itself" analog of flipping
classifier predictions).  Each round targets the current top tool, tries
each mutation style as an edge-table transform, re-runs the bit-exact
fixed-point PageRank, and accepts the best strictly-improving candidate —
deterministic end to end, so accepted objectives form a strictly
decreasing int64 sequence (pytest invariant).

Styles:
- ``split_tool``      redistribute: half of the target's incoming
                      tool_call edges (by src-hash parity) move to a clone
                      vertex ``<tool>__clone<r>``
- ``drop_tool_calls`` remove_edge: every third incoming tool_call edge of
                      the target is deleted

Each candidate reports ``affected_parts``: the partitions (src-owner
``id % P``) its edge delta touches — the partition-level rebuild scope an
incremental builder would rewrite (the full rebuild here is the
conservative fallback; the build layout is already per-partition parquet,
so a delta rebuild rewrites only those directories).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow.compute as pc

import ray.data

from webgraph_ray.functions.hashing import hash_keys
from webgraph_ray.graph.engine import GraphEngine

STYLES = ("split_tool", "drop_tool_calls")


def _tool_scores(edges: ray.data.Dataset, work_dir: str) -> pd.Series:
    """score_fp per tool vertex key (index sorted by key)."""
    from webgraph_ray.functions.oracles import PR_FP_ITERS, PR_FP_SCALE

    tool_keys = sorted(
        set(
            edges.map_batches(
                lambda t: t.filter(pc.starts_with(t["dst_key"], "tool:")).select(
                    ["dst_key"]
                ),
                batch_format="pyarrow",
            ).unique("dst_key")
        )
    )
    ids = hash_keys(np.array(tool_keys, dtype=object))
    eng = GraphEngine(work_dir, num_parts=None)
    eng.build(edges)
    try:
        res = eng.pagerank_fixed(iters=PR_FP_ITERS, scale=PR_FP_SCALE).to_pandas()
    finally:
        eng.shutdown()
    shutil.rmtree(work_dir, ignore_errors=True)
    by_id = res.set_index("vertex_id")["score_fp"]
    return pd.Series(
        [int(by_id.get(i, 0)) for i in ids], index=tool_keys, dtype=np.int64
    )


def _mutate(
    edges: ray.data.Dataset, target: str, style: str, round_no: int
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Apply one style; returns (mutated edges, delta src ids)."""
    clone = f"{target}__clone{round_no}"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        hit = (out["dst_key"] == target) & (out["edge_type"] == "tool_call")
        if style == "split_tool":
            parity = (out["src"].to_numpy(np.int64) % 2) == 1
            move = hit & parity
            out.loc[move, "dst_key"] = clone
            out.loc[move, "dst"] = hash_keys(
                out.loc[move, "dst_key"].to_numpy(dtype=object)
            )
        else:  # drop_tool_calls
            drop = hit & ((out["src"].to_numpy(np.int64) % 3) == 0)
            out = out[~drop]
        return out

    def delta_src(df: pd.DataFrame) -> pd.DataFrame:
        hit = (df["dst_key"] == target) & (df["edge_type"] == "tool_call")
        return pd.DataFrame({"src": df.loc[hit, "src"].unique()})

    delta = edges.map_batches(delta_src, batch_format="pandas").to_pandas()
    return (
        edges.map_batches(fn, batch_format="pandas").materialize(),
        delta["src"].to_numpy(np.int64),
    )


def greedy_mutation(
    edges: ray.data.Dataset, rounds: int = 3, num_parts: int = 8
) -> pd.DataFrame:
    """Run the loop; one row per (round, style) candidate plus the accept
    decision.  All score columns are exact fixed-point ints."""
    work_root = tempfile.mkdtemp(prefix="webgraph_greedy_")
    try:
        cur = edges.materialize()
        scores = _tool_scores(cur, os.path.join(work_root, "base"))
        obj = int(scores.max())
        rows = []
        for r in range(1, rounds + 1):
            # deterministic target: max score, ties by key order
            target = scores.sort_index().idxmax()
            best = None
            for style in STYLES:
                cand, delta_ids = _mutate(cur, target, style, r)
                cscores = _tool_scores(
                    cand, os.path.join(work_root, f"r{r}_{style}")
                )
                cobj = int(cscores.max())
                affected = np.unique(delta_ids % num_parts)
                accepted = cobj < obj and (best is None or cobj < best[0])
                rows.append(
                    {
                        "round": np.int64(r),
                        "style": style,
                        "target_tool": target,
                        "obj_before_fp": np.int64(obj),
                        "obj_after_fp": np.int64(cobj),
                        "affected_parts": np.int64(len(affected)),
                        "total_parts": np.int64(num_parts),
                        "accepted": bool(accepted),
                    }
                )
                if cobj < obj and (best is None or cobj < best[0]):
                    best = (cobj, cand, cscores, style)
            if best is None:
                break
            obj, cur, scores = best[0], best[1], best[2]
            # only the best candidate stays accepted for the round
            for row in rows:
                if row["round"] == r:
                    row["accepted"] = (
                        row["style"] == best[3] and row["obj_after_fp"] == obj
                    )
        return pd.DataFrame(rows)
    finally:
        shutil.rmtree(work_root, ignore_errors=True)
