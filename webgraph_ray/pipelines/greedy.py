"""Greedy adversarial mutation loop — the reference's
mutate -> re-extract -> re-classify -> greedy-accept cycle
(/root/reference/robustness/structure_mutation/greedy_mutation.py:162-334,
mutation styles in mutate_styles.py:16-393: add_node / remove_edge /
redistribute) re-expressed over the global edge table.

Objective: the adversary wants to reduce the maximum fixed-point PageRank
over tool vertices (the "dominant tool conceals itself" analog of flipping
classifier predictions).  Each round targets the current top tool, tries
each mutation style as an edge-table delta, re-runs the bit-exact
fixed-point PageRank, and accepts the best strictly-improving candidate —
deterministic int64 end to end, so the whole loop (targets, candidate
objectives, accept decisions, early stop) is mirrored by a DuckDB oracle
(webgraph_ray/functions/oracles.py::greedy_mutation_sql).

Styles (selectors are defined on the TURN INDEX parsed from the source
key — "conv_X#k" -> k — rather than on SipHash vertex ids, precisely so
the SQL mirror exists):

- ``split_tool``      redistribute: incoming tool_call edges whose source
                      turn index is odd move to a clone vertex
                      ``<tool>__clone<r>``
- ``drop_tool_calls`` remove_edge: incoming tool_call edges whose source
                      turn index is divisible by 3 are deleted
- ``add_node``        node addition (the reference's create-fake-child
                      style, mutate_styles.py:16-91): one new decoy child
                      vertex ``decoy:<tool>:r<r>`` with a single edge
                      target -> decoy

Incremental evaluation: the engine layout for each candidate is produced
by ``webgraph_ray.graph.delta.delta_build`` — only the partitions the
delta touches are rewritten, every other ``part=K`` file is hardlinked
from the current build (byte-identical; pinned by tests/test_greedy.py).
Candidate *rebuild* cost is therefore O(|delta| + affected partitions),
not O(|E|); the PageRank evaluation itself remains global because the
objective is a global fixed point.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from webgraph_ray.functions.hashing import hash_keys
from webgraph_ray.graph.delta import delta_build
from webgraph_ray.graph.engine import GraphEngine

STYLES = ("split_tool", "drop_tool_calls", "add_node")


def _turn_idx(keys: pd.Series) -> pd.Series:
    """Source-key turn index ("conv_X#k" -> k); NaN when absent (mirrors
    the oracle's TRY_CAST(regexp_extract(...)))."""
    return keys.str.extract(r"#(\d+)$", expand=False).astype("float64")


def _tool_keys(edges: ray.data.Dataset) -> list[str]:
    """Sorted distinct tool vertex keys (dst side) in the edge table."""
    return sorted(
        set(
            edges.map_batches(
                lambda t: t.filter(
                    pc.starts_with(t["dst_key"], "tool:")
                ).select(["dst_key"]),
                batch_format="pyarrow",
            ).unique("dst_key")
        )
    )


def _hit_narrow(edges: ray.data.Dataset, target: str) -> ray.data.Dataset:
    """The mutation's working set — every row with dst_key == target,
    projected to (src, dst, weight, src_key, edge_type) — kept as a
    MATERIALIZED Dataset in the object store.  The target is by
    construction the top-PageRank tool, i.e. the highest in-degree hub in
    the graph, so this set must never be pulled to the driver: all
    per-style selections below are vectorized map_batches predicates and
    the deltas stream into delta_build's partitioned spool."""
    return (
        edges.map_batches(
            lambda t: t.filter(pc.equal(t["dst_key"], target)).select(
                ["src", "dst", "weight", "src_key", "edge_type"]
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )


def _distinct_count(ds: ray.data.Dataset, col: str) -> int:
    """Distributed distinct-count of one column (bucket-hash distinct,
    only the final count reaches the driver)."""
    from webgraph_ray.functions.shuffle import bucket_distinct

    return bucket_distinct(ds.select_columns([col]), [col]).count()


def _style_mask(t: pa.Table, style: str) -> pa.Table:
    """Rows of the hit set this style acts on (vectorized Arrow kernels:
    tool_call edges whose source turn index is odd / divisible by 3)."""
    import pyarrow.compute as pc_

    is_tc = pc_.equal(t["edge_type"], "tool_call")
    ti_str = pc_.extract_regex(t["src_key"], r"#(?P<ti>\d+)$")
    ti = pc_.cast(pc_.struct_field(ti_str, "ti"), pa.int64())
    if style == "split_tool":
        sel = pc_.and_kleene(is_tc, pc_.equal(pc_.bit_wise_and(ti, 1), 1))
    else:  # drop_tool_calls
        mod3 = pc_.subtract(ti, pc_.multiply(pc_.divide(ti, 3), 3))
        sel = pc_.and_kleene(is_tc, pc_.equal(mod3, 0))
    return t.filter(pc_.fill_null(sel, False))


def _candidate_delta(
    hit_ds: ray.data.Dataset,
    n_hit: int,
    target: str,
    style: str,
    round_no: int,
) -> tuple[object, object, int, str | None, bool]:
    """(removed, added, n_delta_src, new_tool_key, target_survives) for one
    candidate.  ``removed``/``added`` are narrow (src, dst, weight)
    Datasets (or a 1-row arrow table for add_node) — the hub's in-edge
    set never materializes on the driver."""
    if style == "add_node":
        decoy = f"decoy:{target}:r{round_no}"
        added = pa.table(
            {
                "src": pa.array(hash_keys(np.array([target], dtype=object))),
                "dst": pa.array(hash_keys(np.array([decoy], dtype=object))),
                "weight": pa.array([1.0]),
            }
        )
        return None, added, 1, None, True

    sel = hit_ds.map_batches(
        lambda t: _style_mask(t, style), batch_format="pyarrow"
    ).materialize()
    n_sel = sel.count()
    n_delta = _distinct_count(sel, "src_key") if n_sel else 0
    survives = n_hit - n_sel > 0

    def narrow(t: pa.Table) -> pa.Table:
        return t.select(["src", "dst", "weight"])

    removed = sel.map_batches(narrow, batch_format="pyarrow")
    if style == "drop_tool_calls":
        return removed, None, n_delta, None, survives

    clone = f"{target}__clone{round_no}"
    clone_id = int(hash_keys(np.array([clone], dtype=object))[0])

    def reroute(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"],
                "dst": pa.array(
                    np.full(t.num_rows, clone_id, dtype=np.int64)
                ),
                "weight": t["weight"],
            }
        )

    added = sel.map_batches(reroute, batch_format="pyarrow")
    return removed, added, n_delta, clone if n_sel else None, survives


def _mutated_rich(
    edges: ray.data.Dataset, target: str, style: str, round_no: int
) -> ray.data.Dataset:
    """Apply one style to the rich edge table (lazy)."""
    clone = f"{target}__clone{round_no}"
    decoy = f"decoy:{target}:r{round_no}"

    if style == "add_node":
        row = pa.table(
            {
                "src": pa.array(hash_keys(np.array([target], dtype=object))),
                "dst": pa.array(hash_keys(np.array([decoy], dtype=object))),
                "src_key": pa.array([target]),
                "dst_key": pa.array([decoy]),
                "edge_type": pa.array(["decoy"]),
                "weight": pa.array([1], pa.int64()),
                "conv_id": pa.array([""]),
                "ts": pa.array([pd.Timestamp(0)], pa.timestamp("us")),
            }
        )
        return edges.union(ray.data.from_arrow(row))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        ti = _turn_idx(out["src_key"])
        hit = (out["dst_key"] == target) & (out["edge_type"] == "tool_call")
        if style == "split_tool":
            move = (hit & (ti % 2 == 1)).to_numpy(bool)
            out.loc[move, "dst_key"] = clone
            out.loc[move, "dst"] = hash_keys(
                out.loc[move, "dst_key"].to_numpy(dtype=object)
            )
        else:  # drop_tool_calls
            drop = (hit & (ti % 3 == 0)).to_numpy(bool)
            out = out[~drop]
        return out

    return edges.map_batches(fn, batch_format="pandas")


def _layout_tool_scores(
    layout_dir: str, num_parts: int, tool_keys: list[str]
) -> pd.Series:
    """Fixed-point PageRank over an existing engine layout, filtered
    Ray-side to the tool vertices (only |tools| rows reach the driver)."""
    from webgraph_ray.functions.oracles import PR_FP_ITERS, PR_FP_SCALE

    if not tool_keys:
        raise ValueError("mutated graph lost every tool vertex")
    ids = hash_keys(np.array(tool_keys, dtype=object))
    id_set = np.sort(ids)
    eng = GraphEngine(layout_dir, num_parts=num_parts)
    try:
        res = eng.pagerank_fixed(iters=PR_FP_ITERS, scale=PR_FP_SCALE)
        small = res.map_batches(
            lambda t: t.filter(pc.is_in(t["vertex_id"], pa.array(id_set))),
            batch_format="pyarrow",
        ).to_pandas()
    finally:
        eng.shutdown()
    by_id = small.set_index("vertex_id")["score_fp"]
    return pd.Series(
        [int(by_id.get(i, 0)) for i in ids], index=tool_keys, dtype=np.int64
    )


def greedy_mutation(
    edges: ray.data.Dataset, rounds: int = 3, num_parts: int | None = None
) -> pd.DataFrame:
    """Run the loop; one row per (round, style) candidate with the accept
    decision.  All objective columns are exact fixed-point ints; the whole
    frame is mirrored by ``greedy_mutation_sql`` (driver-oracle-checked)."""
    work_root = tempfile.mkdtemp(prefix="webgraph_greedy_")
    cur_dir = os.path.join(work_root, "cur")
    try:
        cur = edges.materialize()
        base_eng = GraphEngine(cur_dir, num_parts=num_parts)
        base_eng.build(cur)
        P = base_eng.P
        tools = _tool_keys(cur)
        scores = _layout_tool_scores(cur_dir, P, tools)
        obj = int(scores.max())
        rows: list[dict] = []
        for r in range(1, rounds + 1):
            # deterministic target: max score, ties by smallest key
            target = scores.sort_index().idxmax()
            hit_ds = _hit_narrow(cur, target)
            n_hit = hit_ds.count()
            best = None  # (obj, style, cand_dir, scores, tools)
            for style in STYLES:
                removed, added, n_delta, new_tool, survives = _candidate_delta(
                    hit_ds, n_hit, target, style, r
                )
                cand_tools = [t for t in tools if survives or t != target]
                if new_tool:
                    cand_tools = sorted(cand_tools + [new_tool])
                cand_dir = os.path.join(work_root, f"r{r}_{style}")
                if not delta_build(cur_dir, cand_dir, removed, added):
                    # hub set changed (or layout mismatch): full rebuild
                    GraphEngine(cand_dir, num_parts=P).build(
                        _mutated_rich(cur, target, style, r)
                    )
                cscores = _layout_tool_scores(cand_dir, P, cand_tools)
                cobj = int(cscores.max())
                accepted = cobj < obj and (best is None or cobj < best[0])
                rows.append(
                    {
                        "round": np.int64(r),
                        "style": style,
                        "target_tool": target,
                        "obj_before_fp": np.int64(obj),
                        "obj_after_fp": np.int64(cobj),
                        "n_delta_src": np.int64(n_delta),
                        "accepted": bool(accepted),
                    }
                )
                if accepted:
                    best = (cobj, style, cand_dir, cscores, cand_tools)
            if best is None:
                break
            obj, scores, tools = best[0], best[3], best[4]
            # the accepted candidate's layout becomes the current build;
            # unaccepted candidate layouts are discarded
            cur = _mutated_rich(cur, target, best[1], r).materialize()
            old = os.path.join(work_root, f"old{r}")
            os.rename(cur_dir, old)
            os.rename(best[2], cur_dir)
            shutil.rmtree(old, ignore_errors=True)
            for style in STYLES:
                if style != best[1]:
                    shutil.rmtree(
                        os.path.join(work_root, f"r{r}_{style}"),
                        ignore_errors=True,
                    )
            # only the best candidate stays accepted for the round
            for row in rows:
                if row["round"] == r:
                    row["accepted"] = row["style"] == best[1]
        return pd.DataFrame(rows)
    finally:
        shutil.rmtree(work_root, ignore_errors=True)
