"""Edge derivation: transcripts -> edge table.

Rule registry (SURVEY.md §2.9 analog of the reference's config-gated
feature families, /root/reference/code/features.yaml:15-19):

- ``reply``      turn (conv, i-1) -> turn (conv, i).  Analog of the
                 reference's redirect / call-stack chain edges
                 (/root/reference/code/graph/request_edges.py:84-112,157-200).
                 Because ``turn_idx`` is dense per conversation (input
                 contract, FIXTURES.md §1), this is a pure per-row map —
                 NO shuffle, no grouping: each turn with ``turn_idx >= 1``
                 emits exactly one edge to itself from its predecessor.
- ``tool_call``  turn -> tool vertex when ``tool`` is non-null.  Analog of
                 the reference's storage edges
                 (/root/reference/code/graph/storage_edges.py:160-253).
                 Also per-row, no shuffle.
- ``same_tool``  turn_i -> turn_j for i<j within one conversation sharing a
                 tool.  Analog of the reference's set->get indirect edges
                 (/root/reference/code/features/utils.py:417-426) — a
                 per-partition self-join, expressed as
                 ``groupby(conv_id).map_groups`` over the narrow
                 (conv_id, turn_idx, tool, ts) projection.  This is the only
                 rule that shuffles, and it shuffles a projection with NO
                 text payload (SURVEY.md §7).

Vertex keys (FIXTURES.md §2): turn ``"{conv_id}#{turn_idx}"``, tool
``"tool:{name}"``.  ``weight`` is multiplicity after exact dedup by
``(src, dst, edge_type)`` — the reference drops parallel edges last-wins
(/root/reference/code/graph/graph_builder.py:66); we keep the count instead
(the ``groupby(['src','dst']).apply(len)`` idiom,
/root/reference/code/features/utils.py:424).  With the default rules every
derived edge is already unique, so dedup is a no-op kept for custom rules.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from webgraph_ray.functions.hashing import hash_keys
from webgraph_ray.schemas import EDGES

DEFAULT_RULES = ("reply", "tool_call", "same_tool")


def turn_keys(conv_id: pa.Array, turn_idx: pa.Array) -> pa.Array:
    """Vectorized ``"{conv_id}#{turn_idx}"`` composite keys — the analog of
    the reference's cookie composite key ``name|$$|domain``
    (/root/reference/code/graph/utils.py:6-21)."""
    return pc.binary_join_element_wise(
        conv_id, pc.cast(turn_idx, pa.string()), "#"
    )


def _edges_table(
    src_key: pa.Array,
    dst_key: pa.Array,
    edge_type: str,
    conv_id: pa.Array,
    ts: pa.Array,
    weight: pa.Array | None = None,
) -> pa.Table:
    n = len(src_key)
    if weight is None:
        weight = pa.array(np.ones(n, dtype=np.int64))
    src = pa.array(hash_keys(src_key.to_numpy(zero_copy_only=False)))
    dst = pa.array(hash_keys(dst_key.to_numpy(zero_copy_only=False)))
    return pa.table(
        {
            "src": src,
            "dst": dst,
            "src_key": src_key,
            "dst_key": dst_key,
            "edge_type": pa.array([edge_type] * n, pa.string()),
            "weight": weight,
            "conv_id": conv_id,
            "ts": ts,
        },
        schema=EDGES,
    )


def reply_edges_batch(batch: pa.Table) -> pa.Table:
    """Per-row: every turn with turn_idx >= 1 emits (prev turn -> this turn)."""
    mask = pc.greater_equal(batch["turn_idx"], 1)
    b = batch.filter(mask)
    prev_idx = pc.subtract(b["turn_idx"], 1)
    src_key = turn_keys(b["conv_id"], prev_idx)
    dst_key = turn_keys(b["conv_id"], b["turn_idx"])
    return _edges_table(src_key, dst_key, "reply", b["conv_id"], b["ts"])


def tool_call_edges_batch(batch: pa.Table) -> pa.Table:
    """Per-row: turn -> tool vertex for tool turns."""
    b = batch.filter(pc.is_valid(batch["tool"]))
    src_key = turn_keys(b["conv_id"], b["turn_idx"])
    dst_key = pc.binary_join_element_wise("tool:", b["tool"], "")
    return _edges_table(src_key, dst_key, "tool_call", b["conv_id"], b["ts"])


def same_tool_edges_group(g: pd.DataFrame, max_turns: int | None = None) -> pa.Table:
    """Earlier tool turn -> later turn sharing the same tool, within each
    conversation.  Called per conversation-hash BUCKET (not per
    conversation) so the Ray per-group overhead is O(num_buckets); the
    in-bucket self-join groups on (conv_id, tool) in one vectorized
    merge.

    ``max_turns`` guards pathological conversations: the rule is quadratic
    in per-(conv, tool) turn count BY DEFINITION, so when set, only each
    (conv, tool)'s first ``max_turns`` tool turns participate (<=
    max_turns^2/2 pairs per group).  Default None = exact semantics (the
    oracle's)."""
    t = g[g["tool"].notna()][["conv_id", "turn_idx", "tool", "ts"]]
    if len(t) < 2:
        return _EMPTY_EDGES
    if max_turns is not None:
        t = (
            t.sort_values(["conv_id", "tool", "turn_idx"], kind="mergesort")
            .groupby(["conv_id", "tool"], sort=False)
            .head(max_turns)
        )
    m = t.merge(t, on=["conv_id", "tool"], suffixes=("_a", "_b"))
    m = m[m["turn_idx_a"] < m["turn_idx_b"]]
    if len(m) == 0:
        return _EMPTY_EDGES
    conv = m["conv_id"].to_numpy(dtype=object)
    conv_arr = pa.array(conv, pa.string())
    # C-path composite keys (Arrow binary_join), not a per-row f-string loop
    src_key = turn_keys(
        conv_arr, pa.array(m["turn_idx_a"].to_numpy(np.int64))
    ).to_numpy(zero_copy_only=False)
    dst_key = turn_keys(
        conv_arr, pa.array(m["turn_idx_b"].to_numpy(np.int64))
    ).to_numpy(zero_copy_only=False)
    n = len(m)
    return pa.table(
        {
            "src": pa.array(hash_keys(src_key)),
            "dst": pa.array(hash_keys(dst_key)),
            "src_key": pa.array(src_key, pa.string()),
            "dst_key": pa.array(dst_key, pa.string()),
            "edge_type": pa.array(["same_tool"] * n, pa.string()),
            "weight": pa.array(np.ones(n, dtype=np.int64)),
            "conv_id": pa.array(conv, pa.string()),
            "ts": pa.Array.from_pandas(m["ts_b"]).cast(pa.timestamp("us")),
        },
        schema=EDGES,
    )


_EMPTY_EDGES = pa.table(
    {f.name: pa.array([], f.type) for f in EDGES}, schema=EDGES
)


def derive_edges(
    transcripts: ray.data.Dataset,
    rules: Iterable[str] = DEFAULT_RULES,
    same_tool_max_turns: int | None = None,
) -> ray.data.Dataset:
    """transcripts Dataset -> edges Dataset (lazy; union of per-rule streams).

    reply/tool_call are shuffle-free ``map_batches`` over zero-copy Arrow
    batches.  same_tool groups the narrow projection by conv_id;
    ``same_tool_max_turns`` caps its inherent quadratic fan-out per
    (conversation, tool) for hostile inputs (None = exact).
    """
    rules = tuple(rules)
    if not rules:
        raise ValueError("derive_edges needs at least one rule")
    if len(set(rules)) != len(rules):
        raise ValueError(f"duplicate rule names in {rules!r}")
    shadowed = set(EXTRA_RULES) & set(DEFAULT_RULES)
    if shadowed:
        raise ValueError(
            f"EXTRA_RULES must not shadow built-in rules: {sorted(shadowed)!r}"
        )
    unknown = set(rules) - set(DEFAULT_RULES) - set(EXTRA_RULES)
    if unknown:
        raise ValueError(
            f"unknown edge rules {sorted(unknown)!r}; known: "
            f"{DEFAULT_RULES + tuple(EXTRA_RULES)}"
        )
    # prune to the derivation columns before any work: the wide `text`
    # payload never enters an edge (SURVEY.md §7).  Materialized once so
    # the three rule branches don't re-execute the upstream transcript
    # derivation (the narrow projection is small; the object store spills
    # it if needed).
    narrow = transcripts.select_columns(
        ["conv_id", "turn_idx", "tool", "ts"]
    ).materialize()
    parts = []
    if "reply" in rules:
        parts.append(
            narrow.map_batches(
                reply_edges_batch, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    if "tool_call" in rules:
        parts.append(
            narrow.map_batches(
                tool_call_edges_batch, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    if "same_tool" in rules:
        # bucket conversations so the grouped self-join runs per hash
        # bucket, not per conversation (O(buckets) python-group overhead)
        def add_bucket(t: pa.Table) -> pa.Table:
            conv = t["conv_id"].to_numpy(zero_copy_only=False)
            b = (hash_keys(conv) % 64).astype(np.int32)
            return t.append_column("conv_bucket", pa.array(b))

        def same_tool_group(g: pd.DataFrame) -> pa.Table:
            return same_tool_edges_group(g, max_turns=same_tool_max_turns)

        parts.append(
            narrow.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("conv_bucket")
            .map_groups(same_tool_group, batch_format="pandas")
        )
    for name in rules:
        if name in EXTRA_RULES:
            # custom rule contract: fn(narrow_transcripts_ds) -> edges
            # Dataset with the EDGES schema
            parts.append(EXTRA_RULES[name](narrow))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    # The union of three rule streams yields many small blocks; downstream
    # shuffles (groupby/sort) pay per-block overhead, so coalesce to a few
    # blocks per CPU (metadata-only repartition, no row movement).
    target = max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))
    return out.repartition(target)


# Custom-rule extension point: EXTRA_RULES[name] = fn where
# fn(narrow_transcripts: ray.data.Dataset) -> edges Dataset (EDGES schema);
# the narrow input has columns (conv_id, turn_idx, tool, ts).  Registered
# names become valid entries for derive_edges(rules=...).
EXTRA_RULES: dict[str, Callable] = {}
