"""Transcript table sources.

Two deterministic sources of the mandated input shape
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json ``input_hint``):

1. ``transcripts_from_events`` — derives a transcript table from the driver's
   synthetic ``events`` table with a mapping that is *exactly mirrored* by
   ``TRANSCRIPTS_FROM_EVENTS_SQL`` (DuckDB), so the driver's oracle can verify
   per-turn text equality under stable turn ordering end-to-end.

2. ``generate_transcripts`` — a seeded synthetic generator with Zipf-skewed
   conversation lengths and tool usage (hub vertices), used for unit tests
   and the bench harness at arbitrary scale (FIXTURES.md §1). Rows are
   emitted shuffled across blocks to prove derivation does not depend on
   block arrival order.

The derivation is the analog of the reference turning OpenWPM SQLite event
logs into per-visit graph tables (/root/reference/code/graph/database.py:29-75,
/root/reference/code/run.py:123-167) — one columnar scan + window ordering
instead of per-visit point queries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from webgraph_ray.schemas import TRANSCRIPTS

# Event types that represent tool invocations (the other types — view,
# signup — become plain user/assistant turns). Three shared tools across all
# conversations -> deliberate hub vertices (FIXTURES.md §5 "Skew").
TOOL_EVENT_TYPES = ("click", "purchase", "error")

# DuckDB mirror of `_events_batch_to_transcripts`. Keep the two in lockstep:
# any change here must change the Python below identically (tests compare
# them row-for-row).
TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
    printf('conv_%05d', user_id)                         AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS INTEGER)                                     AS turn_idx,
    CASE WHEN event_type IN ('click','purchase','error') THEN 'tool'
         WHEN (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) % 2 = 0
         THEN 'user' ELSE 'assistant' END                AS role,
    't:' || printf('conv_%05d', user_id) || ':' ||
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
             AS VARCHAR) || ':' || props                 AS text,
    CASE WHEN event_type IN ('click','purchase','error') THEN event_type
         ELSE NULL END                                   AS tool,
    ts                                                   AS ts
FROM events
"""


def _events_to_transcripts_pandas(df: pd.DataFrame) -> pd.DataFrame:
    """Window derivation over a group of events that is complete per user_id."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    turn_idx = df.groupby("user_id", sort=False).cumcount().astype("int32")
    conv_id = "conv_" + df["user_id"].astype(int).astype(str).str.zfill(5)
    is_tool = df["event_type"].isin(TOOL_EVENT_TYPES)
    tool = df["event_type"].where(is_tool, None)
    role = np.where(
        is_tool, "tool", np.where(turn_idx % 2 == 0, "user", "assistant")
    )
    text = "t:" + conv_id + ":" + turn_idx.astype(str) + ":" + df["props"]
    out = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": df["ts"],
        }
    )
    return out


def transcripts_from_events(events_path: str) -> ray.data.Dataset:
    """events parquet -> transcripts Dataset.

    The window (row_number per user) needs all of a user's events together:
    one ``groupby('user_id').map_groups`` — a single hash shuffle of the
    narrow events projection. At 100 TB this is the only shuffle of the
    derivation stage and it moves only (event_id, ts, user_id, event_type,
    props).
    """
    ds = ray.data.read_parquet(
        events_path, columns=["event_id", "ts", "user_id", "event_type", "props"]
    )
    return ds.groupby("user_id").map_groups(
        _events_to_transcripts_pandas, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Seeded synthetic generator (FIXTURES.md §1)
# ---------------------------------------------------------------------------

_TOOL_VOCAB = [
    "search", "python", "browser", "calculator", "sql", "bash", "email",
    "calendar", "maps", "weather", "translate", "files",
]
_ROLES = ["user", "assistant"]
_EPOCH_US = np.int64(1_700_000_000_000_000)  # fixed base timestamp


def _gen_block(block_id: int, conv_ids: np.ndarray, seed: int) -> pa.Table:
    """Deterministically generate all turns for a set of conversations."""
    rng = np.random.default_rng(seed * 1_000_003 + block_id)
    # Zipf-skewed conversation lengths in [2, 400]
    lengths = np.minimum(2 + rng.zipf(1.6, size=len(conv_ids)), 400)
    total = int(lengths.sum())
    conv_rep = np.repeat(conv_ids, lengths)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lengths])
    # Zipf-skewed tool choice; ~35% of turns call a tool
    has_tool = rng.random(total) < 0.35
    tool_ix = np.minimum(rng.zipf(1.8, size=total) - 1, len(_TOOL_VOCAB) - 1)
    # strictly increasing ts within conv, ties across convs allowed
    ts = (
        _EPOCH_US
        + conv_rep.astype(np.int64) * 7_919
        + turn_idx.astype(np.int64) * 1_000_000
        + rng.integers(0, 1000, size=total)
    )
    conv_str = np.array([f"conv_{c:07d}" for c in conv_ids], dtype=object)[
        np.repeat(np.arange(len(conv_ids)), lengths)
    ]
    tool = np.where(
        has_tool, np.array(_TOOL_VOCAB, dtype=object)[tool_ix], None
    )
    role = np.where(
        has_tool, "tool", np.where(turn_idx % 2 == 0, "user", "assistant")
    )
    payload = rng.integers(0, 1 << 30, size=total)
    text = np.array(
        [
            f"t:{c}:{t}:{p}"
            for c, t, p in zip(conv_str, turn_idx.tolist(), payload.tolist())
        ],
        dtype=object,
    )
    tbl = pa.table(
        {
            "conv_id": pa.array(conv_str, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    # shuffle rows within the block so downstream never sees sorted input
    perm = rng.permutation(total)
    return tbl.take(perm)


def generate_transcripts(
    num_convs: int, seed: int = 42, num_blocks: int | None = None
) -> ray.data.Dataset:
    """Seeded synthetic transcripts as a Ray Dataset.

    Generation is distributed: conversation ids are split round-robin across
    blocks and each block generates its convs independently (same seed =>
    byte-identical content regardless of parallelism).
    """
    if num_blocks is None:
        num_blocks = max(1, min(64, num_convs // 64))
    assignments = [
        (b, np.arange(b, num_convs, num_blocks, dtype=np.int64))
        for b in range(num_blocks)
    ]
    ds = ray.data.from_items(
        [{"block_id": b, "lo": int(c.min()), "hi": int(c.max())} for b, c in assignments]
    )

    def expand(batch: pd.DataFrame) -> pa.Table:
        tables = [
            _gen_block(
                int(row.block_id),
                np.arange(int(row.block_id), num_convs, num_blocks, dtype=np.int64),
                seed,
            )
            for row in batch.itertuples()
        ]
        return pa.concat_tables(tables)

    return ds.map_batches(expand, batch_format="pandas", batch_size=1)


def generate_transcripts_table(num_convs: int, seed: int = 42) -> pa.Table:
    """Driver-side (no Ray) generation for small unit-test fixtures."""
    tables = []
    num_blocks = max(1, min(64, num_convs // 64))
    for b in range(num_blocks):
        conv_ids = np.arange(b, num_convs, num_blocks, dtype=np.int64)
        tables.append(_gen_block(b, conv_ids, seed))
    out = pa.concat_tables(tables)
    assert out.schema.equals(TRANSCRIPTS), out.schema
    return out
