"""Explicit Arrow schemas for every table the engine reads or writes.

The reference keeps schemas implicit in pandas column lists and enforces
them only at CSV export via ``df.reindex(columns=...)``
(/root/reference/code/run.py:192,205,216, /root/reference/code/features.yaml:21-44).
We instead declare ``pyarrow.Schema`` constants and validate against them in
tests; nested data uses real Arrow types, never JSON-in-string
(cf. /root/reference/code/graph/request_edges.py:20-21).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: transcripts (BASELINE.json input_hint — exact shape mandated)
# ---------------------------------------------------------------------------
TRANSCRIPTS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),  # nullable: null for non-tool turns
        pa.field("ts", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------------------
# Derived: edge table (FIXTURES.md §2; analog of the reference edge rows,
# /root/reference/README.md:122-129 with action -> edge_type)
# ---------------------------------------------------------------------------
EDGE_TYPES = ("reply", "tool_call", "same_tool")

EDGES = pa.schema(
    [
        pa.field("src", pa.int64()),
        pa.field("dst", pa.int64()),
        pa.field("src_key", pa.string()),
        pa.field("dst_key", pa.string()),
        pa.field("edge_type", pa.string()),
        pa.field("weight", pa.int64()),
        pa.field("conv_id", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Narrow projection used on every shuffle path (text payloads never shuffle —
# SURVEY.md §7 "keep wide text payloads out of shuffle paths").
EDGES_NARROW = pa.schema(
    [
        pa.field("src", pa.int64()),
        pa.field("dst", pa.int64()),
        pa.field("weight", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# Derived: vertex table (FIXTURES.md §3; analog of reference node rows,
# /root/reference/README.md:107-121)
# ---------------------------------------------------------------------------
VERTEX_TYPES = ("turn", "tool", "conv")

VERTICES = pa.schema(
    [
        pa.field("vertex_id", pa.int64()),
        pa.field("vertex_key", pa.string()),
        pa.field("vertex_type", pa.string()),
        pa.field("conv_id", pa.string()),  # nullable (null for tool vertices)
        pa.field("first_ts", pa.timestamp("us")),  # arg-min by ts: first-setter
        # analog, /root/reference/code/graph/utils.py:46-75
    ]
)

# ---------------------------------------------------------------------------
# Algorithm outputs
# ---------------------------------------------------------------------------
PAGERANK = pa.schema(
    [pa.field("vertex_id", pa.int64()), pa.field("score", pa.float64())]
)
COMPONENTS = pa.schema(
    [pa.field("vertex_id", pa.int64()), pa.field("component", pa.int64())]
)
LABELS = pa.schema(
    [pa.field("vertex_id", pa.int64()), pa.field("label", pa.int64())]
)
TRIANGLES = pa.schema(
    [pa.field("vertex_id", pa.int64()), pa.field("triangles", pa.int64())]
)
DEGREES = pa.schema(
    [
        pa.field("vertex_key", pa.string()),
        pa.field("in_degree", pa.int64()),
        pa.field("out_degree", pa.int64()),
    ]
)
