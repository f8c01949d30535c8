"""Driver contract for the Ray-Data link-graph engine.

``queries()`` exposes each implemented operator/pipeline (SURVEY.md §2) as a
callable over an ``sf_dir``; ``oracle_sql()`` gives the DuckDB-equivalent
SQL over the same parquet tables for every SQL-expressible query.  The
transcript table itself is derived deterministically from the ``events``
table (webgraph_ray/sources/transcripts.py) so the oracle can reproduce the
whole chain — per-turn text equality under stable turn ordering included.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from webgraph_ray.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    transcripts_from_events,
)
from webgraph_ray.stages.edges import derive_edges
from webgraph_ray.stages.vertices import derive_vertices, degrees
from webgraph_ray.graph.triangles import triangle_counts
from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.functions.joins import bucketed_join
from webgraph_ray.pipelines.flagship import attach_keys, run_flagship


# ---------------------------------------------------------------------------
# Shared SQL fragments (exact mirrors of the Ray derivations)
# ---------------------------------------------------------------------------

_EDGES_SQL = """
  SELECT conv_id || '#' || CAST(turn_idx - 1 AS VARCHAR) AS src_key,
         conv_id || '#' || CAST(turn_idx AS VARCHAR)     AS dst_key,
         'reply' AS edge_type, CAST(1 AS BIGINT) AS weight, conv_id, ts
    FROM transcripts WHERE turn_idx >= 1
  UNION ALL
  SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR),
         'tool:' || tool, 'tool_call', CAST(1 AS BIGINT), conv_id, ts
    FROM transcripts WHERE tool IS NOT NULL
  UNION ALL
  SELECT a.conv_id || '#' || CAST(a.turn_idx AS VARCHAR),
         b.conv_id || '#' || CAST(b.turn_idx AS VARCHAR),
         'same_tool', CAST(1 AS BIGINT), a.conv_id, b.ts
    FROM transcripts a JOIN transcripts b
      ON a.conv_id = b.conv_id AND a.tool = b.tool AND a.turn_idx < b.turn_idx
"""

_CTE = (
    "WITH transcripts AS (" + TRANSCRIPTS_FROM_EVENTS_SQL + "),\n"
    "edges AS (" + _EDGES_SQL + ")\n"
)

_UND_TRI_CTE = (
    _CTE
    + """
, und AS (
    SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b
    FROM edges WHERE src_key <> dst_key
), tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM und e1
    JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
"""
)


# ---------------------------------------------------------------------------
# Query implementations (Ray side)
# ---------------------------------------------------------------------------


def _transcripts(sf_dir: str):
    return transcripts_from_events(os.path.join(sf_dir, "events.parquet"))


# Materialized per-sf caches: the driver calls many queries() entries against
# the same sf_dir in one process; edge derivation is identical across them.
_CACHE: dict[tuple[str, str], Any] = {}


def _edges(sf_dir: str):
    key = (sf_dir, "edges")
    if key not in _CACHE:
        _CACHE[key] = derive_edges(_transcripts(sf_dir)).materialize()
    return _CACHE[key]


def _vertices(sf_dir: str):
    key = (sf_dir, "vertices")
    if key not in _CACHE:
        _CACHE[key] = derive_vertices(_edges(sf_dir)).materialize()
    return _CACHE[key]


def q_transcripts(sf_dir: str):
    return _transcripts(sf_dir)


def q_edges(sf_dir: str):
    return _edges(sf_dir).select_columns(
        ["src_key", "dst_key", "edge_type", "weight", "conv_id", "ts"]
    )


def q_degrees(sf_dir: str):
    return degrees(_edges(sf_dir))


def q_vertices(sf_dir: str):
    return _vertices(sf_dir).select_columns(
        ["vertex_key", "vertex_type", "conv_id", "first_ts"]
    )


def q_first_tool_use(sf_dir: str):
    t = _transcripts(sf_dir)
    tools = t.map_batches(
        lambda b: b.filter(pa.compute.is_valid(b["tool"])),
        batch_format="pyarrow",
    ).select_columns(["conv_id", "tool", "turn_idx", "ts"])
    out = tools.groupby(["conv_id", "tool"]).aggregate(
        Min("turn_idx", alias_name="first_turn_idx"),
        Min("ts", alias_name="first_ts"),
    )

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df["first_turn_idx"] = df["first_turn_idx"].astype("int32")
        return df

    return out.map_batches(cast, batch_format="pandas")


def q_conv_stats(sf_dir: str):
    t = _transcripts(sf_dir).select_columns(["conv_id", "tool", "ts"])

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": [g["conv_id"].iloc[0]],
                "n_turns": np.int64(len(g)),
                "n_tool_turns": np.int64(g["tool"].notna().sum()),
                "n_tools": np.int64(g["tool"].dropna().nunique()),
                "first_ts": [g["ts"].min()],
                "last_ts": [g["ts"].max()],
            }
        )

    return t.groupby("conv_id").map_groups(per_conv, batch_format="pandas")


def q_edge_type_counts(sf_dir: str):
    e = _edges(sf_dir).select_columns(["src_key", "dst_key", "edge_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = (
            df.groupby(["src_key", "edge_type"], sort=False)
            .size()
            .unstack(fill_value=0)
            .rename(columns=lambda c: f"{c}_out")
        )
        ins = (
            df.groupby(["dst_key", "edge_type"], sort=False)
            .size()
            .unstack(fill_value=0)
            .rename(columns=lambda c: f"{c}_in")
        )
        cols = [
            "reply_in", "reply_out", "tool_call_in", "tool_call_out",
            "same_tool_in", "same_tool_out",
        ]
        merged = outs.join(ins, how="outer").fillna(0).astype(np.int64)
        merged = merged.reindex(columns=cols, fill_value=0)
        merged.index.name = "vertex_key"
        return merged.reset_index()

    partials = e.map_batches(partial, batch_format="pandas")
    return partials.groupby("vertex_key").aggregate(
        Sum("reply_in", alias_name="reply_in"),
        Sum("reply_out", alias_name="reply_out"),
        Sum("tool_call_in", alias_name="tool_call_in"),
        Sum("tool_call_out", alias_name="tool_call_out"),
        Sum("same_tool_in", alias_name="same_tool_in"),
        Sum("same_tool_out", alias_name="same_tool_out"),
    )


def _triangles(sf_dir: str):
    key = (sf_dir, "triangles")
    if key not in _CACHE:
        total, per_vertex = triangle_counts(_edges(sf_dir))
        _CACHE[key] = (total, per_vertex.materialize())
    return _CACHE[key]


def q_triangle_total(sf_dir: str):
    total, _ = _triangles(sf_dir)
    return pa.table({"total_triangles": pa.array([total], pa.int64())})


def q_triangles_per_vertex(sf_dir: str):
    _, per_vertex = _triangles(sf_dir)
    joined = attach_keys(per_vertex, _vertices(sf_dir))
    return joined.select_columns(["vertex_key", "triangles"])


def _engine_run(sf_dir: str, algo: str):
    import tempfile

    edges = _edges(sf_dir)
    vertices = _vertices(sf_dir)
    work = tempfile.mkdtemp(prefix=f"webgraph_{algo}_")
    eng = GraphEngine(os.path.join(work, algo), num_parts=None)
    try:
        if algo == "pagerank":
            eng.build(edges, symmetrize=False)
            res = eng.pagerank(tol=1e-6)
            out = attach_keys(res, vertices).select_columns(["vertex_key", "score"])
        elif algo == "components":
            eng.build(edges, symmetrize=True)
            res = eng.components()
            out = attach_keys(res, vertices).select_columns(
                ["vertex_key", "component"]
            )
        else:  # labelprop seeded on tool vertices
            eng.build(edges, symmetrize=True)
            seeds = (
                vertices.to_pandas()
                .query("vertex_type == 'tool'")["vertex_id"]
                .to_numpy()
            )
            res = eng.labelprop(seeds=seeds)
            out = attach_keys(res, vertices).select_columns(["vertex_key", "label"])
        return out.to_pandas()
    finally:
        eng.shutdown()


def q_pagerank(sf_dir: str):
    return _engine_run(sf_dir, "pagerank")


def q_components(sf_dir: str):
    return _engine_run(sf_dir, "components")


def q_labelprop(sf_dir: str):
    return _engine_run(sf_dir, "labelprop")


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001 (driver smoke check)."""
    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "transcripts": q_transcripts,
        "edges": q_edges,
        "degrees": q_degrees,
        "vertices": q_vertices,
        "first_tool_use": q_first_tool_use,
        "conv_stats": q_conv_stats,
        "edge_type_counts": q_edge_type_counts,
        "triangle_total": q_triangle_total,
        "triangles_per_vertex": q_triangles_per_vertex,
        "pagerank": q_pagerank,
        "components": q_components,
        "labelprop": q_labelprop,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": TRANSCRIPTS_FROM_EVENTS_SQL,
        "edges": _CTE
        + "SELECT src_key, dst_key, edge_type, weight, conv_id, ts FROM edges",
        "degrees": _CTE
        + """
        SELECT vertex_key,
               CAST(count(*) FILTER (WHERE side = 'in') AS BIGINT)  AS in_degree,
               CAST(count(*) FILTER (WHERE side = 'out') AS BIGINT) AS out_degree
        FROM (
            SELECT src_key AS vertex_key, 'out' AS side FROM edges
            UNION ALL
            SELECT dst_key, 'in' FROM edges
        ) GROUP BY vertex_key
        """,
        "vertices": _CTE
        + """
        SELECT vertex_key,
               CASE WHEN vertex_key LIKE 'tool:%' THEN 'tool' ELSE 'turn' END AS vertex_type,
               CASE WHEN vertex_key LIKE 'tool:%' THEN NULL
                    ELSE regexp_replace(vertex_key, '#.*$', '') END AS conv_id,
               min(ts) AS first_ts
        FROM (
            SELECT src_key AS vertex_key, ts FROM edges
            UNION ALL
            SELECT dst_key, ts FROM edges
        ) GROUP BY 1
        """,
        "first_tool_use": "WITH transcripts AS ("
        + TRANSCRIPTS_FROM_EVENTS_SQL
        + """)
        SELECT conv_id, tool,
               min(turn_idx) AS first_turn_idx,
               min(ts) AS first_ts
        FROM transcripts WHERE tool IS NOT NULL
        GROUP BY conv_id, tool
        """,
        "conv_stats": "WITH transcripts AS ("
        + TRANSCRIPTS_FROM_EVENTS_SQL
        + """)
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(count(tool) AS BIGINT) AS n_tool_turns,
               CAST(count(DISTINCT tool) AS BIGINT) AS n_tools,
               min(ts) AS first_ts,
               max(ts) AS last_ts
        FROM transcripts GROUP BY conv_id
        """,
        "edge_type_counts": _CTE
        + """
        SELECT vertex_key,
            CAST(count(*) FILTER (WHERE side='in'  AND edge_type='reply') AS BIGINT) AS reply_in,
            CAST(count(*) FILTER (WHERE side='out' AND edge_type='reply') AS BIGINT) AS reply_out,
            CAST(count(*) FILTER (WHERE side='in'  AND edge_type='tool_call') AS BIGINT) AS tool_call_in,
            CAST(count(*) FILTER (WHERE side='out' AND edge_type='tool_call') AS BIGINT) AS tool_call_out,
            CAST(count(*) FILTER (WHERE side='in'  AND edge_type='same_tool') AS BIGINT) AS same_tool_in,
            CAST(count(*) FILTER (WHERE side='out' AND edge_type='same_tool') AS BIGINT) AS same_tool_out
        FROM (
            SELECT src_key AS vertex_key, 'out' AS side, edge_type FROM edges
            UNION ALL
            SELECT dst_key, 'in', edge_type FROM edges
        ) GROUP BY vertex_key
        """,
        "triangle_total": _UND_TRI_CTE
        + "SELECT CAST(count(*) AS BIGINT) AS total_triangles FROM tri",
        "triangles_per_vertex": _UND_TRI_CTE
        + """
        SELECT vertex_key, CAST(count(*) AS BIGINT) AS triangles
        FROM (
            SELECT x AS vertex_key FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY vertex_key
        """,
        # pagerank / components / labelprop: iterative & non-SQL-expressible;
        # verified against the networkx/numpy oracle in tests/ instead.
    }
