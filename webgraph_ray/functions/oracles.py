"""DuckDB oracle-SQL generators for the iterative graph algorithms.

The driver's correctness gate compares each Ray query against ANSI SQL run
by DuckDB on the same parquet tables.  Iterative algorithms are made
SQL-checkable by construction:

- **PageRank** runs in exact int64 fixed-point arithmetic
  (``GraphEngine.pagerank_fixed``), so a fixed number of unrolled
  join+groupby CTE iterations in BIGINT reproduces it bit-exactly — no
  float-hash fragility.
- **Connected components** labels each vertex with the lexicographically
  smallest vertex key of its component; the SQL mirror is min-label
  propagation accelerated by pointer doubling (``lbl <- lbl(lbl)``), which
  converges in O(log diameter) unrolled rounds.
- **Label propagation** freezes seeds, so a non-seed vertex converges to
  the minimum seed label among seeds adjacent to its component of the
  *seed-removed* subgraph (labels never relay through a frozen seed);
  the SQL mirror is components-of-the-non-seed-subgraph plus a boundary
  min.

All three must match the constants used by the Ray queries
(``PR_FP_ITERS``, ``PR_FP_SCALE``, ``CC_ROUNDS`` below).

The reference has no SQL surface; its per-visit networkx metrics
(/root/reference/code/features/structure.py:129-177) are the capability
these algorithms replace at scale (SURVEY.md §2.6).
"""

from __future__ import annotations

# Fixed-point PageRank: iteration count and mass scale (1 unit = 1/SCALE).
PR_FP_ITERS = 25
PR_FP_SCALE = 10**12

# Pointer-doubling rounds: reach doubles per round, so 16 rounds cover any
# component diameter up to ~2^16 propagation hops.
CC_ROUNDS = 16


def pagerank_fp_ctes(iters: int = PR_FP_ITERS, scale: int = PR_FP_SCALE) -> str:
    """CTE chain (assumes an ``edges`` CTE with src_key/dst_key/weight is in
    scope) ending in ``pr{iters}`` with columns (vertex_key, val)."""
    parts = [
        f"""
, pr_verts AS MATERIALIZED (
    SELECT DISTINCT vertex_key FROM (
        SELECT src_key AS vertex_key FROM edges
        UNION ALL SELECT dst_key FROM edges
    )
), pr_outdeg AS MATERIALIZED (
    SELECT src_key, CAST(sum(weight) AS BIGINT) AS outw FROM edges GROUP BY 1
), pr_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pr_verts)
, pr0 AS MATERIALIZED (
    SELECT v.vertex_key, {scale} // n.n AS val FROM pr_verts v CROSS JOIN pr_n n
)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
, pr_agg{i} AS MATERIALIZED (
    SELECT e.dst_key AS vertex_key,
           sum(((s.val // o.outw) * e.weight * 17) // 20) AS agg
    FROM edges e
    JOIN pr{p} s ON s.vertex_key = e.src_key
    JOIN pr_outdeg o ON o.src_key = e.src_key
    GROUP BY 1
), pr_dang{i} AS MATERIALIZED (
    SELECT coalesce(sum(s.val), 0) AS d
    FROM pr{p} s LEFT JOIN pr_outdeg o ON o.src_key = s.vertex_key
    WHERE o.src_key IS NULL
), pr{i} AS MATERIALIZED (
    SELECT v.vertex_key,
           (3 * {scale}) // (20 * n.n)
           + coalesce(a.agg, 0)
           + (17 * g.d) // (20 * n.n) AS val
    FROM pr_verts v CROSS JOIN pr_n n CROSS JOIN pr_dang{i} g
    LEFT JOIN pr_agg{i} a ON a.vertex_key = v.vertex_key
)"""
        )
    return "".join(parts)


def pagerank_fp_sql(base_cte: str) -> str:
    """Full oracle: (vertex_key, score_fp) after PR_FP_ITERS iterations."""
    return (
        base_cte
        + pagerank_fp_ctes()
        + f"\nSELECT vertex_key, CAST(val AS BIGINT) AS score_fp FROM pr{PR_FP_ITERS}"
    )


def _doubling_rounds(prefix: str, und: str, verts: str, rounds: int) -> str:
    """Min-label propagation + pointer doubling over ``und(a, b)`` edges and
    ``verts(vertex_key)``; ends in ``{prefix}{rounds}`` (vertex_key, lbl)."""
    parts = [
        f"""
, {prefix}0 AS MATERIALIZED (SELECT vertex_key, vertex_key AS lbl FROM {verts})"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""
, {prefix}p{i} AS MATERIALIZED (
    SELECT vertex_key, min(lbl) AS lbl FROM (
        SELECT vertex_key, lbl FROM {prefix}{p}
        UNION ALL
        SELECT u.b AS vertex_key, c.lbl FROM {und} u
        JOIN {prefix}{p} c ON c.vertex_key = u.a
    ) GROUP BY 1
), {prefix}{i} AS MATERIALIZED (
    SELECT p.vertex_key, q.lbl
    FROM {prefix}p{i} p JOIN {prefix}p{i} q ON q.vertex_key = p.lbl
)"""
        )
    return "".join(parts)


def components_ctes(rounds: int = CC_ROUNDS) -> str:
    """CTE chain ending in ``cc{rounds}`` (vertex_key, lbl = min key in
    component); assumes an ``edges`` CTE in scope."""
    return (
        """
, cc_und AS MATERIALIZED (
    SELECT src_key AS a, dst_key AS b FROM edges
    UNION ALL SELECT dst_key, src_key FROM edges
), cc_verts AS MATERIALIZED (SELECT DISTINCT a AS vertex_key FROM cc_und)"""
        + _doubling_rounds("cc", "cc_und", "cc_verts", rounds)
    )


def components_sql(base_cte: str, rounds: int = CC_ROUNDS) -> str:
    """Full oracle: (vertex_key, component_key = min key in component)."""
    return (
        base_cte
        + components_ctes(rounds)
        + f"\nSELECT vertex_key, lbl AS component_key FROM cc{rounds}"
    )


def labelprop_sql(base_cte: str, rounds: int = CC_ROUNDS) -> str:
    """Full oracle: (vertex_key, label) with seeds = tool vertices labeled
    by rank of their key in sorted order; unlabeled vertices get -1."""
    return (
        base_cte
        + """
, lp_und AS MATERIALIZED (
    SELECT src_key AS a, dst_key AS b FROM edges
    UNION ALL SELECT dst_key, src_key FROM edges
), lp_verts AS MATERIALIZED (SELECT DISTINCT a AS vertex_key FROM lp_und)
, lp_seeds AS MATERIALIZED (
    SELECT vertex_key,
           CAST(row_number() OVER (ORDER BY vertex_key) - 1 AS BIGINT) AS rank
    FROM lp_verts WHERE vertex_key LIKE 'tool:%'
), lp_nsund AS MATERIALIZED (
    SELECT a, b FROM lp_und
    WHERE a NOT LIKE 'tool:%' AND b NOT LIKE 'tool:%'
), lp_nsverts AS MATERIALIZED (
    SELECT vertex_key FROM lp_verts WHERE vertex_key NOT LIKE 'tool:%'
)"""
        + _doubling_rounds("lp", "lp_nsund", "lp_nsverts", rounds)
        + f"""
, lp_bnd AS (
    SELECT u.b AS vertex_key, s.rank FROM lp_und u
    JOIN lp_seeds s ON u.a = s.vertex_key
    WHERE u.b NOT LIKE 'tool:%'
), lp_comp AS (
    SELECT c.lbl AS comp, min(b.rank) AS rank
    FROM lp{rounds} c JOIN lp_bnd b ON b.vertex_key = c.vertex_key
    GROUP BY 1
)
SELECT vertex_key, label FROM (
    SELECT s.vertex_key, s.rank AS label FROM lp_seeds s
    UNION ALL
    SELECT c.vertex_key, coalesce(cl.rank, -1) AS label
    FROM lp{rounds} c LEFT JOIN lp_comp cl ON cl.comp = c.lbl
)"""
    )


def vertex_features_ctes(base_cte: str) -> str:
    """CTE chain ending in ``vf_final`` = the wide per-vertex feature table
    (webgraph_ray/pipelines/vertex_features.py): degrees + typed edge
    counts + chain depth + rule label + triangles + fixed-point PageRank +
    component, one row per vertex."""
    return (
        base_cte
        + pagerank_fp_ctes()
        + components_ctes()
        + f"""
, vf_deg AS MATERIALIZED (
    SELECT vertex_key,
           CAST(count(*) FILTER (WHERE side = 'in') AS BIGINT)  AS in_degree,
           CAST(count(*) FILTER (WHERE side = 'out') AS BIGINT) AS out_degree
    FROM (SELECT src_key AS vertex_key, 'out' AS side FROM edges
          UNION ALL SELECT dst_key, 'in' FROM edges)
    GROUP BY vertex_key
), vf_etc AS MATERIALIZED (
    SELECT vertex_key,
        CAST(count(*) FILTER (WHERE side='in'  AND edge_type='reply') AS BIGINT) AS reply_in,
        CAST(count(*) FILTER (WHERE side='out' AND edge_type='reply') AS BIGINT) AS reply_out,
        CAST(count(*) FILTER (WHERE side='in'  AND edge_type='tool_call') AS BIGINT) AS tool_call_in,
        CAST(count(*) FILTER (WHERE side='out' AND edge_type='tool_call') AS BIGINT) AS tool_call_out,
        CAST(count(*) FILTER (WHERE side='in'  AND edge_type='same_tool') AS BIGINT) AS same_tool_in,
        CAST(count(*) FILTER (WHERE side='out' AND edge_type='same_tool') AS BIGINT) AS same_tool_out
    FROM (SELECT src_key AS vertex_key, 'out' AS side, edge_type FROM edges
          UNION ALL SELECT dst_key, 'in', edge_type FROM edges)
    GROUP BY vertex_key
), vf_chain AS MATERIALIZED (
    SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR) AS vertex_key,
           CAST(turn_idx AS BIGINT) AS chain_depth
    FROM transcripts
    WHERE conv_id IN (
        SELECT conv_id FROM transcripts GROUP BY 1 HAVING count(*) > 1
    )
), vf_und AS MATERIALIZED (
    SELECT DISTINCT least(src_key, dst_key) AS a, greatest(src_key, dst_key) AS b
    FROM edges WHERE src_key <> dst_key
), vf_tri AS MATERIALIZED (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM vf_und e1
    JOIN vf_und e2 ON e2.a = e1.b
    JOIN vf_und e3 ON e3.a = e1.a AND e3.b = e2.b
), vf_tri_v AS MATERIALIZED (
    SELECT vertex_key, CAST(count(*) AS BIGINT) AS triangles FROM (
        SELECT x AS vertex_key FROM vf_tri
        UNION ALL SELECT y FROM vf_tri
        UNION ALL SELECT z FROM vf_tri
    ) GROUP BY vertex_key
), vf_final AS MATERIALIZED (
SELECT v.vertex_key,
       CASE WHEN v.vertex_key LIKE 'tool:%' THEN 'tool' ELSE 'turn' END AS vertex_type,
       coalesce(d.in_degree, 0)  AS in_degree,
       coalesce(d.out_degree, 0) AS out_degree,
       coalesce(e.reply_in, 0)       AS reply_in,
       coalesce(e.reply_out, 0)      AS reply_out,
       coalesce(e.tool_call_in, 0)   AS tool_call_in,
       coalesce(e.tool_call_out, 0)  AS tool_call_out,
       coalesce(e.same_tool_in, 0)   AS same_tool_in,
       coalesce(e.same_tool_out, 0)  AS same_tool_out,
       coalesce(ch.chain_depth, -1)  AS chain_depth,
       CASE WHEN v.vertex_key LIKE 'tool:%' THEN 'tool'
            WHEN regexp_matches(v.vertex_key, '#0$') THEN 'conv_root'
            WHEN regexp_matches(v.vertex_key, '#[1-9]$') THEN 'early_turn'
            WHEN regexp_matches(v.vertex_key, '#\\d{{2,}}$') THEN 'late_turn'
            ELSE 'unlabelled' END AS label,
       coalesce(t.triangles, 0) AS triangles,
       CAST(p.val AS BIGINT) AS score_fp,
       c.lbl AS component_key
FROM pr_verts v
LEFT JOIN vf_deg d   ON d.vertex_key = v.vertex_key
LEFT JOIN vf_etc e   ON e.vertex_key = v.vertex_key
LEFT JOIN vf_chain ch ON ch.vertex_key = v.vertex_key
LEFT JOIN vf_tri_v t ON t.vertex_key = v.vertex_key
JOIN pr{PR_FP_ITERS} p ON p.vertex_key = v.vertex_key
JOIN cc{CC_ROUNDS} c   ON c.vertex_key = v.vertex_key
)"""
    )


def vertex_features_sql(base_cte: str) -> str:
    return vertex_features_ctes(base_cte) + "\nSELECT * FROM vf_final"


def mutation_impact_sql(base_cte: str) -> str:
    """Full oracle for the bijective-rename robustness check: fixed-point
    PageRank is exactly invariant under vertex renaming, so score_after
    equals score_before for every renamed tool vertex."""
    return (
        base_cte
        + pagerank_fp_ctes()
        + f"""
, mi_map AS (
    SELECT old, 'tool:obf_' || CAST(row_number() OVER (ORDER BY old) - 1
           AS VARCHAR) AS new
    FROM (SELECT DISTINCT dst_key AS old FROM edges
          WHERE dst_key LIKE 'tool:%')
)
SELECT m.old AS tool_key, m.new AS obf_key,
       CAST(p.val AS BIGINT) AS score_before_fp,
       CAST(p.val AS BIGINT) AS score_after_fp
FROM mi_map m JOIN pr{PR_FP_ITERS} p ON p.vertex_key = m.old"""
    )
