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


def pagerank_fp_ctes(
    iters: int = PR_FP_ITERS,
    scale: int = PR_FP_SCALE,
    edges_cte: str = "edges",
    prefix: str = "pr",
) -> str:
    """CTE chain (assumes an ``{edges_cte}`` CTE with src_key/dst_key/weight
    is in scope) ending in ``{prefix}{iters}`` with columns (vertex_key,
    val).  ``prefix`` namespaces the intermediate CTEs so several PR chains
    (e.g. the greedy-mutation oracle's one-per-candidate runs) can coexist
    in one statement."""
    E, x = edges_cte, prefix
    # ONE CTE per iteration (aggregate join + dangling sum folded in as a
    # derived table / uncorrelated scalar subquery): DuckDB's bind+optimize
    # time grows superlinearly with CTE count, and multi-chain oracles
    # (greedy_mutation_sql builds 1 + 3*rounds chains) were planner-bound
    # with the 3-CTE-per-iteration layout.
    parts = [
        f"""
, {x}_verts AS MATERIALIZED (
    SELECT DISTINCT vertex_key FROM (
        SELECT src_key AS vertex_key FROM {E}
        UNION ALL SELECT dst_key FROM {E}
    )
), {x}_outdeg AS MATERIALIZED (
    SELECT src_key, CAST(sum(weight) AS BIGINT) AS outw FROM {E} GROUP BY 1
), {x}_dangset AS MATERIALIZED (
    SELECT v.vertex_key FROM {x}_verts v
    LEFT JOIN {x}_outdeg o ON o.src_key = v.vertex_key
    WHERE o.src_key IS NULL
), {x}_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {x}_verts)
, {x}0 AS MATERIALIZED (
    SELECT v.vertex_key, {scale} // n.n AS val FROM {x}_verts v CROSS JOIN {x}_n n
)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
, {x}{i} AS MATERIALIZED (
    SELECT v.vertex_key,
           (3 * {scale}) // (20 * n.n)
           + coalesce(a.agg, 0)
           + (17 * (SELECT coalesce(sum(s.val), 0) FROM {x}{p} s
                    JOIN {x}_dangset g ON g.vertex_key = s.vertex_key))
             // (20 * n.n) AS val
    FROM {x}_verts v CROSS JOIN {x}_n n
    LEFT JOIN (
        SELECT e.dst_key AS vertex_key,
               sum(((s.val // o.outw) * e.weight * 17) // 20) AS agg
        FROM {E} e
        JOIN {x}{p} s ON s.vertex_key = e.src_key
        JOIN {x}_outdeg o ON o.src_key = e.src_key
        GROUP BY 1
    ) a ON a.vertex_key = v.vertex_key
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


def hopdist_sql(
    base_cte: str,
    seeds_sql: str,
    rounds: int,
    prefix: str = "hd",
) -> str:
    """Multi-source undirected BFS oracle: unrolled min-plus rounds
    d_{i+1}(v) = min(d_i(v), 1 + min over neighbors d_i(u)), seeds at 0.
    ``rounds`` must be >= the largest finite distance (extra rounds are
    no-ops; the Ray run's convergence guard pins the real diameter).
    Unreached vertices report -1.  Every round CTE is MATERIALIZED — d_i
    is referenced twice and would otherwise inline exponentially."""
    x = prefix
    parts = [
        f"""
, {x}_und AS MATERIALIZED (
    SELECT DISTINCT least(src_key, dst_key) AS a,
                    greatest(src_key, dst_key) AS b
    FROM edges WHERE src_key <> dst_key
), {x}_adj AS MATERIALIZED (
    SELECT a AS s, b AS d FROM {x}_und
    UNION ALL SELECT b AS s, a AS d FROM {x}_und
), {x}_verts AS MATERIALIZED (
    SELECT DISTINCT vertex_key FROM (
        SELECT src_key AS vertex_key FROM edges
        UNION ALL SELECT dst_key FROM edges
    )
), {x}_seeds AS MATERIALIZED ({seeds_sql})
, {x}0 AS MATERIALIZED (
    SELECT v.vertex_key,
           CASE WHEN sd.vertex_key IS NOT NULL THEN 0 ELSE NULL END AS dist
    FROM {x}_verts v LEFT JOIN {x}_seeds sd ON sd.vertex_key = v.vertex_key
)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""
, {x}{i} AS MATERIALIZED (
    SELECT v.vertex_key,
           CASE WHEN v.dist IS NULL AND nb.m IS NULL THEN NULL
                ELSE least(coalesce(v.dist, 9223372036854775807),
                           coalesce(nb.m, 9223372036854775807)) END AS dist
    FROM {x}{p} v
    LEFT JOIN (
        SELECT a.d AS vertex_key, min(s.dist) + 1 AS m
        FROM {x}_adj a JOIN {x}{p} s ON s.vertex_key = a.s
        WHERE s.dist IS NOT NULL
        GROUP BY 1
    ) nb ON nb.vertex_key = v.vertex_key
)"""
        )
    return (
        base_cte
        + "".join(parts)
        + f"""
SELECT vertex_key,
       CAST(coalesce(dist, -1) AS BIGINT) AS distance
FROM {x}{rounds}
ORDER BY 1"""
    )


CLOSENESS_SCALE = 100000


def distance_features_sql(
    base_cte: str,
    seeds_sql: str,
    per_seed_sqls: list[str],
    rounds: int,
) -> str:
    """Mirror of the combined hop-distance + sampled-source-closeness row:
    one multi-source BFS (``seeds_sql``) for the distance column, plus one
    single-source BFS per entry of ``per_seed_sqls``; per-vertex closeness
    is the Wasserman-Faust-normalized integer
    ``(r^2 * SCALE) // (dist_sum * s)`` over the s sampled sources
    (r = sources that reach the vertex; 0 when none at a positive
    distance), and per-vertex harmonic centrality is the companion
    integer ``sum_i SCALE // d_i`` over sources at positive distance
    (the Boldi-Vigna web-graph centrality; seeds and unreached vertices
    contribute 0).  Each BFS is an independent subquery (own WITH scope)
    with a distinct CTE prefix."""
    s = len(per_seed_sqls)
    multi = hopdist_sql(base_cte, seeds_sql, rounds, prefix="dfm")
    singles = [
        hopdist_sql(base_cte, seed_sql, rounds, prefix=f"dfs{i}")
        for i, seed_sql in enumerate(per_seed_sqls)
    ]
    reach = " + ".join(
        f"CAST(h{i}.distance >= 0 AS BIGINT)" for i in range(s)
    )
    dsum = " + ".join(
        f"CASE WHEN h{i}.distance >= 0 THEN h{i}.distance ELSE 0 END"
        for i in range(s)
    )
    hsum = " + ".join(
        f"CASE WHEN h{i}.distance > 0 THEN {CLOSENESS_SCALE} // h{i}.distance"
        f" ELSE 0 END"
        for i in range(s)
    )
    joins = "\n".join(
        f"JOIN ({sql}) h{i} USING (vertex_key)"
        for i, sql in enumerate(singles)
    )
    return f"""
SELECT h.vertex_key, h.distance,
       CAST({reach} AS BIGINT) AS n_reached,
       CAST({dsum} AS BIGINT) AS dist_sum,
       CAST(CASE WHEN ({dsum}) = 0 THEN 0
            ELSE (({reach}) * ({reach}) * {CLOSENESS_SCALE})
                 // (({dsum}) * {s}) END AS BIGINT) AS closeness_fp,
       CAST({hsum} AS BIGINT) AS harmonic_fp
FROM ({multi}) h
{joins}
ORDER BY 1"""


BW_SQL_SCALE = 10**6
BW_SQL_SCALE2 = 10**4


def betweenness_sql(
    base_cte: str,
    per_seed_sqls: list[str],
    rounds: int,
    scale: int = BW_SQL_SCALE,
    scale2: int = BW_SQL_SCALE2,
) -> str:
    """Mirror of `graph/betweenness.py`: sampled-source Brandes over the
    simple undirected graph (distinct unordered pairs, self-loops
    dropped), exact int64 fixed-point.  Per seed: ``rounds`` unrolled
    min-plus BFS CTEs (identical shape to `hopdist_sql`), then per-level
    shortest-path counts sigma_L(v) = sum of sigma over neighbors at
    L-1, then the backward dependency chain from ``rounds-1`` down to 1:
    delta_L(v) = (sigma_v * sum over neighbors w at L+1 of
    floor((scale + delta_{L+1}(w)) * scale2 / sigma_w)) // scale2.
    bc_fp(v) = sum of deltas over seeds; the seed (the only dist-0
    vertex) is structurally excluded because the chain stops at level 1.
    ``rounds`` must be >= the deepest BFS level of any seed (the Ray
    side measures and asserts it); extra rounds are empty no-op CTEs."""
    parts = [
        base_cte,
        """
, bw_und AS MATERIALIZED (
    SELECT DISTINCT least(src_key, dst_key) AS a,
                    greatest(src_key, dst_key) AS b
    FROM edges WHERE src_key <> dst_key
), bw_adj AS MATERIALIZED (
    SELECT a AS s, b AS d FROM bw_und
    UNION ALL SELECT b AS s, a AS d FROM bw_und
), bw_verts AS MATERIALIZED (
    -- vertices incident to a non-self-loop edge: the same universe the
    -- Ray side's simple-graph build produces (self-loop-only vertices
    -- are not part of the simple graph on either side)
    SELECT DISTINCT a AS vertex_key FROM bw_und
    UNION SELECT b FROM bw_und
)""",
    ]
    for i, seed_sql in enumerate(per_seed_sqls):
        x = f"bw{i}"
        parts.append(
            f"""
, {x}d0 AS MATERIALIZED (
    SELECT v.vertex_key,
           CASE WHEN sd.vertex_key IS NOT NULL THEN 0 ELSE NULL END AS dist
    FROM bw_verts v LEFT JOIN ({seed_sql}) sd ON sd.vertex_key = v.vertex_key
)"""
        )
        for lv in range(1, rounds + 1):
            pv = lv - 1
            parts.append(
                f"""
, {x}d{lv} AS MATERIALIZED (
    SELECT v.vertex_key,
           CASE WHEN v.dist IS NULL AND nb.m IS NULL THEN NULL
                ELSE least(coalesce(v.dist, 9223372036854775807),
                           coalesce(nb.m, 9223372036854775807)) END AS dist
    FROM {x}d{pv} v
    LEFT JOIN (
        SELECT a.d AS vertex_key, min(s.dist) + 1 AS m
        FROM bw_adj a JOIN {x}d{pv} s ON s.vertex_key = a.s
        WHERE s.dist IS NOT NULL
        GROUP BY 1
    ) nb ON nb.vertex_key = v.vertex_key
)"""
            )
        parts.append(
            f"""
, {x}dist AS MATERIALIZED (
    SELECT vertex_key, dist FROM {x}d{rounds} WHERE dist IS NOT NULL
), {x}sg0 AS MATERIALIZED (
    SELECT vertex_key, CAST(1 AS BIGINT) AS sig FROM {x}dist WHERE dist = 0
)"""
        )
        for lv in range(1, rounds + 1):
            pv = lv - 1
            parts.append(
                f"""
, {x}sg{lv} AS MATERIALIZED (
    SELECT d.vertex_key, CAST(sum(pg.sig) AS BIGINT) AS sig
    FROM {x}dist d
    JOIN bw_adj a ON a.d = d.vertex_key
    JOIN {x}sg{pv} pg ON pg.vertex_key = a.s
    WHERE d.dist = {lv}
    GROUP BY 1
)"""
            )
        sig_union = " UNION ALL ".join(
            f"SELECT * FROM {x}sg{lv}" for lv in range(rounds + 1)
        )
        parts.append(
            f"""
, {x}sig AS MATERIALIZED ({sig_union})
, {x}dl{rounds} AS (
    SELECT vertex_key, CAST(0 AS BIGINT) AS dlt FROM bw_verts WHERE 1 = 0
)"""
        )
        for lv in range(rounds - 1, 0, -1):
            parts.append(
                f"""
, {x}dl{lv} AS MATERIALIZED (
    SELECT v.vertex_key,
           CAST((sv.sig * agg.c) // {scale2} AS BIGINT) AS dlt
    FROM {x}dist v
    JOIN {x}sig sv ON sv.vertex_key = v.vertex_key
    JOIN (
        SELECT a.s AS vertex_key,
               CAST(sum(((CAST({scale} AS BIGINT) + coalesce(dw.dlt, 0))
                         * {scale2}) // sw.sig) AS BIGINT) AS c
        FROM bw_adj a
        JOIN {x}dist dv ON dv.vertex_key = a.d AND dv.dist = {lv + 1}
        JOIN {x}sig sw ON sw.vertex_key = a.d
        LEFT JOIN {x}dl{lv + 1} dw ON dw.vertex_key = a.d
        GROUP BY 1
    ) agg ON agg.vertex_key = v.vertex_key
    WHERE v.dist = {lv}
)"""
            )
        if rounds >= 2:
            dl_union = " UNION ALL ".join(
                f"SELECT * FROM {x}dl{lv}" for lv in range(1, rounds)
            )
        else:
            dl_union = (
                "SELECT vertex_key, CAST(0 AS BIGINT) AS dlt "
                "FROM bw_verts WHERE 1 = 0"
            )
        parts.append(f"\n, {x}delta AS MATERIALIZED ({dl_union})")
    s = len(per_seed_sqls)
    total = " + ".join(f"coalesce(d{i}.dlt, 0)" for i in range(s))
    joins = "\n".join(
        f"LEFT JOIN bw{i}delta d{i} ON d{i}.vertex_key = v.vertex_key"
        for i in range(s)
    )
    return (
        "".join(parts)
        + f"""
SELECT v.vertex_key, CAST({total} AS BIGINT) AS bc_fp
FROM bw_verts v
{joins}
ORDER BY 1"""
    )


def ppr_fp_ctes(
    seeds_sql: str,
    iters: int = PR_FP_ITERS,
    scale: int = PR_FP_SCALE,
    edges_cte: str = "edges",
    prefix: str = "ppr",
) -> str:
    """Personalized-PageRank mirror of ``pagerank_fp_ctes``: initial mass,
    teleport base, and dangling redistribution land only on the seed set
    (``seeds_sql``: a SELECT producing one ``vertex_key`` column).  Ends in
    ``{prefix}{iters}`` (vertex_key, val)."""
    E, x = edges_cte, prefix
    parts = [
        f"""
, {x}_verts AS MATERIALIZED (
    SELECT DISTINCT vertex_key FROM (
        SELECT src_key AS vertex_key FROM {E}
        UNION ALL SELECT dst_key FROM {E}
    )
), {x}_outdeg AS MATERIALIZED (
    SELECT src_key, CAST(sum(weight) AS BIGINT) AS outw FROM {E} GROUP BY 1
), {x}_dangset AS MATERIALIZED (
    SELECT v.vertex_key FROM {x}_verts v
    LEFT JOIN {x}_outdeg o ON o.src_key = v.vertex_key
    WHERE o.src_key IS NULL
), {x}_seeds AS MATERIALIZED ({seeds_sql})
, {x}_s AS (SELECT CAST(count(*) AS BIGINT) AS s FROM {x}_seeds)
, {x}0 AS MATERIALIZED (
    SELECT v.vertex_key,
           CASE WHEN sd.vertex_key IS NOT NULL THEN {scale} // n.s
                ELSE 0 END AS val
    FROM {x}_verts v CROSS JOIN {x}_s n
    LEFT JOIN {x}_seeds sd ON sd.vertex_key = v.vertex_key
)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f"""
, {x}{i} AS MATERIALIZED (
    SELECT v.vertex_key,
           CASE WHEN sd.vertex_key IS NOT NULL THEN
               (3 * {scale}) // (20 * n.s)
               + (17 * (SELECT coalesce(sum(s.val), 0) FROM {x}{p} s
                        JOIN {x}_dangset g ON g.vertex_key = s.vertex_key))
                 // (20 * n.s)
           ELSE 0 END
           + coalesce(a.agg, 0) AS val
    FROM {x}_verts v CROSS JOIN {x}_s n
    LEFT JOIN {x}_seeds sd ON sd.vertex_key = v.vertex_key
    LEFT JOIN (
        SELECT e.dst_key AS vertex_key,
               sum(((s.val // o.outw) * e.weight * 17) // 20) AS agg
        FROM {E} e
        JOIN {x}{p} s ON s.vertex_key = e.src_key
        JOIN {x}_outdeg o ON o.src_key = e.src_key
        GROUP BY 1
    ) a ON a.vertex_key = v.vertex_key
)"""
        )
    return "".join(parts)


def ppr_fp_sql(base_cte: str, seeds_sql: str) -> str:
    """Full personalized-PageRank oracle: (vertex_key, score_fp)."""
    return (
        base_cte
        + ppr_fp_ctes(seeds_sql)
        + f"\nSELECT vertex_key, CAST(val AS BIGINT) AS score_fp"
        f" FROM ppr{PR_FP_ITERS}"
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


# Turn index of an edge's source vertex ("conv_X#k" -> k); NULL for keys
# without the suffix (tool vertices never source mutation-eligible edges).
_TI = "TRY_CAST(regexp_extract(e.src_key, '#(\\d+)$', 1) AS BIGINT)"


def greedy_mutation_sql(
    base_cte: str,
    rounds: int = 3,
    iters: int = PR_FP_ITERS,
    scale: int = PR_FP_SCALE,
) -> str:
    """Full oracle for the greedy adversarial mutation loop
    (webgraph_ray/pipelines/greedy.py): mirrors every round's three
    candidate mutations (split_tool / drop_tool_calls / add_node), the
    fixed-point PageRank objective per candidate (one unrolled BIGINT PR
    chain each — 1 + 3*rounds chains total), the deterministic target and
    accept decisions, and the early stop when no candidate improves.

    SQL-expressibility by construction: the loop's candidate selectors are
    defined on the *turn index* parsed from the source key (parity /
    mod-3), not on the engine's SipHash vertex ids, precisely so this
    mirror exists; the objective is exact int64, so every comparison is
    bit-reproducible."""
    q = [base_cte]
    q.append(
        """
, e0 AS MATERIALIZED (
    SELECT src_key, dst_key, edge_type, CAST(weight AS BIGINT) AS weight
    FROM edges
)"""
    )
    q.append(pagerank_fp_ctes(iters, scale, edges_cte="e0", prefix="g0"))
    q.append(
        f"""
, sc0 AS MATERIALIZED (
    SELECT t.k, CAST(p.val AS BIGINT) AS v
    FROM (SELECT DISTINCT dst_key AS k FROM e0 WHERE dst_key LIKE 'tool:%') t
    JOIN g0{iters} p ON p.vertex_key = t.k
), obj0 AS (SELECT max(v) AS obj FROM sc0)
, tgt1 AS (SELECT k FROM sc0 ORDER BY v DESC, k ASC LIMIT 1)"""
    )
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        before = "obj0" if r == 1 else f"dec{r - 1}"
        q.append(
            f"""
, e{r}s AS MATERIALIZED (
    SELECT e.src_key,
           CASE WHEN e.dst_key = t.k AND e.edge_type = 'tool_call'
                     AND {_TI} % 2 = 1
                THEN e.dst_key || '__clone{r}' ELSE e.dst_key END AS dst_key,
           e.edge_type, e.weight
    FROM {prev} e CROSS JOIN tgt{r} t
), e{r}d AS MATERIALIZED (
    SELECT e.src_key, e.dst_key, e.edge_type, e.weight
    FROM {prev} e CROSS JOIN tgt{r} t
    WHERE NOT (e.dst_key = t.k AND e.edge_type = 'tool_call'
               AND {_TI} % 3 = 0)
), e{r}a AS MATERIALIZED (
    SELECT src_key, dst_key, edge_type, weight FROM {prev}
    UNION ALL
    SELECT t.k, 'decoy:' || t.k || ':r{r}', 'decoy', CAST(1 AS BIGINT)
    FROM tgt{r} t
), nd{r}s AS (
    SELECT CAST(count(DISTINCT e.src_key) AS BIGINT) AS n
    FROM {prev} e CROSS JOIN tgt{r} t
    WHERE e.dst_key = t.k AND e.edge_type = 'tool_call' AND {_TI} % 2 = 1
), nd{r}d AS (
    SELECT CAST(count(DISTINCT e.src_key) AS BIGINT) AS n
    FROM {prev} e CROSS JOIN tgt{r} t
    WHERE e.dst_key = t.k AND e.edge_type = 'tool_call' AND {_TI} % 3 = 0
)"""
        )
        for tag in ("s", "d", "a"):
            q.append(
                pagerank_fp_ctes(
                    iters, scale, edges_cte=f"e{r}{tag}", prefix=f"g{r}{tag}"
                )
            )
            q.append(
                f"""
, sc{r}{tag} AS MATERIALIZED (
    SELECT t.k, CAST(p.val AS BIGINT) AS v
    FROM (SELECT DISTINCT dst_key AS k FROM e{r}{tag}
          WHERE dst_key LIKE 'tool:%') t
    JOIN g{r}{tag}{iters} p ON p.vertex_key = t.k
)"""
            )
        q.append(
            f"""
, cand{r} AS (
    SELECT 'split_tool' AS style, 1 AS ord, (SELECT max(v) FROM sc{r}s) AS obj
    UNION ALL
    SELECT 'drop_tool_calls', 2, (SELECT max(v) FROM sc{r}d)
    UNION ALL
    SELECT 'add_node', 3, (SELECT max(v) FROM sc{r}a)
), dec{r} AS (
    SELECT style, obj FROM cand{r}
    WHERE obj IS NOT NULL AND obj < (SELECT obj FROM {before})
    ORDER BY obj ASC, ord ASC LIMIT 1
), e{r} AS MATERIALIZED (
    SELECT * FROM e{r}s WHERE (SELECT style FROM dec{r}) = 'split_tool'
    UNION ALL
    SELECT * FROM e{r}d WHERE (SELECT style FROM dec{r}) = 'drop_tool_calls'
    UNION ALL
    SELECT * FROM e{r}a WHERE (SELECT style FROM dec{r}) = 'add_node'
), sc{r} AS (
    SELECT * FROM sc{r}s WHERE (SELECT style FROM dec{r}) = 'split_tool'
    UNION ALL
    SELECT * FROM sc{r}d WHERE (SELECT style FROM dec{r}) = 'drop_tool_calls'
    UNION ALL
    SELECT * FROM sc{r}a WHERE (SELECT style FROM dec{r}) = 'add_node'
), tgt{r + 1} AS (SELECT k FROM sc{r} ORDER BY v DESC, k ASC LIMIT 1)"""
        )
    rows = []
    for r in range(1, rounds + 1):
        before = "obj0" if r == 1 else f"dec{r - 1}"
        alive = (
            ""
            if r == 1
            else f" AND EXISTS (SELECT 1 FROM dec{r - 1})"
        )
        for style, tag, nd in (
            ("split_tool", "s", f"(SELECT n FROM nd{r}s)"),
            ("drop_tool_calls", "d", f"(SELECT n FROM nd{r}d)"),
            ("add_node", "a", "CAST(1 AS BIGINT)"),
        ):
            rows.append(
                f"""
SELECT CAST({r} AS BIGINT) AS round, '{style}' AS style,
       (SELECT k FROM tgt{r}) AS target_tool,
       (SELECT obj FROM {before}) AS obj_before_fp,
       (SELECT max(v) FROM sc{r}{tag}) AS obj_after_fp,
       {nd} AS n_delta_src,
       coalesce((SELECT style FROM dec{r}) = '{style}', FALSE) AS accepted
WHERE TRUE{alive}"""
            )
    q.append("\nSELECT * FROM (" + "\nUNION ALL".join(rows) + "\n)")
    return "".join(q)


def mutation_impact_sql(base_cte: str, seed: str, digit_perm: str) -> str:
    """Full oracle for the six-style robustness check.  The five
    key-level styles rely on fixed-point PageRank being exactly invariant
    under a bijective vertex rename (after == before; param_strip adds
    the remove-roundtrip: suffix then strip must land back on baseline);
    the obfuscated key itself is recomputed in SQL (rank rename / seeded
    md5 suffix / seeded group prefix) so the mapping machinery is
    verified, not just the invariance.  text_digits
    recomputes the per-tool digit-value sums from BOTH the original text
    and ``translate(text, '0123456789', perm)`` — the two sums differ
    deterministically, so a no-op mutation on the Ray side fails."""

    def dsum(col: str) -> str:
        return " + ".join(
            f"(length({col}) - length(replace({col}, '{d}', ''))) * {d}"
            for d in range(1, 10)
        )

    return (
        base_cte
        + pagerank_fp_ctes()
        + f"""
, mi_tools AS (
    SELECT DISTINCT dst_key AS old FROM edges WHERE dst_key LIKE 'tool:%'
), mi_map AS (
    SELECT old, 'tool:obf_' || CAST(row_number() OVER (ORDER BY old) - 1
           AS VARCHAR) AS new
    FROM mi_tools
), mi_text AS (
    SELECT tool, text,
           translate(text, '0123456789', '{digit_perm}') AS mut_text
    FROM transcripts WHERE tool IS NOT NULL
)
SELECT 'tool_rename' AS style, m.old AS old_key, m.new AS new_key,
       'pagerank_fp' AS metric,
       CAST(p.val AS BIGINT) AS before_fp, CAST(p.val AS BIGINT) AS after_fp
FROM mi_map m JOIN pr{PR_FP_ITERS} p ON p.vertex_key = m.old
UNION ALL
SELECT 'key_suffix', t.old,
       t.old || '~' || substr(md5('{seed}' || t.old), 1, 6),
       'pagerank_fp', CAST(p.val AS BIGINT), CAST(p.val AS BIGINT)
FROM mi_tools t JOIN pr{PR_FP_ITERS} p ON p.vertex_key = t.old
UNION ALL
SELECT 'subdomain_prefix', t.old,
       'tool:g' || substr(md5('{seed}' || t.old), 1, 1)
           || '.' || substr(t.old, 6),
       'pagerank_fp', CAST(p.val AS BIGINT), CAST(p.val AS BIGINT)
FROM mi_tools t JOIN pr{PR_FP_ITERS} p ON p.vertex_key = t.old
UNION ALL
SELECT 'param_strip', t.old, t.old,
       'pagerank_fp', CAST(p.val AS BIGINT), CAST(p.val AS BIGINT)
FROM mi_tools t JOIN pr{PR_FP_ITERS} p ON p.vertex_key = t.old
UNION ALL
SELECT 'conv_rewrite', t.old, t.old,
       'pagerank_fp', CAST(p.val AS BIGINT), CAST(p.val AS BIGINT)
FROM mi_tools t JOIN pr{PR_FP_ITERS} p ON p.vertex_key = t.old
UNION ALL
SELECT 'text_digits', 'tool:' || tool, 'tool:' || tool, 'digit_sum',
       CAST(sum({dsum('text')}) AS BIGINT),
       CAST(sum({dsum('mut_text')}) AS BIGINT)
FROM mi_text GROUP BY tool"""
    )
