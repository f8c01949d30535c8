"""k-core decomposition pipeline: input canonicalization, keyed output,
and the unrolled-CTE DuckDB oracle.

The engine algorithm itself lives in ``GraphEngine.kcore`` (synchronous
peeling with sparse removal messages).  This module owns the two
graph-semantics decisions around it:

- **degree = number of distinct neighbors.**  The derived edge table has
  one row per (src, dst, edge_type) with multiplicity in ``weight``;
  feeding it raw would count parallel edges.  ``kcore_input`` projects to
  DISTINCT undirected pairs (self-loops dropped, ``bucket_distinct`` — one
  bucket shuffle) so the engine's per-edge counts ARE distinct-neighbor
  degrees.
- **canonical pair orientation is irrelevant.**  Ray canonicalizes by int
  id, the SQL oracle by string key; both expand to the same symmetric
  adjacency, and the k-core is a property of the undirected graph only.

Reference analog: per-node structural features
(/root/reference/code/features/structure.py:129-177) — k-core extends the
same closeness->PageRank / eccentricity->components family with the
standard "dense substructure" feature used for tracker-cluster analysis.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from webgraph_ray.functions.shuffle import bucket_distinct
from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.pipelines.flagship import attach_keys

# Unrolled peel rounds in the SQL oracle.  Peeling reaches its fixpoint in
# a handful of rounds on the transcript graphs (the reply-chain periphery
# strips in one round, the same-tool cores in two or three); extra rounds
# are exact no-ops, so the only cost of headroom is oracle runtime.
KCORE_SQL_ROUNDS = 12


def kcore_input(edges: ray.data.Dataset) -> ray.data.Dataset:
    """DISTINCT undirected (src, dst) id pairs with weight 1: the
    distinct-neighbor-degree input contract of ``GraphEngine.kcore``."""

    def und(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        keep = lo != hi
        return pa.table({"src": lo[keep], "dst": hi[keep]})

    pairs = bucket_distinct(
        edges.select_columns(["src", "dst"]).map_batches(
            und, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["src", "dst"],
    )

    def with_weight(b: pa.Table) -> pa.Table:
        return b.append_column(
            "weight", pa.array(np.ones(len(b), dtype=np.float64))
        )

    return pairs.map_batches(with_weight, batch_format="pyarrow")


def kcore_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    k: int,
) -> pd.DataFrame:
    """(vertex_key, core_degree) for every vertex in the k-core."""
    eng = GraphEngine(os.path.join(work_dir, "kcore"), num_parts=None)
    eng.build(kcore_input(edges), symmetrize=True)
    try:
        res = attach_keys(eng.kcore(k), vertices)
        out = res.select_columns(["vertex_key", "core_degree"]).to_pandas()
    finally:
        eng.shutdown()
    return out.sort_values("vertex_key", kind="mergesort").reset_index(drop=True)


def kcore_sql(edges_cte: str, k: int, rounds: int = KCORE_SQL_ROUNDS) -> str:
    """DuckDB mirror: synchronous peeling unrolled ``rounds`` times (the
    same technique as the fixed-point PageRank / pointer-doubling oracles).
    act_{i+1} = vertices of act_i with >= k neighbors inside act_i; extra
    rounds past the fixpoint are no-ops.  ``edges_cte`` must be a complete
    WITH clause defining ``edges``."""
    ctes = [
        f"""und AS MATERIALIZED (
    SELECT DISTINCT least(src_key, dst_key) AS a,
                    greatest(src_key, dst_key) AS b
    FROM edges WHERE src_key <> dst_key
)""",
        """adj AS MATERIALIZED (
    SELECT a AS s, b AS d FROM und UNION ALL SELECT b AS s, a AS d FROM und
)""",
        "act0 AS (SELECT DISTINCT s AS v FROM adj)",
    ]
    # every act CTE is MATERIALIZED: act_{i+1} references act_i twice, and
    # an inlined (non-materialized) chain would re-derive each round's
    # predecessor exponentially
    for i in range(rounds):
        ctes.append(
            f"""act{i + 1} AS MATERIALIZED (
    SELECT s AS v FROM adj
    WHERE s IN (SELECT v FROM act{i}) AND d IN (SELECT v FROM act{i})
    GROUP BY s HAVING count(*) >= {k}
)"""
        )
    # act sets only shrink, so equal counts in the last two rounds prove
    # the fixpoint was reached; otherwise emit a poison row that fails any
    # comparison loudly and names the oracle (not the engine) as the side
    # that was under-unrolled.
    return (
        edges_cte
        + ", "
        + ",\n".join(ctes)
        + f"""
SELECT s AS vertex_key, CAST(count(*) AS BIGINT) AS core_degree
FROM adj
WHERE s IN (SELECT v FROM act{rounds}) AND d IN (SELECT v FROM act{rounds})
GROUP BY 1
UNION ALL
SELECT '__KCORE_ORACLE_NOT_CONVERGED_RAISE_ROUNDS__', CAST(-1 AS BIGINT)
WHERE (SELECT count(*) FROM act{rounds - 1})
      <> (SELECT count(*) FROM act{rounds})
ORDER BY 1"""
    )
