"""Deterministic graph random walks — the GraphSAGE-style neighborhood
sampling a graph-training pipeline needs, made reproducible (and
SQL-mirrorable) by replacing the RNG with the repo's shared capped
polynomial string hash: at step ``t`` the walk at vertex ``src`` moves to

    argmin over out-neighbors ``dst`` of
        h = (tokhash(dst) * 131 + t * 16007 + tokhash(src)) % M
    (ties broken by smaller dst_key)

Reference analog: the per-visit neighborhood expansions in
/root/reference/code/features/structure.py (ancestry / 2-hop walks); this
generalizes them to fixed-length sampled walks.

Scale shape: the adjacency NEVER shuffles — each step broadcasts the
current frontier's distinct vertices (bounded by the seed count, which is
the caller's sampling knob, NOT the data size), streams one filtered pass
over the edge table computing per-batch partial argmins, and reduces the
<= |frontier| winners on the driver.  L steps = L streaming passes; walk
state is a tiny driver-side table throughout.  (On the BSP engine this
would be one routed exchange per step; the broadcast shape wins while
|frontier| << |edges|, which seed sampling guarantees.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.functions.texthash import M, hash_token_list

WALK_MULT_DST = 131
WALK_MULT_STEP = 16007
WALK_SEED_MOD = 100
WALK_LEN = 4
# restart variant (walks-with-restart, the PinSage importance-sampling
# shape): at step t the walk teleports back to its seed iff
# (tokhash(walk_id) + t*WALK_MULT_STEP) % WALK_RESTART_MOD == 0 — a pure
# function of (walk_id, t), checked BEFORE neighbor selection, so a
# restarting walker survives even at a dead-end vertex (classic RWR)
WALK_RESTART_MOD = 3
# broadcast guard: the frontier is bounded by the seed count; fail loudly
# if a caller disables sampling on a large graph
WALK_MAX_FRONTIER = 1_000_000


def _th(keys) -> np.ndarray:
    """Capped polynomial hash of each string (the texthash token hash —
    identical to sql_token_hash_expr on the SQL side)."""
    return hash_token_list([str(k) for k in keys])


def walk_seeds(narrow: ray.data.Dataset, seed_mod: int = WALK_SEED_MOD):
    """Deterministic seed sample over the edge table's vertex universe
    (src ∪ dst — the same universe the SQL mirror uses): vertex_key with
    tokhash % seed_mod == 0.  The hash filter runs map-side, so only the
    ~1/seed_mod survivors ever leave a batch."""

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        keys = pd.unique(
            np.concatenate(
                [
                    df["src_key"].to_numpy(dtype=object),
                    df["dst_key"].to_numpy(dtype=object),
                ]
            )
        ) if len(df) else np.array([], dtype=object)
        m = (_th(keys) % seed_mod) == 0 if len(keys) else np.zeros(0, bool)
        return pd.DataFrame({"vertex_key": keys[m]})

    return narrow.map_batches(pick, batch_format="pandas")


def random_walks(
    edges: ray.data.Dataset,
    length: int = WALK_LEN,
    seed_mod: int = WALK_SEED_MOD,
    max_frontier: int = WALK_MAX_FRONTIER,
    no_backtrack: bool = False,
    restart_mod: int | None = None,
) -> pd.DataFrame:
    """(walk_id = seed vertex_key, step, vertex_key) rows for steps
    0..length; a walk stops early at a vertex with no out-edges.  Every
    choice is the hash-argmin rule above — byte-deterministic under any
    partitioning, mirrored exactly by random_walks_sql().

    ``no_backtrack=True`` selects the second-order variant (the
    node2vec-family sampling rule with the return bias pushed to its
    deterministic limit): the immediate predecessor is excluded from the
    candidate set unless it is the ONLY out-neighbor — equivalently, rank
    candidates by (is-previous-vertex, h, dst_key) and take the minimum.

    ``restart_mod`` selects the walks-with-restart variant (first-order
    rule + deterministic teleport): at step t the walk returns to its
    seed iff (tokhash(walk_id) + t*WALK_MULT_STEP) % restart_mod == 0,
    checked before neighbor selection (so restarts fire at dead ends
    too); otherwise the normal hash-argmin step applies."""
    from ray.data.dataset import MaterializedDataset

    if no_backtrack and restart_mod:
        raise ValueError("no_backtrack and restart_mod are exclusive")

    if not isinstance(edges, MaterializedDataset):
        edges = edges.materialize()  # length streaming passes below
    narrow = edges.select_columns(["src_key", "dst_key"]).materialize()

    seeds = sorted(
        set(walk_seeds(narrow, seed_mod).to_pandas()["vertex_key"])
    )
    if len(seeds) > max_frontier:
        raise ValueError(
            f"random_walks: {len(seeds)} seeds exceed max_frontier="
            f"{max_frontier}; raise seed_mod"
        )
    out = [
        pd.DataFrame(
            {"walk_id": seeds, "step": np.int64(0), "vertex_key": seeds}
        )
    ]
    # walk_id -> (cur, prev); prev None at step 0 (nothing to exclude)
    cur = {w: (w, None) for w in seeds}

    for t in range(1, length + 1):
        restart_w: set = set()
        if restart_mod:
            wids = list(cur.keys())
            rm = (
                (_th(wids) + t * WALK_MULT_STEP) % restart_mod == 0
                if wids
                else np.zeros(0, bool)
            )
            restart_w = {w for w, m in zip(wids, rm) if m}
        # distinct (cur, prev) states — the choice depends on both
        pairs = sorted(
            {(c, p) for w, (c, p) in cur.items() if w not in restart_w}
        )
        if not pairs and not restart_w:
            break
        frontier = sorted({c for c, _ in pairs})
        fref = ray.put(pa.array(frontier, pa.string()))

        def step_partial(tab: pa.Table, _t=t) -> pa.Table:
            import pyarrow.compute as pc

            fr = ray.get(fref)
            keep = pc.is_in(tab["src_key"], value_set=fr)
            tab = tab.filter(keep)
            if tab.num_rows == 0:
                return pa.table(
                    {
                        "src_key": pa.array([], pa.string()),
                        "dst_key": pa.array([], pa.string()),
                        "h": pa.array([], pa.int64()),
                    }
                )
            src = tab["src_key"].to_numpy(zero_copy_only=False)
            dst = tab["dst_key"].to_numpy(zero_copy_only=False)
            h = (
                _th(dst) * WALK_MULT_DST + _t * WALK_MULT_STEP + _th(src)
            ) % M
            df = pd.DataFrame({"src_key": src, "dst_key": dst, "h": h})
            if no_backtrack:
                # keep ALL candidate edges of frontier vertices: the
                # per-(cur, prev) ranking happens on the driver (the
                # frontier's total out-degree is the partial size)
                df = df.drop_duplicates(["src_key", "dst_key"])
                return pa.Table.from_pandas(df, preserve_index=False)
            # per-batch partial argmin per src: (h, dst_key) lexicographic
            df = df.sort_values(["src_key", "h", "dst_key"], kind="mergesort")
            df = df.drop_duplicates("src_key", keep="first")
            return pa.Table.from_pandas(df, preserve_index=False)

        parts = (
            narrow.map_batches(step_partial, batch_format="pyarrow")
            .to_pandas()
            if pairs
            else pd.DataFrame()
        )
        nxt: dict = {}
        if len(parts):
            if no_backtrack:
                parts = parts.drop_duplicates(["src_key", "dst_key"])
                by_src = dict(tuple(parts.groupby("src_key", sort=False)))
                for c, p in pairs:
                    g = by_src.get(c)
                    if g is None:
                        continue
                    bt = (g["dst_key"] == p).to_numpy() if p is not None else (
                        np.zeros(len(g), dtype=bool)
                    )
                    order = np.lexsort(
                        (g["dst_key"].to_numpy(), g["h"].to_numpy(), bt)
                    )
                    nxt[(c, p)] = g["dst_key"].to_numpy()[order[0]]
            else:
                parts = parts.sort_values(
                    ["src_key", "h", "dst_key"], kind="mergesort"
                ).drop_duplicates("src_key", keep="first")
                firsts = dict(zip(parts["src_key"], parts["dst_key"]))
                nxt = {(c, p): firsts[c] for c, p in pairs if c in firsts}
        cur = {
            w: ((w, c) if w in restart_w else (nxt[(c, p)], c))
            for w, (c, p) in cur.items()
            if w in restart_w or (c, p) in nxt
        }
        if not cur:
            break
        out.append(
            pd.DataFrame(
                {
                    "walk_id": list(cur.keys()),
                    "step": np.int64(t),
                    "vertex_key": [c for c, _ in cur.values()],
                }
            )
        )
    res = pd.concat(out, ignore_index=True)
    return res.sort_values(
        ["walk_id", "step"], kind="mergesort"
    ).reset_index(drop=True)


def random_walks_sql(
    edges_cte: str,
    length: int = WALK_LEN,
    seed_mod: int = WALK_SEED_MOD,
    prefix: str = "rw",
    no_backtrack: bool = False,
    restart_mod: int | None = None,
) -> str:
    """DuckDB mirror: unrolled per-step argmin CTEs over the same hash.
    ``no_backtrack`` carries the previous vertex through the CTE chain
    and ranks candidates (is-prev, h, dst_key) — identical to the Ray
    rule: prefer any non-predecessor; fall back to the predecessor only
    when it is the sole out-neighbor.  ``restart_mod`` mirrors the
    walks-with-restart variant: each step CTE is the UNION of the
    teleport branch (walk returns to its seed when the (walk_id, t) hash
    fires — no adjacency join, so dead-end walkers survive a restart)
    and the ordinary argmin branch over the rest.

    Binder-size note: the token-hash SQL expression expands to ~5 KB of
    text per use, so hashes are computed ONCE in the materialized vertex
    and adjacency CTEs (``th`` / ``th_src`` / ``th_dst`` columns) and
    every per-step CTE references plain columns — three unioned chains
    with inline hashes overflowed DuckDB's binder allocator."""
    from webgraph_ray.functions.texthash import sql_token_hash_expr

    if no_backtrack and restart_mod:
        raise ValueError("no_backtrack and restart_mod are exclusive")

    x = prefix
    th_v = sql_token_hash_expr("v.vertex_key")
    parts = [
        f"""
, {x}_verts AS MATERIALIZED (
    SELECT vertex_key, {th_v} AS th FROM (
        SELECT DISTINCT vertex_key FROM (
            SELECT src_key AS vertex_key FROM edges
            UNION ALL SELECT dst_key FROM edges
        )
    ) v
), {x}_adj AS MATERIALIZED (
    SELECT e.src_key, e.dst_key, s.th AS th_src, d.th AS th_dst
    FROM (SELECT DISTINCT src_key, dst_key FROM edges) e
    JOIN {x}_verts s ON s.vertex_key = e.src_key
    JOIN {x}_verts d ON d.vertex_key = e.dst_key
), {x}_w0 AS MATERIALIZED (
    SELECT vertex_key AS walk_id, vertex_key AS cur,
           CAST(NULL AS VARCHAR) AS prev{", th AS wh" if restart_mod else ""}
    FROM {x}_verts WHERE th % {seed_mod} = 0
)"""
    ]
    bt = (
        "CASE WHEN e.dst_key = w.prev THEN 1 ELSE 0 END,\n                            "
        if no_backtrack
        else ""
    )
    for t in range(1, length + 1):
        if restart_mod:
            # each step CTE is referenced TWICE by the next one (teleport
            # branch + join branch) — MATERIALIZED stops DuckDB from
            # inlining the chain exponentially
            rcond = f"(w.wh + {t} * {WALK_MULT_STEP}) % {restart_mod} = 0"
            parts.append(
                f"""
, {x}_w{t} AS MATERIALIZED (
    SELECT w.walk_id, w.walk_id AS cur, w.cur AS prev, w.wh
    FROM {x}_w{t - 1} w WHERE {rcond}
    UNION ALL
    SELECT walk_id, dst_key AS cur, cur_was AS prev, wh FROM (
        SELECT w.walk_id, e.dst_key, w.cur AS cur_was, w.wh,
               row_number() OVER (
                   PARTITION BY w.walk_id
                   ORDER BY (e.th_dst * {WALK_MULT_DST}
                             + {t} * {WALK_MULT_STEP} + e.th_src) % {M},
                            e.dst_key
               ) AS rn
        FROM {x}_w{t - 1} w JOIN {x}_adj e ON e.src_key = w.cur
        WHERE NOT ({rcond})
    ) WHERE rn = 1
)"""
            )
            continue
        parts.append(
            f"""
, {x}_w{t} AS (
    SELECT walk_id, dst_key AS cur, cur_was AS prev FROM (
        SELECT w.walk_id, e.dst_key, w.cur AS cur_was,
               row_number() OVER (
                   PARTITION BY w.walk_id
                   ORDER BY {bt}(e.th_dst * {WALK_MULT_DST}
                             + {t} * {WALK_MULT_STEP} + e.th_src) % {M},
                            e.dst_key
               ) AS rn
        FROM {x}_w{t - 1} w JOIN {x}_adj e ON e.src_key = w.cur
    ) WHERE rn = 1
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, cur AS vertex_key "
        f"FROM {x}_w{t}"
        for t in range(length + 1)
    )
    return f"{edges_cte}{''.join(parts)}\n{union}"
