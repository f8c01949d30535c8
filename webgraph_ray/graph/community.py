"""Community detection: synchronous mode-based label propagation (LPA)
over the undirected distinct-pair graph, fully deterministic and mirrored
by an exact unrolled SQL oracle.

Reference analog: the reference stops at ancestor-flag propagation
(/root/reference/code/features/structure.py:137-163); unseeded
community LPA (Raghavan et al. 2007, made deterministic here) is a
beyond-reference graph operator, built to the house standard.

Semantics (fixed ``rounds`` synchronous updates):

- graph: DISTINCT undirected pairs (multiplicity ignored, self-loops
  dropped) — the same ``und`` universe the triangle oracle uses;
- init: every vertex (any key appearing on either edge side) is labeled
  with its own key;
- round: each vertex adopts the label with the highest count among its
  neighbors' current labels, ties broken by the lexicographically
  smallest label; a vertex with no neighbors keeps its label.

Everything is a Ray Data composition — no engine actors: per round, ONE
bucketed hash join ships the V-row label table to the adjacency (the
transpose exchange every LPA iteration fundamentally needs), then
map-side (vertex, label) partial counts collapse in a fixed-cardinality
bucket combine (the house pattern — shuffled bytes are O(distinct
(v,label) votes), not O(E)).  The adjacency table builds once and is
reused by every round.  Labels are strings; ASCII keys make the
numpy/pandas tie-break identical to DuckDB's binary collation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

COMMUNITY_ROUNDS = 4


def _und_neighbors(
    edges: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    """(v, u) rows: both directions of the distinct undirected pairs."""
    from webgraph_ray.functions.shuffle import bucket_distinct

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src_key"].astype(str)
        d = df["dst_key"].astype(str)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s.to_numpy(object), d.to_numpy(object))
        b = np.maximum(s.to_numpy(object), d.to_numpy(object))
        return pd.DataFrame({"a": a, "b": b})

    und = bucket_distinct(
        edges.select_columns(["src_key", "dst_key"]).map_batches(
            pairs, batch_format="pandas"
        ),
        ["a", "b"],
        num_buckets=num_buckets,
    )

    def both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "v": np.concatenate([df["a"].to_numpy(object), df["b"].to_numpy(object)]),
                "u": np.concatenate([df["b"].to_numpy(object), df["a"].to_numpy(object)]),
            }
        )

    return und.map_batches(both, batch_format="pandas")


def community_lpa(
    edges: ray.data.Dataset,
    rounds: int = COMMUNITY_ROUNDS,
    num_buckets: int | None = None,
    broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """(vertex_key, label) after ``rounds`` deterministic mode-LPA updates.

    When the vertex universe fits under ``broadcast_threshold`` rows the
    per-round label⋈adjacency shuffle is replaced by the house small-side
    pattern: the label map is ``ray.put`` once per round and votes are
    resolved map-side against the static adjacency, leaving ONE
    fixed-cardinality groupby per round.  Above the threshold the join
    path runs (labels hash-bucketed against the adjacency)."""
    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.joins import bucketed_join
    from webgraph_ray.functions.shuffle import bucket_distinct, default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()

    nbr = _und_neighbors(edges, num_buckets).materialize()

    def flat_verts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "v": np.concatenate(
                    [
                        df["src_key"].astype(str).to_numpy(object),
                        df["dst_key"].astype(str).to_numpy(object),
                    ]
                )
            }
        )

    verts = bucket_distinct(
        edges.select_columns(["src_key", "dst_key"]).map_batches(
            flat_verts, batch_format="pandas"
        ),
        ["v"],
        num_buckets=num_buckets,
    )

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": df["v"], "lbl": df["v"]})

    labels = verts.map_batches(init_labels, batch_format="pandas").materialize()

    # Every round's winner table covers EXACTLY the vertices with >=1
    # undirected neighbor (the distinct cm_nbr.v set), and a neighbor-less
    # vertex keeps its init label forever — so the isolated remainder is
    # computed ONCE (bucket-grouped anti-join) and unioned back each round
    # instead of a per-round left join.
    def tag_side(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["v"]].drop_duplicates().copy()
            out["__s"] = np.int8(side)
            out["__b"] = (
                hash_keys(out["v"].to_numpy(object)) % num_buckets
            ).astype(np.int32)
            return out

        return f

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["__s"] == 1, "v"]
        keep = g.loc[(g["__s"] == 0) & ~g["v"].isin(set(have)), ["v"]]
        return pd.DataFrame({"v": keep["v"], "lbl": keep["v"]})

    iso_labels = (
        labels.map_batches(tag_side(0), batch_format="pandas")
        .union(nbr.map_batches(tag_side(1), batch_format="pandas"))
        .groupby("__b")
        .map_groups(anti, batch_format="pandas")
        .materialize()
    )

    # map-side partial vote counts, then fixed-cardinality bucket combine
    def vote_partials(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["v", "lbl"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out["__b"] = (
            hash_keys(out["v"].to_numpy(object)) % num_buckets
        ).astype(np.int32)
        return out

    def pick_winner(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["v", "lbl"], sort=False)["c"].sum().reset_index()
        # argmax count, tie -> smallest label (stable mergesort)
        agg = agg.sort_values(
            ["v", "c", "lbl"], ascending=[True, False, True], kind="mergesort"
        )
        win = agg.drop_duplicates("v", keep="first")
        return win[["v", "lbl"]]

    def rename_vu(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"v": "u"})

    small = labels.count() <= broadcast_threshold

    for _ in range(rounds):
        if small:
            # house small-side pattern: labels broadcast once per round,
            # votes resolved map-side against the static adjacency
            import ray as _ray

            lbl_df = labels.to_pandas()
            ref = _ray.put(
                pd.Series(
                    lbl_df["lbl"].to_numpy(object),
                    index=lbl_df["v"].to_numpy(object),
                )
            )

            def lookup_votes(df: pd.DataFrame) -> pd.DataFrame:
                m = _ray.get(ref)
                out = df[["v"]].copy()
                out["lbl"] = df["u"].map(m)
                return vote_partials(out)

            partials = nbr.map_batches(lookup_votes, batch_format="pandas")
        else:
            # ship labels to the adjacency: join on the NEIGHBOR key
            lbl_by_u = labels.map_batches(rename_vu, batch_format="pandas")
            joined = bucketed_join(
                nbr, lbl_by_u, keys=["u"], num_buckets=num_buckets
            )
            partials = joined.map_batches(vote_partials, batch_format="pandas")
        winners = (
            partials.groupby("__b")
            .map_groups(pick_winner, batch_format="pandas")
            .materialize()
        )
        labels = winners.union(iso_labels)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vertex_key": df["v"], "label": df["lbl"]})

    return labels.map_batches(final, batch_format="pandas")


def community_lpa_sql(base_cte: str, rounds: int = COMMUNITY_ROUNDS) -> str:
    """Exact DuckDB mirror: unrolled mode-update CTE chain."""
    parts = [
        base_cte,
        """
, cm_und AS MATERIALIZED (
    SELECT DISTINCT least(src_key, dst_key) AS a,
                    greatest(src_key, dst_key) AS b
    FROM edges WHERE src_key <> dst_key
), cm_nbr AS MATERIALIZED (
    SELECT a AS v, b AS u FROM cm_und
    UNION ALL SELECT b, a FROM cm_und
), cm_verts AS MATERIALIZED (
    SELECT DISTINCT src_key AS v FROM edges
    UNION SELECT DISTINCT dst_key FROM edges
), cm_l0 AS (SELECT v, v AS lbl FROM cm_verts)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
, cm_c{r} AS (
    SELECT n.v, l.lbl, count(*) AS c
    FROM cm_nbr n JOIN cm_l{r - 1} l ON l.v = n.u
    GROUP BY 1, 2
), cm_w{r} AS (
    SELECT v, lbl FROM (
        SELECT v, lbl,
               row_number() OVER (
                   PARTITION BY v ORDER BY c DESC, lbl ASC) AS rn
        FROM cm_c{r}) WHERE rn = 1
), cm_l{r} AS (
    SELECT p.v, coalesce(w.lbl, p.lbl) AS lbl
    FROM cm_l{r - 1} p LEFT JOIN cm_w{r} w ON w.v = p.v
)"""
        )
    parts.append(
        f"""
SELECT v AS vertex_key, lbl AS label FROM cm_l{rounds}"""
    )
    return "".join(parts)
