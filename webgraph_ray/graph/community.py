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


def shared_und_layout(
    edges: ray.data.Dataset, num_buckets: int | None = None
) -> tuple:
    """Materialize the (und pairs, both-direction neighbors) layout ONCE
    so an LPA -> modularity -> refinement chain shares it instead of
    re-deriving the distinct undirected universe per stage (each
    derivation is a bucket-distinct shuffle of the edge table)."""
    from webgraph_ray.functions.shuffle import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    und = _und_pairs(edges, num_buckets).materialize()

    def both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "v": np.concatenate(
                    [df["a"].to_numpy(object), df["b"].to_numpy(object)]
                ),
                "u": np.concatenate(
                    [df["b"].to_numpy(object), df["a"].to_numpy(object)]
                ),
            }
        )

    nbr = und.map_batches(both, batch_format="pandas").materialize()
    return und, nbr


def _und_pairs(edges: ray.data.Dataset, num_buckets: int) -> ray.data.Dataset:
    """(a, b) rows: the distinct undirected pairs (a < b, self-loops
    dropped) — the same ``und`` universe the triangle oracle uses."""
    from webgraph_ray.functions.shuffle import bucket_distinct

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src_key"].astype(str)
        d = df["dst_key"].astype(str)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s.to_numpy(object), d.to_numpy(object))
        b = np.maximum(s.to_numpy(object), d.to_numpy(object))
        return pd.DataFrame({"a": a, "b": b})

    return bucket_distinct(
        edges.select_columns(["src_key", "dst_key"]).map_batches(
            pairs, batch_format="pandas"
        ),
        ["a", "b"],
        num_buckets=num_buckets,
    )


def _und_neighbors(
    edges: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    """(v, u) rows: both directions of the distinct undirected pairs."""
    und = _und_pairs(edges, num_buckets)

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
    nbr: ray.data.Dataset | None = None,
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

    if nbr is None:
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


def community_lpa_sql(
    base_cte: str, rounds: int = COMMUNITY_ROUNDS, final_select: bool = True
) -> str:
    """Exact DuckDB mirror: unrolled mode-update CTE chain.

    ``final_select=False`` returns just the CTE chain (ending at
    ``cm_l{rounds}``) so callers can append further CTEs — the
    modularity mirror builds on top of it."""
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
    if final_select:
        parts.append(
            f"""
SELECT v AS vertex_key, lbl AS label FROM cm_l{rounds}"""
        )
    return "".join(parts)


MODULARITY_SCALE = 10**9


def community_modularity(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset | None = None,
    rounds: int = COMMUNITY_ROUNDS,
    num_buckets: int | None = None,
    broadcast_threshold: int = 5_000_000,
    und: ray.data.Dataset | None = None,
    metric: str = "modularity",
) -> pd.DataFrame:
    """Per-community fixed-point Newman modularity of the mode-LPA
    partition, plus the exact ``__total__`` sum.

    ``metric="conductance"`` reuses the identical aggregation (the cut
    falls out of the same two counters: cut_c = deg_c - 2*in_c) and
    reports per-community conductance ``(S*cut_c) // min(vol_c,
    2m - vol_c)`` (-1 when the denominator is 0, i.e. one community
    holds every endpoint) with a ``__max__`` summary row instead of the
    ``__total__`` sum.

    Universe: the distinct undirected pair graph (``m`` pairs, the same
    ``und`` the triangle oracle uses); communities = final LPA labels.
    Only communities with >=1 incident undirected edge appear (an
    isolated singleton's contribution is exactly 0), matching the SQL
    mirror.  Per community ``c`` with ``in_c`` internal pairs and
    ``deg_c`` member-degree sum, the contribution is the two-floor
    fixed-point form (each term nonnegative, so Python floor ==
    truncation == DuckDB ``//``)::

        q_c = (S*4*m*in_c) // (4*m^2)  -  (S*deg_c^2) // (4*m^2)

    with S = MODULARITY_SCALE.  The intermediate products exceed int64
    (deg_c^2 alone can), so the per-community formula runs on Python
    arbitrary-precision ints inside the bucket combine (DuckDB mirrors
    with HUGEINT); the stored contributions are int64-bounded (|q_c|
    <= S).  Scale shape: label attachment is the house size-gated
    broadcast (``ray.put`` once) vs two bucketed hash joins above the
    threshold; per-batch (community, deg, internal) partials collapse in
    a fixed-cardinality bucket combine, so shuffled bytes are O(distinct
    communities), not O(E); only the per-community result table (the
    gate row itself) reaches the driver.

    Output columns: ``vertex_key`` (community label or ``__total__``),
    ``label`` (stringified q_c, the labelprop row's value column).

    Reference analog: none (WebGraph stops at ancestor flags); Newman
    modularity (Newman & Girvan 2004) is the standard partition-quality
    readout for the community operator, built to the house standard.
    """
    import ray as _ray

    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.joins import bucketed_join
    from webgraph_ray.functions.shuffle import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    if labels is None:
        labels = community_lpa(
            edges,
            rounds=rounds,
            num_buckets=num_buckets,
            broadcast_threshold=broadcast_threshold,
        ).materialize()
    if und is None:
        und = _und_pairs(edges, num_buckets).materialize()
    m = int(und.count())
    if m == 0:
        return pd.DataFrame({"vertex_key": ["__total__"], "label": ["0"]})

    if labels.count() <= broadcast_threshold:
        ldf = labels.to_pandas()
        ref = _ray.put(
            pd.Series(
                ldf["label"].to_numpy(object),
                index=ldf["vertex_key"].to_numpy(object),
            )
        )

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            mp = _ray.get(ref)
            return pd.DataFrame(
                {
                    "ca": df["a"].map(mp).to_numpy(object),
                    "cb": df["b"].map(mp).to_numpy(object),
                }
            )

        tagged = und.map_batches(tag, batch_format="pandas")
    else:
        la = labels.map_batches(
            lambda df: df.rename(columns={"vertex_key": "a", "label": "ca"}),
            batch_format="pandas",
        )
        lb = labels.map_batches(
            lambda df: df.rename(columns={"vertex_key": "b", "label": "cb"}),
            batch_format="pandas",
        )
        j1 = bucketed_join(und, la, keys=["a"], num_buckets=num_buckets)
        tagged = bucketed_join(
            j1.map_batches(
                lambda df: df[["b", "ca"]], batch_format="pandas"
            ),
            lb,
            keys=["b"],
            num_buckets=num_buckets,
        )

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        ca = df["ca"].to_numpy(object)
        cb = df["cb"].to_numpy(object)
        t = pd.DataFrame(
            {
                "c": np.concatenate([ca, cb]),
                "inc": np.concatenate(
                    [(ca == cb).astype(np.int64), np.zeros(len(df), np.int64)]
                ),
            }
        )
        g = (
            t.groupby("c", sort=False)
            .agg(deg=("inc", "size"), inc=("inc", "sum"))
            .reset_index()
        )
        g["__b"] = (hash_keys(g["c"].to_numpy(object)) % num_buckets).astype(
            np.int32
        )
        return g

    if metric not in ("modularity", "conductance"):
        raise ValueError(metric)
    S = MODULARITY_SCALE
    denom = 4 * m * m

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("c", sort=False)[["deg", "inc"]].sum().reset_index()
        if metric == "modularity":
            q = [
                (S * 4 * m * int(i)) // denom - (S * int(d) * int(d)) // denom
                for d, i in zip(agg["deg"], agg["inc"])
            ]
        else:
            q = [
                (S * (int(d) - 2 * int(i))) // min(int(d), 2 * m - int(d))
                if min(int(d), 2 * m - int(d)) > 0
                else -1
                for d, i in zip(agg["deg"], agg["inc"])
            ]
        return pd.DataFrame(
            {
                "vertex_key": agg["c"].to_numpy(object),
                "label": [str(x) for x in q],
                "__q": np.array(q, dtype=np.int64),
            }
        )

    per = (
        tagged.map_batches(partials, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
        .materialize()
    )
    if metric == "modularity":
        summary = ("__total__", str(int(per.sum("__q"))))
    else:
        summary = ("__max__", str(int(per.max("__q"))))
    out = per.select_columns(["vertex_key", "label"]).to_pandas()
    return pd.concat(
        [
            out,
            pd.DataFrame({"vertex_key": [summary[0]], "label": [summary[1]]}),
        ],
        ignore_index=True,
    )


def community_modularity_sql(
    base_cte: str,
    rounds: int = COMMUNITY_ROUNDS,
    metric: str = "modularity",
) -> str:
    """Exact DuckDB mirror of :func:`community_modularity`: the LPA CTE
    chain, then the same two-floor HUGEINT arithmetic (or the
    conductance floor when ``metric="conductance"``)."""
    S = MODULARITY_SCALE
    chain = community_lpa_sql(base_cte, rounds=rounds, final_select=False)
    if metric == "modularity":
        q_expr = f"""
           (CAST({S} AS HUGEINT) * 4 * m.m * d.inc)
               // (4 * CAST(m.m AS HUGEINT) * m.m)
         - (CAST({S} AS HUGEINT) * d.deg * d.deg)
               // (4 * CAST(m.m AS HUGEINT) * m.m)"""
        summary = "SELECT '__total__', CAST(sum(q) AS VARCHAR) FROM md_q"
    elif metric == "conductance":
        q_expr = f"""
           CASE WHEN least(CAST(d.deg AS HUGEINT),
                           2 * CAST(m.m AS HUGEINT) - d.deg) = 0 THEN -1
                ELSE (CAST({S} AS HUGEINT) * (d.deg - 2 * d.inc))
                     // least(CAST(d.deg AS HUGEINT),
                              2 * CAST(m.m AS HUGEINT) - d.deg) END"""
        summary = "SELECT '__max__', CAST(max(q) AS VARCHAR) FROM md_q"
    else:
        raise ValueError(metric)
    return (
        chain
        + f"""
, md_tag AS MATERIALIZED (
    SELECT la.lbl AS ca, lb.lbl AS cb
    FROM cm_und u
    JOIN cm_l{rounds} la ON la.v = u.a
    JOIN cm_l{rounds} lb ON lb.v = u.b
), md_m AS (SELECT count(*) AS m FROM md_tag)
, md_deg AS (
    SELECT c, count(*) AS deg, sum(i) AS inc FROM (
        SELECT ca AS c, CASE WHEN ca = cb THEN 1 ELSE 0 END AS i FROM md_tag
        UNION ALL SELECT cb, 0 FROM md_tag)
    GROUP BY 1
), md_q AS (
    SELECT c, {q_expr} AS q
    FROM md_deg d CROSS JOIN md_m m
)
SELECT c AS vertex_key, CAST(q AS VARCHAR) AS label FROM md_q
UNION ALL
{summary}"""
    )


# ---------------------------------------------------------------------------
# Parallel greedy modularity refinement (Louvain-style move phase).
# Starting from a partition (default: the mode-LPA labels), every vertex
# simultaneously considers moving to the community of one of its
# neighbors: the candidate score is the standard Louvain gain comparator
# scaled by 2m to stay integral,
#
#     g(v -> c) = 2*m*k_vc - (tot(c) - deg_v*[c == own]) * deg_v
#
# (k_vc = v's neighbors in c, tot(c) = degree mass of c, both over the
# distinct undirected pair graph), argmax with (score desc, community
# asc) tie-break, "stay" included as a candidate.  Moves are synchronous
# (the distributed-Louvain convention — deterministic, one bounded
# exchange per round, no sequential vertex scan), so a fixed ``rounds``
# budget is part of the semantics rather than run-to-convergence.
# Products exceed int64 at design scale: Python-int / HUGEINT on the
# two engines.  Reference analog: none (WebGraph stops at ancestor
# flags); Blondel et al. 2008 move phase, built to the house standard.
# ---------------------------------------------------------------------------

LOUVAIN_ROUNDS = 2


def louvain_refine(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset | None = None,
    rounds: int = LOUVAIN_ROUNDS,
    num_buckets: int | None = None,
    broadcast_threshold: int = 5_000_000,
    nbr: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(vertex_key, label) after ``rounds`` synchronous greedy
    modularity-refinement moves over the partition ``labels`` (defaults
    to the mode-LPA partition).

    Scale shape per round (below ``broadcast_threshold`` vertices): the
    label / degree / community-mass maps are ``ray.put`` once and every
    candidate is scored map-side, leaving ONE v-bucket combine; above
    the gate the same dataflow runs through bucketed hash joins (label
    attachment on the neighbor key, own+deg attachment on v, mass
    attachment on the community key).  A vertex with no undirected
    neighbor keeps its label (computed once, not per round)."""
    import ray as _ray

    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.joins import bucketed_join
    from webgraph_ray.functions.shuffle import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    if nbr is None:
        nbr = _und_neighbors(edges, num_buckets).materialize()
    if labels is None:
        labels = community_lpa(
            edges,
            num_buckets=num_buckets,
            broadcast_threshold=broadcast_threshold,
        ).materialize()

    def to_vl(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "v": df["vertex_key"].to_numpy(object),
                "lbl": df["label"].to_numpy(object),
            }
        )

    labels = labels.map_batches(to_vl, batch_format="pandas").materialize()
    m = int(nbr.count()) // 2
    if m == 0:
        return labels.map_batches(
            lambda df: pd.DataFrame(
                {"vertex_key": df["v"], "label": df["lbl"]}
            ),
            batch_format="pandas",
        )

    # per-vertex undirected degree (constant across rounds): map-side
    # partial counts + one v-bucket combine
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", sort=False).size().rename("deg").reset_index()
        g["__b"] = (hash_keys(g["v"].to_numpy(object)) % num_buckets).astype(
            np.int32
        )
        return g

    def deg_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", sort=False)["deg"].sum().reset_index()

    deg = (
        nbr.map_batches(deg_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(deg_combine, batch_format="pandas")
        .materialize()
    )

    # isolated vertices (in labels, no und neighbor) keep their label —
    # computed ONCE, unioned back each round (same idiom as LPA; label
    # rows ride through the anti-join so no follow-up semi-join)
    def tag_lbl(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["v", "lbl"]].copy()
        out["__s"] = np.int8(0)
        out["__b"] = (
            hash_keys(out["v"].to_numpy(object)) % num_buckets
        ).astype(np.int32)
        return out

    def tag_deg(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["v"]].drop_duplicates().copy()
        out["lbl"] = None
        out["__s"] = np.int8(1)
        out["__b"] = (
            hash_keys(out["v"].to_numpy(object)) % num_buckets
        ).astype(np.int32)
        return out

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["__s"] == 1, "v"])
        return g.loc[(g["__s"] == 0) & ~g["v"].isin(have), ["v", "lbl"]]

    iso_labels = (
        labels.map_batches(tag_lbl, batch_format="pandas")
        .union(deg.map_batches(tag_deg, batch_format="pandas"))
        .groupby("__b")
        .map_groups(anti, batch_format="pandas")
        .materialize()
    )

    def winners_group(
        g: pd.DataFrame,
    ) -> pd.DataFrame:
        """rows: (v, c, kvc, own, deg, tot) -> one (v, lbl) winner each."""
        agg = (
            g.groupby(["v", "c"], sort=False)
            .agg(
                kvc=("kvc", "sum"),
                own=("own", "first"),
                deg=("deg", "first"),
                tot=("tot", "first"),
            )
            .reset_index()
        )
        score = [
            2 * m * int(k) - (int(t) - (int(d) if c == o else 0)) * int(d)
            for k, c, o, d, t in zip(
                agg["kvc"], agg["c"], agg["own"], agg["deg"], agg["tot"]
            )
        ]
        agg["__score"] = score  # python ints (object) — exact compare
        agg = agg.sort_values(
            ["v", "__score", "c"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        win = agg.drop_duplicates("v", keep="first")
        return pd.DataFrame({"v": win["v"], "lbl": win["c"]})

    small = labels.count() <= broadcast_threshold

    for _ in range(rounds):
        # community degree mass tot(c): labels ⋈ deg on v, combine on c
        if small:
            ldf = labels.to_pandas()
            ddf = deg.to_pandas()
            own_s = pd.Series(
                ldf["lbl"].to_numpy(object), index=ldf["v"].to_numpy(object)
            )
            deg_s = pd.Series(
                ddf["deg"].to_numpy(np.int64),
                index=ddf["v"].to_numpy(object),
            )
            tot_df = pd.DataFrame(
                {"c": own_s.reindex(deg_s.index).to_numpy(object),
                 "deg": deg_s.to_numpy(np.int64)}
            )
            tot_s = tot_df.groupby("c", sort=False)["deg"].sum()
            maps_ref = _ray.put((own_s, deg_s, tot_s))

            def cand_partial(df: pd.DataFrame) -> pd.DataFrame:
                own_m, deg_m, tot_m = _ray.get(maps_ref)
                cu = df["u"].map(own_m).to_numpy(object)
                t = pd.DataFrame({"v": df["v"].to_numpy(object), "c": cu})
                g = (
                    t.groupby(["v", "c"], sort=False)
                    .size()
                    .rename("kvc")
                    .reset_index()
                )
                # own candidate rides along with kvc = 0
                vs = g["v"].drop_duplicates()
                own_rows = pd.DataFrame(
                    {
                        "v": vs.to_numpy(object),
                        "c": vs.map(own_m).to_numpy(object),
                        "kvc": np.zeros(len(vs), np.int64),
                    }
                )
                out = pd.concat([g, own_rows], ignore_index=True)
                out["own"] = out["v"].map(own_m).to_numpy(object)
                out["deg"] = out["v"].map(deg_m).to_numpy(np.int64)
                out["tot"] = out["c"].map(tot_m).to_numpy(np.int64)
                out["__b"] = (
                    hash_keys(out["v"].to_numpy(object)) % num_buckets
                ).astype(np.int32)
                return out

            winners = (
                nbr.map_batches(cand_partial, batch_format="pandas")
                .groupby("__b")
                .map_groups(winners_group, batch_format="pandas")
                .materialize()
            )
        else:
            # joined scale path: label attachment on u; kvc combine on v;
            # own+deg+tot attachment through bucketed joins
            lbl_u = labels.map_batches(
                lambda df: df.rename(columns={"v": "u", "lbl": "c"}),
                batch_format="pandas",
            )
            withc = bucketed_join(nbr, lbl_u, keys=["u"], num_buckets=num_buckets)

            def kvc_partial(df: pd.DataFrame) -> pd.DataFrame:
                g = (
                    df.groupby(["v", "c"], sort=False)
                    .size()
                    .rename("kvc")
                    .reset_index()
                )
                g["__b"] = (
                    hash_keys(g["v"].to_numpy(object)) % num_buckets
                ).astype(np.int32)
                return g

            def kvc_combine(g: pd.DataFrame) -> pd.DataFrame:
                return (
                    g.groupby(["v", "c"], sort=False)["kvc"]
                    .sum()
                    .reset_index()
                )

            kvc = (
                withc.map_batches(kvc_partial, batch_format="pandas")
                .groupby("__b")
                .map_groups(kvc_combine, batch_format="pandas")
            )
            vown = bucketed_join(
                labels, deg, keys=["v"], num_buckets=num_buckets
            ).materialize()
            own_rows = vown.map_batches(
                lambda df: pd.DataFrame(
                    {
                        "v": df["v"].to_numpy(object),
                        "c": df["lbl"].to_numpy(object),
                        "kvc": np.zeros(len(df), np.int64),
                    }
                ),
                batch_format="pandas",
            )
            cand = kvc.union(own_rows)
            cand = bucketed_join(
                cand,
                vown.map_batches(
                    lambda df: df.rename(columns={"lbl": "own"}),
                    batch_format="pandas",
                ),
                keys=["v"],
                num_buckets=num_buckets,
            )

            def tot_partial(df: pd.DataFrame) -> pd.DataFrame:
                g = (
                    df.groupby("lbl", sort=False)["deg"].sum().reset_index()
                ).rename(columns={"lbl": "c", "deg": "tot"})
                g["__b"] = (
                    hash_keys(g["c"].to_numpy(object)) % num_buckets
                ).astype(np.int32)
                return g

            def tot_combine(g: pd.DataFrame) -> pd.DataFrame:
                return g.groupby("c", sort=False)["tot"].sum().reset_index()

            tot = (
                vown.map_batches(tot_partial, batch_format="pandas")
                .groupby("__b")
                .map_groups(tot_combine, batch_format="pandas")
            )
            cand = bucketed_join(cand, tot, keys=["c"], num_buckets=num_buckets)

            def tag_v(df: pd.DataFrame) -> pd.DataFrame:
                out = df.copy()
                out["__b"] = (
                    hash_keys(out["v"].to_numpy(object)) % num_buckets
                ).astype(np.int32)
                return out

            winners = (
                cand.map_batches(tag_v, batch_format="pandas")
                .groupby("__b")
                .map_groups(winners_group, batch_format="pandas")
                .materialize()
            )
        labels = winners.union(iso_labels).materialize()

    return labels.map_batches(
        lambda df: pd.DataFrame({"vertex_key": df["v"], "label": df["lbl"]}),
        batch_format="pandas",
    )


def louvain_refine_sql(
    base_cte: str,
    lpa_rounds: int = COMMUNITY_ROUNDS,
    rounds: int = LOUVAIN_ROUNDS,
    seed_select: str | None = None,
) -> str:
    """Exact DuckDB mirror of :func:`louvain_refine` seeded by the LPA
    partition: unrolled synchronous move rounds over HUGEINT scores.

    ``seed_select``: a ``SELECT v, lbl FROM ...`` statement providing the
    seed partition instead of the LPA chain (mirrors passing ``labels``
    to the Ray side; the LPA CTEs are then skipped entirely)."""
    chain = community_lpa_sql(
        base_cte,
        rounds=lpa_rounds if seed_select is None else 0,
        final_select=False,
    )
    seed = seed_select or f"SELECT v, lbl FROM cm_l{lpa_rounds}"
    parts = [
        chain,
        f"""
, lv_m AS (SELECT count(*) AS m FROM cm_und)
, lv_deg AS MATERIALIZED (SELECT v, count(*) AS deg FROM cm_nbr GROUP BY 1)
, lv_l0 AS ({seed})""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
, lv_kvc{r} AS (
    SELECT n.v, l.lbl AS c, count(*) AS kvc
    FROM cm_nbr n JOIN lv_l{r - 1} l ON l.v = n.u
    GROUP BY 1, 2
), lv_cand{r} AS (
    SELECT v, c, sum(kvc) AS kvc FROM (
        SELECT v, c, kvc FROM lv_kvc{r}
        UNION ALL
        SELECT d.v, l.lbl, 0 FROM lv_deg d JOIN lv_l{r - 1} l ON l.v = d.v)
    GROUP BY 1, 2
), lv_tot{r} AS (
    SELECT l.lbl AS c, sum(d.deg) AS tot
    FROM lv_l{r - 1} l JOIN lv_deg d ON d.v = l.v
    GROUP BY 1
), lv_sc{r} AS (
    SELECT a.v, a.c,
           2 * CAST(m.m AS HUGEINT) * a.kvc
             - (t.tot - CASE WHEN o.lbl = a.c THEN d.deg ELSE 0 END)
               * CAST(d.deg AS HUGEINT) AS score
    FROM lv_cand{r} a
    JOIN lv_tot{r} t ON t.c = a.c
    JOIN lv_l{r - 1} o ON o.v = a.v
    JOIN lv_deg d ON d.v = a.v
    CROSS JOIN lv_m m
), lv_w{r} AS (
    SELECT v, c FROM (
        SELECT v, c,
               row_number() OVER (
                   PARTITION BY v ORDER BY score DESC, c ASC) AS rn
        FROM lv_sc{r}) WHERE rn = 1
), lv_l{r} AS (
    SELECT p.v, coalesce(w.c, p.lbl) AS lbl
    FROM lv_l{r - 1} p LEFT JOIN lv_w{r} w ON w.v = p.v
)"""
        )
    parts.append(
        f"""
SELECT v AS vertex_key, lbl AS label FROM lv_l{rounds}"""
    )
    return "".join(parts)
