"""Common-neighbor link prediction over the undirected edge set.

For every vertex, the single best PREDICTED new link: the non-adjacent
partner sharing the most common neighbors, where only "centers" (the
shared neighbors) with undirected degree in ``[2, deg_cap]`` count.  The
degree cap is the scale contract: a hub center (a shared tool vertex with
millions of incident turns) contributes ``C(deg, 2)`` candidate pairs but
near-zero signal — standard common-neighbor / Adamic-Adar practice drops
or downweights hubs, and dropping them bounds the total wedge volume by
``V * C(deg_cap, 2)`` regardless of skew.  Reference analog: the two-hop
request-chain self-join features (/root/reference/code/features/
utils.py:470-486), re-expressed as bounded bucket shuffles.

Shuffle shape (every intermediate bounded by the cap):

1. canonical distinct undirected pairs — one pair-hash bucket groupby
   (kernels shared with :mod:`webgraph_ray.graph.triangles`),
2. per-vertex degree — per-batch partials + owner-bucket numpy reduce,
3. per-center neighbor pairs — one center-bucket groupby; per bucket a
   vectorized ``triu_indices`` over each center's sorted neighbor block,
4. pair-count combine — one pair-hash bucket groupby,
5. drop already-adjacent pairs — packed-rank ``searchsorted`` probe
   against a broadcast edge set below the size gate, marker left-join
   above it,
6. per-vertex argmax — one vertex-bucket groupby; ties broken by partner
   KEY (not id) so the DuckDB mirror reproduces the choice exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.functions.joins import bucketed_join
from webgraph_ray.graph.triangles import _canonical_batch, _deg_partials

#: fixed-point scale for the resource-allocation weight 1/deg(center) —
#: ``RA_SCALE // d`` is exact integer floor division in both numpy and the
#: DuckDB mirror (`1048576 // d`), so the score stays hash-comparable.
RA_SCALE = 1 << 20

#: fixed-point scale for the Jaccard coefficient of the chosen pair —
#: ``(cn * JAC_SCALE) // (deg(u) + deg(w) - cn)`` is exact integer floor
#: division (the denominator is the size of the neighbor-set union, always
#: >= max(deg) >= 1 for a candidate pair), mirrored verbatim in DuckDB.
JAC_SCALE = 1 << 20

_PAIR_SCHEMA = pa.schema(
    [
        pa.field("u", pa.int64()),
        pa.field("w", pa.int64()),
        pa.field("cn", pa.int64()),
        pa.field("ra", pa.int64()),
    ]
)
_EMPTY_PAIRS = pa.table(
    {
        "u": pa.array([], pa.int64()),
        "w": pa.array([], pa.int64()),
        "cn": pa.array([], pa.int64()),
        "ra": pa.array([], pa.int64()),
    },
    schema=_PAIR_SCHEMA,
)


def _center_pairs(g: pd.DataFrame) -> pa.Table:
    """All neighbor pairs (u < w by id) through every center in one hash
    bucket of centers, partial-combined within the bucket.  Each pair
    carries both the common-neighbor count and the resource-allocation
    partial (sum of ``RA_SCALE // deg(center)`` over its centers)."""
    if len(g) < 2:
        return _EMPTY_PAIRS
    g = g.sort_values(["c", "n"], kind="mergesort")
    c = g["c"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    cw = g["cw"].to_numpy(np.int64)
    _, starts = np.unique(c, return_index=True)
    bounds = np.append(starts, len(c))
    us, ws, pws = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        k = e - s
        if k < 2:
            continue
        i, j = np.triu_indices(k, k=1)
        us.append(n[s + i])
        ws.append(n[s + j])
        # cw is constant within a center block
        pws.append(np.full(len(i), cw[s], dtype=np.int64))
    if not us:
        return _EMPTY_PAIRS
    pair = np.stack([np.concatenate(us), np.concatenate(ws)], axis=1)
    pw = np.concatenate(pws)
    uniq, inverse = np.unique(pair, axis=0, return_inverse=True)
    counts = np.bincount(inverse, minlength=len(uniq)).astype(np.int64)
    # integer-valued float64 sums are exact far beyond any per-bucket total
    ra = np.bincount(inverse, weights=pw, minlength=len(uniq)).astype(np.int64)
    return pa.table(
        {
            "u": pa.array(uniq[:, 0]),
            "w": pa.array(uniq[:, 1]),
            "cn": pa.array(counts),
            "ra": pa.array(ra),
        },
        schema=_PAIR_SCHEMA,
    )


def undirected_pairs(
    edges: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Distinct undirected pairs ``(a, b), a < b`` — per-batch dedup
    partials then ONE pair-hash bucket groupby (materialized so callers
    can fan out without recompute)."""
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    def _pair_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = a * np.uint64(0x9E3779B97F4A7C15) + b
        bk = (mix % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("pair_bucket", pa.array(bk))

    def _dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    return (
        edges.map_batches(_canonical_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_pair_bucket, batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(_dedup_bucket, batch_format="pandas")
        .materialize()
    )


def undirected_degrees(
    und: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-vertex distinct-neighbor degree over an `undirected_pairs`
    output — per-batch partials + owner-bucket numpy reduce."""
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    def _deg_bucket(t: pa.Table) -> pa.Table:
        p = _deg_partials(t)
        vid = p["vertex_id"].to_numpy(zero_copy_only=False)
        return p.append_column("vb", pa.array((vid % num_partitions).astype(np.int32)))

    def _deg_reduce(g: pd.DataFrame) -> pd.DataFrame:
        vid = g["vertex_id"].to_numpy(np.int64)
        dv = g["deg"].to_numpy(np.int64)
        order = np.argsort(vid, kind="stable")
        vid, dv = vid[order], dv[order]
        uniq, starts = np.unique(vid, return_index=True)
        return pd.DataFrame({"vertex_id": uniq, "deg": np.add.reduceat(dv, starts)})

    return (
        und.map_batches(_deg_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vb")
        .map_groups(_deg_reduce, batch_format="pandas")
    )


def link_prediction(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    deg_cap: int = 64,
    num_partitions: int | None = None,
    broadcast_threshold: int = 4_000_000,
    und: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Best predicted new link per vertex.

    Returns ``Dataset(vertex_id, lp_partner, lp_cn, lp_ra_fp, lp_jac_fp)``
    where ``lp_partner`` is the partner's vertex KEY, ``lp_cn`` its
    common-neighbor count, ``lp_ra_fp`` the resource-allocation score of
    the same chosen pair (sum of ``RA_SCALE // deg(center)`` over shared
    centers — the exact-integer analog of RA's 1/deg downweighting) and
    ``lp_jac_fp`` its Jaccard coefficient ``cn * JAC_SCALE //
    (deg(u) + deg(w) - cn)`` (neighbor-set overlap over union); only
    vertices with at least one candidate pair appear (left-join + fill
    against a vertex universe for the dense view).

    Below ``broadcast_threshold`` undirected edges the adjacency-exclusion
    probe broadcasts a packed sorted edge array (``ray.put`` once, one
    vectorized ``searchsorted`` per batch); above it a marker left-join
    over pair-hash buckets takes over — no driver materialization of
    anything O(E) on that path.  Pass a precomputed `undirected_pairs`
    output as ``und`` to share the pair dedup with other consumers
    (clustering coefficient, triangle counting).
    """
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    def _pair_bucket(t: pa.Table, cols=("a", "b")) -> pa.Table:
        a = t[cols[0]].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t[cols[1]].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = a * np.uint64(0x9E3779B97F4A7C15) + b
        bk = (mix % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("pair_bucket", pa.array(bk))

    if und is None:
        und = undirected_pairs(edges, num_partitions)
    small = und.count() <= broadcast_threshold

    # --- per-vertex undirected degree (owner-bucket numpy reduce) ---------
    deg = undirected_degrees(und, num_partitions)

    # --- center-filtered adjacency: rows (c, n), deg(c) in [2, deg_cap] ---
    def _both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c": pa.array(np.concatenate([a, b])),
                "n": pa.array(np.concatenate([b, a])),
            }
        )

    nbr = und.map_batches(_both_dirs, batch_format="pyarrow", zero_copy_batch=True)

    if small:
        dpdf = deg.to_pandas()
        ok = (dpdf["deg"] >= 2) & (dpdf["deg"] <= deg_cap)
        kept = dpdf.loc[ok].sort_values("vertex_id")
        centers_ref = ray.put(
            (
                kept["vertex_id"].to_numpy(dtype=np.int64),
                (RA_SCALE // kept["deg"].to_numpy(dtype=np.int64)).astype(
                    np.int64
                ),
            )
        )

        def keep_centers(t: pa.Table) -> pa.Table:
            centers, weights = ray.get(centers_ref)
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(centers) == 0 or len(c) == 0:
                empty = t.filter(pa.array(np.zeros(len(c), dtype=bool)))
                return empty.append_column("cw", pa.array([], pa.int64()))
            idx = np.searchsorted(centers, c)
            hit = (idx < len(centers)) & (
                centers[np.minimum(idx, len(centers) - 1)] == c
            )
            kept_t = t.filter(pa.array(hit))
            cw = weights[idx[hit]]
            return kept_t.append_column("cw", pa.array(cw))

        nbr = nbr.map_batches(keep_centers, batch_format="pyarrow", zero_copy_batch=True)
    else:
        centers = deg.map_batches(
            lambda df: pd.DataFrame(
                {
                    "c": df.loc[
                        (df["deg"] >= 2) & (df["deg"] <= deg_cap), "vertex_id"
                    ].to_numpy(dtype=np.int64),
                    "cw": (
                        RA_SCALE
                        // df.loc[
                            (df["deg"] >= 2) & (df["deg"] <= deg_cap), "deg"
                        ].to_numpy(dtype=np.int64)
                    ).astype(np.int64),
                }
            ),
            batch_format="pandas",
        )
        nbr = bucketed_join(
            nbr, centers, keys=["c"], how="inner", num_buckets=num_partitions
        )

    def _c_bucket(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("cb", pa.array((c % num_partitions).astype(np.int32)))

    pairs = (
        nbr.map_batches(_c_bucket, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(_center_pairs, batch_format="pandas")
    )

    # --- global pair-count combine (one pair-hash bucket groupby) ---------
    def _sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["u", "w"], as_index=False, sort=False)[["cn", "ra"]]
            .sum()
            .astype({"cn": np.int64, "ra": np.int64})
        )

    cn = (
        pairs.map_batches(
            lambda t: _pair_bucket(t, cols=("u", "w")), batch_format="pyarrow"
        )
        .groupby("pair_bucket")
        .map_groups(_sum_bucket, batch_format="pandas")
    )

    # --- drop pairs that are already edges ---------------------------------
    if small:
        updf = und.to_pandas()
        e_a = updf["a"].to_numpy(dtype=np.int64)
        e_b = updf["b"].to_numpy(dtype=np.int64)
        vocab = np.unique(np.concatenate([e_a, e_b]))
        assert len(vocab) < (1 << 32), "rank packing needs < 2^32 vertices"
        packed = np.sort(
            (np.searchsorted(vocab, e_a).astype(np.int64) << 32)
            | np.searchsorted(vocab, e_b).astype(np.int64)
        )
        edge_ref = ray.put((vocab, packed))

        def drop_adjacent(t: pa.Table) -> pa.Table:
            voc, pk = ray.get(edge_ref)
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(u) == 0 or len(pk) == 0:
                return t
            iu = np.searchsorted(voc, u)
            iw = np.searchsorted(voc, w)
            # candidates can involve vertices, but both endpoints of a
            # candidate pair are by construction in the edge vocabulary
            q = (iu.astype(np.int64) << 32) | iw.astype(np.int64)
            idx = np.searchsorted(pk, q)
            present = (idx < len(pk)) & (pk[np.minimum(idx, len(pk) - 1)] == q)
            return t.filter(pa.array(~present))

        newp = cn.map_batches(drop_adjacent, batch_format="pyarrow", zero_copy_batch=True)
    else:
        marker = und.map_batches(
            lambda df: df.rename(columns={"a": "u", "b": "w"}).assign(
                __und=np.int8(1)
            ),
            batch_format="pandas",
        )
        joined = bucketed_join(
            cn, marker, keys=["u", "w"], how="left", num_buckets=num_partitions
        )
        newp = joined.map_batches(
            lambda df: df.loc[df["__und"].isna(), ["u", "w", "cn", "ra"]].astype(
                {"cn": np.int64, "ra": np.int64}
            ),
            batch_format="pandas",
        )

    # --- Jaccard of each surviving candidate pair ---------------------------
    # jac = cn / |N(u) ∪ N(w)| = cn / (deg(u) + deg(w) - cn), exact
    # fixed-point (denominator >= max endpoint degree >= 1 by construction).
    # Below the gate the per-vertex degree table (O(V), far smaller than
    # the edge set) broadcasts once; above it two bucketed joins attach the
    # endpoint degrees.
    if small:
        dsort = dpdf.sort_values("vertex_id")
        deg_ref = ray.put(
            (
                dsort["vertex_id"].to_numpy(dtype=np.int64),
                dsort["deg"].to_numpy(dtype=np.int64),
            )
        )

        def add_jac(t: pa.Table) -> pa.Table:
            vid, dv = ray.get(deg_ref)
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = t["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
            # every candidate endpoint appears in `und`, so both lookups hit
            du = dv[np.searchsorted(vid, u)] if len(u) else np.empty(0, np.int64)
            dw = dv[np.searchsorted(vid, w)] if len(w) else np.empty(0, np.int64)
            jac = (c * JAC_SCALE) // (du + dw - c) if len(u) else np.empty(0, np.int64)
            return t.append_column("jac", pa.array(jac.astype(np.int64)))

        newp = newp.map_batches(add_jac, batch_format="pyarrow", zero_copy_batch=True)
    else:
        du_t = deg.map_batches(
            lambda df: df.rename(columns={"vertex_id": "u", "deg": "du"}),
            batch_format="pandas",
        )
        dw_t = deg.map_batches(
            lambda df: df.rename(columns={"vertex_id": "w", "deg": "dw"}),
            batch_format="pandas",
        )
        newp = bucketed_join(
            newp, du_t, keys=["u"], how="inner", num_buckets=num_partitions
        )
        newp = bucketed_join(
            newp, dw_t, keys=["w"], how="inner", num_buckets=num_partitions
        )

        def jac_big(df: pd.DataFrame) -> pd.DataFrame:
            c = df["cn"].to_numpy(np.int64)
            den = df["du"].to_numpy(np.int64) + df["dw"].to_numpy(np.int64) - c
            df = df[["u", "w", "cn", "ra"]].copy()
            df["jac"] = (c * JAC_SCALE) // den
            return df

        newp = newp.map_batches(jac_big, batch_format="pandas")

    # --- symmetrize, attach partner keys, per-vertex argmax ----------------
    def _sym(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["ra"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = t["jac"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "v": pa.array(np.concatenate([u, w])),
                # partner id under the join column name attach_keys expects
                "vertex_id": pa.array(np.concatenate([w, u])),
                "cn": pa.array(np.concatenate([c, c])),
                "ra": pa.array(np.concatenate([r, r])),
                "jac": pa.array(np.concatenate([j, j])),
            }
        )

    from webgraph_ray.pipelines.flagship import attach_keys

    sym = newp.map_batches(_sym, batch_format="pyarrow", zero_copy_batch=True)
    with_keys = attach_keys(sym, vertices).map_batches(
        lambda df: df[["v", "vertex_key", "cn", "ra", "jac"]].rename(
            columns={"vertex_key": "lp_partner"}
        ),
        batch_format="pandas",
    )

    def _v_bucket(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("vb", pa.array((v % num_partitions).astype(np.int32)))

    def _best(g: pd.DataFrame) -> pd.DataFrame:
        # the winner is chosen by (cn DESC, partner key) exactly as before;
        # lp_ra_fp / lp_jac_fp report the RA and Jaccard scores of that
        # SAME chosen pair
        g = g.sort_values(
            ["v", "cn", "lp_partner"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("v", keep="first")
        return g[["v", "lp_partner", "cn", "ra", "jac"]].rename(
            columns={
                "v": "vertex_id",
                "cn": "lp_cn",
                "ra": "lp_ra_fp",
                "jac": "lp_jac_fp",
            }
        )

    return (
        with_keys.map_batches(_v_bucket, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(_best, batch_format="pandas")
    )
