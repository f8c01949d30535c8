"""HyperANF: the approximate neighborhood function N(t) — how many
(source, target) pairs are within t hops — and the effective diameter,
computed with per-vertex HLL-style register vectors advanced through
the same routed partition-actor exchange as the walk engine.

Why this shape at 100 TB: the exact neighborhood function is |V| BFS
runs (quadratic); HyperANF (Boldi, Rosa & Vigna, WWW'11) replaces each
vertex's reachability SET with an m-register rank sketch whose union is
elementwise max — so one hop for EVERY vertex simultaneously is
  B_t(v) = max(B_{t-1}(v), elementwise-max over out-neighbors' B_{t-1})
and the whole frontier advances in one P-way exchange of fixed-width
uint8 register blocks (32 bytes/vertex here), never a per-vertex scan.
Adjacency partitions ONCE (the walk engine's build-once layout is
reused verbatim); each hop ships only boundary-vertex registers, each
boundary vertex ONCE per subscribing partition (subscriptions are
computed in a single init handshake).  Multi-edges need no dedup
anywhere — max-merge is idempotent.

Correctness contract: register evolution is EXACT integer state (the
approximation is only vertex-set -> sketch), so per-hop global
register_sum / nonzero_registers are exact integers mirrored
bit-for-bit by the unrolled DuckDB CTEs in `anf_sql` (gate row:
sketches kind='anf').  The float N-hat estimates and the effective
diameter are pytest-pinned against exact per-vertex BFS ball sizes
(tests/test_anf.py).

Hash conventions are shared with stages/sketch.py's HLL (same token
hash + KMV quadratic mix, same length(bin(w)) SQL rank idiom) so the
sketches cross-validate.

Reference analog: the reference's per-node ancestry/BFS features
(/root/reference/code/features/structure.py:129-163) compute exact
small-radius reachability per node; HyperANF is the all-radii,
all-vertices version that survives web scale.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from webgraph_ray.functions.texthash import M
from webgraph_ray.stages.sketch import KMV_C1, KMV_C2, KMV_C3

ANF_P = 5
ANF_M = 1 << ANF_P  # 32 registers/vertex
ANF_WBITS = 31 - ANF_P
ANF_WMOD = 1 << ANF_WBITS
ANF_RMAX = ANF_WBITS + 1  # 27
ANF_HOPS = 5
# alpha_m bias constant (Flajolet et al. 2007) for m = 32
ANF_ALPHA = 0.697


def _registers_from_th(th: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index j, rank rho) of each vertex from its stored token
    hash — KMV quadratic mix then the HLL split, identical to
    stages/sketch.py so `anf_sql` can reuse the SQL idioms."""
    th = th.astype(np.int64)
    u = (((th * th) % M) * KMV_C1 % M + (th * KMV_C2) % M + KMV_C3) % M
    j = u >> ANF_WBITS
    w = u & (ANF_WMOD - 1)
    rho = ANF_RMAX - np.frexp(w.astype(np.float64))[1]
    # frexp exponent of 0.0 is 0 -> rho = ANF_RMAX: the all-zero case
    return j.astype(np.int64), rho.astype(np.int64)


@ray.remote(num_cpus=0)
class AnfPartition:
    """Owns the registers of every vertex with tokhash % P == part_id
    plus the out-adjacency of those vertices (CSR into the sorted
    distinct-dst universe W, built once from the walk layout).  A hop:
    assemble the incoming register rows for W, max-reduce per source
    vertex, merge into own state, emit the new registers each
    subscribing partition needs."""

    def __init__(self, work_dir: str, part_id: int, num_parts: int):
        from webgraph_ray.graph.walk_engine import (
            hash_key_order,
            hash_lookup,
            hash_unique,
            read_layout_partition,
        )

        self.part_id = int(part_id)
        self.P = int(num_parts)

        def _read(sub: str, columns) -> pa.Table | None:
            return read_layout_partition(work_dir, sub, part_id, columns)

        # own vertex universe + initial registers, in canonical (th, key)
        # order — every sort/unique/lookup here rides the stored int64
        # token hash (hash_key_order docstring: the object-dtype mergesort
        # this replaces dominated init at 48M edges)
        vt = _read("verts", ["vertex_key", "th"])
        if vt is None or vt.num_rows == 0:
            self.verts = np.array([], dtype=object)
            self.th_verts = np.zeros(0, dtype=np.int64)
        else:
            vk = vt["vertex_key"].to_numpy(zero_copy_only=False).astype(object)
            tha = vt["th"].to_numpy(zero_copy_only=False).astype(np.int64)
            self.th_verts, self.verts, _ = hash_unique(tha, vk)
        self.B = np.zeros((len(self.verts), ANF_M), dtype=np.uint8)
        if len(self.verts):
            j, rho = _registers_from_th(self.th_verts)
            self.B[np.arange(len(self.verts)), j] = rho.astype(np.uint8)

        # CSR: own srcs -> positions in the distinct dst universe W
        et = _read("edges", ["src_key", "dst_key", "th_src", "th_dst"])
        if et is None or et.num_rows == 0:
            self.src_pos = np.array([], dtype=np.int64)
            self.indptr = np.zeros(1, dtype=np.int64)
            self.nbr_wpos = np.array([], dtype=np.int64)
            self.W = np.array([], dtype=object)
            self.w_th = np.zeros(0, dtype=np.int64)
            w_owner = np.array([], dtype=np.int64)
        else:
            src = et["src_key"].to_numpy(zero_copy_only=False).astype(object)
            th_src = (
                et["th_src"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            perm = hash_key_order(th_src, src)
            src, th_src = src[perm], th_src[perm]
            dst = (
                et["dst_key"].to_numpy(zero_copy_only=False).astype(object)[perm]
            )
            dst_th = (
                et["th_dst"].to_numpy(zero_copy_only=False).astype(np.int64)[perm]
            )
            self.w_th, self.W, winv = hash_unique(dst_th, dst)
            w_owner = self.w_th % self.P
            newg = np.ones(len(src), dtype=bool)
            newg[1:] = (th_src[1:] != th_src[:-1]) | (src[1:] != src[:-1])
            starts = np.flatnonzero(newg)
            self.indptr = np.concatenate([starts, [len(src)]]).astype(
                np.int64
            )
            self.nbr_wpos = winv.astype(np.int64)
            self.src_pos, _ = hash_lookup(
                self.th_verts, self.verts, th_src[starts], src[starts]
            )
        self._lookup = hash_lookup

        # W split by owner: positions (into W) each sender covers, in W's
        # canonical order — emit/receive slices align by INDEX in these
        # arrays (the subscription contract), no shared sortedness needed
        self.w_pos_by_owner = [
            np.flatnonzero(w_owner == q) for q in range(self.P)
        ]
        # self coverage: positions of own vertices inside W
        mine = self.w_pos_by_owner[self.part_id]
        self.self_w_pos = mine
        self.self_own_idx, _ = hash_lookup(
            self.th_verts, self.verts, self.w_th[mine], self.W[mine]
        )
        # subscriber -> indices of OWN vertices to emit (set in
        # set_subscriptions); R_in buffer reused every hop
        self.emit_idx: list[np.ndarray | None] = [None] * self.P
        self.R = np.zeros((len(self.W), ANF_M), dtype=np.uint8)
        # HyperBall accumulators (Boldi & Vigna 2013): harmonic
        # centrality hc(v) = sum_t (|ball_t(v)| - |ball_{t-1}(v)|) / t,
        # updated per hop from OWN registers only — no extra exchange.
        # Per-vertex registers are partitioning-independent (max-merge is
        # exact), so hc is bitwise identical at any P.
        self._hop = 0
        self.prev_est = self._per_vertex_est()
        self.hc = np.zeros(len(self.verts), dtype=np.float64)
        # sum-of-distances S(v) = sum_t t * gain_t — the closeness /
        # Lin's-index ingredient from the same paper, same free update
        self.sd = np.zeros(len(self.verts), dtype=np.float64)

    def _per_vertex_est(self) -> np.ndarray:
        """Per-own-vertex HLL ball-size estimate (the stats() estimator,
        unsummed)."""
        if not len(self.verts):
            return np.zeros(0, dtype=np.float64)
        s = np.ldexp(1.0, -self.B.astype(np.int64)).sum(axis=1)
        zeros = (self.B == 0).sum(axis=1)
        e_raw = ANF_ALPHA * ANF_M * ANF_M / s
        small = (e_raw <= 2.5 * ANF_M) & (zeros > 0)
        return np.where(
            small,
            ANF_M * np.log(ANF_M / np.maximum(zeros, 1)),
            e_raw,
        )

    def get_needs(self) -> list:
        """For each sender q: (keys, th) of W owned by q, in W's canonical
        order (empty for self — the self slice never ships).  th ships
        along so the sender's lookup never re-hashes."""
        empty = (np.array([], dtype=object), np.zeros(0, dtype=np.int64))
        return [
            empty
            if q == self.part_id
            else (
                self.W[self.w_pos_by_owner[q]],
                self.w_th[self.w_pos_by_owner[q]],
            )
            for q in range(self.P)
        ]

    def set_subscriptions(self, needs_by_subscriber: dict) -> None:
        """needs_by_subscriber[p] = (keys, th) owned by me that p needs."""
        for p, (keys, th) in needs_by_subscriber.items():
            k = np.asarray(keys, dtype=object)
            self.emit_idx[int(p)], _ = self._lookup(
                self.th_verts, self.verts, np.asarray(th, np.int64), k
            )

    def stats(self) -> tuple[int, int, float]:
        """(register_sum, nonzero_registers, N-hat contribution) of the
        owned vertices — one call per hop, no separate estimate round.
        ``prev_est`` always holds the post-latest-hop per-vertex
        estimates (set in __init__ and refreshed by step())."""
        rs = int(self.B.sum(dtype=np.int64))
        nz = int(np.count_nonzero(self.B))
        if not len(self.verts):
            return rs, nz, 0.0
        return rs, nz, float(self.prev_est.sum())

    def emit(self) -> list:
        """Current registers for each subscriber (self slot empty)."""
        out = []
        for p in range(self.P):
            idx = self.emit_idx[p]
            if p == self.part_id or idx is None or not len(idx):
                out.append(np.zeros((0, ANF_M), dtype=np.uint8))
            else:
                out.append(self.B[idx])
        if self.P == 1:
            return out[0]
        return out

    def centralities_topk(self, k: int) -> pa.Table:
        """This partition's top-k rows by accumulated harmonic centrality
        (ties to the smaller key), carrying the full geometric-centrality
        readout family from the HyperBall paper: harmonic hc(v), the
        sum-of-distances S(v), the final ball-size estimate, and Lin's
        index |ball|^2 / S (1.0 for vertices whose ball never grew).  The
        driver merges P of these and takes the global top-k."""
        n = len(self.verts)
        if n == 0:
            return pa.table(
                {
                    "vertex_key": pa.array([], pa.string()),
                    "centrality": pa.array([], pa.float64()),
                    "sum_dist": pa.array([], pa.float64()),
                    "ball": pa.array([], pa.float64()),
                    "lin": pa.array([], pa.float64()),
                }
            )
        k = min(int(k), n)
        thr = np.partition(self.hc, n - k)[n - k]
        cand = np.flatnonzero(self.hc >= thr)
        lin = np.where(
            self.sd[cand] > 0.0,
            self.prev_est[cand] ** 2 / np.maximum(self.sd[cand], 1e-300),
            1.0,
        )
        df = (
            pd.DataFrame(
                {
                    "vertex_key": self.verts[cand],
                    "centrality": self.hc[cand],
                    "sum_dist": self.sd[cand],
                    "ball": self.prev_est[cand],
                    "lin": lin,
                }
            )
            .sort_values(
                ["centrality", "vertex_key"],
                ascending=[False, True],
                kind="mergesort",
            )
            .head(k)
        )
        return pa.table(
            {
                "vertex_key": pa.array(
                    df["vertex_key"].to_numpy(dtype=object), pa.string()
                ),
                "centrality": pa.array(
                    df["centrality"].to_numpy(np.float64), pa.float64()
                ),
                "sum_dist": pa.array(
                    df["sum_dist"].to_numpy(np.float64), pa.float64()
                ),
                "ball": pa.array(
                    df["ball"].to_numpy(np.float64), pa.float64()
                ),
                "lin": pa.array(df["lin"].to_numpy(np.float64), pa.float64()),
            }
        )

    def step(self, *incoming) -> tuple:
        """One hop: merge neighbors' previous registers into own state,
        then emit the updated slices.  Returns (stats, out_0..out_{P-1})
        with stats = (register_sum, nonzero_registers) of own vertices
        AFTER the hop."""
        # assemble R over W: senders' arrays align with w_pos_by_owner
        qi = 0
        for q in range(self.P):
            if q == self.part_id:
                if len(self.self_w_pos):
                    self.R[self.self_w_pos] = self.B[self.self_own_idx]
                continue
            inc = incoming[qi]
            qi += 1
            pos = self.w_pos_by_owner[q]
            if inc is not None and len(pos):
                self.R[pos] = inc
        if len(self.src_pos):
            nbr_max = np.maximum.reduceat(
                self.R[self.nbr_wpos], self.indptr[:-1], axis=0
            )
            # fancy indexing yields a copy — assign back, never out=
            self.B[self.src_pos] = np.maximum(
                self.B[self.src_pos], nbr_max
            )
        # HyperBall update: credit this hop's ball growth at weight 1/t
        self._hop += 1
        if len(self.verts):
            est = self._per_vertex_est()
            gains = np.maximum(est - self.prev_est, 0.0)
            self.hc += gains / self._hop
            self.sd += gains * self._hop
            self.prev_est = est
        outs = self.emit()
        if self.P == 1:
            outs = [outs]
        return (self.stats(), *outs)


def _prepare_actors(
    edges: "ray.data.Dataset",
    work_dir: str,
    num_parts: int | None,
    reverse: bool,
) -> tuple[list, int]:
    """Shared setup for the ANF-family drivers: direction handling,
    build-once layout, actor spawn, subscription handshake."""
    from webgraph_ray.graph.walk_engine import (
        build_walk_layout,
        check_walk_layout,
    )

    if reverse:

        def _swap(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src_key": t["dst_key"],
                    "dst_key": t["src_key"],
                }
            )

        if edges is not None:
            edges = edges.select_columns(
                ["src_key", "dst_key"]
            ).map_batches(_swap, batch_format="pyarrow")
        # the on-disk layout is direction-blind, so a shared work_dir
        # must never serve both directions: the transposed layout lives
        # in its own subdir (a pre-built FORWARD layout silently served
        # as in-balls otherwise — round-5 review)
        work_dir = os.path.join(work_dir, "transposed")
    if num_parts is None:
        num_parts = max(1, int(ray.cluster_resources().get("CPU", 4)) // 2)
    P = int(num_parts)
    if not check_walk_layout(work_dir, P):
        build_walk_layout(edges, work_dir, P)
    actors = [AnfPartition.remote(work_dir, q, P) for q in range(P)]
    needs = ray.get([a.get_needs.remote() for a in actors])
    ray.get(
        [
            actors[q].set_subscriptions.remote(
                {
                    p: needs[p][q]
                    for p in range(P)
                    if p != q and len(needs[p][q][0])
                }
            )
            for q in range(P)
        ]
    )
    return actors, P


def _hop_loop(actors: list, P: int, hops: int) -> list[tuple]:
    """Run the P-way register exchange for ``hops`` hops; returns the
    per-hop (hop, register_sum, nonzero_registers, n_hat) rows."""
    rows = []
    st = ray.get([a.stats.remote() for a in actors])
    rows.append(
        (
            0,
            sum(s[0] for s in st),
            sum(s[1] for s in st),
            sum(s[2] for s in st),
        )
    )
    # outs[q][p]: q's emitted registers for p
    outs = [
        a.emit.options(num_returns=P).remote()
        if P > 1
        else [a.emit.remote()]
        for a in actors
    ]
    outs = [list(o) if P > 1 else o for o in outs]
    for t in range(1, int(hops) + 1):
        rets = [
            actors[p].step.options(num_returns=P + 1).remote(
                *[outs[q][p] for q in range(P) if q != p]
            )
            for p in range(P)
        ]
        rets = [list(r) for r in rets]
        st = ray.get([r[0] for r in rets])
        rows.append(
            (
                t,
                sum(s[0] for s in st),
                sum(s[1] for s in st),
                sum(s[2] for s in st),
            )
        )
        outs = [r[1:] for r in rets]
    return rows


def neighborhood_function(
    edges: "ray.data.Dataset",
    work_dir: str,
    hops: int = ANF_HOPS,
    num_parts: int | None = None,
    reverse: bool = False,
) -> pd.DataFrame:
    """HyperANF over the edge list: one row per hop t = 0..hops with the
    exact integer register fingerprints (register_sum,
    nonzero_registers — the gate columns) and the float N-hat estimate
    of sum_v |ball(v, t)|.  Reuses the walk engine's build-once
    partitioned layout in ``work_dir``.

    ``reverse=True`` computes IN-balls (how many vertices can reach v
    within t hops — the audience/influence readout) by building the
    layout over the transposed edge list; forward and reverse GLOBAL
    N-hat coincide on any graph (each counts reachable pairs once),
    which the pytest pins."""
    actors, P = _prepare_actors(edges, work_dir, num_parts, reverse)
    try:
        rows = _hop_loop(actors, P, hops)
        return pd.DataFrame(
            rows,
            columns=["hop", "register_sum", "nonzero_registers", "n_hat"],
        ).astype(
            {
                "hop": np.int64,
                "register_sum": np.int64,
                "nonzero_registers": np.int64,
            }
        )
    finally:
        for a in actors:
            ray.kill(a, no_restart=True)


def harmonic_centrality(
    edges: "ray.data.Dataset",
    work_dir: str,
    hops: int = ANF_HOPS,
    num_parts: int | None = None,
    topk: int = 20,
    reverse: bool = True,
    full: bool = False,
) -> pd.DataFrame:
    """HyperBall harmonic centrality (Boldi & Vigna, "In-Core Computation
    of Geometric Centralities with HyperBall", CIKM 2013): hc(v) =
    sum_{u != v} 1/d(u, v), estimated from the SAME register exchange as
    the neighborhood function — each hop, every vertex credits its ball
    growth at weight 1/t, entirely from its own registers (no extra
    exchange, no per-vertex BFS).  ``reverse=True`` (the default, and the
    paper's convention) uses in-balls, so hc(v) scores how quickly the
    rest of the graph REACHES v; ``reverse=False`` scores how quickly v
    reaches the graph.

    Per-vertex registers evolve identically under any partitioning
    (max-merge is exact), so the returned rows are bitwise reproducible
    at any ``num_parts`` — pytest-pinned.  Returns the global top-k by
    harmonic centrality, ties to the smaller key; cost over the plain
    neighborhood function is one O(V/P * m) numpy pass per hop.  With
    ``full=True`` the frame carries the paper's whole geometric family:
    ``sum_dist`` S(v) = sum_t t*gain_t (the closeness ingredient:
    closeness = 1/S), the final ``ball`` size estimate, and ``lin``
    (Lin's index |ball|^2 / S — closeness made comparable across
    different-sized reachable sets; 1.0 where the ball never grew).

    Reference analog: the reference's centrality-style per-node structure
    features (/root/reference/code/features/structure.py:129-163) are
    exact small-radius per-node expansions; this is the all-vertices
    geometric-centrality version that survives web scale."""
    actors, P = _prepare_actors(edges, work_dir, num_parts, reverse)
    try:
        _hop_loop(actors, P, hops)
        tables = ray.get(
            [a.centralities_topk.remote(int(topk)) for a in actors]
        )
        merged = pa.concat_tables(tables).to_pandas()
        merged = (
            merged.sort_values(
                ["centrality", "vertex_key"],
                ascending=[False, True],
                kind="mergesort",
            )
            .head(int(topk))
            .reset_index(drop=True)
        )
        if full:
            return merged
        return merged[["vertex_key", "centrality"]]
    finally:
        for a in actors:
            ray.kill(a, no_restart=True)


def effective_diameter(nf: pd.DataFrame, frac: float = 0.9) -> int:
    """Smallest hop t with N-hat(t) >= frac * N-hat(max hop) — the
    standard HyperANF effective-diameter readout (interpolation-free
    integer variant)."""
    target = frac * float(nf["n_hat"].iloc[-1])
    ok = nf[nf["n_hat"] >= target]
    return int(ok["hop"].iloc[0])


def mean_distance(nf: pd.DataFrame) -> float:
    """Estimated mean shortest-path distance over reachable pairs:
    sum_t t * (N-hat(t) - N-hat(t-1)) / (N-hat(max) - N-hat(0)) — the
    standard ANF readout next to the effective diameter (hop-0 pairs
    are the vertices themselves, excluded as distance-0 self-pairs)."""
    nh = nf["n_hat"].to_numpy(np.float64)
    t = nf["hop"].to_numpy(np.int64)
    # the register STATE is monotone but the estimator's branch switch
    # can dip n_hat between hops on small graphs — clamp gains at 0 in
    # numerator and denominator (the standard ANF readout)
    gains = np.maximum(np.diff(nh), 0.0)
    denom = gains.sum()
    if denom <= 0:
        return 0.0
    return float((t[1:] * gains).sum() / denom)


def anf_sql(cte_prefix: str, hops: int = ANF_HOPS) -> str:
    """DuckDB mirror of the exact integer register evolution: same
    vertex hash + mix + rank idiom as the Ray side, hops unrolled as
    materialized CTEs over the ``edges`` relation supplied by
    ``cte_prefix``.  Returns (hop, register_sum, nonzero_registers)."""
    from webgraph_ray.functions.texthash import sql_token_hash_expr

    h = sql_token_hash_expr("vertex_key")
    mix = (
        f"((({h} * {h}) % {M}) * {KMV_C1} % {M}"
        f" + ({h} * {KMV_C2}) % {M} + {KMV_C3}) % {M}"
    )
    parts = [
        f"""anf_v AS MATERIALIZED (
    SELECT vertex_key, {mix} AS u FROM (
        SELECT src_key AS vertex_key FROM edges
        UNION
        SELECT dst_key FROM edges
    )
),
anf_r0 AS MATERIALIZED (
    SELECT vertex_key, u // {ANF_WMOD} AS j,
           CASE WHEN u % {ANF_WMOD} = 0 THEN {ANF_RMAX}
                ELSE {ANF_RMAX} - length(bin(u % {ANF_WMOD})) END AS rho
    FROM anf_v
)"""
    ]
    for t in range(1, int(hops) + 1):
        parts.append(
            f"""anf_r{t} AS MATERIALIZED (
    SELECT vertex_key, j, max(rho) AS rho FROM (
        SELECT vertex_key, j, rho FROM anf_r{t - 1}
        UNION ALL
        SELECT e.src_key, r.j, r.rho
        FROM edges e JOIN anf_r{t - 1} r ON r.vertex_key = e.dst_key
    ) GROUP BY 1, 2
)"""
        )
    sums = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS hop,"
        f" CAST(sum(rho) AS BIGINT) AS register_sum,"
        f" CAST(count(*) AS BIGINT) AS nonzero_registers FROM anf_r{t}"
        for t in range(int(hops) + 1)
    )
    return (
        cte_prefix + ",\n" + ",\n".join(parts) + "\n" + sums
        + "\nORDER BY hop"
    )
