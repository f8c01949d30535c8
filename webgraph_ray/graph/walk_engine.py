"""Routed random walks: per-partition adjacency actors advance walker
state through an actor-to-actor exchange — one tiny routed message per
step — instead of rescanning the edge table every step.

The round-4 scan-path (`stages/walks.py`) streams ONE full pass over the
edge table per step to advance a frontier that fits in a page; at 100 TB
with length=7 that is 7 full-corpus scans.  Here the adjacency partitions
ONCE (hive-partitioned parquet by src-owner, the same build-once contract
as `graph/engine.py` layouts), each actor holds its partition's CSR in
memory, and a step costs O(sum deg(frontier)) work plus one P-way
exchange of (walk_id, vertex) pairs whose size is the ACTIVE WALKER
count — independent of |E|.  That also lifts the scan path's
driver-frontier bound: walks can start from EVERY vertex (seed_mod=1,
the GraphSAGE workload) because walker state lives sharded in the
actors, never on the driver.

Choice rule (identical to stages/walks.py, so the same DuckDB mirror
applies and a pytest pins engine-path == scan-path):

    at step t the walk at ``src`` moves to the out-neighbor ``dst``
    minimizing (tokhash(dst)*131 + t*16007 + tokhash(src)) % M,
    ties to the smaller dst_key; a walk at a vertex with no out-edges
    stops.

Every choice is a pure function of (src, dst, t), so results are
byte-identical under any partitioning or exchange order.

Reference analog: the per-visit neighborhood expansions in
/root/reference/code/features/structure.py:129-163 (ancestry / 2-hop
walks), generalized to fixed-length sampled walks; the routed-state
design is the round-4 verdict's item #2.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.functions.texthash import M, hash_token_list
from webgraph_ray.stages.walks import (
    WALK_LEN,
    WALK_MULT_DST,
    WALK_MULT_STEP,
    WALK_SEED_MOD,
)


def _th(keys) -> np.ndarray:
    return hash_token_list([str(k) for k in keys])


def hash_key_order(th: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Stable permutation ordering rows by (th, key): an int64 argsort on
    the stored token hash, plus a string sort ONLY inside hash-collision
    runs.  Replaces the object-dtype string mergesort that dominated
    partition-actor init at 48M edges (BASELINE.md: ~70-85s/actor) — the
    16-char token-hash cap means keys sharing a long prefix collide in
    small groups, and everything outside those groups never pays a string
    comparison."""
    perm = np.argsort(th, kind="stable")
    n = len(perm)
    if n < 2:
        return perm
    th_s = th[perm]
    keys_s = keys[perm]
    same_th = th_s[1:] == th_s[:-1]
    trouble = same_th & (keys_s[1:] != keys_s[:-1])
    if not trouble.any():
        return perm
    # string-sort only the runs that actually mix distinct keys
    run_id = np.zeros(n, dtype=np.int64)
    np.cumsum(~same_th, out=run_id[1:])
    bad = np.unique(run_id[1:][trouble])
    sub = np.flatnonzero(np.isin(run_id, bad))
    order = (
        pd.DataFrame({"r": run_id[sub], "k": keys_s[sub]})
        .sort_values(["r", "k"], kind="mergesort")
        .index.to_numpy()
    )
    perm[sub] = perm[sub][order]
    return perm


def hash_unique(
    th: np.ndarray, keys: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(th_u, keys_u, inverse): the distinct keys in canonical (th, key)
    order — the engines' replacement for ``np.unique`` on object strings."""
    n = len(keys)
    if n == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.array([], dtype=object),
            np.zeros(0, dtype=np.int64),
        )
    perm = hash_key_order(th, keys)
    th_s, keys_s = th[perm], keys[perm]
    newg = np.ones(n, dtype=bool)
    newg[1:] = (th_s[1:] != th_s[:-1]) | (keys_s[1:] != keys_s[:-1])
    starts = np.flatnonzero(newg)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.cumsum(newg) - 1
    return th_s[starts], keys_s[starts], inv


def hash_lookup(
    th_u: np.ndarray, keys_u: np.ndarray, q_th: np.ndarray, q_keys: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact positions of ``q_keys`` in a canonical (th, key)-ordered
    universe: int64 searchsorted plus a linear scan only inside
    hash-collision runs.  Returns (pos, found)."""
    n = len(th_u)
    q_th = np.asarray(q_th, dtype=np.int64)
    q_keys = np.asarray(q_keys, dtype=object)
    pos = np.searchsorted(th_u, q_th).astype(np.int64)
    found = pos < n
    f = np.flatnonzero(found)
    if len(f):
        found[f] = th_u[pos[f]] == q_th[f]
    f = np.flatnonzero(found)
    if len(f):
        hit = keys_u[pos[f]] == q_keys[f]
        for i in f[~hit]:  # within-run scan: collision groups are tiny
            p = int(pos[i]) + 1
            ok = False
            while p < n and th_u[p] == q_th[i]:
                if keys_u[p] == q_keys[i]:
                    pos[i] = p
                    ok = True
                    break
                p += 1
            found[i] = ok
    return pos, found


def build_walk_layout(
    edges: ray.data.Dataset, work_dir: str, num_parts: int
) -> None:
    """One-time partitioned layout: edges hive-partitioned by the OWNER of
    their src vertex (owner = tokhash % P — computable anywhere from the
    key string, no global id assignment needed), plus a vertex-universe
    table partitioned by owner (so seed selection sees src-only AND
    dst-only vertices).  Token hashes are computed once here and stored,
    never recomputed per step."""
    P = int(num_parts)
    narrow = edges.select_columns(["src_key", "dst_key"])

    def prep_edges(t: pa.Table) -> pa.Table:
        src = t["src_key"].to_numpy(zero_copy_only=False)
        dst = t["dst_key"].to_numpy(zero_copy_only=False)
        ths, thd = _th(src), _th(dst)
        return pa.table(
            {
                "src_key": t["src_key"],
                "dst_key": t["dst_key"],
                "th_src": pa.array(ths),
                "th_dst": pa.array(thd),
                "part": pa.array(ths % P),
            }
        )

    narrow.map_batches(prep_edges, batch_format="pyarrow").write_parquet(
        os.path.join(work_dir, "edges"), partition_cols=["part"]
    )

    def prep_verts(t: pa.Table) -> pa.Table:
        src = t["src_key"].to_numpy(zero_copy_only=False)
        dst = t["dst_key"].to_numpy(zero_copy_only=False)
        keys = (
            pd.unique(np.concatenate([src, dst]))
            if len(t)
            else np.array([], dtype=object)
        )
        th = _th(keys)
        return pa.table(
            {
                "vertex_key": pa.array(keys, pa.string()),
                "th": pa.array(th),
                "part": pa.array(th % P),
            }
        )

    narrow.map_batches(prep_verts, batch_format="pyarrow").write_parquet(
        os.path.join(work_dir, "verts"), partition_cols=["part"]
    )
    # partition-count manifest: hive dirs are keyed th % P, so reusing a
    # layout at a different P silently mis-routes — written last so a
    # complete manifest implies a complete layout
    import json

    with open(os.path.join(work_dir, "layout_meta.json"), "w") as f:
        json.dump({"num_parts": P}, f)


def check_walk_layout(work_dir: str, num_parts: int) -> bool:
    """True if ``work_dir`` holds a complete layout; raises if it holds
    one built with a DIFFERENT partition count (routing by th % P_new
    over hive dirs keyed th % P_old silently loses the graph)."""
    import json

    if not os.path.isdir(os.path.join(work_dir, "edges")):
        return False
    meta_path = os.path.join(work_dir, "layout_meta.json")
    built_p = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            built_p = json.load(f).get("num_parts")
    if built_p != int(num_parts):
        raise ValueError(
            f"walk layout at {work_dir} was built with num_parts="
            f"{built_p}, requested {num_parts}; rebuild the layout or "
            f"pass the original num_parts"
        )
    return True


def read_layout_partition(
    work_dir: str, sub: str, part_id: int, columns
) -> pa.Table | None:
    """Read one hive partition of the walk layout (edges/verts) — the
    single on-disk contract shared by WalkPartition and AnfPartition."""
    import pyarrow.parquet as pq

    d = os.path.join(work_dir, sub, f"part={part_id}")
    if not os.path.isdir(d):
        return None
    files = [
        os.path.join(dp, f)
        for dp, _, fns in os.walk(d)
        for f in fns
        if f.endswith(".parquet")
    ]
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


@ray.remote(num_cpus=0)
class WalkPartition:
    """Owns the out-adjacency of every vertex whose tokhash % P equals
    ``part_id`` (CSR over key-sorted edges, built ONCE in __init__) plus
    the walkers currently AT one of those vertices.  ``step`` advances
    them vectorized and returns P outgoing slices routed by the next
    vertex's owner — the engine-exchange dataflow: the driver passes refs
    between actors and never touches walker data."""

    def __init__(self, work_dir: str, part_id: int, num_parts: int):
        self.part_id = int(part_id)
        self.P = int(num_parts)

        def _read(sub: str, columns) -> pa.Table:
            return read_layout_partition(work_dir, sub, part_id, columns)

        et = _read("edges", ["src_key", "dst_key", "th_src", "th_dst"])
        if et is None or et.num_rows == 0:
            self.usrc = np.array([], dtype=object)
            self.indptr = np.zeros(1, dtype=np.int64)
            self.dst = np.array([], dtype=object)
            self.th_dst = np.array([], dtype=np.int64)
            self.th_usrc = np.array([], dtype=np.int64)
        else:
            # canonical (th, key) order: CSR groups by src with an int64
            # sort — no object-dtype mergesort (hash_key_order docstring)
            src = et["src_key"].to_numpy(zero_copy_only=False).astype(object)
            th_src = et["th_src"].to_numpy(zero_copy_only=False).astype(np.int64)
            perm = hash_key_order(th_src, src)
            src, th_src = src[perm], th_src[perm]
            newg = np.ones(len(src), dtype=bool)
            newg[1:] = (th_src[1:] != th_src[:-1]) | (src[1:] != src[:-1])
            starts = np.flatnonzero(newg)
            self.usrc = src[starts]
            self.th_usrc = th_src[starts]
            self.indptr = np.concatenate([starts, [len(src)]]).astype(np.int64)
            self.dst = (
                et["dst_key"].to_numpy(zero_copy_only=False).astype(object)[perm]
            )
            self.th_dst = (
                et["th_dst"].to_numpy(zero_copy_only=False).astype(np.int64)[perm]
            )

        vt = _read("verts", ["vertex_key", "th"])
        if vt is None or vt.num_rows == 0:
            self.verts = np.array([], dtype=object)
            self.th_verts = np.array([], dtype=np.int64)
        else:
            vk = vt["vertex_key"].to_numpy(zero_copy_only=False).astype(object)
            th = vt["th"].to_numpy(zero_copy_only=False).astype(np.int64)
            self.th_verts, self.verts, _ = hash_unique(th, vk)

        self._empty = np.empty(0, dtype=object)
        self.act_wid = self._empty
        self.act_cur = self._empty
        self.act_prev = self._empty
        self.no_backtrack = False
        self.restart_mod = 0
        self.rows: list[tuple[np.ndarray, int, np.ndarray]] = []

    def init_walks(
        self,
        seed_mod: int,
        no_backtrack: bool = False,
        restart_mod: int = 0,
    ) -> int:
        """Seed walkers at owned vertices with tokhash % seed_mod == 0 and
        emit their step-0 rows.  Returns the local seed count."""
        self.no_backtrack = bool(no_backtrack)
        self.restart_mod = int(restart_mod or 0)
        m = (self.th_verts % seed_mod) == 0 if len(self.verts) else np.zeros(0, bool)
        seeds = self.verts[m]
        self.act_wid = seeds.copy()
        self.act_cur = seeds.copy()
        self.act_prev = np.full(len(seeds), None, dtype=object)
        self.rows = [(seeds, 0, seeds)] if len(seeds) else []
        return int(len(seeds))

    def _advance(self, wid: np.ndarray, cur: np.ndarray, prev: np.ndarray, t: int):
        """Vectorized hash-argmin step for walkers at owned vertices.
        Returns (next wid, next vertex, vertex-left) for the survivors.
        In no_backtrack mode candidates rank (is-predecessor, h, dst) —
        the predecessor is taken only when it is the sole out-neighbor.
        In restart mode the (walk_id, t) teleport hash is checked FIRST:
        firing walkers jump to their seed (= walk_id) regardless of
        adjacency — dead-end walkers survive a restart — and only the
        rest take the ordinary argmin step."""
        if len(wid) == 0:
            return self._empty, self._empty, self._empty
        if self.restart_mod:
            rst = (
                _th(wid) + t * WALK_MULT_STEP
            ) % self.restart_mod == 0
            if rst.any():
                keep = ~rst
                swid, scur, sprev = self._advance(
                    wid[keep], cur[keep], prev[keep], t
                )
                rwid = wid[rst].astype(object)
                return (
                    np.concatenate([rwid, swid]),
                    np.concatenate([rwid.copy(), scur]),
                    np.concatenate([cur[rst].astype(object), sprev]),
                )
        if self.no_backtrack:
            # the choice depends on (cur, prev): group by the pair.
            # prev None (step 0) encodes as '' — vertex keys are
            # non-empty, so '' never matches a neighbor
            pair_codes, upairs = pd.factorize(
                pd.Series(
                    [
                        f"{c}\x1f{p if p is not None else ''}"
                        for c, p in zip(cur, prev)
                    ],
                    dtype=object,
                ),
                sort=True,
            )
            ucur = np.array([s.split("\x1f", 1)[0] for s in upairs], dtype=object)
            uprev = np.array([s.split("\x1f", 1)[1] for s in upairs], dtype=object)
            inv = pair_codes
        else:
            ucur, inv = np.unique(cur, return_inverse=True)
            uprev = None
        pos, found = hash_lookup(self.th_usrc, self.usrc, _th(ucur), ucur)
        # next vertex per unique frontier state (object; None = dead end)
        nxt_u = np.full(len(ucur), None, dtype=object)
        fpos = pos[found]
        if len(fpos):
            starts = self.indptr[fpos]
            ends = self.indptr[fpos + 1]
            lens = (ends - starts).astype(np.int64)
            total = int(lens.sum())
            offs = np.cumsum(lens) - lens
            idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(offs, lens)
                + np.repeat(starts, lens)
            )
            h = (
                self.th_dst[idx] * WALK_MULT_DST
                + t * WALK_MULT_STEP
                + np.repeat(self.th_usrc[fpos], lens)
            ) % M
            if self.no_backtrack:
                # rank key = is_prev * (M+1) + h (exact: h < M < 2^31)
                prev_rep = np.repeat(uprev[found], lens)
                is_prev = self.dst[idx] == prev_rep
                h = h + is_prev.astype(np.int64) * (M + 1)
            minh = np.minimum.reduceat(h, offs)
            is_min = h == np.repeat(minh, lens)
            cand = np.where(is_min, np.arange(total, dtype=np.int64), total)
            first = np.minimum.reduceat(cand, offs)
            res_dst = self.dst[idx[first]].copy()
            # ties go to the smallest dst_key.  Neighbors are no longer
            # string-sorted within a group (the CSR orders by hash), so
            # multi-achiever groups — duplicate (src, dst) rows across edge
            # types, or an h collision, which since M is prime and the
            # multiplier is coprime requires equal th_dst — resolve by an
            # explicit string min over just those groups' achievers.
            nmin = np.add.reduceat(is_min.astype(np.int64), offs)
            mm = nmin > 1
            if mm.any():
                rows = np.flatnonzero(is_min & np.repeat(mm, lens))
                gid = np.repeat(np.arange(len(fpos)), lens)[rows]
                gmin = (
                    pd.Series(self.dst[idx[rows]], index=gid, dtype=object)
                    .groupby(level=0)
                    .min()
                )
                res_dst[gmin.index.to_numpy()] = gmin.to_numpy(dtype=object)
            nxt_u[found] = res_dst
        nxt = nxt_u[inv]
        alive = np.array([v is not None for v in nxt], dtype=bool)
        return wid[alive], nxt[alive].astype(object), cur[alive]

    def step(self, t: int, *incoming):
        """Advance resident + incoming walkers one step; emit step-t rows;
        return P outgoing (wid, cur, prev) slices routed by owner(next).
        The self slice stays resident and its return slot is empty."""
        wids = [self.act_wid]
        curs = [self.act_cur]
        prevs = [self.act_prev]
        for inc in incoming:
            if inc is None:
                continue
            w, c, p = inc
            if len(w):
                wids.append(np.asarray(w, dtype=object))
                curs.append(np.asarray(c, dtype=object))
                prevs.append(np.asarray(p, dtype=object))
        wid = np.concatenate(wids) if len(wids) > 1 else wids[0]
        cur = np.concatenate(curs) if len(curs) > 1 else curs[0]
        prev = np.concatenate(prevs) if len(prevs) > 1 else prevs[0]

        nwid, ncur, nprev = self._advance(wid, cur, prev, t)
        if len(nwid):
            self.rows.append((nwid, int(t), ncur))
        owner = (_th(ncur) % self.P) if len(ncur) else np.empty(0, np.int64)
        out = []
        for q in range(self.P):
            m = owner == q
            if q == self.part_id:
                self.act_wid = nwid[m]
                self.act_cur = ncur[m]
                self.act_prev = nprev[m]
                out.append((self._empty, self._empty, self._empty))
            else:
                out.append((nwid[m], ncur[m], nprev[m]))
        if self.P == 1:
            return out[0]
        return out

    def save_result(self, out_dir: str) -> int:
        """Write this partition's rows as its own parquet file — the
        scale sink for every-vertex walks (output stays sharded; a failed
        run re-writes only missing partitions).  Returns the row count."""
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        t = self.result()
        pq.write_table(
            t, os.path.join(out_dir, f"part-{self.part_id:05d}.parquet")
        )
        return t.num_rows

    def result(self) -> pa.Table:
        """All (walk_id, step, vertex_key) rows this partition emitted."""
        if not self.rows:
            return pa.table(
                {
                    "walk_id": pa.array([], pa.string()),
                    "step": pa.array([], pa.int64()),
                    "vertex_key": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "walk_id": pa.array(
                    np.concatenate([r[0] for r in self.rows]), pa.string()
                ),
                "step": pa.array(
                    np.concatenate(
                        [np.full(len(r[0]), r[1], np.int64) for r in self.rows]
                    )
                ),
                "vertex_key": pa.array(
                    np.concatenate([r[2] for r in self.rows]), pa.string()
                ),
            }
        )


def random_walks_engine(
    edges: ray.data.Dataset,
    work_dir: str,
    length: int = WALK_LEN,
    seed_mod: int = WALK_SEED_MOD,
    num_parts: int | None = None,
    output_dir: str | None = None,
    no_backtrack: bool = False,
    restart_mod: int | None = None,
) -> pd.DataFrame | ray.data.Dataset:
    """Same contract and byte-identical output as
    `stages.walks.random_walks` (the DuckDB mirror
    `stages.walks.random_walks_sql` applies unchanged), computed by the
    routed-actor exchange: adjacency partitions once, each step ships only
    (walk_id, vertex) pairs between actors.  ``work_dir`` holds the
    partitioned layout (reusable across calls, like engine layouts).

    With ``output_dir`` the result NEVER lands on the driver: each actor
    writes its own parquet shard and a ``ray.data.Dataset`` over the
    directory is returned — the required shape for every-vertex walks
    (seed_mod=1), whose output is O(V * length) rows."""
    if no_backtrack and restart_mod:
        raise ValueError("no_backtrack and restart_mod are exclusive")
    if num_parts is None:
        num_parts = max(1, int(ray.cluster_resources().get("CPU", 4)) // 2)
    P = int(num_parts)
    if not check_walk_layout(work_dir, P):
        build_walk_layout(edges, work_dir, P)
    actors = [WalkPartition.remote(work_dir, q, P) for q in range(P)]
    try:
        ray.get(
            [
                a.init_walks.remote(
                    seed_mod, no_backtrack, int(restart_mod or 0)
                )
                for a in actors
            ]
        )
        # outs[p][q]: (wid, cur) slice from p to q after the latest step
        outs: list[list] = [[None] * P for _ in range(P)]
        for t in range(1, length + 1):
            new_outs = []
            for q, a in enumerate(actors):
                inc = [outs[p][q] for p in range(P) if p != q]
                if P == 1:
                    new_outs.append([a.step.remote(t)])
                else:
                    new_outs.append(
                        list(a.step.options(num_returns=P).remote(t, *inc))
                    )
            outs = new_outs
        if output_dir is not None:
            ray.get([a.save_result.remote(output_dir) for a in actors])
            return ray.data.read_parquet(output_dir)
        tables = ray.get([a.result.remote() for a in actors])
        res = pa.concat_tables(tables).to_pandas()
        return res.sort_values(
            ["walk_id", "step"], kind="mergesort"
        ).reset_index(drop=True)
    finally:
        for a in actors:
            ray.kill(a, no_restart=True)
