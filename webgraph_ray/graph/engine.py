"""Partitioned BSP graph engine: per-partition adjacency in actor workers.

The scale design mandated by the north rule (BASELINE.json): each iteration
is a sparse gather-scatter over per-partition adjacency blocks held in
actor-pool workers, with message exchange expressed as
groupby-aggregate-style combines keyed on destination-vertex ranges, and
explicit skew handling for hub vertices via salted splits.

How each requirement maps to this module:

- **Partitioning.**  Vertex ``v`` is *owned* by partition ``v % P`` (ids are
  uniform 64-bit hashes, so modulo is a uniform range partitioner).  Edges
  live with their source's owner — except hub edges (below).  The build step
  is plain Ray Data: narrow ``(src, dst, weight)`` projections written as
  hive-partitioned Parquet (``part=K/``), so a failed build resumes by
  partition directory and actors read only their slice.

- **Gather-scatter.**  At init each actor builds a compressed sparse
  adjacency block: the edge list sorted by ``dst`` with precomputed
  segment boundaries (the CSC/CSR-style indptr over destinations) and a
  searchsorted source-index array.  The per-iteration combine is then a
  single ``np.add.reduceat`` / ``np.minimum.reduceat`` over contiguous
  segments — a local groupby-aggregate on the destination key.  Messages
  leaving the actor are already combined *per destination vertex* (the
  map-side combine of SURVEY.md §4), so a hub vertex receives at most P
  partial values per iteration no matter its in-degree.

- **Skew / salted splits.**  A vertex whose *out*-edges exceed
  ``hub_threshold`` would concentrate its whole edge block on one
  partition.  Hub edges are instead salted across partitions by
  ``(src + dst) % P``, and the (small) per-iteration hub state is broadcast
  to all partitions through the object store — each actor maps it into its
  edge block via a searchsorted index precomputed at init.

- **Exchange.**  ``scatter`` returns P object refs
  (``num_returns=P``); the driver routes ref ``q`` of every actor to actor
  ``q``'s ``apply`` without touching the data (object-store-mediated
  all-to-all; on a multi-node cluster these transfers are the network
  shuffle).

- **Checkpoint / lineage.**  Every ``checkpoint_every`` iterations each
  actor atomically writes its owned vertex state
  (``ckpt/<algo>/iter=K/part=N.parquet``, temp-file + rename) and the
  driver then writes ``manifest.json`` (iteration, counters, per-partition
  files, build fingerprint) *last*.  Resume scans for the newest complete
  manifest and reloads actor state mid-algorithm.

The reference computes its per-vertex graph features one visit and one node
at a time on transient networkx graphs
(/root/reference/code/graph/graph_builder.py:66-68,
/root/reference/code/features/feature_extraction.py:88-103); this engine
replaces that with global BSP iteration, per SURVEY.md §2.6/§7.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

UNLABELED = np.int64(np.iinfo(np.int64).max)


# ---------------------------------------------------------------------------
# Build: Ray Data -> hive-partitioned parquet layout under work_dir
# ---------------------------------------------------------------------------


def _edge_partition_batch(num_parts: int, hub_ids: np.ndarray):
    """Assign each edge to a partition: src-owner normally, salted for hubs."""

    def fn(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (src % num_parts).astype(np.int32)
        if len(hub_ids):
            is_hub = np.isin(src, hub_ids)
            part[is_hub] = ((src[is_hub] + dst[is_hub]) % num_parts).astype(
                np.int32
            )
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "weight": pc.cast(batch["weight"], pa.float64()),
                "part": pa.array(part),
            }
        )

    return fn


def _vertex_partials_batch(num_parts: int):
    """Emit per-batch (vertex_id, cnt, part) incidence-count partials for
    both endpoints (map-side combine).  The per-owner reduce keeps exact
    incidence counts so a *delta* rebuild can patch vertex membership
    locally: a vertex leaves the graph exactly when its count hits 0."""

    def fn(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, cnt = np.unique(np.concatenate([src, dst]), return_counts=True)
        return pa.table(
            {
                "vertex_id": pa.array(ids),
                "cnt": pa.array(cnt.astype(np.int64)),
                "part": pa.array((ids % num_parts).astype(np.int32)),
            }
        )

    return fn


def _outdeg_partials_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial weighted out-degree (map-side combine)."""
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(src, kind="stable")
    s, wv = src[order], w[order]
    uniq, starts = np.unique(s, return_index=True)
    sums = np.add.reduceat(wv, starts)
    return pa.table({"vertex_id": pa.array(uniq), "out_strength": pa.array(sums)})


def _outdeg_partials_with_part(num_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        t = _outdeg_partials_batch(batch)
        vid = t["vertex_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((vid % num_parts).astype(np.int32)))

    return fn


@ray.remote
def _assemble_hub_remote(positions, n_hubs, *vals_per_actor):
    """Remote hub-broadcast assembly so chained iterations need no driver
    round-trip: takes each actor's owned-hub values (refs) and produces the
    next iteration's global hub array."""
    dtype = next(
        (v.dtype for v in vals_per_actor if len(v)), np.dtype(np.float64)
    )
    arr = np.zeros(n_hubs, dtype=dtype)
    for pos, vals in zip(positions, vals_per_actor):
        if len(vals):
            arr[pos] = vals
    return arr


_MIN_SENTINEL = np.iinfo(np.int64).max


@ray.remote
def _relay_combine_remote(args, op: str, *slices):
    """Stateless second-tier combiner for the tree exchange: merge one
    source GROUP's message slices for one destination partition into a
    single block aligned to the group's static union-outbox (``args`` =
    (per-member position maps into the union, union length), ray.put once
    at start()).  On a multi-node cluster Ray schedules this next to its
    inputs (the group's node), so the combine happens before the block
    crosses the network.  Position maps are unique per member, so plain
    fancy-indexed ops are exact.

    ``min`` drops entries that stayed at the int64-max sentinel — a
    minimum's identity element is a no-op at the receiver, so dropping it
    preserves min-label semantics exactly."""
    maps, length = args
    if op == "add_dense":
        agg = np.zeros(
            length,
            dtype=next((s.dtype for s in slices if len(s)), np.float64),
        )
        for m, s in zip(maps, slices):
            if len(s):
                agg[m] += s
        return agg
    if op == "add_sparse":
        agg = np.zeros(length, dtype=np.int64)
        touched = np.zeros(length, dtype=bool)
        for m, item in zip(maps, slices):
            idx, vals = item
            if len(vals):
                pos = m[idx]
                agg[pos] += vals
                touched[pos] = True
        nz = np.flatnonzero(touched).astype(np.uint32)
        return nz, agg[nz]
    # op == "min"
    agg = np.full(length, _MIN_SENTINEL, dtype=np.int64)
    for m, item in zip(maps, slices):
        idx, vals = item
        if len(vals):
            pos = m[idx]
            agg[pos] = np.minimum(agg[pos], vals)
    nz = np.flatnonzero(agg != _MIN_SENTINEL).astype(np.uint32)
    return nz, agg[nz]


@ray.remote
def _reduce_verts(partials_dir: str, out_dir: str, part: int):
    """Per-owner vertex reduce: sum incidence-count partials into one
    (vertex_id, cnt) file per partition (numpy, no sort shuffle)."""
    d = os.path.join(partials_dir, f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        return 0
    t = pq.read_table(d, columns=["vertex_id", "cnt"])
    vid = t["vertex_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vid, kind="stable")
    vid, c = vid[order], c[order]
    uniq, starts = np.unique(vid, return_index=True)
    sums = np.add.reduceat(c, starts)
    od = os.path.join(out_dir, f"part={part}")
    os.makedirs(od, exist_ok=True)
    tmp = os.path.join(od, f".tmp.{uuid.uuid4().hex[:8]}")
    pq.write_table(
        pa.table({"vertex_id": pa.array(uniq), "cnt": pa.array(sums)}), tmp
    )
    os.replace(tmp, os.path.join(od, "data.parquet"))
    return int(len(uniq))


def edges_part_contribution(part_dir: str):
    """Fingerprint contribution of one edges/part=K directory:
    (n_edges, weight_sum, order-insensitive content-hash term).  Shared by
    the full build and the delta build so their manifests are comparable."""
    if not os.path.isdir(part_dir):
        return 0, 0.0, 0
    t = pq.read_table(part_dir, columns=["src", "dst", "weight"])
    if not t.num_rows:
        return 0, 0.0, 0
    weight_sum = float(pa.compute.sum(t["weight"]).as_py() or 0.0)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
    w = (
        t["weight"]
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
        .view(np.uint64)
    )
    with np.errstate(over="ignore"):
        mix = src * np.uint64(0x9E3779B97F4A7C15)
        mix ^= dst * np.uint64(0xC2B2AE3D27D4EB4F)
        mix ^= w * np.uint64(0x165667B19E3779F9)
        mix ^= mix >> np.uint64(29)
        mix *= np.uint64(0xBF58476D1CE4E5B9)
        term = np.bitwise_xor.reduce(mix) + np.uint64(np.sum(mix, dtype=np.uint64))
    return int(t.num_rows), weight_sum, int(term)


def assemble_manifest(
    num_parts: int,
    hub_threshold: int,
    symmetrize: bool,
    num_hubs: int,
    part_terms: dict,
) -> dict:
    """Build-manifest dict from per-partition contribution terms.
    ``part_terms[str(p)] = [n_edges, weight_sum, hash_term]``.  Shared by
    build() and delta_build() so both produce comparable fingerprints."""
    n_edges = sum(int(v[0]) for v in part_terms.values())
    total_weight = sum(float(v[1]) for v in part_terms.values())
    content_hash = np.uint64(0)
    with np.errstate(over="ignore"):
        for v in part_terms.values():
            content_hash += np.uint64(int(v[2]))
    return {
        "num_parts": int(num_parts),
        "hub_threshold": int(hub_threshold),
        "symmetrize": bool(symmetrize),
        "num_hubs": int(num_hubs),
        "n_edges": int(n_edges),
        "total_weight": round(total_weight, 6),
        "content_hash": int(content_hash),
        "part_terms": part_terms,
    }


@ray.remote
def _part_contribution_remote(part_dir: str):
    return list(edges_part_contribution(part_dir))


@ray.remote
def _sym_strength_part(directed_dir: str, work_dir: str, part: int, num_parts: int):
    """Phase 1 of the symmetrize-from-layout fast path, over ONE directed
    edges/part=K: emit symmetrized out-strength partials (every edge
    contributes its weight to BOTH endpoints) and vertex incidence-count
    partials (2x per endpoint), each written per owner partition."""
    d = os.path.join(directed_dir, "edges", f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        return 0
    t = pq.read_table(d, columns=["src", "dst", "weight"])
    if not t.num_rows:
        return 0
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    vid = np.concatenate([src, dst])
    ww = np.concatenate([w, w])
    order = np.argsort(vid, kind="stable")
    vid, ww = vid[order], ww[order]
    uniq, starts, counts = np.unique(vid, return_index=True, return_counts=True)
    strength = np.add.reduceat(ww, starts)
    # symmetrized incidence: each appearance among directed src+dst becomes
    # two appearances (once as src of a row, once as dst of its reverse)
    cnt = (2 * counts).astype(np.int64)
    owner = (uniq % num_parts).astype(np.int32)
    tag = uuid.uuid4().hex[:8]
    for p in np.unique(owner):
        sel = owner == p
        od = os.path.join(work_dir, "outdeg_partials", f"part={int(p)}")
        os.makedirs(od, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "vertex_id": pa.array(uniq[sel]),
                    "out_strength": pa.array(strength[sel]),
                }
            ),
            os.path.join(od, f"sym_{part}_{tag}.parquet"),
        )
        vd = os.path.join(work_dir, "verts_partials", f"part={int(p)}")
        os.makedirs(vd, exist_ok=True)
        pq.write_table(
            pa.table(
                {"vertex_id": pa.array(uniq[sel]), "cnt": pa.array(cnt[sel])}
            ),
            os.path.join(vd, f"sym_{part}_{tag}.parquet"),
        )
    return int(len(uniq))


@ray.remote
def _sym_edges_part(
    directed_dir: str,
    work_dir: str,
    part: int,
    num_parts: int,
    hub_ids: np.ndarray,
):
    """Phase 2 of the symmetrize-from-layout fast path: read ONE directed
    edges/part=K, emit forward + reversed rows, and scatter them to their
    symmetrized partitions (same src-owner / salted-hub rule as build)."""
    d = os.path.join(directed_dir, "edges", f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        return 0
    t = pq.read_table(d, columns=["src", "dst", "weight"])
    if not t.num_rows:
        return 0
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dd = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    src = np.concatenate([s, dd])
    dst = np.concatenate([dd, s])
    ww = np.concatenate([w, w])
    p_out = (src % num_parts).astype(np.int64)
    if len(hub_ids):
        is_hub = np.isin(src, hub_ids)
        p_out[is_hub] = (src[is_hub] + dst[is_hub]) % num_parts
    tag = uuid.uuid4().hex[:8]
    for p in np.unique(p_out):
        sel = p_out == p
        od = os.path.join(work_dir, "edges", f"part={int(p)}")
        os.makedirs(od, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "src": pa.array(src[sel]),
                    "dst": pa.array(dst[sel]),
                    "weight": pa.array(ww[sel]),
                }
            ),
            os.path.join(od, f"sym_{part}_{tag}.parquet"),
        )
    return int(len(src))


@ray.remote
def _rev_strength_part(directed_dir: str, work_dir: str, part: int, num_parts: int):
    """Phase 1 of the reverse-from-layout fast path, over ONE directed
    edges/part=K: emit REVERSED out-strength partials (the forward dst is
    the reversed src, so each edge contributes its weight to its dst) and
    vertex incidence-count partials (identical to the forward build's —
    reversal permutes endpoints but not appearances), each written per
    owner partition."""
    d = os.path.join(directed_dir, "edges", f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        return 0
    t = pq.read_table(d, columns=["src", "dst", "weight"])
    if not t.num_rows:
        return 0
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    tag = uuid.uuid4().hex[:8]

    # reversed out-strength: keyed by the forward dst
    order = np.argsort(dst, kind="stable")
    dvid, dw = dst[order], w[order]
    duniq, dstarts = np.unique(dvid, return_index=True)
    strength = np.add.reduceat(dw, dstarts)
    owner = (duniq % num_parts).astype(np.int32)
    for p in np.unique(owner):
        sel = owner == p
        od = os.path.join(work_dir, "outdeg_partials", f"part={int(p)}")
        os.makedirs(od, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "vertex_id": pa.array(duniq[sel]),
                    "out_strength": pa.array(strength[sel]),
                }
            ),
            os.path.join(od, f"rev_{part}_{tag}.parquet"),
        )

    # incidence counts: appearances among src+dst (same as the forward build)
    vid = np.concatenate([src, dst])
    vorder = np.argsort(vid, kind="stable")
    vid = vid[vorder]
    vuniq, _, counts = np.unique(vid, return_index=True, return_counts=True)
    vowner = (vuniq % num_parts).astype(np.int32)
    for p in np.unique(vowner):
        sel = vowner == p
        vd = os.path.join(work_dir, "verts_partials", f"part={int(p)}")
        os.makedirs(vd, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "vertex_id": pa.array(vuniq[sel]),
                    "cnt": pa.array(counts[sel].astype(np.int64)),
                }
            ),
            os.path.join(vd, f"rev_{part}_{tag}.parquet"),
        )
    return int(len(duniq))


@ray.remote
def _rev_edges_part(
    directed_dir: str,
    work_dir: str,
    part: int,
    num_parts: int,
    hub_ids: np.ndarray,
):
    """Phase 2 of the reverse-from-layout fast path: read ONE directed
    edges/part=K, swap src/dst, and scatter the reversed rows to their
    partitions (same src-owner / salted-hub rule as build, with the hub
    set recomputed from REVERSED strength)."""
    d = os.path.join(directed_dir, "edges", f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        return 0
    t = pq.read_table(d, columns=["src", "dst", "weight"])
    if not t.num_rows:
        return 0
    src = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    ww = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    p_out = (src % num_parts).astype(np.int64)
    if len(hub_ids):
        is_hub = np.isin(src, hub_ids)
        p_out[is_hub] = (src[is_hub] + dst[is_hub]) % num_parts
    tag = uuid.uuid4().hex[:8]
    for p in np.unique(p_out):
        sel = p_out == p
        od = os.path.join(work_dir, "edges", f"part={int(p)}")
        os.makedirs(od, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "src": pa.array(src[sel]),
                    "dst": pa.array(dst[sel]),
                    "weight": pa.array(ww[sel]),
                }
            ),
            os.path.join(od, f"rev_{part}_{tag}.parquet"),
        )
    return int(len(src))


@ray.remote
def _reduce_outdeg(partials_dir: str, out_dir: str, part: int, threshold: float):
    """Final per-owner out-degree reduce: sum partials with numpy (replaces
    a full sort-based groupby shuffle) and report this owner's hubs."""
    d = os.path.join(partials_dir, f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        return np.array([], dtype=np.int64)
    t = pq.read_table(d, columns=["vertex_id", "out_strength"])
    vid = t["vertex_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = t["out_strength"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(vid, kind="stable")
    vid, w = vid[order], w[order]
    uniq, starts = np.unique(vid, return_index=True)
    sums = np.add.reduceat(w, starts)
    od = os.path.join(out_dir, f"part={part}")
    os.makedirs(od, exist_ok=True)
    tmp = os.path.join(od, f".tmp.{uuid.uuid4().hex[:8]}")
    pq.write_table(
        pa.table({"vertex_id": pa.array(uniq), "out_strength": pa.array(sums)}), tmp
    )
    os.replace(tmp, os.path.join(od, "data.parquet"))
    return uniq[sums > threshold]


# ---------------------------------------------------------------------------
# The per-partition actor
# ---------------------------------------------------------------------------


@ray.remote
class GraphPartition:
    """Owns: vertex state for {v : v % P == part_id}, and the edge block
    assigned to this partition (sorted by dst, reduceat-segmented)."""

    def __init__(self, part_id: int, num_parts: int, work_dir: str):
        self.pid = part_id
        self.P = num_parts
        self.work_dir = work_dir

        # STORAGE CONTRACT: work_dir must be visible to every node that can
        # host a partition actor (shared filesystem / fuse-mounted object
        # store on a real cluster; any local dir on one node).  Without
        # this check a worker on a node that lacks the build would silently
        # construct an EMPTY partition — wrong results, no error.
        manifest = os.path.join(work_dir, "build_manifest.json")
        if not os.path.exists(manifest):
            raise RuntimeError(
                f"GraphPartition {part_id}: no build manifest at {manifest!r} "
                "on this node. The engine work_dir must be on storage shared "
                "by all nodes (see GraphEngine docstring); on a multi-node "
                "cluster pass a shared-filesystem path."
            )
        if not os.path.isdir(os.path.join(work_dir, "edges")):
            raise RuntimeError(
                f"GraphPartition {part_id}: build manifest present but the "
                f"edges/ layout is missing under {work_dir!r} — partial or "
                "non-shared storage."
            )

        edir = os.path.join(work_dir, "edges", f"part={part_id}")
        vdir = os.path.join(work_dir, "verts", f"part={part_id}")
        odir = os.path.join(work_dir, "outdeg", f"part={part_id}")

        def read(d, cols):
            if not os.path.isdir(d) or not os.listdir(d):
                return {c: np.array([], dtype=np.int64 if c != "weight" and c != "out_strength" else np.float64) for c in cols}
            t = pq.read_table(d, columns=cols)
            return {c: t[c].to_numpy(zero_copy_only=False) for c in cols}

        e = read(edir, ["src", "dst", "weight"])
        esrc = e["src"].astype(np.int64)
        edst = e["dst"].astype(np.int64)
        ew = e["weight"].astype(np.float64)

        v = read(vdir, ["vertex_id"])
        self.owned = np.unique(v["vertex_id"].astype(np.int64))
        n = len(self.owned)

        # weighted out-degree for owned vertices (table partitioned by owner)
        o = read(odir, ["vertex_id", "out_strength"])
        self.out_strength = np.zeros(n, dtype=np.float64)
        if len(o["vertex_id"]):
            ovid = o["vertex_id"].astype(np.int64)
            pos = np.searchsorted(self.owned, ovid)
            # partial rows may repeat a vertex: accumulate
            np.add.at(self.out_strength, pos, o["out_strength"].astype(np.float64))

        # hub set (global, small)
        hub_path = os.path.join(work_dir, "hubs.parquet")
        if os.path.exists(hub_path):
            self.hub_ids = pq.read_table(hub_path)["vertex_id"].to_numpy().astype(np.int64)
        else:
            self.hub_ids = np.array([], dtype=np.int64)

        # Sort the edge block ONCE by (destination partition, dst): the
        # per-iteration combine is a reduceat over static segments (the
        # local groupby-aggregate on destination key), and — because
        # segments come out already grouped by destination partition — the
        # combined message vector is born in routed order, so scatter
        # slices it directly with NO per-iteration gather/permutation pass.
        # (The stable secondary dst order keeps per-dst float summation
        # order identical to a plain dst sort: bit-identical messages.)
        order = np.lexsort((edst, edst % self.P))
        edst = edst[order]
        esrc = esrc[order]
        self.ew = ew[order]
        if len(edst):
            change = np.flatnonzero(np.diff(edst)) + 1
            seg_starts = np.concatenate([[0], change])
        else:
            seg_starts = np.array([], dtype=np.int64)
        self.udst = edst[seg_starts]

        # Static index arrays ride as int32 where the partition-local range
        # allows (always, until a single partition holds >=2^31 edges or
        # vertices): per-iteration memory-bus traffic is the single-socket
        # scaling ceiling, and halving index bytes directly widens it.
        def _compact(a: np.ndarray, hi: int) -> np.ndarray:
            return a.astype(np.int32) if hi < 2**31 else a

        self.seg_starts = _compact(seg_starts, len(edst) + 1)

        # Map each edge's src to local state or broadcast hub slot.
        self.e_is_hub = (
            np.isin(esrc, self.hub_ids) if len(self.hub_ids) else np.zeros(len(esrc), bool)
        )
        local_src = esrc[~self.e_is_hub]
        self.src_pos = np.searchsorted(self.owned, local_src)
        assert len(local_src) == 0 or (
            (self.src_pos < n).all() and (self.owned[self.src_pos] == local_src).all()
        ), "non-hub edge src not owned by its partition: partitioner bug"
        self.src_pos = _compact(self.src_pos, max(n, 1))
        self.hub_pos = _compact(
            np.searchsorted(self.hub_ids, esrc[self.e_is_hub]),
            max(len(self.hub_ids), 1),
        )
        self._has_hub_edges = bool(self.e_is_hub.any())

        # integer-valued edge weights fit float32 exactly below 2^24: the
        # float64 contrib * float32 weight product is then bit-identical to
        # the float64-weight product at half the bus bytes per edge
        if len(self.ew) and np.array_equal(self.ew, np.floor(self.ew)) and (
            np.abs(self.ew) < 2**24
        ).all():
            self.ew = self.ew.astype(np.float32)

        # Destination routing: udst is already grouped by destination
        # partition (primary lexsort key), so the routed order IS the
        # message order; bounds delimit each destination's slice.
        dpart_u = self.udst % self.P
        bounds = np.searchsorted(dpart_u, np.arange(self.P + 1))
        self.route_bounds = bounds
        # static per-destination-partition id arrays (shipped once)
        self.out_ids = [
            self.udst[bounds[q] : bounds[q + 1]] for q in range(self.P)
        ]

        # vertex state (filled by init_state / load_checkpoint)
        self.state = np.zeros(n, dtype=np.float64)
        self._hist: list = []
        self.frozen = np.zeros(n, dtype=bool)  # for seeded label propagation
        self.edges_count = len(esrc)
        self._inbox_maps: dict[int, np.ndarray] = {}
        # delta-exchange state for min-label algorithms: last per-unique-dst
        # message sent; only strictly-decreased entries are re-sent.
        # _dirty tracks whether the last apply changed any owned label and
        # _last_hub the last hub broadcast seen — when neither moved, the
        # whole O(edges) message recompute is skipped (quiescent partition).
        self._prev_msg: np.ndarray | None = None
        self._dirty = True
        self._last_hub: np.ndarray | None = None
        self._msgs_sent = 0
        self._msgs_dense = 0
        self._msgs_recv = 0

    # ---- build-time topology info ----
    def topology(self):
        return {
            "owned": int(len(self.owned)),
            "edges": int(self.edges_count),
            "dangling": int((self.out_strength == 0).sum()),
        }

    def outbox_ids(self):
        """Static per-destination-partition dst-id arrays (exchange setup)."""
        return self.out_ids

    def register_inboxes(self, per_source_ids: dict):
        """Precompute searchsorted maps from each source partition's static
        dst-id array into the owned-state index."""
        for p, ids in per_source_ids.items():
            if len(ids) == 0:
                self._inbox_maps[p] = np.array([], dtype=np.int64)
                continue
            pos = np.searchsorted(self.owned, ids)
            assert (pos < len(self.owned)).all(), "routing bug: unowned vertex"
            assert (self.owned[pos] == ids).all(), "routing bug: unowned vertex"
            if len(self.owned) < 2**31:
                pos = pos.astype(np.int32)
            self._inbox_maps[p] = pos
        return True

    # ---- state init ----
    def init_state(
        self,
        algo: str,
        seed_prefix_ids=None,
        init_value: float | None = None,
        seed_labels=None,
        kcore_k: int | None = None,
    ):
        n = len(self.owned)
        self.frozen = np.zeros(n, dtype=bool)
        self._prev_msg = None
        self._dirty = True
        self._last_hub = None
        self._msgs_sent = 0
        self._msgs_dense = 0
        self._msgs_recv = 0
        if algo == "pagerank":
            # filled later once global N is known (set_uniform_state)
            self.state = np.full(n, init_value if init_value is not None else 0.0)
        elif algo in ("pagerank_fp", "salsa"):
            # fixed-point PageRank / SALSA: int64 mass units carried in
            # self.labels.  Requires integer edge weights (asserted once).
            assert np.array_equal(self.ew, np.floor(self.ew)), (
                "fixed-point pagerank/salsa requires integer edge weights"
            )
            self.ew_int = self.ew.astype(np.int64)
            if len(self.ew_int) == 0 or np.abs(self.ew_int).max() < 2**31:
                # int64 share * int32 weight promotes to int64: exact, half
                # the per-edge weight bytes on the bus
                self.ew_int = self.ew_int.astype(np.int32)
            self.out_int = np.maximum(self.out_strength.astype(np.int64), 1)
            self.labels = np.zeros(n, dtype=np.int64)
            # personalized teleport set: owned positions of the seed ids
            # (None = uniform teleport, the classic PageRank)
            self.ppr_pos = None
            if n and seed_prefix_ids is not None and len(seed_prefix_ids):
                seeds = np.asarray(seed_prefix_ids, dtype=np.int64)
                pos = np.searchsorted(self.owned, seeds)
                ok = (pos < n) & (
                    np.take(self.owned, np.minimum(pos, n - 1)) == seeds
                )
                self.ppr_pos = pos[ok]
        elif algo in ("components", "labelprop", "hopdist"):
            self.state = self.owned.astype(np.float64)  # placeholder, see below
            # min-label algorithms keep int64 labels in a separate array
            self.labels = self.owned.copy()
            if algo in ("labelprop", "hopdist"):
                self.labels = np.full(n, UNLABELED, dtype=np.int64)
                if n and seed_prefix_ids is not None and len(seed_prefix_ids):
                    seeds = np.asarray(seed_prefix_ids, dtype=np.int64)
                    pos = np.searchsorted(self.owned, seeds)
                    ok = (pos < n) & (
                        np.take(self.owned, np.minimum(pos, n - 1)) == seeds
                    )
                    if seed_labels is None:
                        lab = self.owned[pos[ok]]
                    else:
                        lab = np.asarray(seed_labels, dtype=np.int64)[ok]
                    pos = pos[ok]
                    self.labels[pos] = lab
                    self.frozen[pos] = True
        elif algo == "salsa":
            # stochastic half-step: contrib = (s // out_strength) * w, NO
            # damping and NO normalization (mass-conserving up to floors;
            # the per-dst sums are bounded by the total mass = scale)
            share = self.labels // self.out_int
            edge_vals = gather(share, np.int64)
            edge_vals = edge_vals * self.ew_int
            if len(self.seg_starts):
                msg = np.add.reduceat(edge_vals, self.seg_starts)
            else:
                msg = np.array([], dtype=np.int64)
        elif algo == "hits":
            # HITS half-steps: labels carries the current hub (on the
            # forward layout) or authority (on the reversed layout) score
            # in integer units; messages are gather(labels)*w sums.  The
            # driver-side orchestrator (graph/hits.py) alternates layouts.
            assert np.array_equal(self.ew, np.floor(self.ew)), (
                "hits requires integer edge weights"
            )
            self.ew_int = self.ew.astype(np.int64)
            if len(self.ew_int) == 0 or np.abs(self.ew_int).max() < 2**31:
                self.ew_int = self.ew_int.astype(np.int32)
            self.labels = np.zeros(n, dtype=np.int64)
        elif algo == "kcore":
            # k-core peeling: labels carries the current degree (filled by
            # the degree round), active/removed_now drive the peel.  All
            # integer — the unrolled-CTE oracle reproduces it exactly.
            self.labels = np.zeros(n, dtype=np.int64)
            self.kc_active = np.ones(n, dtype=bool)
            self.kc_removed_now = np.zeros(n, dtype=bool)
            self.kcore_k = int(kcore_k)
        else:
            raise ValueError(algo)
        return int(n)

    def set_uniform_fp(self, value_int: int):
        """Uniform fixed-point init (``scale // N`` units per vertex);
        returns this partition's dangling mass (int units)."""
        self.labels = np.full(len(self.owned), int(value_int), dtype=np.int64)
        return int(self.labels[self.out_strength == 0].sum())

    def set_seeded_fp(self, value_int: int):
        """Personalized init: ``scale // |S|`` units on each owned seed,
        zero elsewhere; returns this partition's dangling mass."""
        self.labels = np.zeros(len(self.owned), dtype=np.int64)
        if self.ppr_pos is not None:
            self.labels[self.ppr_pos] = int(value_int)
        return int(self.labels[self.out_strength == 0].sum())

    def set_uniform_state(self, value: float, hist_cap: int | None = None):
        self.state = np.full(len(self.owned), value, dtype=np.float64)
        self._hist = [self.state]
        if hist_cap is not None:
            # rollback buffer only needs the current chain's states (+1)
            self.hist_cap = int(hist_cap)
        return True

    def local_stats(self):
        dangling_mass = float(self.state[self.out_strength == 0].sum())
        return dangling_mass, float(self.state.sum())

    # ---- hub broadcast ----
    def hub_owned_ids(self):
        """Hub ids owned by this partition (static; exchange setup)."""
        n = len(self.owned)
        if len(self.hub_ids) == 0 or n == 0:
            return np.array([], dtype=np.int64)
        pos = np.searchsorted(self.owned, self.hub_ids)
        ok = (pos < n) & (
            np.take(self.owned, np.minimum(pos, n - 1)) == self.hub_ids
        )
        return self.hub_ids[ok]

    def hub_values(self, algo: str):
        """(hub_ids_owned, value) for hubs owned by this partition.
        Values keep their native dtype: float64 contribs for pagerank,
        int64 labels for min-label algorithms (no lossy casts)."""
        n = len(self.owned)
        empty_val = np.float64 if algo == "pagerank" else np.int64
        if len(self.hub_ids) == 0 or n == 0:
            return np.array([], dtype=np.int64), np.array([], dtype=empty_val)
        mask_pos = np.searchsorted(self.owned, self.hub_ids)
        ok = (mask_pos < n) & (
            np.take(self.owned, np.minimum(mask_pos, n - 1)) == self.hub_ids
        )
        ids = self.hub_ids[ok]
        pos = mask_pos[ok]
        if algo == "pagerank":
            outs = self.out_strength[pos]
            vals = np.where(outs > 0, self.state[pos] / np.maximum(outs, 1e-300), 0.0)
        elif algo in ("pagerank_fp", "salsa"):
            # broadcast the integer per-unit-weight share s // out
            vals = self.labels[pos] // self.out_int[pos]
        elif algo == "kcore":
            # removed-this-round indicator: hub out-edges live in OTHER
            # partitions (salted splits), which learn of a hub's removal
            # through this broadcast
            vals = self.kc_removed_now[pos].astype(np.int64)
        else:
            vals = self.labels[pos]
        return ids, vals

    # ---- iteration: scatter ----
    def _compute_messages(self, algo: str, hub_vals: np.ndarray | None = None):
        def gather(vals: np.ndarray, dtype) -> np.ndarray:
            """Per-edge source values: straight fancy gather when the
            partition has no hub edges (the common case — no masked
            scatter pass); masked fill otherwise."""
            if not self._has_hub_edges:
                return vals[self.src_pos]
            edge_vals = np.empty(self.edges_count, dtype=dtype)
            edge_vals[~self.e_is_hub] = vals[self.src_pos]
            edge_vals[self.e_is_hub] = hub_vals[self.hub_pos]
            return edge_vals

        if algo == "pagerank":
            outs = self.out_strength
            contrib = np.where(outs > 0, self.state / np.maximum(outs, 1e-300), 0.0)
            edge_vals = gather(contrib, np.float64)
            edge_vals *= self.ew
            if len(self.seg_starts):
                msg = np.add.reduceat(edge_vals, self.seg_starts)
            else:
                msg = np.array([], dtype=np.float64)
        elif algo == "pagerank_fp":
            # exact int64 arithmetic: contrib = ((s // out) * w * 17) // 20.
            # Bounds: share*w <= s <= scale (mass conservation), *17 < 2^63.
            share = self.labels // self.out_int
            edge_vals = gather(share, np.int64)
            edge_vals = (edge_vals * self.ew_int * 17) // 20
            if len(self.seg_starts):
                msg = np.add.reduceat(edge_vals, self.seg_starts)
            else:
                msg = np.array([], dtype=np.int64)
        elif algo == "salsa":
            # stochastic half-step: contrib = (s // out_strength) * w, NO
            # damping and NO normalization (mass-conserving up to floors;
            # the per-dst sums are bounded by the total mass = scale)
            share = self.labels // self.out_int
            edge_vals = gather(share, np.int64)
            edge_vals = edge_vals * self.ew_int
            if len(self.seg_starts):
                msg = np.add.reduceat(edge_vals, self.seg_starts)
            else:
                msg = np.array([], dtype=np.int64)
        elif algo == "hits":
            # per-dst sum of src values * weight, exact int64 (the raw
            # power-iteration half-step; normalization happens in apply)
            vals = gather(self.labels, np.int64)
            edge_vals = vals * self.ew_int
            if len(self.seg_starts):
                msg = np.add.reduceat(edge_vals, self.seg_starts)
            else:
                msg = np.array([], dtype=np.int64)
        elif algo == "kcore_deg":
            # degree round: every edge contributes 1 to its dst — the
            # per-unique-dst message is just the static segment length
            # (no gather at all)
            if len(self.seg_starts):
                ss = self.seg_starts.astype(np.int64)
                ends = np.append(ss[1:], self.edges_count)
                msg = ends - ss
            else:
                msg = np.array([], dtype=np.int64)
        elif algo == "kcore":
            # peel round: per-dst count of just-removed in-neighbors
            edge_vals = gather(self.kc_removed_now.astype(np.int64), np.int64)
            if len(self.seg_starts):
                msg = np.add.reduceat(edge_vals, self.seg_starts)
            else:
                msg = np.array([], dtype=np.int64)
        else:  # min-label over int64 (components / labelprop / hopdist)
            edge_vals = gather(self.labels, np.int64)
            if algo == "hopdist":
                # min-PLUS step: crossing an edge costs one hop; the
                # unreached sentinel saturates (int64-max must not wrap)
                edge_vals = np.where(
                    edge_vals == UNLABELED, edge_vals, edge_vals + 1
                )
            if len(self.seg_starts):
                msg = np.minimum.reduceat(edge_vals, self.seg_starts)
            else:
                msg = np.array([], dtype=np.int64)
        return msg

    def _min_delta_mask(self, msg: np.ndarray) -> np.ndarray:
        """Delta-exchange for min-label algorithms: labels only shrink, so
        a per-unique-dst message that did not strictly decrease since the
        last scatter is a no-op at the receiver (min is idempotent) and is
        NOT re-sent.  After the frontier collapses this cuts exchanged
        entries per iteration from O(unique dsts) to O(still-changing)."""
        if self._prev_msg is None:
            mask = np.ones(len(msg), dtype=bool)
        else:
            mask = msg < self._prev_msg
        self._prev_msg = msg
        self._msgs_sent += int(mask.sum())
        self._msgs_dense += len(msg)
        return mask

    def _min_quiescent(self, hub_vals: np.ndarray | None) -> bool:
        """True when this partition's messages CANNOT have changed since
        the last scatter: no owned label moved in the last apply and the
        hub broadcast (the only external input to _compute_messages) is
        unchanged.  The O(edges) message recompute is then skipped — the
        converged-partition fast path of a long-diameter run."""
        if self._prev_msg is None or self._dirty:
            return False
        if hub_vals is None:
            hub_same = self._last_hub is None
        else:
            hub_same = self._last_hub is not None and np.array_equal(
                hub_vals, self._last_hub
            )
        return hub_same

    def _min_track_inputs(self, hub_vals: np.ndarray | None):
        self._dirty = False  # set again by apply_min when labels change
        self._last_hub = None if hub_vals is None else np.array(hub_vals, copy=True)

    def exchange_stats(self):
        """(entries actually sent, dense entries, entries received) since
        init_state.  received < sent when a relay tier combined partials
        in flight (the tree-combine experiment's measured quantity)."""
        return int(self._msgs_sent), int(self._msgs_dense), int(self._msgs_recv)

    def _kcore_sparse(self, hub_vals: np.ndarray | None):
        """(msg, nonzero-mask) for a peel round, or (None, None) when this
        partition provably sends nothing: no owned vertex was removed last
        round and no hub was either (the only two message sources)."""
        if not self.kc_removed_now.any() and (
            hub_vals is None or not hub_vals.any()
        ):
            self._msgs_dense += len(self.udst)
            return None, None
        msg = self._compute_messages("kcore", hub_vals)
        mask = msg != 0
        self._msgs_sent += int(mask.sum())
        self._msgs_dense += len(msg)
        return msg, mask

    def scatter(self, algo: str, hub_vals: np.ndarray | None = None):
        """Compute per-unique-dst combined messages; return P slices
        (num_returns=P set at call site).  Min-label algorithms send
        sparse (uint32 local index, int64 value) deltas; dense-value
        algorithms (pagerank) send the full slice."""
        b = self.route_bounds
        if algo == "kcore":
            # removal counts are zero almost everywhere once the frontier
            # passes: send only nonzero entries (same sparse wire format as
            # the min-label delta path, ADD applied at the receiver)
            msg, mask = self._kcore_sparse(hub_vals)
            if msg is None:
                empty = (np.array([], np.uint32), np.array([], np.int64))
                return empty if self.P == 1 else tuple([empty] * self.P)
            return self._pack_sparse_sliced(msg, mask)
        if algo in ("components", "labelprop", "hopdist", "min"):
            if self._min_quiescent(hub_vals):
                self._msgs_dense += len(self._prev_msg)
                empty = (np.array([], np.uint32), np.array([], np.int64))
                return empty if self.P == 1 else tuple([empty] * self.P)
            self._min_track_inputs(hub_vals)
            msg = self._compute_messages(algo, hub_vals)
            mask = self._min_delta_mask(msg)
            return self._pack_sparse_sliced(msg, mask)
        msg = self._compute_messages(algo, hub_vals)
        # msg is born in routed order (build-time lexsort): plain slices
        out = tuple(msg[b[q] : b[q + 1]] for q in range(self.P))
        if self.P == 1:
            return out[0]
        return out

    def scatter_fused(self, algo: str, hub_vals: np.ndarray | None = None):
        """Like scatter, but returns ONE routed object instead of P slices.
        Receivers slice their own segment — on a single node the object
        lives in shared-memory plasma, so every reader maps it zero-copy
        and the object count per iteration drops from P^2 to P.  On a
        multi-node cluster prefer the sliced scatter (each slice ships only
        to its destination).

        Dense algorithms emit (bounds, routed_msg); min-label algorithms
        emit a 3-tuple (bounds, local_idx uint32, values) carrying only the
        strictly-decreased entries (see _min_delta_mask)."""
        if algo == "kcore":
            msg, mask = self._kcore_sparse(hub_vals)
            if msg is None:
                z = np.zeros(self.P + 1, dtype=np.int64)
                return z, np.array([], np.uint32), np.array([], np.int64)
            return self._pack_sparse_fused(msg, mask)
        if algo in ("components", "labelprop", "hopdist", "min"):
            if self._min_quiescent(hub_vals):
                self._msgs_dense += len(self._prev_msg)
                z = np.zeros(self.P + 1, dtype=np.int64)
                return z, np.array([], np.uint32), np.array([], np.int64)
            self._min_track_inputs(hub_vals)
            msg = self._compute_messages(algo, hub_vals)
            mask = self._min_delta_mask(msg)
            return self._pack_sparse_fused(msg, mask)
        msg = self._compute_messages(algo, hub_vals)
        # msg is born in routed order (build-time lexsort): no gather pass
        return self.route_bounds, msg

    # ---- iteration: apply ----
    def apply_pagerank(self, alpha: float, one_over_n: float, dangling_mass, *rest):
        """One power-iteration apply.  ``dangling_mass`` is either a float
        (first iteration of a chain) or None, in which case the first P
        elements of ``rest`` are the previous applies' per-partition
        dangling masses (object refs resolved by Ray) — this lets the driver
        chain K iterations without a synchronization round between them.
        Returns 3 values (``num_returns=3`` at the call site): L1 delta,
        local dangling mass, and this owner's hub values for the next
        iteration's broadcast."""
        if dangling_mass is None:
            dangling_mass = float(sum(rest[: self.P]))
            incoming = rest[self.P :]
        else:
            incoming = rest
        xlast = self.state
        agg = self._agg_dense_incoming(incoming, np.float64)
        x = alpha * (agg + dangling_mass * one_over_n) + (1.0 - alpha) * one_over_n
        delta = float(np.abs(x - xlast).sum())
        self.state = x
        self._hist.append(x)
        if len(self._hist) > getattr(self, "hist_cap", 34):
            del self._hist[0]
        dangling_next = float(x[self.out_strength == 0].sum())
        # piggyback next-iteration hub values: saves a full RPC round
        return delta, dangling_next, self.hub_values("pagerank")[1]

    def apply_pagerank_fp(self, base_int: int, n_global: int, dangling_mass, *rest):
        """Fixed-point apply: x = base + agg + (17*dangling) // (20*N), all
        exact int64 — the result is independent of summation order and
        partitioning, so a DuckDB BIGINT oracle reproduces it bit-exactly.
        Chaining protocol mirrors apply_pagerank (dangling refs in rest)."""
        if dangling_mass is None:
            dangling_mass = int(sum(rest[: self.P]))
            incoming = rest[self.P :]
        else:
            incoming = rest
        agg = self._agg_dense_incoming(incoming, np.int64)
        if self.ppr_pos is not None:
            # personalized teleport: base and dangling mass land ONLY on
            # seeds (n_global carries |S| in this mode)
            x = agg
            x[self.ppr_pos] += base_int + (17 * int(dangling_mass)) // (
                20 * n_global
            )
        else:
            x = base_int + agg + (17 * int(dangling_mass)) // (20 * n_global)
        changed = int((x != self.labels).sum())
        self.labels = x
        dangling_next = int(x[self.out_strength == 0].sum())
        return changed, dangling_next, self.hub_values("pagerank_fp")[1]

    def rollback(self, steps: int):
        """Discard the last ``steps`` applies (chained iterations that ran
        past the convergence point must not affect the returned state)."""
        for _ in range(steps):
            self._hist.pop()
        self.state = self._hist[-1]
        return True

    def _my_slice(self, item):
        """Fused-exchange messages arrive as (bounds, routed_msg); pick this
        partition's segment (a zero-copy view of the plasma buffer)."""
        if isinstance(item, tuple):
            bounds, msg = item
            return msg[bounds[self.pid] : bounds[self.pid + 1]]
        return item

    def _agg_dense_incoming(self, incoming, dtype) -> np.ndarray:
        """Sum dense per-source message slices into an owned-aligned array
        (positions are unique within one source: messages are pre-combined
        per dst, so fancy indexing is safe)."""
        agg = np.zeros(len(self.owned), dtype=dtype)
        for p, vals in enumerate(incoming):
            vals = self._my_slice(vals)
            if vals is None or len(vals) == 0:
                continue
            self._msgs_recv += len(vals)
            agg[self._inbox_maps[p]] += vals
        return agg

    def _iter_sparse_incoming(self, incoming):
        """Yield (owned positions, values) per source for sparse wire
        formats: 3-tuples (bounds, idx, vals) from scatter_fused (slice my
        segment first) or 2-tuples (idx, vals) from the sliced scatter."""
        for p, item in enumerate(incoming):
            if item is None:
                continue
            if len(item) == 3:
                bounds, idx, vals = item
                i0, i1 = bounds[self.pid], bounds[self.pid + 1]
                idx, vals = idx[i0:i1], vals[i0:i1]
            else:
                idx, vals = item
            if len(vals) == 0:
                continue
            self._msgs_recv += len(vals)
            yield self._inbox_maps[p][idx], vals

    def _pack_sparse_sliced(self, msg: np.ndarray, mask: np.ndarray):
        """Per-destination (local idx, values) pairs of the masked entries
        (the sliced scatter's wire format)."""
        b = self.route_bounds
        out = []
        for q in range(self.P):
            m = mask[b[q] : b[q + 1]]
            seg = msg[b[q] : b[q + 1]]
            out.append((np.flatnonzero(m).astype(np.uint32), seg[m]))
        return out[0] if self.P == 1 else tuple(out)

    def _pack_sparse_fused(self, msg: np.ndarray, mask: np.ndarray):
        """(bounds, local idx, values) of the masked entries (the fused
        scatter's wire format)."""
        nz = np.flatnonzero(mask)
        b = self.route_bounds
        new_bounds = np.searchsorted(nz, b)
        seg_of = np.searchsorted(b, nz, side="right") - 1
        local_idx = (nz - b[seg_of]).astype(np.uint32)
        return new_bounds, local_idx, msg[nz]

    def apply_min(self, *incoming):
        """Apply sparse min-label deltas.  Each incoming item is either a
        3-tuple (bounds, local_idx, values) from scatter_fused (slice my
        segment first) or a 2-tuple (local_idx, values) from the sliced
        scatter; local_idx indexes into this source's static inbox map.
        Entries absent from a delta were unchanged at the source and need
        no re-application (min is idempotent)."""
        new = self.labels.copy()
        for pos, vals in self._iter_sparse_incoming(incoming):
            new[pos] = np.minimum(new[pos], vals)
        new[self.frozen] = self.labels[self.frozen]
        changed = int((new != self.labels).sum())
        if changed:
            self._dirty = True  # next scatter must recompute messages
        self.labels = new
        return changed, self.hub_values("min")[1]

    def apply_sum(self, *incoming):
        """HITS half-step apply: labels <- per-dst aggregated sums; returns
        the partition's total (for the driver's global L1 normalization)
        and this owner's hub label values."""
        agg = self._agg_dense_incoming(incoming, np.int64)
        self.labels = agg
        return int(agg.sum())

    def apply_katz(self, scale: int, alpha_den: int, *incoming):
        """Katz iteration apply: labels <- scale + (per-dst aggregated
        weighted in-sum) // alpha_den, exact int64 (the caller sizes
        alpha_den >= 2 * max weighted in-degree, which bounds labels by
        2*scale and every segment sum by alpha_den*scale — asserted
        against 2^62 at the driver)."""
        agg = self._agg_dense_incoming(incoming, np.int64)
        self.labels = int(scale) + agg // int(alpha_den)
        return True

    def scale_labels(self, scale: int, total: int):
        """labels <- labels * scale // total (exact int64; caller ensures
        labels * scale < 2^63).  A degenerate half-step (total == 0, i.e.
        all weight sums zero) zeroes the labels — matching the HITS
        oracle, where ``(v * scale) // (SELECT sum(v) ...)`` divides by
        NULL/0 and the wrapping coalesce lands on 0."""
        if total != 0:
            self.labels = (self.labels * int(scale)) // int(total)
        else:
            self.labels = np.zeros_like(self.labels)
        return True

    def get_labels(self):
        return self.labels

    def set_labels(self, arr):
        arr = np.asarray(arr, dtype=np.int64)
        assert len(arr) == len(self.owned), "label transfer length mismatch"
        self.labels = arr.copy()
        return True

    def set_uniform_labels(self, value_int: int):
        self.labels = np.full(len(self.owned), int(value_int), dtype=np.int64)
        return True

    def apply_kcore_deg(self, *incoming):
        """Degree round: sum per-dst edge counts into labels, then peel the
        first layer (degree < k).  Dense wire format (every dst gets a
        count)."""
        self.labels = self._agg_dense_incoming(incoming, np.int64)
        newly = self.kc_active & (self.labels < self.kcore_k)
        self.kc_removed_now = newly
        self.kc_active &= ~newly
        return int(newly.sum()), self.hub_values("kcore")[1]

    def apply_kcore(self, *incoming):
        """Peel round: subtract removed-in-neighbor counts, then remove any
        active vertex whose degree dropped below k.  Sparse wire format
        (same shapes as apply_min)."""
        for pos, vals in self._iter_sparse_incoming(incoming):
            self.labels[pos] -= vals
        newly = self.kc_active & (self.labels < self.kcore_k)
        self.kc_removed_now = newly
        self.kc_active &= ~newly
        return int(newly.sum()), self.hub_values("kcore")[1]

    # ---- sampled Brandes betweenness (graph/betweenness.py orchestrates;
    # the exchange itself is the plain "hits" sum-scatter over a
    # weight-1 symmetric simple graph, so no new message path is needed;
    # these methods only hold the per-level BFS/sigma/delta state) ----
    def bw_init(self):
        """Once per run: zero the cross-seed accumulator."""
        n = len(self.owned)
        self.bw_dist = np.full(n, -1, dtype=np.int64)
        self.bw_sigma = np.zeros(n, dtype=np.int64)
        self.bw_delta = np.zeros(n, dtype=np.int64)
        self.bw_acc = np.zeros(n, dtype=np.int64)
        return True

    def bw_seed(self, seed_id: int):
        """Per source: reset dist/sigma/delta, plant the seed (dist 0,
        sigma 1) and stage the level-0 labels for the first exchange."""
        self.bw_dist[:] = -1
        self.bw_sigma[:] = 0
        self.bw_delta[:] = 0
        n = len(self.owned)
        if n:
            pos = int(np.searchsorted(self.owned, seed_id))
            if pos < n and self.owned[pos] == seed_id:
                self.bw_dist[pos] = 0
                self.bw_sigma[pos] = 1
        self.labels = np.where(self.bw_dist == 0, self.bw_sigma, 0)
        return True

    def bw_stage_forward(self, level: int):
        """labels <- sigma of the (level-1) frontier, 0 elsewhere; the
        following "hits" exchange then delivers per-dst sigma sums."""
        self.labels = np.where(self.bw_dist == level - 1, self.bw_sigma, 0)
        return True

    def bw_apply_forward(self, level: int, *incoming):
        """Unreached vertices with a nonzero incoming path-count sum join
        the BFS at ``level`` with sigma = that sum.  Returns (newly
        reached, max sigma) — the driver guards sigma against the
        fixed-point overflow bound."""
        agg = self._agg_dense_incoming(incoming, np.int64)
        newly = (self.bw_dist < 0) & (agg > 0)
        self.bw_dist[newly] = level
        self.bw_sigma[newly] = agg[newly]
        mx = int(self.bw_sigma[newly].max()) if newly.any() else 0
        return int(newly.sum()), mx

    def bw_stage_backward(self, level: int, scale: int, scale2: int):
        """labels <- per-successor dependency quota for vertices at
        (level+1): floor((scale + delta) * scale2 / sigma).  The symmetric
        layout delivers it to every neighbor; only dist==level applies."""
        m = self.bw_dist == level + 1
        c = np.zeros(len(self.owned), dtype=np.int64)
        if m.any():
            c[m] = ((int(scale) + self.bw_delta[m]) * int(scale2)) // self.bw_sigma[m]
        self.labels = c
        return True

    def bw_apply_backward(self, level: int, scale2: int, *incoming):
        """delta[v at level] <- (sigma[v] * sum of successor quotas)
        // scale2 (Brandes dependency accumulation, exact int64)."""
        agg = self._agg_dense_incoming(incoming, np.int64)
        m = self.bw_dist == level
        if m.any():
            s = self.bw_sigma[m]
            a = agg[m]
            if len(a) and a.max() > 0:
                # sigma_v <= sigma_w along the DAG keeps each term below
                # (scale+delta)*scale2, but the SUM over successors can
                # still overflow — fail loudly, never wrap
                assert int(s.max()) * int(a.max()) < 2**62, (
                    "betweenness fixed-point overflow: lower BW_SCALE2 "
                    "or sample fewer sources"
                )
            self.bw_delta[m] = (s * a) // int(scale2)
        return True

    def bw_accumulate(self):
        """bc += this source's dependencies.  The seed itself is the only
        dist==0 vertex and the backward loop stops at level 1, so its
        delta is still 0 — the v != s exclusion is structural."""
        self.bw_acc += self.bw_delta
        return True

    def bw_result(self):
        return pa.table(
            {
                "vertex_id": pa.array(self.owned),
                "bc_fp": pa.array(self.bw_acc),
            }
        )

    # ---- checkpoint / results ----
    def checkpoint(self, algo: str, ckpt_dir: str, iteration: int):
        d = os.path.join(ckpt_dir, algo, f"iter={iteration}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part={self.pid}.parquet")
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        if algo == "pagerank":
            t = pa.table(
                {"vertex_id": pa.array(self.owned), "value": pa.array(self.state)}
            )
        else:
            t = pa.table(
                {
                    "vertex_id": pa.array(self.owned),
                    "value": pa.array(self.labels),
                    "frozen": pa.array(self.frozen),
                }
            )
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic
        return path

    def load_checkpoint(self, algo: str, ckpt_dir: str, iteration: int):
        self._prev_msg = None  # resumed run re-sends dense on first scatter
        self._dirty = True
        self._last_hub = None
        path = os.path.join(
            ckpt_dir, algo, f"iter={iteration}", f"part={self.pid}.parquet"
        )
        t = pq.read_table(path)
        vid = t["vertex_id"].to_numpy().astype(np.int64)
        assert np.array_equal(vid, self.owned), "checkpoint/build vertex mismatch"
        if algo == "pagerank":
            self.state = t["value"].to_numpy().astype(np.float64).copy()
            self._hist = [self.state]
        else:
            self.labels = t["value"].to_numpy().astype(np.int64).copy()
            self.frozen = t["frozen"].to_numpy().copy()
        return True

    def result_table(self, algo: str):
        if algo == "pagerank":
            return pa.table(
                {"vertex_id": pa.array(self.owned), "score": pa.array(self.state)}
            )
        if algo == "pagerank_fp":
            return pa.table(
                {
                    "vertex_id": pa.array(self.owned),
                    "score_fp": pa.array(self.labels),
                }
            )
        if algo == "kcore":
            # survivors only, with their within-core degree (the peel's
            # decrements leave exactly the active-neighbor count)
            return pa.table(
                {
                    "vertex_id": pa.array(self.owned[self.kc_active]),
                    "core_degree": pa.array(self.labels[self.kc_active]),
                }
            )
        col = {"components": "component", "hopdist": "distance"}.get(
            algo, "label"
        )
        return pa.table(
            {"vertex_id": pa.array(self.owned), col: pa.array(self.labels)}
        )


# ---------------------------------------------------------------------------
# Driver-side engine
# ---------------------------------------------------------------------------


@dataclass
class RunMetrics:
    iterations: int = 0
    converged: bool = False
    edges_traversed: int = 0
    wall_sec: float = 0.0
    history: list = field(default_factory=list)
    # min-label delta exchange: entries actually shipped vs the dense
    # (every-unique-dst-every-iteration) count the pre-delta engine sent
    msgs_sent: int = 0
    msgs_dense: int = 0
    msgs_recv: int = 0


class GraphEngine:
    """Build once (Ray Data -> partitioned parquet), run many algorithms.

    ``symmetrize=True`` adds the reverse of every edge (undirected view) —
    required for components / label propagation / the reference's
    eccentricity analog (/root/reference/code/features/structure.py:173-177).

    **Storage contract**: ``work_dir`` holds the partitioned build layout
    AND checkpoints, and every partition actor reads its slice from it at
    init.  On a multi-node cluster it must therefore be a path visible on
    every node (shared filesystem / mounted object store); actors fail
    loudly at init when their node cannot see the build (rather than
    silently computing over an empty partition).  Single-node runs may use
    any local directory.  An object-store-shipped build (pass partition
    blocks as ObjectRefs instead of paths) is the alternative for clusters
    without shared storage; the parquet layout was chosen because it also
    provides build resumability and checkpoint durability.
    """

    def __init__(
        self,
        work_dir: str,
        num_parts: int | None = None,
        hub_threshold: int = 1 << 17,
        actor_num_cpus: float = 1.0,
        fused_exchange: bool = True,
        tree_combine: int = 0,
    ):
        """``actor_num_cpus``: CPU reservation per partition actor.  Must
        satisfy ``num_parts * actor_num_cpus <= cluster CPUs`` or actor
        creation deadlocks; ``start()`` enforces this by lowering the
        reservation when oversubscribed (single-node testing convenience —
        on a real cluster size P to the cluster instead)."""
        self.work_dir = work_dir
        if num_parts is None:
            num_parts = max(1, int(ray.cluster_resources().get("CPU", 4)) // 2)
        self.P = int(num_parts)
        self.actor_num_cpus = float(actor_num_cpus)
        self.hub_threshold = int(hub_threshold)
        self.fused = bool(fused_exchange)
        # two-level exchange: sources are split into ``tree_combine`` groups
        # and a stateless relay task per (group, destination) combines the
        # group's message slices in flight, so each receiver applies G
        # partials instead of P (G ~ sqrt(P) cuts per-dst partial growth to
        # O(sqrt P); on a multi-node cluster a group maps to the sources'
        # node/rack, making the first hop node-local).  0 disables; engine-
        # wide (all algorithms of this engine instance use the same mode).
        self.tree_combine = int(tree_combine)
        self.tree_G = 0
        self.actors: list | None = None
        self.N = 0
        self.total_edges = 0
        self.metrics: dict[str, RunMetrics] = {}

    # ---- build ----
    def build(self, edges: ray.data.Dataset, symmetrize: bool = False) -> "GraphEngine":
        """edges Dataset (columns src,dst,weight) -> partitioned layout.

        Three Ray Data passes over the narrow projection, all with map-side
        pre-combine; the only shuffle is the implicit partition_cols write.
        """
        # idempotent: clear any previous build's layout first — parquet
        # writers APPEND uuid-named files into existing directories, so a
        # re-run into a stale work_dir would silently double every edge
        # and out-degree.
        for sub in (
            "raw",
            "outdeg_partials",
            "outdeg",
            "edges",
            "verts",
            "verts_partials",
        ):
            shutil.rmtree(os.path.join(self.work_dir, sub), ignore_errors=True)
        for f in ("hubs.parquet", "build_manifest.json"):
            try:
                os.remove(os.path.join(self.work_dir, f))
            except FileNotFoundError:
                pass
        os.makedirs(self.work_dir, exist_ok=True)
        narrow = edges.select_columns(["src", "dst", "weight"])
        if symmetrize:
            def sym(b: pa.Table) -> pa.Table:
                rev = pa.table(
                    {"src": b["dst"], "dst": b["src"], "weight": b["weight"]}
                )
                return pa.concat_tables([b, rev])

            narrow = narrow.map_batches(sym, batch_format="pyarrow")

        # pass 0: persist the narrow projection to disk once, so the three
        # passes below stream from parquet instead of re-deriving the whole
        # upstream pipeline three times.  Skipped only when the input is
        # already materialized AND carries no further transforms: with
        # symmetrize=True the reverse-edge map would otherwise re-execute
        # in every pass even over a materialized input.
        from ray.data.dataset import MaterializedDataset

        if symmetrize or not isinstance(edges, MaterializedDataset):
            raw_dir = os.path.join(self.work_dir, "raw")
            narrow.write_parquet(raw_dir)
            narrow = ray.data.read_parquet(raw_dir)

        # pass 1: weighted out-degree — per-batch partials written partitioned
        # by owner, then P parallel numpy reduce tasks (NO sort shuffle; the
        # map-side combine makes the partials small and the reduce local).
        # Each reduce task also reports its owner's hubs (> threshold).
        partials_dir = os.path.join(self.work_dir, "outdeg_partials")
        narrow.map_batches(
            _outdeg_partials_with_part(self.P),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(partials_dir, partition_cols=["part"])
        outdeg_dir = os.path.join(self.work_dir, "outdeg")
        hub_lists = ray.get(
            [
                _reduce_outdeg.remote(
                    partials_dir, outdeg_dir, p, float(self.hub_threshold)
                )
                for p in range(self.P)
            ]
        )
        hub_ids = np.sort(np.concatenate(hub_lists).astype(np.int64))
        pq.write_table(
            pa.table({"vertex_id": pa.array(hub_ids)}),
            os.path.join(self.work_dir, "hubs.parquet"),
        )

        # pass 2: edges with salted partition assignment
        narrow.map_batches(
            _edge_partition_batch(self.P, hub_ids),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(os.path.join(self.work_dir, "edges"), partition_cols=["part"])

        # pass 3: vertex-universe incidence-count partials, then P parallel
        # numpy reduce tasks into one (vertex_id, cnt) file per owner
        vparts_dir = os.path.join(self.work_dir, "verts_partials")
        narrow.map_batches(
            _vertex_partials_batch(self.P),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(vparts_dir, partition_cols=["part"])
        verts_dir = os.path.join(self.work_dir, "verts")
        ray.get(
            [_reduce_verts.remote(vparts_dir, verts_dir, p) for p in range(self.P)]
        )
        shutil.rmtree(vparts_dir, ignore_errors=True)

        # logical (content-derived) fingerprint: the same graph rebuilt with
        # different Ray block splits must fingerprint identically, so a
        # valid checkpoint survives a natural build-then-resume restart.
        # Per-partition terms are stored so a DELTA rebuild (graph/delta.py)
        # can recompute only affected parts' contributions; the global
        # order-insensitive content hash guards resume: two different edge
        # sets with equal count+weight must not collide, or resume could
        # load a stale checkpoint from a rewired graph (monotone min-label
        # algorithms would then converge to wrong labels).
        part_terms = {
            str(p): list(
                edges_part_contribution(
                    os.path.join(self.work_dir, "edges", f"part={p}")
                )
            )
            for p in range(self.P)
        }
        fingerprint = assemble_manifest(
            self.P, self.hub_threshold, bool(symmetrize), len(hub_ids), part_terms
        )
        with open(os.path.join(self.work_dir, "build_manifest.json"), "w") as f:
            json.dump(fingerprint, f)
        return self

    def build_symmetrized_from(self, directed_dir: str) -> "GraphEngine":
        """Derive the symmetrized (undirected-view) layout from an existing
        DIRECTED build's partitioned parquet — one reverse-and-append pass
        per partition, all raw Ray tasks over the layout files.

        ``build(edges, symmetrize=True)`` re-runs the whole upstream Ray
        Data pipeline (edge derivation + raw persist + three partitioned
        passes); when a directed build of the SAME edge table already
        exists (vertex_features runs PageRank on the directed graph and
        components on the symmetrized one), that repeats work that is
        fully determined by the directed layout.  This path instead reads
        each ``edges/part=K`` once for strength/incidence partials and
        once for the forward+reverse scatter — O(|E|) file I/O with zero
        Ray Data overhead and zero upstream re-execution.

        Produces a layout indistinguishable from
        ``build(symmetrize=True)``: same partition rule (src-owner, salted
        hubs — hub set recomputed from SYMMETRIZED strength), same
        manifest schema, identical content fingerprint (pinned by
        tests/test_graph_engine.py::test_symmetrized_from_matches_full)."""
        with open(os.path.join(directed_dir, "build_manifest.json")) as f:
            src_manifest = json.load(f)
        if src_manifest.get("symmetrize"):
            raise ValueError("source layout is already symmetrized")
        src_parts = int(src_manifest["num_parts"])

        for sub in ("outdeg_partials", "outdeg", "edges", "verts", "verts_partials"):
            shutil.rmtree(os.path.join(self.work_dir, sub), ignore_errors=True)
        for f_ in ("hubs.parquet", "build_manifest.json"):
            try:
                os.remove(os.path.join(self.work_dir, f_))
            except FileNotFoundError:
                pass
        os.makedirs(self.work_dir, exist_ok=True)

        # pass 1: symmetrized strength + incidence partials per owner
        ray.get(
            [
                _sym_strength_part.remote(directed_dir, self.work_dir, k, self.P)
                for k in range(src_parts)
            ]
        )
        outdeg_dir = os.path.join(self.work_dir, "outdeg")
        hub_lists = ray.get(
            [
                _reduce_outdeg.remote(
                    os.path.join(self.work_dir, "outdeg_partials"),
                    outdeg_dir,
                    p,
                    float(self.hub_threshold),
                )
                for p in range(self.P)
            ]
        )
        hub_ids = np.sort(np.concatenate(hub_lists).astype(np.int64))
        pq.write_table(
            pa.table({"vertex_id": pa.array(hub_ids)}),
            os.path.join(self.work_dir, "hubs.parquet"),
        )

        # pass 2: forward + reverse edge scatter with salted assignment
        ray.get(
            [
                _sym_edges_part.remote(
                    directed_dir, self.work_dir, k, self.P, hub_ids
                )
                for k in range(src_parts)
            ]
        )

        # verts reduce + per-part fingerprint terms (parallel)
        ray.get(
            [
                _reduce_verts.remote(
                    os.path.join(self.work_dir, "verts_partials"),
                    os.path.join(self.work_dir, "verts"),
                    p,
                )
                for p in range(self.P)
            ]
        )
        shutil.rmtree(
            os.path.join(self.work_dir, "outdeg_partials"), ignore_errors=True
        )
        shutil.rmtree(
            os.path.join(self.work_dir, "verts_partials"), ignore_errors=True
        )
        term_refs = {
            str(p): _part_contribution_remote.remote(
                os.path.join(self.work_dir, "edges", f"part={p}")
            )
            for p in range(self.P)
        }
        part_terms = {k: ray.get(r) for k, r in term_refs.items()}
        fingerprint = assemble_manifest(
            self.P, self.hub_threshold, True, len(hub_ids), part_terms
        )
        with open(os.path.join(self.work_dir, "build_manifest.json"), "w") as f:
            json.dump(fingerprint, f)
        return self

    def build_reversed_from(self, directed_dir: str) -> "GraphEngine":
        """Derive the REVERSED layout (every edge src<->dst swapped) from an
        existing directed build's partitioned parquet — the sibling of
        :meth:`build_symmetrized_from` that HITS needs (auth steps flow
        along edges, hub steps against them, graph/hits.py).

        ``build(swapped_edges)`` re-runs the whole upstream Ray Data
        pipeline a second time even though the reversed layout is fully
        determined by the forward build's parquet.  This path reads each
        forward ``edges/part=K`` exactly twice (strength/incidence
        partials, then the swapped scatter) as raw Ray tasks — O(|E|) file
        I/O, zero upstream re-execution, zero Ray Data overhead.

        Produces a layout indistinguishable from ``build()`` over the
        swapped edge table: same partition rule (src-owner with salted
        hubs, hub set recomputed from REVERSED strength), same manifest
        schema, identical content fingerprint (pinned by
        tests/test_graph_engine.py::test_reversed_from_matches_full)."""
        with open(os.path.join(directed_dir, "build_manifest.json")) as f:
            src_manifest = json.load(f)
        if src_manifest.get("symmetrize"):
            raise ValueError(
                "reversal of a symmetrized layout is the identity — use the "
                "source layout directly"
            )
        src_parts = int(src_manifest["num_parts"])

        for sub in ("outdeg_partials", "outdeg", "edges", "verts", "verts_partials"):
            shutil.rmtree(os.path.join(self.work_dir, sub), ignore_errors=True)
        for f_ in ("hubs.parquet", "build_manifest.json"):
            try:
                os.remove(os.path.join(self.work_dir, f_))
            except FileNotFoundError:
                pass
        os.makedirs(self.work_dir, exist_ok=True)

        # pass 1: reversed strength + incidence partials per owner
        ray.get(
            [
                _rev_strength_part.remote(directed_dir, self.work_dir, k, self.P)
                for k in range(src_parts)
            ]
        )
        outdeg_dir = os.path.join(self.work_dir, "outdeg")
        hub_lists = ray.get(
            [
                _reduce_outdeg.remote(
                    os.path.join(self.work_dir, "outdeg_partials"),
                    outdeg_dir,
                    p,
                    float(self.hub_threshold),
                )
                for p in range(self.P)
            ]
        )
        hub_ids = np.sort(np.concatenate(hub_lists).astype(np.int64))
        pq.write_table(
            pa.table({"vertex_id": pa.array(hub_ids)}),
            os.path.join(self.work_dir, "hubs.parquet"),
        )

        # pass 2: swapped edge scatter with salted assignment
        ray.get(
            [
                _rev_edges_part.remote(
                    directed_dir, self.work_dir, k, self.P, hub_ids
                )
                for k in range(src_parts)
            ]
        )

        # verts reduce + per-part fingerprint terms (parallel)
        ray.get(
            [
                _reduce_verts.remote(
                    os.path.join(self.work_dir, "verts_partials"),
                    os.path.join(self.work_dir, "verts"),
                    p,
                )
                for p in range(self.P)
            ]
        )
        shutil.rmtree(
            os.path.join(self.work_dir, "outdeg_partials"), ignore_errors=True
        )
        shutil.rmtree(
            os.path.join(self.work_dir, "verts_partials"), ignore_errors=True
        )
        term_refs = {
            str(p): _part_contribution_remote.remote(
                os.path.join(self.work_dir, "edges", f"part={p}")
            )
            for p in range(self.P)
        }
        part_terms = {k: ray.get(r) for k, r in term_refs.items()}
        fingerprint = assemble_manifest(
            self.P, self.hub_threshold, False, len(hub_ids), part_terms
        )
        with open(os.path.join(self.work_dir, "build_manifest.json"), "w") as f:
            json.dump(fingerprint, f)
        return self

    # ---- actors ----
    def start(self) -> "GraphEngine":
        if self.actors is not None:
            return self
        with open(os.path.join(self.work_dir, "build_manifest.json")) as f:
            bm = json.load(f)
        assert bm["num_parts"] == self.P, "num_parts mismatch with build"
        avail = float(ray.cluster_resources().get("CPU", 1))
        cpus = self.actor_num_cpus
        # Leave at least one CPU unreserved: result consumption runs Ray Data
        # tasks while actors are alive, and a fully-reserved node deadlocks.
        if self.P * cpus >= avail:
            cpus = 0
        self.actors = [
            GraphPartition.options(num_cpus=cpus).remote(p, self.P, self.work_dir)
            for p in range(self.P)
        ]
        topo = ray.get([a.topology.remote() for a in self.actors])
        self.N = sum(t["owned"] for t in topo)
        self.total_edges = sum(t["edges"] for t in topo)
        # exchange static outbox id arrays -> inbox maps
        outboxes = ray.get([a.outbox_ids.remote() for a in self.actors])
        self.tree_G = (
            self.tree_combine if 1 < self.tree_combine < self.P else 0
        )
        if self.tree_G:
            # two-level combine: receivers register GROUP inbox maps (the
            # sorted union of the group's outbox ids per destination) and
            # the driver keeps, per (group, dst), the static member->group
            # position maps the relay tasks need (ray.put once).
            groups = [
                list(map(int, g))
                for g in np.array_split(np.arange(self.P), self.tree_G)
            ]
            self._tree_groups = groups
            group_ids = []  # [g][q] -> union id array
            self._relay_args = []  # [g][q] -> ref((member_maps, L))
            for members in groups:
                per_q_ids, per_q_args = [], []
                for q in range(self.P):
                    ids = [outboxes[p][q] for p in members]
                    nonempty = [i for i in ids if len(i)]
                    union = (
                        np.unique(np.concatenate(nonempty))
                        if nonempty
                        else np.array([], dtype=np.int64)
                    )
                    maps = tuple(
                        np.searchsorted(union, i).astype(np.int64) for i in ids
                    )
                    per_q_ids.append(union)
                    per_q_args.append(ray.put((maps, int(len(union)))))
                group_ids.append(per_q_ids)
                self._relay_args.append(per_q_args)
            for q, a in enumerate(self.actors):
                ray.get(
                    a.register_inboxes.remote(
                        {g: group_ids[g][q] for g in range(self.tree_G)}
                    )
                )
        else:
            for q, a in enumerate(self.actors):
                ray.get(
                    a.register_inboxes.remote(
                        {p: outboxes[p][q] for p in range(self.P)}
                    )
                )
        # hub routing: per-actor positions into the global sorted hub array
        hub_path = os.path.join(self.work_dir, "hubs.parquet")
        self.hub_ids_global = (
            pq.read_table(hub_path)["vertex_id"].to_numpy().astype(np.int64)
            if os.path.exists(hub_path)
            else np.array([], dtype=np.int64)
        )
        self.has_hubs = len(self.hub_ids_global) > 0
        if self.has_hubs:
            owned = ray.get([a.hub_owned_ids.remote() for a in self.actors])
            self._hub_pos = [
                np.searchsorted(self.hub_ids_global, ids) for ids in owned
            ]
            self._hub_pos_ref = ray.put(self._hub_pos)
        return self

    def shutdown(self):
        if self.actors:
            for a in self.actors:
                ray.kill(a)
            self.actors = None

    # ---- common iteration driver ----
    def _exchange(self, algo: str, hub_ref):
        """Submit one scatter per actor; returns outs[p][q] = ref of the
        message block from p to q.  In fused mode (default; right for a
        single node where plasma is shared memory) each actor emits ONE
        routed object and receivers slice it — P objects per iteration.
        With fused=False each slice is a separate return (P^2 objects) and
        ships only to its destination — right for multi-node clusters."""
        if self.tree_G:
            return self._exchange_tree(algo, hub_ref)
        outs = []
        for a in self.actors:
            if self.fused or self.P == 1:
                ref = a.scatter_fused.remote(algo, hub_ref) if self.P > 1 else a.scatter.remote(algo, hub_ref)
                outs.append([ref] * self.P)
            else:
                outs.append(
                    list(
                        a.scatter.options(num_returns=self.P).remote(algo, hub_ref)
                    )
                )
        return outs

    def _exchange_tree(self, algo: str, hub_ref):
        """Two-level exchange: sliced scatter (each slice is its own
        return, shipping only to its consumers) -> one relay task per
        (group, destination) combines the group's slices -> receivers get
        ``tree_G`` group partials.  outs[g][q] = combined block from group
        g to partition q."""
        op = (
            "min"
            if algo in ("components", "labelprop", "hopdist", "min")
            else "add_sparse"
            if algo == "kcore"
            else "add_dense"
        )
        slices = [
            list(a.scatter.options(num_returns=self.P).remote(algo, hub_ref))
            for a in self.actors
        ]
        return [
            [
                _relay_combine_remote.remote(
                    self._relay_args[g][q],
                    op,
                    *[slices[p][q] for p in members],
                )
                for q in range(self.P)
            ]
            for g, members in enumerate(self._tree_groups)
        ]

    def _assemble_hub_ref(self, vals_per_actor, dtype):
        """Per-actor owned-hub values -> one broadcast array (ray.put once
        per iteration; actors read it zero-copy from the object store)."""
        arr = np.zeros(len(self.hub_ids_global), dtype=dtype)
        for p, vals in enumerate(vals_per_actor):
            if len(vals):
                arr[self._hub_pos[p]] = vals
        return ray.put(arr)

    def _initial_hub_ref(self, algo: str):
        if not self.has_hubs:
            return None
        vals = ray.get([a.hub_values.remote(algo) for a in self.actors])
        return self._assemble_hub_ref(
            [v[1] for v in vals],
            np.float64 if algo == "pagerank" else np.int64,
        )

    def _build_fingerprint(self) -> dict:
        with open(os.path.join(self.work_dir, "build_manifest.json")) as f:
            return json.load(f)

    def _write_manifest(self, algo, iteration, counters, paths):
        mdir = os.path.join(self.work_dir, "ckpt", algo, f"iter={iteration}")
        os.makedirs(mdir, exist_ok=True)
        manifest = {
            "algo": algo,
            "iteration": iteration,
            "num_parts": self.P,
            "counters": counters,
            "parts": sorted(os.path.basename(p) for p in paths),
            "build": self._build_fingerprint(),  # lineage: which graph
            "complete": True,
        }
        tmp = os.path.join(mdir, f".manifest.tmp.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(mdir, "manifest.json"))

    def latest_checkpoint(self, algo: str) -> tuple[int, dict] | None:
        """Newest complete checkpoint whose recorded build fingerprint
        matches the CURRENT build — state from a different rebuilt graph is
        never resumed silently."""
        d = os.path.join(self.work_dir, "ckpt", algo)
        if not os.path.isdir(d):
            return None
        try:
            current = self._build_fingerprint()
        except FileNotFoundError:
            return None
        best = None
        for sub in os.listdir(d):
            mp = os.path.join(d, sub, "manifest.json")
            if sub.startswith("iter=") and os.path.exists(mp):
                with open(mp) as f:
                    m = json.load(f)
                if not m.get("complete"):
                    continue
                if m.get("build") is not None and m["build"] != current:
                    continue  # checkpoint belongs to a different build
                if best is None or m["iteration"] > best[0]:
                    best = (m["iteration"], m)
        return best

    def _checkpoint_round(self, algo, iteration, counters):
        ckpt_dir = os.path.join(self.work_dir, "ckpt")
        paths = ray.get(
            [a.checkpoint.remote(algo, ckpt_dir, iteration) for a in self.actors]
        )
        self._write_manifest(algo, iteration, counters, paths)

    # ---- PageRank ----
    def pagerank(
        self,
        alpha: float = 0.85,
        tol: float = 1e-6,
        max_iter: int = 100,
        checkpoint_every: int = 0,
        resume: bool = False,
        chain: int = 8,
    ) -> ray.data.Dataset:
        """Power iteration mirroring networkx.pagerank semantics exactly:
        uniform init/personalization/dangling distribution, L1 convergence
        err < N*tol (the criterion the oracle uses), alpha damping.
        The reference's per-node closeness centrality
        (/root/reference/code/features/structure.py:170) is the capability
        this replaces at scale.

        ``chain`` iterations are submitted as one dependency-chained task
        graph with a single driver synchronization at the end (dangling
        masses and hub broadcasts flow through object refs), amortizing the
        per-iteration coordination cost.  If convergence lands inside a
        chain the actors roll back the overshoot, so results are identical
        to chain=1.  Chain segments end exactly at ``checkpoint_every``
        boundaries, so the configured cadence is honored.
        """
        self.start()
        algo = "pagerank"
        t0 = time.time()
        m = RunMetrics()
        start_iter = 0
        one_over_n = 1.0 / max(self.N, 1)
        chain = max(1, min(chain, 32))
        if resume and (ck := self.latest_checkpoint(algo)):
            start_iter = ck[0]
            ray.get(
                [
                    a.load_checkpoint.remote(
                        algo, os.path.join(self.work_dir, "ckpt"), start_iter
                    )
                    for a in self.actors
                ]
            )
            dangling_mass = ck[1]["counters"]["dangling_mass"]
        else:
            # fresh run: clear stale checkpoints so a later resume cannot mix
            # state from a previous run of the same algorithm
            shutil.rmtree(os.path.join(self.work_dir, "ckpt", algo), ignore_errors=True)
            ray.get([a.init_state.remote(algo) for a in self.actors])
            ray.get(
                [
                    a.set_uniform_state.remote(one_over_n, hist_cap=chain + 2)
                    for a in self.actors
                ]
            )
            stats = ray.get([a.local_stats.remote() for a in self.actors])
            dangling_mass = sum(s[0] for s in stats)

        counters = {"err": None, "dangling_mass": dangling_mass, "edges_traversed": 0}
        hub_ref = self._initial_hub_ref(algo)
        it = start_iter
        while it < max_iter and not m.converged:
            k = min(chain, max_iter - it)
            if checkpoint_every:
                # end the chain exactly at the next checkpoint boundary so
                # the requested cadence is honored (not lcm(chain, every))
                next_ckpt = (it // checkpoint_every + 1) * checkpoint_every
                k = min(k, next_ckpt - it)
            delta_refss = []
            dangl_refss = []
            dangling_arg: float | None = dangling_mass
            dangl_refs: list = []
            for _ in range(k):
                outs = self._exchange(algo, hub_ref)
                applies = [
                    self.actors[q]
                    .apply_pagerank.options(num_returns=3)
                    .remote(
                        alpha,
                        one_over_n,
                        dangling_arg,
                        *dangl_refs,
                        *[outs[i][q] for i in range(len(outs))],
                    )
                    for q in range(self.P)
                ]
                delta_refss.append([a[0] for a in applies])
                dangl_refs = [a[1] for a in applies]
                dangl_refss.append(dangl_refs)
                dangling_arg = None  # subsequent iterations sum the refs
                if self.has_hubs:
                    hub_ref = _assemble_hub_remote.remote(
                        self._hub_pos_ref,
                        len(self.hub_ids_global),
                        *[a[2] for a in applies],
                    )
            # single synchronization for the whole chain
            errs = [sum(ray.get(refs)) for refs in delta_refss]
            done_j = None
            for j, err in enumerate(errs):
                it += 1
                m.iterations = it
                m.edges_traversed += self.total_edges
                m.history.append({"iter": it, "err": err})
                if err < self.N * tol:
                    m.converged = True
                    done_j = j
                    break
            overshoot = (k - 1 - done_j) if done_j is not None else 0
            if overshoot:
                ray.get([a.rollback.remote(overshoot) for a in self.actors])
            dangling_mass = sum(
                ray.get(dangl_refss[done_j if done_j is not None else k - 1])
            )
            counters = {
                "err": m.history[-1]["err"],
                "dangling_mass": dangling_mass,
                "edges_traversed": m.edges_traversed,
                "wall_sec": time.time() - t0,
            }
            if checkpoint_every and (
                it % checkpoint_every == 0 or m.converged or it >= max_iter
            ):
                self._checkpoint_round(algo, it, counters)
        m.wall_sec = time.time() - t0
        stats = ray.get([a.exchange_stats.remote() for a in self.actors])
        m.msgs_sent = int(sum(s[0] for s in stats))
        m.msgs_dense = int(sum(s[1] for s in stats))
        m.msgs_recv = int(sum(s[2] for s in stats))
        self.metrics[algo] = m
        return self._results(algo)

    # ---- fixed-point PageRank (oracle-exact mode) ----
    def pagerank_fixed(
        self,
        iters: int = 25,
        scale: int = 10**12,
        checkpoint_every: int = 0,
        resume: bool = False,
        chain: int = 8,
        seeds: np.ndarray | None = None,
    ) -> ray.data.Dataset:
        """PageRank in exact int64 fixed-point arithmetic (alpha = 17/20,
        mass carried in units of ``1/scale``).  Every operation is integer
        (share = s // out_strength, contrib = (share*w*17)//20, teleport
        base = 3*scale // (20*N), dangling share = 17*d // (20*N)), so the
        result after a fixed number of iterations is bit-exact regardless
        of summation order, partition count, or vertex relabeling — which
        makes it (a) DuckDB-oracle-checkable via an unrolled BIGINT CTE and
        (b) provably invariant under graph mutations that are bijective
        renames (the robustness-analysis check).  The float path
        (``pagerank``) remains the production algorithm; this mode shares
        all of its scatter/exchange/hub/checkpoint machinery.

        Runs exactly ``iters`` iterations (no convergence cut) so the SQL
        oracle can mirror the iteration count.

        With ``seeds`` (an int64 array of vertex ids) the run is
        PERSONALIZED PageRank: initial mass, the teleport base, and the
        dangling redistribution all land only on the seed set (random walk
        with restart to the seeds) — the relevance-to-a-set score used for
        seed-expansion / neighborhood ranking.  Same exchange machinery,
        same exact-int64 arithmetic, same unrolled-CTE oracle shape."""
        self.start()
        algo = "pagerank_fp"
        t0 = time.time()
        m = RunMetrics()
        start_iter = 0
        seeds_sorted = None
        denom = max(self.N, 1)
        if seeds is not None:
            seeds_sorted = np.unique(np.asarray(seeds, dtype=np.int64))
            denom = max(len(seeds_sorted), 1)
        base = (3 * scale) // (20 * denom)
        if resume and (ck := self.latest_checkpoint(algo)):
            start_iter = ck[0]
            # init first (builds ew_int/out_int), then restore labels
            ray.get(
                [
                    a.init_state.remote(algo, seed_prefix_ids=seeds_sorted)
                    for a in self.actors
                ]
            )
            ray.get(
                [
                    a.load_checkpoint.remote(
                        algo, os.path.join(self.work_dir, "ckpt"), start_iter
                    )
                    for a in self.actors
                ]
            )
            dangling_mass = int(ck[1]["counters"]["dangling_mass"])
        else:
            shutil.rmtree(
                os.path.join(self.work_dir, "ckpt", algo), ignore_errors=True
            )
            ray.get(
                [
                    a.init_state.remote(algo, seed_prefix_ids=seeds_sorted)
                    for a in self.actors
                ]
            )
            if seeds_sorted is None:
                dangling_parts = ray.get(
                    [a.set_uniform_fp.remote(scale // denom) for a in self.actors]
                )
            else:
                dangling_parts = ray.get(
                    [a.set_seeded_fp.remote(scale // denom) for a in self.actors]
                )
            dangling_mass = int(sum(dangling_parts))

        hub_ref = self._initial_hub_ref(algo)
        it = start_iter
        while it < iters:
            k = min(max(1, chain), iters - it)
            if checkpoint_every:
                next_ckpt = (it // checkpoint_every + 1) * checkpoint_every
                k = min(k, next_ckpt - it)
            changed_refss = []
            dangl_refss = []
            dangling_arg: int | None = dangling_mass
            dangl_refs: list = []
            for _ in range(k):
                outs = self._exchange(algo, hub_ref)
                applies = [
                    self.actors[q]
                    .apply_pagerank_fp.options(num_returns=3)
                    .remote(
                        base,
                        denom,
                        dangling_arg,
                        *dangl_refs,
                        *[outs[i][q] for i in range(len(outs))],
                    )
                    for q in range(self.P)
                ]
                changed_refss.append([a[0] for a in applies])
                dangl_refs = [a[1] for a in applies]
                dangl_refss.append(dangl_refs)
                dangling_arg = None
                if self.has_hubs:
                    hub_ref = _assemble_hub_remote.remote(
                        self._hub_pos_ref,
                        len(self.hub_ids_global),
                        *[a[2] for a in applies],
                    )
            for refs in changed_refss:
                changed = sum(ray.get(refs))
                it += 1
                m.iterations = it
                m.edges_traversed += self.total_edges
                m.history.append({"iter": it, "changed": changed})
            dangling_mass = int(sum(ray.get(dangl_refss[k - 1])))
            counters = {
                "changed": m.history[-1]["changed"],
                "dangling_mass": dangling_mass,
                "edges_traversed": m.edges_traversed,
                "wall_sec": time.time() - t0,
            }
            if checkpoint_every and (it % checkpoint_every == 0 or it >= iters):
                self._checkpoint_round(algo, it, counters)
        m.converged = True  # fixed iteration count: defined as complete
        m.wall_sec = time.time() - t0
        stats = ray.get([a.exchange_stats.remote() for a in self.actors])
        m.msgs_sent = int(sum(s[0] for s in stats))
        m.msgs_dense = int(sum(s[1] for s in stats))
        m.msgs_recv = int(sum(s[2] for s in stats))
        self.metrics[algo] = m
        return self._results(algo)

    # ---- min-label algorithms ----
    def _min_label_run(
        self,
        algo: str,
        seeds: np.ndarray | None,
        max_iter: int,
        checkpoint_every: int,
        resume: bool,
        chain: int = 4,
        seed_labels: np.ndarray | None = None,
        require_convergence: bool = True,
    ) -> ray.data.Dataset:
        self.start()
        t0 = time.time()
        m = RunMetrics()
        start_iter = 0
        if resume and (ck := self.latest_checkpoint(algo)):
            start_iter = ck[0]
            ray.get(
                [
                    a.load_checkpoint.remote(
                        algo, os.path.join(self.work_dir, "ckpt"), start_iter
                    )
                    for a in self.actors
                ]
            )
        else:
            shutil.rmtree(os.path.join(self.work_dir, "ckpt", algo), ignore_errors=True)
            ray.get(
                [
                    a.init_state.remote(
                        algo, seed_prefix_ids=seeds, seed_labels=seed_labels
                    )
                    for a in self.actors
                ]
            )

        counters = {}
        hub_ref = self._initial_hub_ref(algo)
        chain = max(1, chain)
        it = start_iter
        while it < max_iter and not m.converged:
            k = min(chain, max_iter - it)
            if checkpoint_every:
                next_ckpt = (it // checkpoint_every + 1) * checkpoint_every
                k = min(k, next_ckpt - it)
            changed_refss = []
            for _ in range(k):
                outs = self._exchange(algo, hub_ref)
                applies = [
                    self.actors[q]
                    .apply_min.options(num_returns=2)
                    .remote(*[outs[i][q] for i in range(len(outs))])
                    for q in range(self.P)
                ]
                changed_refss.append([a[0] for a in applies])
                if self.has_hubs:
                    hub_ref = _assemble_hub_remote.remote(
                        self._hub_pos_ref,
                        len(self.hub_ids_global),
                        *[a[1] for a in applies],
                    )
            for refs in changed_refss:
                changed = sum(ray.get(refs))
                it += 1
                m.iterations = it
                m.edges_traversed += self.total_edges
                m.history.append({"iter": it, "changed": changed})
                if changed == 0:
                    # min-label is monotone: iterations past the fixpoint are
                    # no-ops, so overshoot inside the chain needs no rollback
                    m.converged = True
                    break
            counters = {
                "changed": m.history[-1]["changed"],
                "edges_traversed": m.edges_traversed,
                "wall_sec": time.time() - t0,
            }
            if checkpoint_every and (
                it % checkpoint_every == 0 or m.converged or it >= max_iter
            ):
                self._checkpoint_round(algo, it, counters)
        m.wall_sec = time.time() - t0
        stats = ray.get([a.exchange_stats.remote() for a in self.actors])
        m.msgs_sent = int(sum(s[0] for s in stats))
        m.msgs_dense = int(sum(s[1] for s in stats))
        m.msgs_recv = int(sum(s[2] for s in stats))
        self.metrics[algo] = m
        if require_convergence and not m.converged:
            # a silently-capped min-label run returns stale/UNLABELED
            # labels that downstream consumers (and the exact-fixpoint
            # oracles) would treat as converged — fail loudly instead
            # (pass require_convergence=False for deliberate partial runs
            # that a later resume completes)
            # m.history can be empty when a resumed run starts at
            # start_iter >= max_iter with unconverged checkpointed state —
            # the RuntimeError must not be masked by an IndexError then
            changed = m.history[-1]["changed"] if m.history else "unknown"
            raise RuntimeError(
                f"{algo} did not reach its fixpoint within max_iter="
                f"{max_iter} iterations ({changed} labels "
                "still changing); raise max_iter (propagation needs ~graph "
                "diameter iterations)"
            )
        return self._results(algo)

    def components(
        self,
        max_iter: int = 5000,
        checkpoint_every: int = 0,
        resume: bool = False,
        require_convergence: bool = True,
    ) -> ray.data.Dataset:
        """Min-label propagation to fixpoint on the (symmetrized) build —
        the scalable replacement for per-node reachability/eccentricity
        (/root/reference/code/features/structure.py:129-131,173-177).
        Component id = min vertex id in the component (exact, deterministic).
        Requires a build with ``symmetrize=True`` — on a directed build the
        fixpoint would be forward-reachability min-labels, not components.
        """
        try:
            symmetrized = self._build_fingerprint().get("symmetrize")
        except FileNotFoundError:
            raise ValueError(
                "no build found in this work_dir: call build(edges, "
                "symmetrize=True) first"
            ) from None
        if not symmetrized:
            raise ValueError(
                "components() needs an undirected graph: "
                "call build(edges, symmetrize=True)"
            )
        return self._min_label_run(
            "components",
            None,
            max_iter,
            checkpoint_every,
            resume,
            require_convergence=require_convergence,
        )

    def labelprop(
        self,
        seeds: np.ndarray,
        max_iter: int = 5000,
        checkpoint_every: int = 0,
        resume: bool = False,
        seed_labels: np.ndarray | None = None,
        require_convergence: bool = True,
    ) -> ray.data.Dataset:
        """Seeded synchronous label propagation, smallest-label tie-break:
        seeds are frozen to their own label; every other vertex repeatedly
        adopts the minimum label among itself and its in-neighbors (run on
        the symmetrized build for undirected semantics).  Deterministic by
        construction; generalizes the reference's ancestor-class flags
        (/root/reference/code/features/structure.py:137-163).
        Unreached vertices keep the UNLABELED sentinel (documented).

        ``seed_labels`` (optional, aligned with ``seeds``) assigns explicit
        int64 labels; default is each seed's own vertex id.  Explicit labels
        make the fixpoint oracle-expressible: with rank-by-key labels, a
        non-seed vertex converges to the minimum label among seeds adjacent
        to its component of the seed-removed subgraph (seeds are frozen, so
        labels never relay *through* a seed).
        """
        seeds = np.asarray(seeds, dtype=np.int64)
        order = np.argsort(seeds)
        seeds = seeds[order]
        if seed_labels is not None:
            seed_labels = np.asarray(seed_labels, dtype=np.int64)[order]
        return self._min_label_run(
            "labelprop",
            seeds,
            max_iter,
            checkpoint_every,
            resume,
            seed_labels=seed_labels,
            require_convergence=require_convergence,
        )

    def hopdist(
        self,
        seeds: np.ndarray,
        max_iter: int = 5000,
        checkpoint_every: int = 0,
        resume: bool = False,
        require_convergence: bool = True,
    ) -> ray.data.Dataset:
        """Multi-source BFS hop distance from the seed set: min-PLUS label
        propagation (each edge crossing costs 1), seeds frozen at 0.
        Unreached vertices keep the UNLABELED sentinel.  Shares the whole
        min-label stack — delta exchange (distances only shrink), quiescent
        partitions, checkpoints — so total exchanged entries across the run
        are O(V) amortized, not O(V * diameter).

        Run on a symmetrized build for undirected distance.  This is the
        scalable stand-in for the reference's per-node
        eccentricity/closeness features
        (/root/reference/code/features/structure.py:129-177): per-seed-set
        distances instead of per-node all-pairs sweeps."""
        seeds = np.sort(np.asarray(seeds, dtype=np.int64))
        return self._min_label_run(
            "hopdist",
            seeds,
            max_iter,
            checkpoint_every,
            resume,
            seed_labels=np.zeros(len(seeds), dtype=np.int64),
            require_convergence=require_convergence,
        )

    def kcore(self, k: int, max_iter: int = 100000) -> ray.data.Dataset:
        """k-core decomposition by synchronous peeling: repeatedly remove
        every vertex with fewer than ``k`` neighbors still present; the
        survivors (with their within-core degrees) are the k-core.

        Scale shape: one dense degree exchange (segment lengths — no
        gather), then peel rounds whose messages are the per-dst counts of
        JUST-removed in-neighbors — sparse by construction (a vertex is
        removed once), so total bytes exchanged across ALL peel rounds is
        O(E) amortized, not O(E * rounds).  Hub removals ride the existing
        broadcast channel.  Requires a symmetrized build; for the standard
        distinct-neighbor degree semantics feed one row per undirected
        pair (the ``kcore_input`` helper in pipelines does this).

        Extends the engine's algorithm family the same way closeness ->
        PageRank and eccentricity -> components did (reference analog:
        per-node structural features,
        /root/reference/code/features/structure.py:129-177).  Peeling is
        monotone, so it always terminates; max_iter is a safety rail only.
        """
        try:
            symmetrized = self._build_fingerprint().get("symmetrize")
        except FileNotFoundError:
            raise ValueError(
                "no build found in this work_dir: call build(edges, "
                "symmetrize=True) first"
            ) from None
        if not symmetrized:
            raise ValueError("kcore() needs an undirected (symmetrized) build")
        self.start()
        t0 = time.time()
        m = RunMetrics()
        ray.get(
            [a.init_state.remote("kcore", kcore_k=int(k)) for a in self.actors]
        )
        # (no initial hub broadcast needed: the degree round does no
        # gather, and the first peel round's hub indicator is piggybacked
        # on apply_kcore_deg's returns)

        def one_round(algo: str, apply_name: str, hub):
            outs = self._exchange(algo, hub)
            applies = [
                getattr(self.actors[q], apply_name)
                .options(num_returns=2)
                .remote(*[outs[i][q] for i in range(len(outs))])
                for q in range(self.P)
            ]
            changed = sum(ray.get([a[0] for a in applies]))
            new_hub = None
            if self.has_hubs:
                new_hub = _assemble_hub_remote.remote(
                    self._hub_pos_ref,
                    len(self.hub_ids_global),
                    *[a[1] for a in applies],
                )
            return changed, new_hub

        changed, hub_ref = one_round("kcore_deg", "apply_kcore_deg", None)
        m.iterations = 1
        m.edges_traversed = self.total_edges
        m.history.append({"iter": 1, "removed": changed})
        while changed > 0 and m.iterations < max_iter:
            changed, hub_ref = one_round("kcore", "apply_kcore", hub_ref)
            m.iterations += 1
            m.edges_traversed += self.total_edges
            m.history.append({"iter": m.iterations, "removed": changed})
        m.converged = changed == 0
        m.wall_sec = time.time() - t0
        stats = ray.get([a.exchange_stats.remote() for a in self.actors])
        m.msgs_sent = int(sum(s[0] for s in stats))
        m.msgs_dense = int(sum(s[1] for s in stats))
        m.msgs_recv = int(sum(s[2] for s in stats))
        self.metrics["kcore"] = m
        if not m.converged:
            raise RuntimeError(
                f"kcore did not finish peeling within max_iter={max_iter}"
            )
        return self._results("kcore")

    # ---- results ----
    def _results(self, algo: str) -> ray.data.Dataset:
        tables = ray.get([a.result_table.remote(algo) for a in self.actors])
        return ray.data.from_arrow(tables)

    def cleanup(self):
        self.shutdown()
        shutil.rmtree(self.work_dir, ignore_errors=True)
