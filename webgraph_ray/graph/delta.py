"""Delta (incremental) engine-layout rebuild.

Given a base build (GraphEngine.build's hive-partitioned parquet layout)
and an edge delta (removed rows + added rows), produce a new layout in
which ONLY the partitions the delta touches are rewritten; every other
``part=K`` file is hardlinked from the base (byte-identical, zero copy).

This is the partition-scoped analog of the reference's per-visit mutation
scoping (/root/reference/robustness/structure_mutation/greedy_mutation.py:
224-240 rebuilds one visit's graph slice per candidate, not the whole
crawl); here the unit of rebuild is the engine partition instead of the
visit.  Cost is O(|delta| + sum of affected-partition sizes), not O(|E|):
the greedy mutation loop (pipelines/greedy.py) evaluates each candidate
against a layout produced this way.

Correctness invariants maintained exactly (all asserted, fail -> the
caller falls back to a full build):

- **edges/part=K**: multiset removal by (src, dst) occurrence + append of
  added rows, partition assignment identical to the base build's rule
  (src-owner, hub edges salted by (src+dst) % P).
- **outdeg/part=K**: weighted out-strength patched per source owner;
  rows hitting 0 are dropped (the vertex becomes dangling).
- **verts/part=K**: exact incidence counts patched per vertex owner; a
  vertex leaves the universe exactly when its count reaches 0, enters it
  when first referenced.
- **hub set**: must be unchanged by the delta — a threshold crossing
  would change edge salting globally, so it triggers the full-build
  fallback instead (returns False).
- **build_manifest.json**: per-partition fingerprint terms recomputed for
  patched partitions only; the global content hash therefore reflects the
  new edge multiset, so checkpoints from the base graph are never resumed
  against the mutated one.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from webgraph_ray.graph.engine import assemble_manifest, edges_part_contribution


class DeltaFallback(Exception):
    """Delta not applicable (hub-set change, missing rows, old layout):
    caller must run a full build."""


def assign_edge_parts(
    src: np.ndarray, dst: np.ndarray, num_parts: int, hub_ids: np.ndarray
) -> np.ndarray:
    """Mirror of engine._edge_partition_batch's assignment rule."""
    part = (src % num_parts).astype(np.int64)
    if len(hub_ids):
        is_hub = np.isin(src, hub_ids)
        part[is_hub] = (src[is_hub] + dst[is_hub]) % num_parts
    return part


def _multiset_remove_mask(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    r_src: np.ndarray,
    r_dst: np.ndarray,
    r_w: np.ndarray,
) -> np.ndarray:
    """Keep-mask over (src, dst, weight) rows after removing each removed
    triple once per occurrence.  Weights are matched on their exact float64
    bit pattern, so a base partition holding duplicate (src, dst) pairs with
    unequal weights drops exactly the occurrence the caller named (the
    outdeg patch subtracts the supplied weight — matching on the pair alone
    could silently diverge from a full rebuild).  Raises DeltaFallback if
    any removed occurrence has no matching row."""
    n = len(src)
    if len(r_src) == 0:
        return np.ones(n, dtype=bool)
    w_bits = np.ascontiguousarray(w, dtype=np.float64).view(np.int64)
    r_w_bits = np.ascontiguousarray(r_w, dtype=np.float64).view(np.int64)
    both = np.stack(
        [
            np.concatenate([src, r_src]),
            np.concatenate([dst, r_dst]),
            np.concatenate([w_bits, r_w_bits]),
        ],
        axis=1,
    )
    _, inv = np.unique(both, axis=0, return_inverse=True)
    lay_ids, rem_ids = inv[:n], inv[n:]
    rem_counts = np.bincount(rem_ids, minlength=int(inv.max()) + 1)
    order = np.argsort(lay_ids, kind="stable")
    sorted_ids = lay_ids[order]
    # occurrence rank within each pair group (sorted order)
    occ = np.arange(n) - np.searchsorted(sorted_ids, sorted_ids)
    drop_sorted = occ < rem_counts[sorted_ids]
    if int(drop_sorted.sum()) != len(r_src):
        raise DeltaFallback(
            f"{len(r_src) - int(drop_sorted.sum())} removed rows not found "
            "in base partition"
        )
    keep = np.ones(n, dtype=bool)
    keep[order[drop_sorted]] = False
    return keep


@ray.remote
def _patch_edges_part(
    base_dir: str,
    out_dir: str,
    part: int,
    r_src: np.ndarray,
    r_dst: np.ndarray,
    r_w: np.ndarray,
    a_src: np.ndarray,
    a_dst: np.ndarray,
    a_w: np.ndarray,
):
    """Rewrite one edges/part=K; returns the new fingerprint term or an
    error string (exceptions in the task -> driver-side fallback)."""
    src_d = os.path.join(base_dir, "edges", f"part={part}")
    if os.path.isdir(src_d) and os.listdir(src_d):
        t = pq.read_table(src_d, columns=["src", "dst", "weight"])
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    else:
        src = np.array([], dtype=np.int64)
        dst = np.array([], dtype=np.int64)
        w = np.array([], dtype=np.float64)
    keep = _multiset_remove_mask(src, dst, w, r_src, r_dst, r_w)
    new_src = np.concatenate([src[keep], a_src])
    new_dst = np.concatenate([dst[keep], a_dst])
    new_w = np.concatenate([w[keep], a_w])
    od = os.path.join(out_dir, "edges", f"part={part}")
    os.makedirs(od, exist_ok=True)
    tmp = os.path.join(od, f".tmp.{uuid.uuid4().hex[:8]}")
    pq.write_table(
        pa.table(
            {
                "src": pa.array(new_src),
                "dst": pa.array(new_dst),
                "weight": pa.array(new_w),
            }
        ),
        tmp,
    )
    os.replace(tmp, os.path.join(od, "data.parquet"))
    return list(edges_part_contribution(od))


def _read_keyed(base_dir: str, layout: str, part: int, value_col: str):
    d = os.path.join(base_dir, layout, f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        return np.array([], dtype=np.int64), np.array(
            [], dtype=np.float64 if value_col == "out_strength" else np.int64
        )
    t = pq.read_table(d, columns=["vertex_id", value_col])
    return (
        t["vertex_id"].to_numpy(zero_copy_only=False).astype(np.int64),
        t[value_col].to_numpy(zero_copy_only=False),
    )


def _apply_keyed_delta(
    vid: np.ndarray,
    val: np.ndarray,
    d_vid: np.ndarray,
    d_val: np.ndarray,
    *,
    integer: bool,
):
    """(vertex_id, value) + per-vertex delta -> patched arrays with zero
    rows dropped.  Negative results raise DeltaFallback."""
    pos = np.searchsorted(vid, d_vid)
    n = len(vid)
    known = (pos < n) & (vid[np.minimum(pos, max(n - 1, 0))] == d_vid) if n else np.zeros(len(d_vid), dtype=bool)
    new_val = val.astype(np.int64 if integer else np.float64).copy()
    np.add.at(new_val, pos[known], d_val[known])
    ins_vid = d_vid[~known]
    ins_val = d_val[~known]
    if len(ins_val) and (ins_val <= 0).any():
        raise DeltaFallback("delta decrements a vertex absent from the base")
    all_vid = np.concatenate([vid, ins_vid])
    all_val = np.concatenate([new_val, ins_val.astype(new_val.dtype)])
    order = np.argsort(all_vid, kind="stable")
    all_vid, all_val = all_vid[order], all_val[order]
    if (all_val < 0).any() or (
        not integer and (all_val < -1e-9).any()
    ):
        raise DeltaFallback("negative value after delta (removed > present)")
    keepm = all_val > (0 if integer else 1e-12)
    return all_vid[keepm], all_val[keepm]


def _write_keyed(out_dir: str, layout: str, part: int, vid, val, value_col: str):
    od = os.path.join(out_dir, layout, f"part={part}")
    os.makedirs(od, exist_ok=True)
    tmp = os.path.join(od, f".tmp.{uuid.uuid4().hex[:8]}")
    pq.write_table(
        pa.table({"vertex_id": pa.array(vid), value_col: pa.array(val)}), tmp
    )
    os.replace(tmp, os.path.join(od, "data.parquet"))


def _link_part(base_dir: str, out_dir: str, layout: str, part: int):
    sd = os.path.join(base_dir, layout, f"part={part}")
    if not os.path.isdir(sd):
        return
    dd = os.path.join(out_dir, layout, f"part={part}")
    os.makedirs(dd, exist_ok=True)
    for f in os.listdir(sd):
        try:
            os.link(os.path.join(sd, f), os.path.join(dd, f))
        except OSError:
            shutil.copy2(os.path.join(sd, f), os.path.join(dd, f))


def _group_delta(vid: np.ndarray, val: np.ndarray):
    """Sum ``val`` per unique vid (both sorted by vid on return)."""
    if not len(vid):
        return vid, val
    order = np.argsort(vid, kind="stable")
    vid, val = vid[order], val[order]
    uniq, starts = np.unique(vid, return_index=True)
    return uniq, np.add.reduceat(val, starts)


def delta_build(
    base_dir: str,
    out_dir: str,
    removed: "pa.Table | None",
    added: "pa.Table | None",
) -> bool:
    """Produce ``out_dir`` = base layout with ``removed`` rows taken out
    and ``added`` rows put in.  Returns True on success; False when the
    delta cannot be applied incrementally (hub-set change, row mismatch,
    layout without per-part fingerprint terms) — the caller must then run
    a full ``GraphEngine.build``.  ``removed`` / ``added`` are arrow
    tables (or None) with columns src, dst, weight; for a symmetrized
    base build they must already contain the reverse rows."""

    def cols(t):
        if t is None or t.num_rows == 0:
            return (
                np.array([], dtype=np.int64),
                np.array([], dtype=np.int64),
                np.array([], dtype=np.float64),
            )
        return (
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["weight"].to_numpy(zero_copy_only=False).astype(np.float64),
        )

    try:
        with open(os.path.join(base_dir, "build_manifest.json")) as f:
            manifest = json.load(f)
        if "part_terms" not in manifest:
            raise DeltaFallback("base manifest has no per-part terms")
        P = int(manifest["num_parts"])
        hub_path = os.path.join(base_dir, "hubs.parquet")
        hub_ids = (
            pq.read_table(hub_path)["vertex_id"].to_numpy().astype(np.int64)
            if os.path.exists(hub_path)
            else np.array([], dtype=np.int64)
        )
        r_src, r_dst, r_w = cols(removed)
        a_src, a_dst, a_w = cols(added)

        # --- out-strength delta per source owner + hub-stability check ---
        od_vid, od_dw = _group_delta(
            np.concatenate([r_src, a_src]), np.concatenate([-r_w, a_w])
        )
        nz = od_dw != 0
        od_vid, od_dw = od_vid[nz], od_dw[nz]
        od_parts = od_vid % P
        thr = float(manifest["hub_threshold"])
        for p in np.unique(od_parts):
            vid, val = _read_keyed(base_dir, "outdeg", int(p), "out_strength")
            sel = od_parts == p
            dv, dd = od_vid[sel], od_dw[sel]
            pos = np.searchsorted(vid, dv)
            n = len(vid)
            known = (
                (pos < n) & (vid[np.minimum(pos, max(n - 1, 0))] == dv)
                if n
                else np.zeros(len(dv), dtype=bool)
            )
            old_out = np.zeros(len(dv))
            old_out[known] = val.astype(np.float64)[pos[known]]
            new_out = old_out + dd
            if ((old_out > thr) != (new_out > thr)).any():
                raise DeltaFallback("hub set changes under delta")

        # --- vertex incidence-count delta per owner ---
        vc_vid, vc_dc = _group_delta(
            np.concatenate([r_src, r_dst, a_src, a_dst]),
            np.concatenate(
                [
                    np.full(len(r_src) + len(r_dst), -1, dtype=np.int64),
                    np.full(len(a_src) + len(a_dst), 1, dtype=np.int64),
                ]
            ).astype(np.float64),
        )
        nz = vc_dc != 0
        vc_vid, vc_dc = vc_vid[nz], vc_dc[nz].astype(np.int64)
        vc_parts = vc_vid % P

        # --- edge-row partition assignment (same rule as the base build) ---
        r_part = assign_edge_parts(r_src, r_dst, P, hub_ids)
        a_part = assign_edge_parts(a_src, a_dst, P, hub_ids)
        edge_parts = np.unique(np.concatenate([r_part, a_part])).astype(int)

        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)

        # --- edges: patch affected parts (parallel), link the rest ---
        patch_refs = {}
        for p in edge_parts:
            rs = r_part == p
            as_ = a_part == p
            patch_refs[int(p)] = _patch_edges_part.remote(
                base_dir,
                out_dir,
                int(p),
                r_src[rs],
                r_dst[rs],
                r_w[rs],
                a_src[as_],
                a_dst[as_],
                a_w[as_],
            )
        for p in range(P):
            if p not in patch_refs:
                _link_part(base_dir, out_dir, "edges", p)

        # --- outdeg: patch affected owners, link the rest ---
        od_touch = set(int(p) for p in np.unique(od_parts))
        for p in range(P):
            if p in od_touch:
                vid, val = _read_keyed(base_dir, "outdeg", p, "out_strength")
                sel = od_parts == p
                nv, nval = _apply_keyed_delta(
                    vid,
                    val.astype(np.float64),
                    od_vid[sel],
                    od_dw[sel],
                    integer=False,
                )
                _write_keyed(out_dir, "outdeg", p, nv, nval, "out_strength")
            else:
                _link_part(base_dir, out_dir, "outdeg", p)

        # --- verts: patch affected owners, link the rest ---
        vc_touch = set(int(p) for p in np.unique(vc_parts))
        for p in range(P):
            if p in vc_touch:
                vid, val = _read_keyed(base_dir, "verts", p, "cnt")
                sel = vc_parts == p
                nv, nval = _apply_keyed_delta(
                    vid,
                    val.astype(np.int64),
                    vc_vid[sel],
                    vc_dc[sel],
                    integer=True,
                )
                _write_keyed(out_dir, "verts", p, nv, nval, "cnt")
            else:
                _link_part(base_dir, out_dir, "verts", p)

        # --- hubs (unchanged by construction) + manifest ---
        if os.path.exists(hub_path):
            try:
                os.link(hub_path, os.path.join(out_dir, "hubs.parquet"))
            except OSError:
                shutil.copy2(hub_path, os.path.join(out_dir, "hubs.parquet"))

        new_terms = dict(manifest["part_terms"])
        for p, ref in patch_refs.items():
            new_terms[str(p)] = ray.get(ref)
        new_manifest = assemble_manifest(
            P,
            int(manifest["hub_threshold"]),
            bool(manifest["symmetrize"]),
            int(manifest["num_hubs"]),
            new_terms,
        )
        with open(os.path.join(out_dir, "build_manifest.json"), "w") as f:
            json.dump(new_manifest, f)
        return True
    except DeltaFallback:
        shutil.rmtree(out_dir, ignore_errors=True)
        return False
    except ray.exceptions.RayTaskError as e:
        # DeltaFallback raised inside a patch task arrives wrapped
        if isinstance(e.cause, DeltaFallback):
            shutil.rmtree(out_dir, ignore_errors=True)
            return False
        raise
