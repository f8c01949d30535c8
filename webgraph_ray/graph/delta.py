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

Scale shape: the delta arrives either as small driver-side Arrow tables
or as ``ray.data.Dataset``s (columns src, dst, weight).  Both are SPOOLED
to a hive-partitioned scratch directory first — edge rows by their base
partition rule, per-vertex strength/incidence delta PARTIALS by vertex
owner (pre-combined per batch, the map-side-combine rule) — and every
patch below runs as a per-partition Ray task that reads only its own
spool slice.  With Dataset inputs nothing proportional to the delta ever
materializes on the driver: a mutation of the top hub's in-edge set (the
greedy loop's working set) streams batch-by-batch from the object store
into the spool.  The spool directory must live on storage shared by all
nodes, the same contract as the engine work_dir.

Correctness invariants maintained exactly (all asserted, fail -> the
caller falls back to a full build):

- **edges/part=K**: multiset removal by (src, dst, weight-bits)
  occurrence + append of added rows, partition assignment identical to
  the base build's rule (src-owner, hub edges salted by (src+dst) % P).
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
import tempfile
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


# ---------------------------------------------------------------------------
# Delta spool: edge rows by base partition, per-vertex partials by owner
# ---------------------------------------------------------------------------


def _read_spool_edges(spool: str, sub: str, part: int):
    d = os.path.join(spool, sub, f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        z = np.array([], dtype=np.int64)
        return z, z, np.array([], dtype=np.float64)
    t = pq.read_table(d, columns=["src", "dst", "weight"])
    return (
        t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["weight"].to_numpy(zero_copy_only=False).astype(np.float64),
    )


def _write_edge_slice(spool, sub, part, src, dst, w, tag):
    od = os.path.join(spool, sub, f"part={int(part)}")
    os.makedirs(od, exist_ok=True)
    pq.write_table(
        pa.table(
            {"src": pa.array(src), "dst": pa.array(dst), "weight": pa.array(w)}
        ),
        os.path.join(od, f"d_{tag}.parquet"),
    )


def _spool_edge_arrays(spool, sub, src, dst, w, P, hub_ids, tag):
    part = assign_edge_parts(src, dst, P, hub_ids)
    for p in np.unique(part):
        sel = part == p
        _write_edge_slice(spool, sub, p, src[sel], dst[sel], w[sel], tag)


def _spool_dataset(spool: str, sub: str, ds, P: int, hub_ids: np.ndarray):
    """Stream a Dataset delta into the spool: each batch scatters its rows
    by the base partition rule — nothing lands on the driver."""

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows:
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
            _spool_edge_arrays(
                spool, sub, src, dst, w, P, hub_ids, uuid.uuid4().hex[:8]
            )
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(scatter, batch_format="pyarrow").materialize()


@ray.remote
def _spool_partials(spool: str, part: int, num_parts: int):
    """Per edge-partition task: turn this part's spooled removed/added rows
    into per-OWNER (vertex_id, dw) strength partials and (vertex_id, dc)
    incidence partials (pre-combined), so the keyed patches below read only
    their own slice."""
    r_src, r_dst, r_w = _read_spool_edges(spool, "rem", part)
    a_src, a_dst, a_w = _read_spool_edges(spool, "add", part)

    def grouped(vid, val):
        if not len(vid):
            return vid, val
        order = np.argsort(vid, kind="stable")
        vid, val = vid[order], val[order]
        uniq, starts = np.unique(vid, return_index=True)
        return uniq, np.add.reduceat(val, starts)

    tag = uuid.uuid4().hex[:8]
    od_vid, od_dw = grouped(
        np.concatenate([r_src, a_src]), np.concatenate([-r_w, a_w])
    )
    nz = od_dw != 0
    od_vid, od_dw = od_vid[nz], od_dw[nz]
    for p in np.unique(od_vid % num_parts):
        sel = (od_vid % num_parts) == p
        d = os.path.join(spool, "outdeg_delta", f"part={int(p)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {"vertex_id": pa.array(od_vid[sel]), "dw": pa.array(od_dw[sel])}
            ),
            os.path.join(d, f"p_{part}_{tag}.parquet"),
        )

    vc_vid, vc_dc = grouped(
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
    for p in np.unique(vc_vid % num_parts):
        sel = (vc_vid % num_parts) == p
        d = os.path.join(spool, "verts_delta", f"part={int(p)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {"vertex_id": pa.array(vc_vid[sel]), "dc": pa.array(vc_dc[sel])}
            ),
            os.path.join(d, f"p_{part}_{tag}.parquet"),
        )
    return int(len(r_src) + len(a_src))


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


def _read_spool_keyed(spool: str, layout: str, part: int, col: str):
    d = os.path.join(spool, layout, f"part={part}")
    if not os.path.isdir(d) or not os.listdir(d):
        return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
    t = pq.read_table(d, columns=["vertex_id", col])
    vid = t["vertex_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = t[col].to_numpy(zero_copy_only=False)
    order = np.argsort(vid, kind="stable")
    vid, val = vid[order], val[order]
    uniq, starts = np.unique(vid, return_index=True)
    return uniq, np.add.reduceat(val, starts)


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


# ---------------------------------------------------------------------------
# Per-partition patch tasks (each reads ONLY its own spool slice)
# ---------------------------------------------------------------------------


@ray.remote
def _patch_edges_part(base_dir: str, out_dir: str, spool: str, part: int):
    """Rewrite one edges/part=K from its spool slice; returns the new
    fingerprint term (exceptions in the task -> driver-side fallback)."""
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
    r_src, r_dst, r_w = _read_spool_edges(spool, "rem", part)
    a_src, a_dst, a_w = _read_spool_edges(spool, "add", part)
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


@ray.remote
def _patch_outdeg_part(
    base_dir: str, out_dir: str, spool: str, part: int, threshold: float
):
    """Patch one outdeg/part=K owner from its grouped strength delta, and
    enforce the hub-stability invariant for this owner's vertices."""
    dv, dd = _read_spool_keyed(spool, "outdeg_delta", part, "dw")
    vid, val = _read_keyed(base_dir, "outdeg", part, "out_strength")
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
    if ((old_out > threshold) != (new_out > threshold)).any():
        raise DeltaFallback("hub set changes under delta")
    nv, nval = _apply_keyed_delta(
        vid, val.astype(np.float64), dv, dd, integer=False
    )
    _write_keyed(out_dir, "outdeg", part, nv, nval, "out_strength")
    return True


@ray.remote
def _patch_verts_part(base_dir: str, out_dir: str, spool: str, part: int):
    dv, dd = _read_spool_keyed(spool, "verts_delta", part, "dc")
    vid, val = _read_keyed(base_dir, "verts", part, "cnt")
    nv, nval = _apply_keyed_delta(
        vid, val.astype(np.int64), dv, dd.astype(np.int64), integer=True
    )
    _write_keyed(out_dir, "verts", part, nv, nval, "cnt")
    return True


def _touched_parts(spool: str, sub: str) -> set[int]:
    d = os.path.join(spool, sub)
    if not os.path.isdir(d):
        return set()
    return {
        int(name.split("=", 1)[1])
        for name in os.listdir(d)
        if name.startswith("part=") and os.listdir(os.path.join(d, name))
    }


def delta_build(
    base_dir: str,
    out_dir: str,
    removed,
    added,
) -> bool:
    """Produce ``out_dir`` = base layout with ``removed`` rows taken out
    and ``added`` rows put in.  Returns True on success; False when the
    delta cannot be applied incrementally (hub-set change, row mismatch,
    layout without per-part fingerprint terms) — the caller must then run
    a full ``GraphEngine.build``.  ``removed`` / ``added`` are arrow
    tables, ``ray.data.Dataset``s, or None, with columns src, dst, weight;
    for a symmetrized base build they must already contain the reverse
    rows.  Dataset inputs stream straight into the per-partition spool —
    nothing proportional to the delta reaches the driver."""
    spool = tempfile.mkdtemp(prefix="webgraph_delta_spool_", dir=base_dir)
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

        # --- spool the delta (driver-side for tables, streamed for Datasets)
        for sub, delta in (("rem", removed), ("add", added)):
            if delta is None:
                continue
            if isinstance(delta, pa.Table):
                if delta.num_rows:
                    _spool_edge_arrays(
                        spool,
                        sub,
                        delta["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                        delta["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                        delta["weight"]
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64),
                        P,
                        hub_ids,
                        uuid.uuid4().hex[:8],
                    )
            else:  # ray.data.Dataset
                _spool_dataset(spool, sub, delta, P, hub_ids)

        edge_parts = sorted(
            _touched_parts(spool, "rem") | _touched_parts(spool, "add")
        )
        # per-owner strength/incidence partials from the spooled edge rows
        ray.get([_spool_partials.remote(spool, p, P) for p in edge_parts])
        od_touch = _touched_parts(spool, "outdeg_delta")
        vc_touch = _touched_parts(spool, "verts_delta")

        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)

        refs = []
        patch_refs = {}
        for p in edge_parts:
            patch_refs[int(p)] = _patch_edges_part.remote(
                base_dir, out_dir, spool, int(p)
            )
        thr = float(manifest["hub_threshold"])
        for p in range(P):
            if p not in patch_refs:
                _link_part(base_dir, out_dir, "edges", p)
            if p in od_touch:
                refs.append(
                    _patch_outdeg_part.remote(base_dir, out_dir, spool, p, thr)
                )
            else:
                _link_part(base_dir, out_dir, "outdeg", p)
            if p in vc_touch:
                refs.append(_patch_verts_part.remote(base_dir, out_dir, spool, p))
            else:
                _link_part(base_dir, out_dir, "verts", p)
        ray.get(refs)

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
    except (DeltaFallback, ray.exceptions.RayTaskError) as e:
        if isinstance(e, ray.exceptions.RayTaskError) and not isinstance(
            e.cause, DeltaFallback
        ):
            raise
        # drain in-flight patch tasks BEFORE removing out_dir, or a
        # straggler could re-create it after the cleanup
        pending = list(locals().get("patch_refs", {}).values()) + list(
            locals().get("refs", [])
        )
        for ref in pending:
            try:
                ray.get(ref)
            except Exception:
                pass
        shutil.rmtree(out_dir, ignore_errors=True)
        return False
    finally:
        shutil.rmtree(spool, ignore_errors=True)
