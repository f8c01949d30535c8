"""link_prediction: hand-built fixture + pure-pandas oracle + path equality."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.graph.linkpred import link_prediction


def _mk(edge_pairs, keys_by_id):
    src = np.array([a for a, _ in edge_pairs], dtype=np.int64)
    dst = np.array([b for _, b in edge_pairs], dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    ids = np.array(sorted(keys_by_id), dtype=np.int64)
    vertices = ray.data.from_arrow(
        pa.table(
            {
                "vertex_id": ids,
                "vertex_key": pa.array([keys_by_id[i] for i in ids]),
            }
        )
    )
    return edges, vertices


def _oracle(edge_pairs, keys_by_id, deg_cap):
    und = {(min(a, b), max(a, b)) for a, b in edge_pairs if a != b}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    cn = {}
    ra = {}
    for c, ns in nbrs.items():
        if not (2 <= deg[c] <= deg_cap):
            continue
        w_c = (1 << 20) // deg[c]
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                cn[p] = cn.get(p, 0) + 1
                ra[p] = ra.get(p, 0) + w_c
    best = {}
    for (u, w), c in cn.items():
        if (u, w) in und:
            continue
        jac = c * (1 << 20) // (deg[u] + deg[w] - c)
        for v, p in ((u, w), (w, u)):
            cur = best.get(v)
            cand = (-c, keys_by_id[p])
            if cur is None or cand < cur[0]:
                best[v] = (cand, p, c, ra[(u, w)], jac)
    return {
        v: (keys_by_id[p], c, r, j)
        for v, ((_, _), p, c, r, j) in best.items()
    }


def _run(edge_pairs, keys_by_id, deg_cap, **kw):
    edges, vertices = _mk(edge_pairs, keys_by_id)
    out = link_prediction(edges, vertices, deg_cap=deg_cap, **kw).to_pandas()
    if out.empty:
        return {}
    return {
        int(r.vertex_id): (
            r.lp_partner,
            int(r.lp_cn),
            int(r.lp_ra_fp),
            int(r.lp_jac_fp),
        )
        for r in out.itertuples()
    }


# ids deliberately ordered OPPOSITE to keys so an id-based tie-break would
# give the wrong answer: id 10 -> key 'z', id 11 -> 'y', ...
KEYS = {10: "z", 11: "y", 12: "x", 13: "w", 14: "v", 15: "u", 16: "t"}
EDGES = [
    # center 13 connects {10, 11}; center 14 also connects {10, 11}
    (13, 10), (13, 11), (14, 10), (14, 11),
    # tie: 15 and 16 are both sole common-neighbor partners of 12 via 13
    (13, 12), (13, 15), (13, 16),  # wait: 13's nbrs = {10,11,12,15,16}
]


def test_counts_and_tiebreak():
    exp = _oracle(EDGES, KEYS, deg_cap=64)
    got = _run(EDGES, KEYS, deg_cap=64)
    assert got == exp
    # (10, 11) share centers 13 (deg 5) and 14 (deg 2) and are not adjacent
    # -> cn = 2, ra = 2^20//5 + 2^20//2 = 209715 + 524288; both endpoints
    # have deg 2, so jac = 2*2^20 // (2+2-2) = 2^20
    assert got[10] == ("y", 2, 734003, 1 << 20)
    assert got[11] == ("z", 2, 734003, 1 << 20)
    # 12's candidates via center 13 all have cn = 1; the tie must break by
    # KEY ('t' < 'u' < 'y' < 'z'), i.e. partner id 16 — an id-ordered
    # tie-break would pick id 10 ('z') instead
    # deg(12) = deg(16) = 1 -> union size 1 -> jac = 2^20 despite cn = 1
    assert got[12] == ("t", 1, 209715, 1 << 20)


def test_hub_center_excluded():
    # a hub center (id 100) connects 10 spokes; with deg_cap below 10 the
    # spokes get NO predictions through it
    keys = {100: "hub", **{200 + i: f"s{i:02d}" for i in range(10)}}
    edges = [(100, 200 + i) for i in range(10)]
    assert _run(edges, keys, deg_cap=9) == {}
    # raising the cap to 10 admits the hub as a center again
    got = _run(edges, keys, deg_cap=10)
    exp = _oracle(edges, keys, deg_cap=10)
    assert got == exp
    assert got[200] == ("s01", 1, (1 << 20) // 10, 1 << 20)


def test_adjacent_pairs_excluded():
    # triangle 1-2-3: every shared-neighbor pair is already an edge
    keys = {1: "a", 2: "b", 3: "c"}
    edges = [(1, 2), (2, 3), (1, 3)]
    assert _run(edges, keys, deg_cap=64) == {}


def test_large_path_matches_small():
    exp = _run(EDGES, KEYS, deg_cap=64)
    got = _run(EDGES, KEYS, deg_cap=64, broadcast_threshold=0)
    assert got == exp
