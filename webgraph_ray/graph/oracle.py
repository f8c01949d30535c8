"""Trusted driver-side oracle (networkx/numpy) for the graph algorithms.

Mirrors the reference's idiom of building a networkx DiGraph from the edge
table (/root/reference/code/graph/graph_builder.py:66-68) — used ONLY in
tests, never in the engine (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

try:
    import networkx as nx

    HAS_NX = True
except ImportError:  # pragma: no cover
    HAS_NX = False

from webgraph_ray.graph.engine import UNLABELED


def _weighted_digraph(edges: pd.DataFrame):
    g = nx.DiGraph()
    for src, dst, w in (
        edges.groupby(["src", "dst"])["weight"].sum().reset_index().itertuples(index=False)
    ):
        g.add_edge(int(src), int(dst), weight=float(w))
    return g


def pagerank_oracle(edges: pd.DataFrame, alpha=0.85, tol=1e-6, max_iter=100) -> dict[int, float]:
    g = _weighted_digraph(edges)
    # scipy is not installed in this environment; use networkx's pure-python
    # power iteration (same documented semantics: uniform init, uniform
    # dangling distribution, err = sum|x-xlast| < N*tol)
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    return _pagerank_python(
        g, alpha=alpha, tol=tol, max_iter=max_iter, weight="weight"
    )


def components_oracle(edges: pd.DataFrame) -> dict[int, int]:
    g = nx.Graph()
    g.add_edges_from(
        (int(s), int(d)) for s, d in edges[["src", "dst"]].itertuples(index=False)
    )
    out = {}
    for comp in nx.connected_components(g):
        mid = min(comp)
        for v in comp:
            out[v] = mid
    return out


def labelprop_oracle(
    edges: pd.DataFrame, seeds: np.ndarray, max_iter: int = 50
) -> dict[int, int]:
    """Seeded synchronous min-label propagation on the undirected view:
    seeds frozen to their own id; others take min(own, neighbors) per round
    until fixpoint.  Pure-numpy independent implementation."""
    src = edges["src"].to_numpy(dtype=np.int64)
    dst = edges["dst"].to_numpy(dtype=np.int64)
    # symmetrize
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    verts = np.unique(np.concatenate([s, d]))
    label = np.full(len(verts), UNLABELED, dtype=np.int64)
    seeds = np.asarray(seeds, dtype=np.int64)
    seed_pos = np.searchsorted(verts, seeds)
    seed_pos = seed_pos[(seed_pos < len(verts)) & (verts[np.minimum(seed_pos, len(verts) - 1)] == seeds)]
    label[seed_pos] = verts[seed_pos]
    frozen = np.zeros(len(verts), dtype=bool)
    frozen[seed_pos] = True
    si = np.searchsorted(verts, s)
    di = np.searchsorted(verts, d)
    for _ in range(max_iter):
        new = label.copy()
        msg = label[si]
        order = np.argsort(di, kind="stable")
        dsorted = di[order]
        msorted = msg[order]
        uniq, starts = np.unique(dsorted, return_index=True)
        mins = np.minimum.reduceat(msorted, starts)
        new[uniq] = np.minimum(new[uniq], mins)
        new[frozen] = label[frozen]
        if (new == label).all():
            break
        label = new
    return {int(v): int(l) for v, l in zip(verts, label)}


def triangles_oracle(edges: pd.DataFrame) -> tuple[int, dict[int, int]]:
    g = nx.Graph()
    g.add_edges_from(
        (int(s), int(d))
        for s, d in edges[["src", "dst"]].itertuples(index=False)
        if s != d
    )
    per = nx.triangles(g)
    total = sum(per.values()) // 3
    return total, per
