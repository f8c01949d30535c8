"""SCC: networkx parity on planted and random digraphs + invariances."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.graph.scc import scc_keyed


def _mk(edge_pairs, n_verts=None):
    ids = sorted(
        set(range(n_verts)) if n_verts else {v for e in edge_pairs for v in e}
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edge_pairs], pa.int64()),
                "dst": pa.array([b for _, b in edge_pairs], pa.int64()),
            }
        )
    )
    vertices = ray.data.from_arrow(
        pa.table(
            {
                "vertex_id": pa.array(ids, pa.int64()),
                "vertex_key": pa.array([f"v{i:03d}" for i in ids]),
            }
        )
    )
    return edges, vertices


def _nx_scc(edge_pairs, n_verts=None):
    import networkx as nx

    g = nx.DiGraph()
    if n_verts:
        g.add_nodes_from(range(n_verts))
    g.add_edges_from(edge_pairs)
    out = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def _check(edge_pairs, tmp_path, n_verts=None, **kw):
    edges, vertices = _mk(edge_pairs, n_verts)
    got = scc_keyed(edges, vertices, str(tmp_path), **kw)
    got_map = {
        int(k[1:]): int(s[1:])
        for k, s in zip(got["vertex_key"], got["scc_key"])
    }
    assert got_map == _nx_scc(edge_pairs, n_verts)


def test_planted_cycles(tmp_path):
    # two cycles bridged by one-way edges + a DAG tail + an isolate
    edges = [
        (0, 1), (1, 2), (2, 0),          # SCC {0,1,2}
        (2, 3),                          # bridge
        (3, 4), (4, 5), (5, 3),          # SCC {3,4,5}
        (5, 6), (6, 7),                  # DAG tail (singletons)
        (8, 8),                          # self-loop (dropped by the build's
                                         # canonicalization in networkx too)
    ]
    _check(edges, tmp_path, n_verts=10)


def test_mutual_pair_and_chain(tmp_path):
    # a 2-cycle at the END of a long chain: forces several FW-BW rounds
    # under adversarial (monotone) id ordering
    chain = [(i, i + 1) for i in range(8)]
    edges = chain + [(9, 8), (8, 9)]
    _check(edges, tmp_path)


def test_random_digraph_parity(tmp_path):
    rng = np.random.RandomState(7)
    n = 40
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.randint(0, n, 160), rng.randint(0, n, 160))
            if a != b
        }
    )
    _check(edges, tmp_path, n_verts=n)


def test_partition_invariance(tmp_path):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)]
    e1, v1 = _mk(edges)
    a = scc_keyed(e1, v1, str(tmp_path / "a"), num_parts=1)
    e2, v2 = _mk(edges)
    b = scc_keyed(e2, v2, str(tmp_path / "b"), num_parts=4)
    assert a.equals(b)


def test_antijoin_path_matches_broadcast(tmp_path):
    """broadcast_threshold=0 forces the settled-filter anti-join path."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (4, 5)]
    e1, v1 = _mk(edges)
    a = scc_keyed(e1, v1, str(tmp_path / "a"))
    e2, v2 = _mk(edges)
    b = scc_keyed(e2, v2, str(tmp_path / "b"), broadcast_threshold=0)
    assert a.equals(b)
