"""Katz centrality: brute int-reference + engine/SQL parity + partitioning."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.graph.katz import katz_fp_ctes, katz_keyed

SCALE = 10**9

EDGES = [
    (0, 1, 1), (0, 2, 2), (1, 2, 1), (2, 3, 5),
    (3, 0, 1), (4, 2, 3), (2, 4, 1), (0, 3, 1),
    # a parallel edge (same src/dst twice): linear in w, must fold in
    (0, 1, 4),
]


def _brute(edge_rows, iters, scale=SCALE):
    verts = sorted({v for e in edge_rows for v in e[:2]})
    inw = {}
    for _, d, w in edge_rows:
        inw[d] = inw.get(d, 0) + w
    aden = max(2 * max(inw.values(), default=1), 2)
    x = {v: scale for v in verts}
    for _ in range(iters):
        agg = {v: 0 for v in verts}
        for s, d, w in edge_rows:
            agg[d] += x[s] * w
        x = {v: scale + agg[v] // aden for v in verts}
    return x, aden


def _mk(edge_rows):
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edge_rows], pa.int64()),
                "dst": pa.array([e[1] for e in edge_rows], pa.int64()),
                "weight": pa.array([e[2] for e in edge_rows], pa.int64()),
            }
        )
    )
    ids = sorted({v for e in edge_rows for v in e[:2]})
    vertices = ray.data.from_arrow(
        pa.table(
            {
                "vertex_id": pa.array(ids, pa.int64()),
                "vertex_key": pa.array([f"v{i:03d}" for i in ids]),
            }
        )
    )
    return edges, vertices


def test_engine_matches_brute(tmp_path):
    exp, _ = _brute(EDGES, iters=6)
    edges, vertices = _mk(EDGES)
    got = katz_keyed(edges, vertices, str(tmp_path), iters=6)
    got_map = {
        int(k[1:]): int(s) for k, s in zip(got["vertex_key"], got["score_fp"])
    }
    assert got_map == exp
    # sanity: the heavy-in-weight vertex 2 must outrank the leaf 1
    assert got_map[2] > got_map[1]


def test_partition_invariance(tmp_path):
    edges, vertices = _mk(EDGES)
    a = katz_keyed(edges, vertices, str(tmp_path / "a"), num_parts=1)
    b = katz_keyed(edges, vertices, str(tmp_path / "b"), num_parts=4)
    assert a.equals(b)


def test_sql_parity(tmp_path):
    edges, vertices = _mk(EDGES)
    got = katz_keyed(edges, vertices, str(tmp_path), iters=6)
    df = pd.DataFrame(
        {
            "src_key": [f"v{e[0]:03d}" for e in EDGES],
            "dst_key": [f"v{e[1]:03d}" for e in EDGES],
            "weight": [e[2] for e in EDGES],
        }
    )
    con = duckdb.connect()
    con.register("raw_edges", df)
    sql = (
        "WITH edges AS (SELECT src_key, dst_key, weight FROM raw_edges)"
        + katz_fp_ctes(iters=6)
        + "\nSELECT vertex_key, CAST(val AS BIGINT) AS score_fp FROM kz6"
        "\nORDER BY vertex_key"
    )
    oracle = con.execute(sql).df()
    con.close()
    assert list(oracle["vertex_key"]) == list(got["vertex_key"])
    assert list(oracle["score_fp"]) == list(got["score_fp"])


# --- eigenvector centrality (same module family) ---------------------------

from webgraph_ray.graph.katz import eigen_fp_ctes, eigenvector_keyed  # noqa: E402

EIG_SCALE = 10**7


def _brute_eigen(edge_rows, iters, scale=EIG_SCALE):
    verts = sorted({v for e in edge_rows for v in e[:2]})
    x = {v: scale // len(verts) for v in verts}
    for _ in range(iters):
        raw = {v: 0 for v in verts}
        for s, d, w in edge_rows:
            raw[d] += x[s] * w
        total = sum(raw.values())
        if total == 0:
            x = {v: 0 for v in verts}
        else:
            x = {v: (raw[v] * scale) // total for v in verts}
    return x


def test_eigen_matches_brute_and_sql(tmp_path):
    exp = _brute_eigen(EDGES, iters=12)
    edges, vertices = _mk(EDGES)
    got = eigenvector_keyed(edges, vertices, str(tmp_path))
    got_map = {
        int(k[1:]): int(s) for k, s in zip(got["vertex_key"], got["score_fp"])
    }
    assert got_map == exp
    df = pd.DataFrame(
        {
            "src_key": [f"v{e[0]:03d}" for e in EDGES],
            "dst_key": [f"v{e[1]:03d}" for e in EDGES],
            "weight": [e[2] for e in EDGES],
        }
    )
    con = duckdb.connect()
    con.register("raw_edges", df)
    sql = (
        "WITH edges AS (SELECT src_key, dst_key, weight FROM raw_edges)"
        + eigen_fp_ctes(iters=12)
        + "\nSELECT vertex_key, CAST(val AS BIGINT) AS score_fp FROM ev12"
        "\nORDER BY vertex_key"
    )
    oracle = con.execute(sql).df()
    con.close()
    assert list(oracle["vertex_key"]) == list(got["vertex_key"])
    assert list(oracle["score_fp"]) == list(got["score_fp"])


def test_eigen_partition_invariance(tmp_path):
    edges, vertices = _mk(EDGES)
    a = eigenvector_keyed(edges, vertices, str(tmp_path / "a"), num_parts=1)
    b = eigenvector_keyed(edges, vertices, str(tmp_path / "b"), num_parts=4)
    assert a.equals(b)
