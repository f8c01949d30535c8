"""SALSA: brute int-reference + engine/SQL parity + partitioning."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.graph.salsa import salsa_keyed, salsa_sql

SCALE = 10**12

EDGES = [
    (0, 1, 1), (0, 2, 2), (1, 2, 1), (2, 3, 5),
    (3, 0, 1), (4, 2, 3), (2, 4, 1), (0, 3, 1),
    (0, 1, 4),  # parallel edge
]


def _brute(edge_rows, iters, scale=SCALE):
    verts = sorted({v for e in edge_rows for v in e[:2]})
    outw, inw = {}, {}
    for s, d, w in edge_rows:
        outw[s] = outw.get(s, 0) + w
        inw[d] = inw.get(d, 0) + w
    h = {v: scale // len(verts) for v in verts}
    a = {v: 0 for v in verts}
    for _ in range(iters):
        a = {v: 0 for v in verts}
        for s, d, w in edge_rows:
            a[d] += (h[s] // outw[s]) * w
        h = {v: 0 for v in verts}
        for s, d, w in edge_rows:
            h[s] += (a[d] // inw[d]) * w
    return a, h


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
    exp_a, exp_h = _brute(EDGES, iters=8)
    edges, vertices = _mk(EDGES)
    got = salsa_keyed(edges, vertices, str(tmp_path)).to_pandas()
    got = got.sort_values("vertex_key").reset_index(drop=True)
    for _, r in got.iterrows():
        v = int(r["vertex_key"][1:])
        assert int(r["auth_fp"]) == exp_a[v], v
        assert int(r["hub_fp"]) == exp_h[v], v
    # mass conservation up to floors: totals bounded by SCALE
    assert 0 < got["auth_fp"].sum() <= SCALE
    assert 0 < got["hub_fp"].sum() <= SCALE


def test_partition_invariance(tmp_path):
    edges, vertices = _mk(EDGES)
    a = salsa_keyed(edges, vertices, str(tmp_path / "a"), num_parts=1).to_pandas()
    b = salsa_keyed(edges, vertices, str(tmp_path / "b"), num_parts=4).to_pandas()
    a = a.sort_values("vertex_key").reset_index(drop=True)
    b = b.sort_values("vertex_key").reset_index(drop=True)
    assert a.equals(b)


def test_sql_parity(tmp_path):
    edges, vertices = _mk(EDGES)
    got = (
        salsa_keyed(edges, vertices, str(tmp_path))
        .to_pandas()
        .sort_values("vertex_key")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(
        {
            "src_key": [f"v{e[0]:03d}" for e in EDGES],
            "dst_key": [f"v{e[1]:03d}" for e in EDGES],
            "weight": [e[2] for e in EDGES],
        }
    )
    con = duckdb.connect()
    con.register("raw_edges", df)
    sql = salsa_sql(
        "WITH edges AS (SELECT src_key, dst_key, weight FROM raw_edges)"
    )
    oracle = con.execute(sql).df()
    con.close()
    assert list(oracle["vertex_key"]) == list(got["vertex_key"])
    assert list(oracle["auth_fp"]) == list(got["auth_fp"])
    assert list(oracle["hub_fp"]) == list(got["hub_fp"])
