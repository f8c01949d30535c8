"""HyperANF: exact register-evolution equality vs a brute single-process
mirror, partition-count invariance, DuckDB SQL parity, N-hat accuracy vs
exact BFS ball sizes, effective diameter on a chain."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.functions.texthash import hash_token_list
from webgraph_ray.graph.anf import (
    ANF_M,
    _registers_from_th,
    anf_sql,
    effective_diameter,
    neighborhood_function,
)


def _graph(n=60, extra=120, seed=7):
    """Chain 0->1->...->n-1 plus `extra` random edges (string keys)."""
    rng = np.random.default_rng(seed)
    edges = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(n - 1)]
    for _ in range(extra):
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.append((f"v{a:03d}", f"v{b:03d}"))
    return edges


def _edges_ds(edges, nparts=1):
    df = pd.DataFrame(edges, columns=["src_key", "dst_key"])
    ds = ray.data.from_pandas(df)
    return ds.repartition(nparts) if nparts > 1 else ds


def _brute(edges, hops):
    """Single-process register evolution + exact BFS ball sizes."""
    verts = sorted({s for s, _ in edges} | {d for _, d in edges})
    th = hash_token_list(list(verts))
    j, rho = _registers_from_th(th)
    B = {v: np.zeros(ANF_M, dtype=np.int64) for v in verts}
    for i, v in enumerate(verts):
        B[v][j[i]] = rho[i]
    out = {}
    for v in verts:
        out.setdefault(v, set())
    for s, d in edges:
        out[s].add(d)
    rows = [(0, sum(int(b.sum()) for b in B.values()),
             sum(int(np.count_nonzero(b)) for b in B.values()))]
    balls = {v: {v} for v in verts}
    exact = [sum(len(b) for b in balls.values())]
    frontier = dict(balls)
    for t in range(1, hops + 1):
        B2 = {}
        for v in verts:
            m = B[v].copy()
            for w in out[v]:
                m = np.maximum(m, B[w])
            B2[v] = m
        B = B2
        rows.append(
            (
                t,
                sum(int(b.sum()) for b in B.values()),
                sum(int(np.count_nonzero(b)) for b in B.values()),
            )
        )
        balls2 = {}
        for v in verts:
            s = set(balls[v])
            for w in out[v]:
                s |= balls[w]
            balls2[v] = s
        balls = balls2
        exact.append(sum(len(b) for b in balls.values()))
    return (
        pd.DataFrame(
            rows, columns=["hop", "register_sum", "nonzero_registers"]
        ),
        exact,
    )


def test_engine_matches_brute_and_partition_invariant(tmp_path):
    edges = _graph()
    ref, exact = _brute(edges, hops=4)
    got_by_p = {}
    for P in (1, 4):
        nf = neighborhood_function(
            _edges_ds(edges, 3),
            str(tmp_path / f"anf_p{P}"),
            hops=4,
            num_parts=P,
        )
        got_by_p[P] = nf
        pd.testing.assert_frame_equal(
            nf[["hop", "register_sum", "nonzero_registers"]],
            ref,
            check_dtype=False,
        )
    # n_hat is a pure function of the (exactly equal) registers up to
    # float partition-sum association order — last-ulp tolerance
    assert np.allclose(
        got_by_p[1]["n_hat"].to_numpy(),
        got_by_p[4]["n_hat"].to_numpy(),
        rtol=1e-12,
    )
    # accuracy: final N-hat within 30% of the exact pair count
    nhat = float(got_by_p[4]["n_hat"].iloc[-1])
    assert abs(nhat - exact[-1]) / exact[-1] < 0.30
    # register sums never decrease (max-merge monotonicity)
    rs = got_by_p[4]["register_sum"].to_numpy()
    assert all(rs[i] <= rs[i + 1] for i in range(len(rs) - 1))


def test_duckdb_parity(tmp_path):
    edges = _graph(n=40, extra=60, seed=3)
    nf = neighborhood_function(
        _edges_ds(edges), str(tmp_path / "anf_sql"), hops=3, num_parts=3
    )
    con = duckdb.connect()
    con.register(
        "e_src", pd.DataFrame(edges, columns=["src_key", "dst_key"])
    )
    sql = anf_sql(
        "WITH edges AS MATERIALIZED (SELECT * FROM e_src)", hops=3
    )
    exp = con.execute(sql).df()
    con.close()
    pd.testing.assert_frame_equal(
        nf[["hop", "register_sum", "nonzero_registers"]],
        exp,
        check_dtype=False,
    )


def test_effective_diameter_chain(tmp_path):
    # pure chain: ball sizes keep growing through every hop, so the
    # 0.9-quantile hop sits near the max hop, never at 0
    edges = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(12)]
    nf = neighborhood_function(
        _edges_ds(edges), str(tmp_path / "anf_chain"), hops=6, num_parts=2
    )
    d = effective_diameter(nf)
    assert d >= 3
    # a dense clique-ish star saturates after hop 1
    star = [("hub", f"s{i}") for i in range(10)] + [
        (f"s{i}", "hub") for i in range(10)
    ]
    nf2 = neighborhood_function(
        _edges_ds(star), str(tmp_path / "anf_star"), hops=4, num_parts=2
    )
    assert effective_diameter(nf2) <= 2


def test_layout_partition_count_guard(tmp_path):
    """Regression (round-5 review): reusing a walk/ANF layout built
    with a different partition count must raise, not silently
    mis-route (hive dirs keyed th % P_old vs routing th % P_new)."""
    import pytest

    from webgraph_ray.graph.walk_engine import (
        build_walk_layout,
        random_walks_engine,
    )

    edges = _graph(n=20, extra=10)
    wd = str(tmp_path / "layout_p4")
    build_walk_layout(_edges_ds(edges), wd, 4)
    with pytest.raises(ValueError, match="num_parts"):
        random_walks_engine(_edges_ds(edges), wd, num_parts=2)
    with pytest.raises(ValueError, match="num_parts"):
        neighborhood_function(_edges_ds(edges), wd, hops=2, num_parts=2)
    # matching P reuses the layout fine
    nf = neighborhood_function(_edges_ds(edges), wd, hops=2, num_parts=4)
    assert len(nf) == 3


def test_reverse_anf_in_balls(tmp_path):
    """reverse=True computes in-balls: on a directed chain a->b->c,
    forward balls grow from the head, reverse balls from the tail; the
    GLOBAL register fingerprints coincide with running forward ANF on
    the hand-transposed edge list, and global pair counts match the
    forward direction (each reachable pair counted once either way)."""
    edges = _graph(n=25, extra=30, seed=21)
    fwd = neighborhood_function(
        _edges_ds(edges), str(tmp_path / "fwd"), hops=3, num_parts=2
    )
    rev = neighborhood_function(
        _edges_ds(edges), str(tmp_path / "rev"), hops=3, num_parts=2,
        reverse=True,
    )
    transposed = [(d, s) for s, d in edges]
    rev_manual = neighborhood_function(
        _edges_ds(transposed), str(tmp_path / "revm"), hops=3, num_parts=2
    )
    pd.testing.assert_frame_equal(rev, rev_manual)
    # per-vertex balls differ, but the number of (u, v) pairs within t
    # hops is direction-independent — the EXACT pair counts agree, so
    # the sketch estimates must track each other closely
    for t in range(4):
        f, r = float(fwd["n_hat"].iloc[t]), float(rev["n_hat"].iloc[t])
        assert abs(f - r) / max(f, r) < 0.35


def test_reverse_never_reuses_forward_layout(tmp_path):
    """Regression (round-5 review #2): with a FORWARD layout pre-built
    in work_dir (the bench build-once contract), reverse=True must not
    silently serve forward balls — the transposed layout gets its own
    subdir and the result equals forward ANF on the hand-transposed
    edge list."""
    import os

    from webgraph_ray.graph.walk_engine import build_walk_layout

    edges = _graph(n=15, extra=12, seed=2)
    wd = str(tmp_path / "shared")
    build_walk_layout(_edges_ds(edges), wd, 2)
    rev = neighborhood_function(
        _edges_ds(edges), wd, hops=2, num_parts=2, reverse=True
    )
    assert os.path.isdir(os.path.join(wd, "transposed", "edges"))
    man = neighborhood_function(
        _edges_ds([(d, s) for s, d in edges]),
        str(tmp_path / "manual"),
        hops=2,
        num_parts=2,
    )
    pd.testing.assert_frame_equal(rev, man)
