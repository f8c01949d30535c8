"""Deterministic random walks vs brute force + the DuckDB mirror."""

import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.functions.texthash import M, hash_token_list
from webgraph_ray.stages.walks import (
    WALK_MULT_DST,
    WALK_MULT_STEP,
    random_walks,
)


def _edges_ds(pairs):
    df = pd.DataFrame(pairs, columns=["src_key", "dst_key"])
    df["edge_type"] = "t"
    df["weight"] = np.int64(1)
    return ray.data.from_pandas(df)


def _th1(s):
    return int(hash_token_list([s])[0])


def brute_walks(pairs, length, seed_mod):
    adj = {}
    verts = set()
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    seeds = sorted(v for v in verts if _th1(v) % seed_mod == 0)
    rows = [(w, 0, w) for w in seeds]
    cur = {w: w for w in seeds}
    for t in range(1, length + 1):
        nxt = {}
        for w, v in cur.items():
            outs = adj.get(v)
            if not outs:
                continue
            nxt[w] = min(
                outs,
                key=lambda d: (
                    (_th1(d) * WALK_MULT_DST + t * WALK_MULT_STEP + _th1(v))
                    % M,
                    d,
                ),
            )
        cur = nxt
        rows += [(w, t, v) for w, v in sorted(cur.items())]
    return (
        pd.DataFrame(rows, columns=["walk_id", "step", "vertex_key"])
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )


def test_random_walks_vs_bruteforce_and_partitions():
    rng = np.random.default_rng(17)
    verts = [f"v{i:03d}" for i in range(120)]
    pairs = list(
        {
            (verts[rng.integers(120)], verts[rng.integers(120)])
            for _ in range(400)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    exp = brute_walks(pairs, length=4, seed_mod=7)
    assert exp["walk_id"].nunique() > 3  # sampling actually fired
    assert exp["step"].max() >= 2
    for nparts in (1, 9):
        got = random_walks(
            _edges_ds(pairs).repartition(nparts), length=4, seed_mod=7
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp, check_dtype=False
        )


def test_random_walks_dead_end_stops():
    # w0 is a seed for seed_mod=1; chain w0 -> a -> b, b has no out-edge
    pairs = [("w0", "a"), ("a", "b")]
    got = random_walks(_edges_ds(pairs), length=5, seed_mod=1)
    g = got[got["walk_id"] == "w0"]
    assert list(g["vertex_key"]) == ["w0", "a", "b"]
    assert list(g["step"]) == [0, 1, 2]


def test_walk_engine_equals_scan_path(tmp_path):
    """The routed-actor engine (graph/walk_engine.py) must be
    byte-identical to the per-step-scan path under any partition count —
    every choice is a pure function of (src, dst, t)."""
    from webgraph_ray.graph.walk_engine import random_walks_engine

    rng = np.random.default_rng(23)
    verts = [f"n{i:03d}" for i in range(150)]
    pairs = list(
        {
            (verts[rng.integers(150)], verts[rng.integers(150)])
            for _ in range(500)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    exp = random_walks(_edges_ds(pairs), length=4, seed_mod=5)
    assert exp["walk_id"].nunique() > 3
    for i, nparts in enumerate((1, 4)):
        got = random_walks_engine(
            _edges_ds(pairs),
            str(tmp_path / f"wl{i}"),
            length=4,
            seed_mod=5,
            num_parts=nparts,
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            exp.reset_index(drop=True),
            check_dtype=False,
        )


def test_walk_engine_every_vertex_and_dead_end(tmp_path):
    """seed_mod=1 walks from EVERY vertex (the GraphSAGE workload the
    scan path's driver-frontier bound disallowed at scale) and dead ends
    stop walks."""
    from webgraph_ray.graph.walk_engine import random_walks_engine

    pairs = [("w0", "a"), ("a", "b"), ("c", "a")]
    got = random_walks_engine(
        _edges_ds(pairs), str(tmp_path / "wl"), length=5, seed_mod=1,
        num_parts=3,
    )
    # every vertex seeds a walk
    assert set(got[got["step"] == 0]["walk_id"]) == {"w0", "a", "b", "c"}
    g = got[got["walk_id"] == "w0"]
    assert list(g["vertex_key"]) == ["w0", "a", "b"]
    assert list(g["step"]) == [0, 1, 2]
    # b has no out-edges: its walk is just step 0
    assert len(got[got["walk_id"] == "b"]) == 1
    exp = random_walks(_edges_ds(pairs), length=5, seed_mod=1)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )


def test_random_walks_vs_duckdb_oracle():
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.queries()["random_walks"](sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = con.execute(entry.oracle_sql()["random_walks"]).df()

    def norm(df):
        df = df[sorted(df.columns)].copy()
        df["step"] = df["step"].astype("int64")
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(norm(got), norm(exp), check_dtype=False)
    assert got["walk_id"].nunique() > 0


def test_walk_engine_sharded_output(tmp_path):
    """output_dir: each actor writes its own parquet shard, the returned
    Dataset matches the driver-collected result row for row."""
    from webgraph_ray.graph.walk_engine import random_walks_engine

    pairs = [("w0", "a"), ("a", "b"), ("c", "a"), ("b", "c")]
    collected = random_walks_engine(
        _edges_ds(pairs), str(tmp_path / "l1"), length=3, seed_mod=1,
        num_parts=2,
    )
    ds = random_walks_engine(
        _edges_ds(pairs), str(tmp_path / "l2"), length=3, seed_mod=1,
        num_parts=2, output_dir=str(tmp_path / "out"),
    )
    got = (
        ds.to_pandas()
        .sort_values(["walk_id", "step"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, collected, check_dtype=False)
    import os

    shards = [f for f in os.listdir(tmp_path / "out") if f.endswith(".parquet")]
    assert len(shards) == 2  # one per partition actor


def brute_walks_nb(pairs, length, seed_mod):
    """Non-backtracking reference: rank candidates (is-prev, h, dst);
    the predecessor is chosen only when it is the sole out-neighbor."""
    adj = {}
    verts = set()
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    seeds = sorted(v for v in verts if _th1(v) % seed_mod == 0)
    rows = [(w, 0, w) for w in seeds]
    cur = {w: (w, None) for w in seeds}
    for t in range(1, length + 1):
        nxt = {}
        for w, (v, p) in cur.items():
            outs = adj.get(v)
            if not outs:
                continue
            nxt[w] = (
                min(
                    outs,
                    key=lambda d: (
                        d == p,
                        (_th1(d) * WALK_MULT_DST + t * WALK_MULT_STEP + _th1(v)) % M,
                        d,
                    ),
                ),
                v,
            )
        cur = nxt
        rows += [(w, t, v) for w, (v, _) in sorted(cur.items())]
    return (
        pd.DataFrame(rows, columns=["walk_id", "step", "vertex_key"])
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )


def test_no_backtrack_walks_scan_engine_brute(tmp_path):
    """nb variant: scan path == engine path == brute force; and on a
    two-cycle with an escape, the nb walk escapes where the simple walk
    may bounce."""
    from webgraph_ray.graph.walk_engine import random_walks_engine

    rng = np.random.default_rng(31)
    verts = [f"m{i:03d}" for i in range(100)]
    pairs = list(
        {
            (verts[rng.integers(100)], verts[rng.integers(100)])
            for _ in range(350)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    exp = brute_walks_nb(pairs, length=4, seed_mod=5)
    assert exp["walk_id"].nunique() > 2
    got_scan = random_walks(
        _edges_ds(pairs).repartition(3), length=4, seed_mod=5,
        no_backtrack=True,
    )
    pd.testing.assert_frame_equal(
        got_scan.reset_index(drop=True), exp, check_dtype=False
    )
    got_eng = random_walks_engine(
        _edges_ds(pairs), str(tmp_path / "nb"), length=4, seed_mod=5,
        num_parts=4, no_backtrack=True,
    )
    pd.testing.assert_frame_equal(
        got_eng.reset_index(drop=True), exp, check_dtype=False
    )

    # pure 2-cycle a<->b with escape b->c: nb must go a->b->c (not bounce
    # back), and at a sole-neighbor dead-end pair x<->y it takes prev
    pairs2 = [("w0", "b"), ("b", "w0"), ("b", "c")]
    nb = random_walks(_edges_ds(pairs2), length=3, seed_mod=1, no_backtrack=True)
    g = nb[nb["walk_id"] == "w0"]
    assert list(g["vertex_key"])[:3] == ["w0", "b", "c"]
    # sole out-neighbor == prev: walk returns (x<->y forever)
    pairs3 = [("w0", "y"), ("y", "w0")]
    nb3 = random_walks(_edges_ds(pairs3), length=3, seed_mod=1, no_backtrack=True)
    g3 = nb3[nb3["walk_id"] == "w0"]
    assert list(g3["vertex_key"]) == ["w0", "y", "w0", "y"]


def brute_walks_restart(pairs, length, seed_mod, rmod):
    """Walks-with-restart reference: the (walk_id, t) teleport hash is
    checked BEFORE neighbor selection (dead-end walkers survive a
    restart); otherwise the plain first-order argmin rule."""
    adj = {}
    verts = set()
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    seeds = sorted(v for v in verts if _th1(v) % seed_mod == 0)
    rows = [(w, 0, w) for w in seeds]
    cur = {w: w for w in seeds}
    for t in range(1, length + 1):
        nxt = {}
        for w, v in cur.items():
            if (_th1(w) + t * WALK_MULT_STEP) % rmod == 0:
                nxt[w] = w
                continue
            outs = adj.get(v)
            if not outs:
                continue
            nxt[w] = min(
                outs,
                key=lambda d: (
                    (_th1(d) * WALK_MULT_DST + t * WALK_MULT_STEP + _th1(v))
                    % M,
                    d,
                ),
            )
        cur = nxt
        rows += [(w, t, v) for w, v in sorted(cur.items())]
    return (
        pd.DataFrame(rows, columns=["walk_id", "step", "vertex_key"])
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )


def test_restart_walks_scan_engine_brute(tmp_path):
    """restart variant: scan path == engine path == brute force under
    partitioning; and a restart firing AT a dead end revives the walk."""
    from webgraph_ray.graph.walk_engine import random_walks_engine
    from webgraph_ray.stages.walks import WALK_RESTART_MOD

    rng = np.random.default_rng(41)
    verts = [f"r{i:03d}" for i in range(100)]
    pairs = list(
        {
            (verts[rng.integers(100)], verts[rng.integers(100)])
            for _ in range(300)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    exp = brute_walks_restart(
        pairs, length=4, seed_mod=5, rmod=WALK_RESTART_MOD
    )
    assert exp["walk_id"].nunique() > 2
    got_scan = random_walks(
        _edges_ds(pairs).repartition(3), length=4, seed_mod=5,
        restart_mod=WALK_RESTART_MOD,
    )
    pd.testing.assert_frame_equal(
        got_scan.reset_index(drop=True), exp, check_dtype=False
    )
    got_eng = random_walks_engine(
        _edges_ds(pairs), str(tmp_path / "re"), length=4, seed_mod=5,
        num_parts=4, restart_mod=WALK_RESTART_MOD,
    )
    pd.testing.assert_frame_equal(
        got_eng.reset_index(drop=True), exp, check_dtype=False
    )

    # constructed dead-end revival: pick a seed whose teleport fires at
    # t=2 but not t=1 -> walk goes seed -> dead-end -> (restart) seed
    s = next(
        c
        for c in (f"s{i:02d}" for i in range(60))
        if (_th1(c) + 2 * WALK_MULT_STEP) % WALK_RESTART_MOD == 0
        and (_th1(c) + 1 * WALK_MULT_STEP) % WALK_RESTART_MOD != 0
    )
    got = random_walks(
        _edges_ds([(s, "zz_dead")]), length=2, seed_mod=1,
        restart_mod=WALK_RESTART_MOD,
    )
    g = got[got["walk_id"] == s]
    assert list(g["vertex_key"]) == [s, "zz_dead", s]
    assert list(g["step"]) == [0, 1, 2]
