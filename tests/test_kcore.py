"""k-core decomposition: engine peeling vs networkx, hub path, SQL oracle."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.graph.kcore import kcore_input, kcore_sql
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges

nx = pytest.importorskip("networkx")


def _random_edges(seed=7, n=400, m=2400):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)
    return pd.DataFrame(
        {"src": src, "dst": dst, "weight": np.ones(m, dtype=np.float64)}
    )


def _nx_kcore(pdf: pd.DataFrame, k: int) -> dict[int, int]:
    g = nx.Graph()
    g.add_edges_from(zip(pdf["src"], pdf["dst"]))
    g.remove_edges_from(nx.selfloop_edges(g))
    core = nx.k_core(g, k)
    return {v: core.degree(v) for v in core.nodes}


@pytest.mark.parametrize("num_parts,k", [(1, 4), (3, 4), (3, 7)])
def test_kcore_matches_networkx(tmp_path, num_parts, k):
    pdf = _random_edges()
    ds = ray.data.from_pandas(pdf).repartition(5)
    eng = GraphEngine(str(tmp_path / f"kc{num_parts}_{k}"), num_parts=num_parts)
    eng.build(kcore_input(ds), symmetrize=True)
    try:
        got = eng.kcore(k).to_pandas()
        exp = _nx_kcore(pdf, k)
        assert len(got) == len(exp)
        g = dict(zip(got["vertex_id"], got["core_degree"]))
        assert g == exp
        assert eng.metrics["kcore"].converged
        # peel messages are sparse: far fewer entries than dense rounds
        m = eng.metrics["kcore"]
        assert m.msgs_sent <= m.msgs_dense
    finally:
        eng.shutdown()


def test_kcore_hub_salting_same_result(tmp_path):
    """A star hub above the hub threshold must peel identically: hub
    removal knowledge travels via the broadcast channel."""
    pdf = _random_edges(seed=11, n=120, m=500)
    hub_rows = pd.DataFrame(
        {
            "src": np.full(80, 999, dtype=np.int64),
            "dst": np.arange(80, dtype=np.int64),
            "weight": np.ones(80),
        }
    )
    pdf = pd.concat([pdf, hub_rows], ignore_index=True)
    ds = ray.data.from_pandas(pdf).repartition(4)
    results = {}
    for tag, thr in (("plain", 1 << 17), ("salted", 8)):
        eng = GraphEngine(
            str(tmp_path / tag), num_parts=3, hub_threshold=thr
        )
        eng.build(kcore_input(ds), symmetrize=True)
        try:
            results[tag] = (
                eng.kcore(3)
                .to_pandas()
                .sort_values("vertex_id")
                .reset_index(drop=True)
            )
        finally:
            eng.shutdown()
    assert results["plain"].equals(results["salted"])
    exp = _nx_kcore(pdf, 3)
    assert dict(
        zip(results["plain"]["vertex_id"], results["plain"]["core_degree"])
    ) == exp


def test_kcore_empty_core(tmp_path):
    """k above the max degree peels everything; result is empty but valid."""
    pdf = _random_edges(seed=3, n=60, m=150)
    eng = GraphEngine(str(tmp_path / "empty"), num_parts=2)
    eng.build(kcore_input(ray.data.from_pandas(pdf)), symmetrize=True)
    try:
        got = eng.kcore(10_000).to_pandas()
        assert len(got) == 0
        assert eng.metrics["kcore"].converged
    finally:
        eng.shutdown()


def test_kcore_sql_oracle_on_transcript_graph(tmp_path):
    """End-to-end parity on a real derived edge table: engine peel vs the
    unrolled-CTE DuckDB oracle (string-keyed)."""
    from webgraph_ray.graph.kcore import kcore_keyed
    from webgraph_ray.stages.vertices import derive_vertices

    t = generate_transcripts(30, seed=5)
    edges = derive_edges(t).materialize()
    vertices = derive_vertices(edges).materialize()
    k = 5
    got = kcore_keyed(edges, vertices, str(tmp_path), k=k)

    epdf = edges.to_pandas()
    con = duckdb.connect()
    con.register("edges_tbl", epdf)
    sql = kcore_sql("WITH edges AS (SELECT * FROM edges_tbl)", k=k)
    exp = con.execute(sql).df()
    assert got["vertex_key"].tolist() == exp["vertex_key"].tolist()
    assert got["core_degree"].tolist() == exp["core_degree"].tolist()


# ---------------------------------------------------------------------------
# HITS (lives here to reuse the module's graph fixtures)
# ---------------------------------------------------------------------------


def test_hits_matches_integer_reference(tmp_path):
    """Engine HITS vs a direct numpy int64 mirror of the alternating
    normalized half-steps, plus direction sanity (pure source has hub>0,
    auth=0)."""
    from webgraph_ray.graph.hits import HITS_SCALE, hits

    pdf = pd.DataFrame(
        {
            "src": np.array([1, 1, 2, 3, 3, 4, 5, 5, 5], dtype=np.int64),
            "dst": np.array([2, 3, 3, 4, 2, 2, 2, 3, 4], dtype=np.int64),
            "weight": np.array([1, 2, 1, 1, 1, 3, 1, 1, 1], dtype=np.float64),
        }
    )
    got = (
        hits(ray.data.from_pandas(pdf).repartition(3), str(tmp_path / "h"), iters=7)
        .to_pandas()
        .sort_values("vertex_id")
        .reset_index(drop=True)
    )

    verts = np.unique(np.concatenate([pdf["src"], pdf["dst"]]))
    idx = {int(v): i for i, v in enumerate(verts)}
    si = np.array([idx[int(v)] for v in pdf["src"]])
    di = np.array([idx[int(v)] for v in pdf["dst"]])
    w = pdf["weight"].to_numpy(np.int64)
    scale = HITS_SCALE
    h = np.full(len(verts), scale // len(verts), dtype=np.int64)
    for _ in range(7):
        a = np.zeros(len(verts), dtype=np.int64)
        np.add.at(a, di, h[si] * w)
        a = (a * scale) // max(int(a.sum()), 1)
        h = np.zeros(len(verts), dtype=np.int64)
        np.add.at(h, si, a[di] * w)
        h = (h * scale) // max(int(h.sum()), 1)
    exp_auth = dict(zip(verts.tolist(), a.tolist()))
    exp_hub = dict(zip(verts.tolist(), h.tolist()))
    g_auth = dict(zip(got["vertex_id"].tolist(), got["auth_fp"].tolist()))
    g_hub = dict(zip(got["vertex_id"].tolist(), got["hub_fp"].tolist()))
    assert g_auth == exp_auth
    assert g_hub == exp_hub
    assert g_auth[1] == 0 and g_hub[1] > 0  # vertex 1 is a pure source


def test_hits_partition_invariant_and_sql(tmp_path):
    from webgraph_ray.graph.hits import hits, hits_sql

    pdf = _random_edges(seed=17, n=80, m=400)
    pdf["weight"] = 1.0
    a = (
        hits(ray.data.from_pandas(pdf).repartition(2), str(tmp_path / "p1"),
             iters=5, num_parts=1)
        .to_pandas().sort_values("vertex_id").reset_index(drop=True)
    )
    b = (
        hits(ray.data.from_pandas(pdf).repartition(5), str(tmp_path / "p4"),
             iters=5, num_parts=4)
        .to_pandas().sort_values("vertex_id").reset_index(drop=True)
    )
    assert a.equals(b)

    # SQL mirror over string keys
    epdf = pdf.copy()
    epdf["src_key"] = "v" + epdf["src"].astype(str).str.zfill(4)
    epdf["dst_key"] = "v" + epdf["dst"].astype(str).str.zfill(4)
    con = duckdb.connect()
    con.register("edges_tbl", epdf)
    sql = hits_sql("WITH edges AS (SELECT * FROM edges_tbl)", iters=5)
    exp = con.execute(sql).df()
    key_of = {int(r.src): f"v{int(r.src):04d}" for r in pdf.itertuples()}
    key_of.update({int(r.dst): f"v{int(r.dst):04d}" for r in pdf.itertuples()})
    a["vertex_key"] = a["vertex_id"].map(key_of)
    merged = a.merge(exp, on="vertex_key", suffixes=("", "_sql"))
    assert len(merged) == len(exp) == len(a)
    assert (merged["auth_fp"] == merged["auth_fp_sql"]).all()
    assert (merged["hub_fp"] == merged["hub_fp_sql"]).all()
