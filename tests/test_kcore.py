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
