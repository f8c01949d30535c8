"""assortativity: exact-moment fixture + networkx/DuckDB parity + paths."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.stages.features import (
    assortativity,
    reciprocity_assortativity_sql,
)


def _ds(edge_pairs):
    src = np.array([a for a, _ in edge_pairs], dtype=np.int64)
    dst = np.array([b for _, b in edge_pairs], dtype=np.int64)
    return ray.data.from_arrow(pa.table({"src": src, "dst": dst}))


def _sql_row(edge_pairs):
    """Run the DuckDB mirror over a hand-registered edge table (keys are
    the stringified ids, a bijection, so pair/degree counts agree)."""
    df = pd.DataFrame(
        {
            "src_key": [f"v{a:04d}" for a, _ in edge_pairs],
            "dst_key": [f"v{b:04d}" for _, b in edge_pairs],
        }
    )
    con = duckdb.connect()
    con.register("raw_edges", df)
    sql = reciprocity_assortativity_sql(
        "WITH edges AS (SELECT src_key, dst_key FROM raw_edges)"
    )
    out = con.execute(sql).df()
    con.close()
    return out.iloc[0]


STAR = [(0, i) for i in range(1, 6)]  # K_{1,5}: r = -1 exactly
MIXED = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 0),  # 5-cycle
    (0, 2), (1, 3),                          # chords
    (5, 0), (5, 6), (6, 7),                  # a tail
]


def test_star_is_minus_one():
    out = assortativity(_ds(STAR)).iloc[0]
    # every pair joins deg 5 to deg 1 -> perfect anti-correlation
    assert out["assort_fp"] == -1_000_000
    assert out["und_m"] == 10
    assert out["und_s1"] == 5 * 6
    assert out["und_s2"] == 5 * 26
    assert out["und_sxy"] == 2 * 25
    # negative-numerator truncation matches DuckDB's BIGINT // exactly
    sql = _sql_row(STAR)
    for c in ("und_m", "und_s1", "und_s2", "und_sxy", "assort_fp"):
        assert int(sql[c]) == int(out[c]), c


def test_networkx_and_sql_parity():
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(MIXED)
    r = nx.degree_assortativity_coefficient(g)
    out = assortativity(_ds(MIXED)).iloc[0]
    assert abs(out["assort_fp"] / 1e6 - r) < 2e-6
    sql = _sql_row(MIXED)
    for c in ("und_m", "und_s1", "und_s2", "und_sxy", "assort_fp"):
        assert int(sql[c]) == int(out[c]), c


def test_big_path_matches_small():
    small = assortativity(_ds(MIXED)).iloc[0]
    big = assortativity(_ds(MIXED), broadcast_threshold=0).iloc[0]
    assert (small == big).all()


def test_degenerate():
    # single edge: both degrees 1, zero variance -> fp = 0 by convention
    out = assortativity(_ds([(1, 2)])).iloc[0]
    assert out["assort_fp"] == 0 and out["und_m"] == 2
    # empty edge set
    out = assortativity(_ds([])).iloc[0]
    assert out["und_m"] == 0 and out["assort_fp"] == 0
