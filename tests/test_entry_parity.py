"""Mini-driver: run every queries() entry at sf0.001 and compare against
its oracle_sql() through DuckDB — order-insensitive, like the real gate."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture
def con(sf_dir):
    # function-scoped on purpose: one shared in-memory connection
    # accumulates buffer-pool blocks across ~50 unrolled-CTE oracles and
    # eventually hits bad_alloc on the late alphabetical queries; a fresh
    # connection per query costs only 10 CREATE VIEWs and mirrors the
    # real driver gate
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield c
    c.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_pandas(res):
    import ray.data
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, sf_dir, con):
    ray_res = _normalize(_to_pandas(entrymod.queries()[name](sf_dir)))
    sql_res = _normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(ray_res.columns) == list(sql_res.columns), name
    assert len(ray_res) == len(sql_res), name
    pd.testing.assert_frame_equal(ray_res, sql_res, check_dtype=False)


def test_rows_only_queries_run(sf_dir):
    qs = entrymod.queries()
    # near_dup_pairs may legitimately be empty on dup-free synthetic docs
    may_be_empty = {"near_dup_pairs"}
    for name in set(qs) - set(entrymod.oracle_sql()):
        df = _to_pandas(qs[name](sf_dir))
        assert df is not None, name
        if name not in may_be_empty:
            assert len(df) > 0, name


def test_entry_smoke():
    df = entrymod.entry()
    assert len(df) > 0
    assert {"vertex_key", "score", "component", "triangles"} <= set(df.columns)
    # flagship returns the top-k PageRank summary (never a full per-vertex
    # table on the driver): scores are a descending prefix of a unit sum
    assert df["score"].is_monotonic_decreasing
    assert 0.0 < df["score"].sum() <= 1.0 + 1e-9
    # component labels are exact 64-bit ints (a float pad would round them)
    assert df["component"].dtype == "int64"
