"""orders ⋈ lineitem co-partitioned join vs brute-force + DuckDB."""

import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.stages.relational import order_revenue


def test_order_revenue_vs_duckdb_oracle():
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.queries()["order_revenue"](sf).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    exp = con.execute(entry.oracle_sql()["order_revenue"]).df()

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(norm(got), norm(exp), check_dtype=False)
    # left-join semantics: itemless orders present with zeros
    assert (got["n_items"] == 0).any()
    assert (got.loc[got["n_items"] == 0, "revenue_cents"] == 0).all()


def test_order_revenue_partials_cross_blocks():
    """One order's lineitems split across many blocks must still sum."""
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3], np.int64),
            "o_custkey": np.array([10, 20, 30], np.int64),
            "o_orderstatus": ["F", "O", "P"],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1] * 40 + [2] * 3, np.int64),
            "l_extendedprice": np.full(43, 10.0),
            "l_discount": np.full(43, 0.25),
        }
    )
    got = (
        order_revenue(
            ray.data.from_pandas(orders).repartition(2),
            ray.data.from_pandas(li).repartition(11),
        )
        .to_pandas()
        .set_index("o_orderkey")
        .sort_index()
    )
    assert got.loc[1, "n_items"] == 40
    assert got.loc[1, "revenue_cents"] == 40 * 750  # 10*(1-.25)*100
    assert got.loc[2, "n_items"] == 3
    assert got.loc[3, "n_items"] == 0 and got.loc[3, "revenue_cents"] == 0
    assert list(got["o_custkey"]) == [10, 20, 30]
