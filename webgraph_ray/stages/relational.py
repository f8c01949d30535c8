"""Relational two-big-table operators over the TPC-H-ish side tables —
the fact⋈dimension join shape every large pipeline needs, in the house
bucket pattern.

``order_revenue`` (orders ⋈ lineitem): the fact side pre-aggregates
map-side (one (orderkey, n_items, revenue_cents) partial row per distinct
key per batch — bounded by key cardinality, not row count), both sides
stamp the SAME orderkey-hash bucket, and ONE groupby co-locates them for
a C-path per-bucket merge.  Neither table is ever broadcast or
materialized on the driver; revenue uses the repo's half-up integer-cents
rule (floor(x*100+0.5)), bit-stable against the DuckDB oracle.

Reference analog: the per-visit frame⋈request merges in
/root/reference/code/graph/build.py (pandas merge per visit), lifted to
a distributed co-partitioned join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def order_revenue(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """(o_orderkey, o_custkey, o_orderstatus, n_items, revenue_cents) —
    one row per order; orders with no lineitem keep zeros (left join)."""
    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = num_buckets or default_num_buckets()
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "n_items",
        "revenue_cents", "__b",
    ]

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        price = df["l_extendedprice"].to_numpy(np.float64)
        disc = df["l_discount"].to_numpy(np.float64)
        # same expression tree as the SQL mirror: x*(1-d)*100 + 0.5, floor
        cents = np.floor(price * (1 - disc) * 100 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame(
                {"o_orderkey": df["l_orderkey"].to_numpy(np.int64), "c": cents}
            )
            .groupby("o_orderkey", sort=False)["c"]
            .agg(["sum", "size"])
            .reset_index()
        )
        out = pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"],
                "o_custkey": np.nan,
                "o_orderstatus": None,
                "n_items": g["size"].astype(np.float64),
                "revenue_cents": g["sum"].astype(np.float64),
            }
        )
        out["__b"] = (out["o_orderkey"].to_numpy(np.int64) % nb).astype(
            np.int32
        )
        return out[cols]

    def orders_side(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "o_custkey": df["o_custkey"].to_numpy(np.float64),
                "o_orderstatus": df["o_orderstatus"].astype(object),
                "n_items": np.nan,
                "revenue_cents": np.nan,
            }
        )
        out["__b"] = (out["o_orderkey"].to_numpy(np.int64) % nb).astype(
            np.int32
        )
        return out[cols]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_orderkey", sort=False).agg(
            o_custkey=("o_custkey", "first"),   # first non-null
            o_orderstatus=("o_orderstatus", "first"),
            n_items=("n_items", "sum"),         # NaN-skipping partial sums
            revenue_cents=("revenue_cents", "sum"),
        )
        agg = agg.reset_index()
        # left semantics: fact partials without an orders row are dropped
        agg = agg[agg["o_custkey"].notna()]
        agg["o_custkey"] = agg["o_custkey"].astype(np.int64)
        agg["n_items"] = agg["n_items"].fillna(0).astype(np.int64)
        agg["revenue_cents"] = (
            agg["revenue_cents"].fillna(0).astype(np.int64)
        )
        return agg

    li = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pandas")
    od = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderstatus"]
    ).map_batches(orders_side, batch_format="pandas")
    return (
        od.union(li)
        .groupby("__b")
        .map_groups(merge, batch_format="pandas")
    )
