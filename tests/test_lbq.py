"""Log-bucket quantile sketch: brute-force bucket pick, the 2x-bracket
guarantee vs exact discrete quantiles, partition invariance, DuckDB
parity, negative/zero buckets."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.stages.sketch import (
    logbucket_quantiles,
    logbucket_quantiles_sql,
)


def _events_ds(df, nparts=1):
    ds = ray.data.from_pandas(df)
    return ds.repartition(nparts) if nparts > 1 else ds


def _fixture(n=400, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_type": rng.choice(["buy", "view"], n),
            "value": np.round(rng.lognormal(2.0, 1.5, n), 2),
        }
    )


def test_bracket_guarantee_and_partition_invariance():
    df = _fixture()
    got1 = logbucket_quantiles(_events_ds(df, 1))
    got5 = logbucket_quantiles(_events_ds(df, 5))
    pd.testing.assert_frame_equal(got1, got5, check_dtype=False)
    # exact discrete quantile (ceil-rank convention) per type must land
    # inside [est_lo, 2*est_lo) for positive buckets
    cents = np.floor(df["value"].to_numpy(np.float64) * 100 + 0.5).astype(
        np.int64
    )
    for _, r in got1.iterrows():
        vals = np.sort(cents[df["event_type"].to_numpy() == r["event_type"]])
        n = len(vals)
        rank = (n * int(r["quantile_pct"]) + 99) // 100
        exact = int(vals[rank - 1])
        lo = int(r["est_lo_cents"])
        assert lo <= exact < max(2 * lo, 1), (r.to_dict(), exact)


def test_duckdb_parity():
    df = _fixture(seed=5)
    got = logbucket_quantiles(_events_ds(df, 3))
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(logbucket_quantiles_sql()).df()
    con.close()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.reset_index(drop=True),
        check_dtype=False,
    )


def test_zero_and_negative_buckets():
    df = pd.DataFrame(
        {
            "event_type": ["t"] * 6,
            "value": [-5.0, -0.2, 0.0, 0.0, 0.0, 0.0],
        }
    )
    got = logbucket_quantiles(_events_ds(df))
    # p25 lands in the negative bucket (2 of 6 values), p75 on zero
    by_pct = got.set_index("quantile_pct")
    assert int(by_pct.loc[25, "bucket"]) == -1
    assert int(by_pct.loc[25, "est_lo_cents"]) == -1
    assert int(by_pct.loc[75, "bucket"]) == 0
    assert int(by_pct.loc[75, "est_lo_cents"]) == 0
    # SQL agrees on the signed/zero cases too
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(logbucket_quantiles_sql()).df()
    con.close()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.reset_index(drop=True),
        check_dtype=False,
    )
