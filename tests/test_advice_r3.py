"""Regression tests for the round-3 ADVICE findings."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from webgraph_ray.graph.delta import _multiset_remove_mask
from webgraph_ray.stages.media import MediaDecoder, _binary_parts
from webgraph_ray.stages.windows import _cents, sliding_window_stats


def test_delta_remove_matches_weight_bits():
    """Duplicate (src, dst) pairs with unequal weights: removal must drop
    exactly the occurrence whose weight the caller named, not an arbitrary
    one (the outdeg patch subtracts the supplied weight)."""
    src = np.array([7, 7, 7], dtype=np.int64)
    dst = np.array([9, 9, 5], dtype=np.int64)
    w = np.array([1.0, 2.0, 3.0])
    keep = _multiset_remove_mask(
        src,
        dst,
        w,
        np.array([7], dtype=np.int64),
        np.array([9], dtype=np.int64),
        np.array([2.0]),
    )
    np.testing.assert_array_equal(keep, [True, False, True])


def test_delta_remove_multiset_semantics_preserved():
    """Equal-weight duplicates still remove once per named occurrence."""
    src = np.array([1, 1], dtype=np.int64)
    dst = np.array([2, 2], dtype=np.int64)
    w = np.array([5.0, 5.0])
    keep = _multiset_remove_mask(
        src,
        dst,
        w,
        np.array([1], dtype=np.int64),
        np.array([2], dtype=np.int64),
        np.array([5.0]),
    )
    assert int(keep.sum()) == 1


def test_binary_parts_large_binary_offsets():
    payloads = [b"abc", b"", b"defgh"]
    small = pa.array(payloads, pa.binary())
    large = pa.array(payloads, pa.large_binary())
    for arr in (small, large):
        start, length, data = _binary_parts(arr)
        np.testing.assert_array_equal(length, [3, 0, 5])
        assert bytes(data[start[2] : start[2] + length[2]]) == b"defgh"


def test_media_decoder_all_empty_payloads():
    """n > 0 rows, every payload empty: the data buffer is empty and the
    clipped gather must not index into it."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"", b""], pa.binary()),
            "media_type": pa.array(["image", "image"]),
        }
    )
    out = MediaDecoder()(t)
    assert out["n_bytes"].to_pylist() == [0, 0]
    assert out["format"].to_pylist() == ["unknown", "unknown"]


def test_cents_half_up_matches_oracle_rule():
    """0.125 * 100 == 12.5 exactly in float64; both sides must land on 13
    (floor(x + 0.5)), where np.round gave 12 (half-even)."""
    import duckdb

    vals = pd.Series([0.125, 0.135, 1.005, 2.675, -0.125])
    ours = _cents(vals)
    sql = duckdb.sql(
        "SELECT CAST(floor(v * 100 + 0.5) AS BIGINT) FROM "
        "(SELECT unnest([0.125, 0.135, 1.005, 2.675, -0.125]"
        "::DOUBLE[]) AS v)"
    ).fetchall()
    np.testing.assert_array_equal(ours, [r[0] for r in sql])
    assert ours[0] == 13  # np.round would say 12


def test_sliding_window_band_is_per_user_range():
    """Wide global timestamp range with many users must not wrap the band
    key: per-user ranges are small so the banded path stays exact."""
    rng = np.random.default_rng(7)
    n_users = 50
    rows = []
    eid = 0
    for u in range(n_users):
        # users start eras apart (wide global range, narrow per-user range)
        base = np.int64(u) * np.int64(3_600_000_000_000)
        for t in sorted(rng.integers(0, 60_000_000, size=8).tolist()):
            rows.append((eid, u, base + t, 1.0))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "value"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    ds = ray.data.from_pandas(df[["event_id", "user_id", "ts", "value"]])
    out = (
        sliding_window_stats(ds, lookback_minutes=10)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # brute-force oracle
    for _, r in df.iterrows():
        in_win = df[
            (df.user_id == r.user_id)
            & (df.ts_us <= r.ts_us)
            & (df.ts_us >= r.ts_us - 10 * 60_000_000)
        ]
        got = out[out.event_id == r.event_id].iloc[0]
        assert got.n_window == len(in_win)
        assert got.window_cents == 100 * len(in_win)
