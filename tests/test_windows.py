"""Time-window operators: tumbling aggregate, as-of join, sessionization —
edge cases (user boundaries, matchless prefixes, exact gap boundary) vs a
hand-computed oracle, plus the sf parity the driver gate re-checks."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from webgraph_ray.stages.windows import (
    asof_last_match,
    grouped_topk,
    sessionize,
    sliding_window_stats,
    tumbling_user_activity,
    value_quantiles,
)

T0 = pd.Timestamp("2024-01-01 00:00:00")


@pytest.fixture(scope="module")
def tiny_events():
    rows = [
        # user 1: purchase at +5m, view at +10m, purchase at +65m (new hour)
        (0, T0 + pd.Timedelta(minutes=5), 1, "purchase", 10.00),
        (1, T0 + pd.Timedelta(minutes=10), 1, "view", 1.00),
        (2, T0 + pd.Timedelta(minutes=65), 1, "purchase", 20.00),
        # user 2: NO purchase ever; exact 30-minute gap must NOT split
        (3, T0 + pd.Timedelta(minutes=0), 2, "view", 2.00),
        (4, T0 + pd.Timedelta(minutes=30), 2, "view", 3.00),
        # 30 min + 1 us DOES split
        (5, T0 + pd.Timedelta(minutes=60, microseconds=1), 2, "view", 4.00),
        # user 3: a single event; same-row purchase counts as its own match
        (6, T0 + pd.Timedelta(minutes=1), 3, "purchase", 5.55),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    return ray.data.from_pandas(df)


def test_tumbling(tiny_events):
    got = (
        tumbling_user_activity(tiny_events, every_minutes=60)
        .to_pandas()
        .sort_values(["user_id", "window_id"])
        .reset_index(drop=True)
    )
    base = int(T0.value // 1000) // 3_600_000_000
    exp = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "window_id": [base, base + 1, base, base + 1, base],
            "n_events": [2, 1, 2, 1, 1],
            "value_cents": [1100, 2000, 500, 400, 555],
        }
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_asof(tiny_events):
    got = (
        asof_last_match(tiny_events, match_type="purchase")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = {0: 1000, 1: 1000, 2: 2000, 3: -1, 4: -1, 5: -1, 6: 555}
    assert dict(zip(got["event_id"], got["last_match_cents"])) == exp


def test_sessionize(tiny_events):
    got = (
        sessionize(tiny_events, gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    # user 1: 5m/10m together, 65m is 55m later -> splits
    # user 2: 0m/30m together (exact gap does not split), 60m+1us splits
    # user 3: one session
    assert list(zip(got["user_id"], got["session_id"], got["n_events"])) == [
        (1, 0, 2), (1, 1, 1), (2, 0, 2), (2, 1, 1), (3, 0, 1),
    ]
    u2s0 = got[(got["user_id"] == 2) & (got["session_id"] == 0)].iloc[0]
    assert u2s0["value_cents"] == 500
    assert u2s0["t_start"] == T0 and u2s0["t_end"] == T0 + pd.Timedelta(minutes=30)


def test_sliding_window(tiny_events):
    """10-min lookback, RANGE-frame semantics: boundary row at exactly
    ts - 10min is INCLUDED; other users' rows never leak into a frame."""
    got = (
        sliding_window_stats(tiny_events, lookback_minutes=10)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # user 1: +5m sees itself; +10m sees +5m (exactly 5m back) and itself;
    #         +65m sees only itself (gap 55m)
    # user 2: 0m/30m/60m+1us all isolated (gaps 30m, 30m+1us > 10m)
    # user 3: single row
    exp_n = {0: 1, 1: 2, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}
    exp_c = {0: 1000, 1: 1100, 2: 2000, 3: 200, 4: 300, 5: 400, 6: 555}
    assert dict(zip(got["event_id"], got["n_window"])) == exp_n
    assert dict(zip(got["event_id"], got["window_cents"])) == exp_c


def test_sliding_window_boundary_and_ties():
    """Exact-boundary inclusion and same-timestamp peers (RANGE not ROWS)."""
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": [
                T0,
                T0 + pd.Timedelta(minutes=10),  # exactly lookback -> included
                T0 + pd.Timedelta(minutes=10),  # tie: peer row included
                T0 + pd.Timedelta(minutes=20, microseconds=1),  # just outside
            ],
            "user_id": [7, 7, 7, 7],
            "event_type": ["view"] * 4,
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = (
        sliding_window_stats(ray.data.from_pandas(df), lookback_minutes=10)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # rows 1 and 2 share a ts: each sees row0 (exactly 10m back) + both peers
    assert list(got["n_window"]) == [1, 3, 3, 1]
    assert list(got["window_cents"]) == [100, 700, 700, 800]


def test_grouped_topk(tiny_events):
    """k=2: rank by cents DESC then event_id ASC; partial top-k across
    batches must not drop a globally-ranked row."""
    got = (
        grouped_topk(tiny_events, k=2)
        .to_pandas()
        .sort_values(["user_id", "rank"])
        .reset_index(drop=True)
    )
    # user 1 values: 10.00(e0), 1.00(e1), 20.00(e2) -> top2 = e2, e0
    # user 2 values: 2,3,4 -> top2 = e5(400), e4(300); user 3 -> e6
    assert list(zip(got["user_id"], got["rank"], got["event_id"])) == [
        (1, 1, 2), (1, 2, 0), (2, 1, 5), (2, 2, 4), (3, 1, 6),
    ]


def test_grouped_topk_partial_is_safe():
    """Rows for one user split across many input blocks: map-side top-k
    partials must still yield the exact global top-k."""
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Series([T0] * n).astype("datetime64[us]"),
            "user_id": np.zeros(n, dtype=np.int64) + 9,
            "event_type": ["view"] * n,
            "value": (np.arange(n) % 97).astype(np.float64),
        }
    )
    ds = ray.data.from_pandas([df.iloc[i : i + 50] for i in range(0, n, 50)])
    got = grouped_topk(ds, k=3).to_pandas().sort_values("rank")
    # max value 96.0 occurs at event_ids 96, 193, 290, ... -> smallest ids win
    assert list(got["event_id"]) == [96, 193, 290]
    assert list(got["cents"]) == [9600, 9600, 9600]


def test_value_quantiles(tiny_events):
    got = value_quantiles(tiny_events, quantiles=(0.5, 1.0))
    got = got.sort_values(["event_type", "quantile_pct"]).reset_index(drop=True)
    # purchase cents: [555, 1000, 2000] -> median 1000, max 2000
    # view cents: [100, 200, 300, 400] -> disc median = 2nd = 200, max 400
    exp = pd.DataFrame(
        {
            "event_type": ["purchase", "purchase", "view", "view"],
            "quantile_pct": [50, 100, 50, 100],
            "value_cents": [1000, 2000, 200, 400],
        }
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_windows_match_duckdb(sf_dir):
    """Full-table parity at sf0.001 against the registered oracles (the
    exact comparison the driver gate runs)."""
    import duckdb
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    for name in (
        "tumbling_user_activity",
        "asof_last_purchase",
        "sliding_window_stats",
        "sessions",
        "grouped_topk",
        "value_quantiles",
    ):
        rdf = entrymod.queries()[name](sf_dir)
        if hasattr(rdf, "to_pandas"):
            rdf = rdf.to_pandas()
        odf = con.execute(entrymod.oracle_sql()[name]).fetchdf()
        cols = sorted(rdf.columns)
        a = rdf[cols].sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_shared_bucket_layout_equivalence():
    """Every user-keyed window op over bucket_events(ev) must equal the
    same op over the raw stream (the shuffle-free fast path)."""
    from webgraph_ray.stages.windows import bucket_events

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
            "user_id": rng.integers(0, 50, n).astype(np.int64),
            "event_type": rng.choice(["view", "purchase", "click"], n),
            "value": rng.integers(0, 5000, n) / 100.0,
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    ev = ray.data.from_pandas(df).repartition(6)
    b = bucket_events(ev, num_buckets=7)

    def norm(ds, keys):
        out = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
        return out.sort_values(keys, kind="mergesort").reset_index(drop=True)

    for op, keys in [
        (lambda e: tumbling_user_activity(e, every_minutes=60), ["user_id", "window_id"]),
        (lambda e: asof_last_match(e, match_type="purchase"), ["event_id"]),
        (lambda e: sliding_window_stats(e, lookback_minutes=10), ["event_id"]),
        (lambda e: sessionize(e, gap_minutes=30), ["user_id", "session_id"]),
        (lambda e: grouped_topk(e, k=3), ["user_id", "rank"]),
    ]:
        raw = norm(op(ev), keys)
        fast = norm(op(b), keys)
        pd.testing.assert_frame_equal(raw, fast)


def test_bucket_events_validation_contract():
    from webgraph_ray.stages.windows import bucket_events

    df = pd.DataFrame(
        {
            "event_id": np.arange(10, dtype=np.int64),
            "ts": pd.Series([pd.Timestamp("2024-01-01")] * 10).astype(
                "datetime64[us]"
            ),
            "user_id": np.arange(10, dtype=np.int64) % 3,
            "event_type": ["view"] * 10,
            "value": np.ones(10),
        }
    )
    b = bucket_events(ray.data.from_pandas(df).repartition(4), num_buckets=3)
    got = b.to_pandas()
    assert set(got.columns) >= {"event_id", "user_id", "ts_us", "event_type", "cents", "__b"}
    # each bucket's users are disjoint and complete
    for bb, grp in got.groupby("__b"):
        assert (grp["user_id"].to_numpy() % 3 == bb).all()
    assert len(got) == 10
