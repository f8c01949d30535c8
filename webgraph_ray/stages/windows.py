"""Time-window operators over the raw event stream — the windowed
aggregate / as-of join / sessionization family a training-data pipeline
needs and Ray Data has no built-in for (the reference's closest analog is
its per-visit time-ordered call-stack walk,
/root/reference/code/graph/database.py:41-63, which orders events per
visit before deriving features).

All three are expressed as compositions the streaming executor can
pipeline:

- ``tumbling_user_activity``: per-batch pre-aggregate on (user, window)
  -> ONE low-cardinality bucket groupby -> per-bucket exact combine
  (the map-side-combine-then-small-shuffle shape; never a raw
  high-cardinality sort aggregate).
- ``asof_last_match`` / ``sessionize``: ONE user-hash bucket shuffle,
  then vectorized per-bucket kernels (sort + ffill / gap cumsum) — no
  per-row Python, no per-user groups at the Ray level (bucket
  cardinality is fixed at ~4x cluster CPUs, so group overhead is
  independent of user count).

``bucket_events`` materializes the user-hash layout ONCE (one block per
bucket, contract validated); every op in the family detects the shared
layout via its ``__b`` column and runs shuffle-free as a per-block
``map_batches`` — N window ops over the same stream pay ONE all-to-all
exchange instead of N.  This is the reuse-one-partitioning-key rule made
concrete.

Money columns ride as exact integer cents (``floor(value*100 + 0.5)``,
half-up on both sides) so sums
are associative and every query is bit-reproducible against its DuckDB
oracle (float sums would differ in the last ulp across partitionings).
Partitioning assumption: one user's events fit one task's memory after
bucketing — at 10^12 events either raise num_buckets or salt pathological
users (documented; same assumption as the conv-hash buckets everywhere
else in this repo).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from webgraph_ray.functions.shuffle import default_num_buckets

US_PER_MIN = 60_000_000


def _cents(values: pd.Series) -> np.ndarray:
    # Explicit half-up rule, mirrored verbatim by every window oracle as
    # floor(value * 100 + 0.5): np.round is half-even while DuckDB round()
    # is half-away-from-zero, so neither builtin matches the other on an
    # exact .5 — floor(x + 0.5) is the same C expression on both sides.
    return np.floor(values.to_numpy(np.float64) * 100 + 0.5).astype(np.int64)


def _epoch_us(ts: pd.Series) -> np.ndarray:
    return ts.to_numpy("datetime64[us]").view(np.int64)


def bucket_events(
    events: ray.data.Dataset,
    num_buckets: int | None = None,
    validate: bool = True,
) -> ray.data.Dataset:
    """Materialize the event stream user-hash-bucketed ONCE so every
    user-keyed window operator (as-of join, range join, sessionization,
    grouped top-k, tumbling aggregate) can then run as a shuffle-free
    per-block ``map_batches`` over the shared layout — N ops pay ONE
    all-to-all exchange instead of N.

    Layout contract (what the shuffle-free fast paths rely on): a ``__b``
    bucket — hence every row of a user — is never split across blocks
    (several small buckets sharing one block is fine).  ``validate=True``
    checks it with a cheap map-only pass over the materialized blocks
    (one row per distinct bucket per block) and fails loudly if the
    runtime ever splits a bucket — the same "bucket fits a task" memory
    assumption the kernels already make."""
    nb = num_buckets or default_num_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": _epoch_us(df["ts"]),
                "event_type": df["event_type"].astype(str),
                "cents": _cents(df["value"]),
            }
        )
        out["__b"] = (out["user_id"].to_numpy(np.int64) % nb).astype(np.int32)
        return out

    def ident(g: pd.DataFrame) -> pd.DataFrame:
        return g

    bucketed = (
        events.map_batches(prep, batch_format="pandas")
        .groupby("__b")
        .map_groups(ident, batch_format="pandas")
        .materialize()
    )
    if validate:
        # several buckets sharing a block is harmless (kernels handle any
        # number of complete users per batch); ONE bucket split across two
        # blocks is the contract violation — flag exactly that
        def block_buckets(df: pd.DataFrame) -> pd.DataFrame:
            vc = df["__b"].value_counts()
            return pd.DataFrame({"b": vc.index.to_numpy(np.int32)})

        spans = bucketed.map_batches(
            block_buckets, batch_format="pandas", batch_size=None
        ).to_pandas()
        if spans["b"].duplicated().any():
            raise RuntimeError(
                "bucket_events: a user bucket was split across blocks; "
                "raise DataContext.target_max_block_size or num_buckets "
                "so each bucket fits one block"
            )
    return bucketed


def _is_bucketed(events: ray.data.Dataset) -> bool:
    schema = events.schema(fetch_if_missing=False)
    return schema is not None and "__b" in schema.names


def tumbling_user_activity(
    events: ray.data.Dataset,
    every_minutes: int = 60,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Tumbling-window aggregate: (user_id, window_id, n_events,
    value_cents) where window_id = floor(epoch_us / window).  Per-batch
    combine first, then one small bucket groupby."""
    nb = num_buckets or default_num_buckets()
    win_us = every_minutes * US_PER_MIN

    if _is_bucketed(events):
        # shared layout: every (user, window) group is block-local, so the
        # aggregate is exact per block with NO further shuffle
        def per_block(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "user_id": df["user_id"].to_numpy(np.int64),
                    "window_id": df["ts_us"].to_numpy(np.int64) // win_us,
                    "n_events": np.ones(len(df), dtype=np.int64),
                    "value_cents": df["cents"].to_numpy(np.int64),
                }
            )
            return out.groupby(
                ["user_id", "window_id"], sort=False, as_index=False
            ).sum()

        return events.map_batches(
            per_block, batch_format="pandas", batch_size=None
        )

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "window_id": _epoch_us(df["ts"]) // win_us,
                "n_events": np.ones(len(df), dtype=np.int64),
                "value_cents": _cents(df["value"]),
            }
        )
        g = out.groupby(["user_id", "window_id"], sort=False, as_index=False).sum()
        g["__b"] = ((g["user_id"] * 1_000_003) ^ g["window_id"]).abs() % nb
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "window_id"], sort=False, as_index=False)[
            ["n_events", "value_cents"]
        ].sum()

    return (
        events.map_batches(pre, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
    )


def asof_last_match(
    events: ray.data.Dataset,
    match_type: str = "purchase",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """As-of join of the event stream against itself: for every event, the
    value (cents) of the most recent ``match_type`` event of the SAME user
    at or before it (order (ts, event_id); -1 when none yet).  ONE
    user-hash bucket shuffle; the per-bucket kernel is a vectorized sort +
    forward-fill."""
    nb = num_buckets or default_num_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": _epoch_us(df["ts"]),
                "is_match": (df["event_type"] == match_type).to_numpy(bool),
                "cents": _cents(df["value"]),
            }
        )
        out["__b"] = (out["user_id"].to_numpy(np.int64) % nb).astype(np.int32)
        return out

    def ffill(g: pd.DataFrame) -> pd.DataFrame:
        if "is_match" not in g.columns:  # shared bucket_events layout
            g = g.assign(is_match=(g["event_type"] == match_type))
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "last_match_cents": pd.Series(dtype="int64"),
                }
            )
        is_match = g["is_match"].to_numpy(bool)
        cents = g["cents"].to_numpy(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        # vectorized per-user forward fill: running index of the last match
        # row (-1 = none yet), invalidated when it precedes this user's
        # first row (filled only ever points at match rows <= current row)
        idx = np.arange(n)
        filled = np.maximum.accumulate(np.where(is_match, idx, -1))
        first_of_user = np.zeros(n, dtype=np.int64)
        starts = np.flatnonzero(np.diff(uid)) + 1
        first_of_user[starts] = starts
        first_of_user = np.maximum.accumulate(first_of_user)
        valid = filled >= first_of_user
        last = np.where(valid, cents[np.maximum(filled, 0)], -1)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "last_match_cents": last.astype(np.int64),
            }
        )

    if _is_bucketed(events):
        return events.map_batches(ffill, batch_format="pandas", batch_size=None)
    return (
        events.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(ffill, batch_format="pandas")
    )


def sliding_window_stats(
    events: ray.data.Dataset,
    lookback_minutes: int = 10,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Range join of the event stream against itself: for every event, the
    count and value-sum (cents) of the SAME user's events in
    ``[ts - lookback, ts]`` (inclusive both ends, the row itself included).

    This is the interval/range-join member of the window family — the same
    ONE-user-hash-bucket-shuffle shape as :func:`asof_last_match`, with a
    per-bucket kernel that is two ``np.searchsorted`` calls over per-user
    prefix sums (O(n log n) per bucket, no per-row Python, no quadratic
    pair expansion).  Mirrors DuckDB's
    ``RANGE BETWEEN INTERVAL x PRECEDING AND CURRENT ROW`` window frame.

    Ties on ts: the frame is defined purely by the time range, so rows of
    the same user sharing one timestamp all see the identical (count, sum)
    over that range — exactly the RANGE-frame (not ROWS-frame) semantics.
    """
    nb = num_buckets or default_num_buckets()
    look_us = lookback_minutes * US_PER_MIN

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": _epoch_us(df["ts"]),
                "cents": _cents(df["value"]),
            }
        )
        out["__b"] = (out["user_id"].to_numpy(np.int64) % nb).astype(np.int32)
        return out

    def window(g: pd.DataFrame) -> pd.DataFrame:  # shared-layout compatible
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "n_window": pd.Series(dtype="int64"),
                    "window_cents": pd.Series(dtype="int64"),
                }
            )
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        # Offset timestamps per user so searchsorted never crosses a user
        # boundary: shift each user's times into a disjoint numeric band.
        # Band width is the max PER-USER time range (not the global range),
        # so users x range products stay small; if the product would still
        # wrap int64 (~1e5+ users x multi-century microsecond spans in one
        # bucket) fall back to per-user segment-bounded searchsorted rather
        # than corrupt the frames silently.
        new_user = np.r_[False, uid[1:] != uid[:-1]]
        user_ord = np.cumsum(new_user)
        seg_starts = np.flatnonzero(np.r_[True, new_user[1:]])
        rel = ts - ts[seg_starts][user_ord]  # >= 0, nondecreasing per user
        band = int(rel.max()) + look_us + 2
        if int(user_ord[-1]) * band + int(rel.max()) < 2**62:
            # Bands are disjoint: prev user's max key <= u*band - look - 2
            # < key_i - look, so the 'left' probe never crosses backwards.
            key = user_ord * np.int64(band) + rel
            # frame start: first row of same user with ts >= ts_i - look
            lo = np.searchsorted(key, key - look_us, side="left")
            # frame end: last row of same user with ts <= ts_i (ties incl.)
            hi = np.searchsorted(key, key, side="right")
        else:  # pragma: no cover - astronomically wide buckets only
            seg_ends = np.r_[seg_starts[1:], n]
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            for s, e in zip(seg_starts, seg_ends):
                seg = ts[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - look_us, side="left")
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "n_window": (hi - lo).astype(np.int64),
                "window_cents": (csum[hi] - csum[lo]).astype(np.int64),
            }
        )

    if _is_bucketed(events):
        return events.map_batches(window, batch_format="pandas", batch_size=None)
    return (
        events.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(window, batch_format="pandas")
    )


def grouped_topk(
    events: ray.data.Dataset,
    k: int = 3,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-user top-k events by value (cents), rank 1 = highest; ties
    broken by smaller event_id (deterministic, mirrors SQL
    ``row_number() OVER (... ORDER BY cents DESC, event_id)``).

    Scale shape: each input batch keeps at most k rows per user seen in
    that batch (map-side partial top-k — the pre-aggregate-before-shuffle
    rule), so the ONE user-hash bucket shuffle moves O(k · users) rows,
    not O(events).  Per-bucket combine is a C-path sort + groupby.head(k)
    + rank assignment; no per-row Python anywhere.
    """
    nb = num_buckets or default_num_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "cents": _cents(df["value"]),
            }
        )
        out = out.sort_values(
            ["user_id", "cents", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = out.groupby("user_id", sort=False).head(k)
        out["__b"] = (out["user_id"].to_numpy(np.int64) % nb).astype(np.int32)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "cents", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.groupby("user_id", sort=False).head(k)
        g = g.assign(rank=g.groupby("user_id", sort=False).cumcount() + 1)
        return g[["user_id", "rank", "event_id", "cents"]].astype(
            {"rank": np.int64}
        )

    if _is_bucketed(events):
        return events.map_batches(combine, batch_format="pandas", batch_size=None)
    return (
        events.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
    )


def value_quantiles(
    events: ray.data.Dataset,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> pd.DataFrame:
    """EXACT discrete quantiles of the value column (cents) per event_type,
    via a distributed value histogram: per-batch (event_type, cents) ->
    count partials, ONE tiny groupby over the distinct-value domain, then
    a driver-side cumulative walk over the (small) histogram.

    Matches SQL ``quantile_disc``: the q-quantile is the value at
    1-based position ceil(q*n) in sorted order.

    Scale contract: the shuffled/collected table is O(types × distinct
    cent values), independent of row count — exact quantiles at 100 TB
    are only feasible when the value domain is bounded (money in cents
    is); for unbounded domains use a sketch and drop the exact oracle.
    Returns a small pandas DataFrame (type, quantile_pct, value_cents).
    """

    nb = default_num_buckets()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_type": df["event_type"].astype(str),
                "cents": _cents(df["value"]),
            }
        )
        g = out.groupby(["event_type", "cents"], sort=False).size()
        g = g.rename("n").reset_index()
        # single int32 bucket key: Ray's sort shuffle on a composite
        # (string, int) key is an order of magnitude slower than one small
        # int groupby + per-bucket pandas combine (measured 17 s vs 1 s on
        # a 50k-cell histogram)
        g["__b"] = (
            (g["cents"].to_numpy(np.int64) * 1_000_003) % nb
        ).astype(np.int32)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "cents"], sort=False, as_index=False)[
            "n"
        ].sum()

    h = (
        events.map_batches(hist, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    n_col = "sum(n)" if "sum(n)" in h.columns else "n"
    h = h.sort_values(["event_type", "cents"], kind="mergesort")
    rows = []
    for etype, grp in h.groupby("event_type", sort=True):
        counts = grp["n" if n_col == "n" else n_col].to_numpy(np.int64)
        vals = grp["cents"].to_numpy(np.int64)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        for q in quantiles:
            pos = int(np.ceil(q * total))  # 1-based quantile_disc position
            idx = int(np.searchsorted(cum, max(pos, 1), side="left"))
            rows.append((etype, int(round(q * 100)), int(vals[idx])))
    return pd.DataFrame(rows, columns=["event_type", "quantile_pct", "value_cents"])


def sessionize(
    events: ray.data.Dataset,
    gap_minutes: int = 30,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Gap-based sessionization: events of one user more than
    ``gap_minutes`` apart start a new session.  Returns one row per
    (user_id, session_id) with n_events, value_cents, t_start, t_end.
    ONE user-hash bucket shuffle; per-bucket kernel is sort + gap cumsum +
    groupby-agg, all C-path."""
    nb = num_buckets or default_num_buckets()
    gap_us = gap_minutes * US_PER_MIN

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts": df["ts"].to_numpy("datetime64[us]"),
                "event_id": df["event_id"].to_numpy(np.int64),
                "cents": _cents(df["value"]),
            }
        )
        out["__b"] = (out["user_id"].to_numpy(np.int64) % nb).astype(np.int32)
        return out

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        if "ts" not in g.columns:  # shared bucket_events layout
            g = g.assign(ts=g["ts_us"].to_numpy(np.int64).view("datetime64[us]"))
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts_us = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        new_user = np.empty(len(g), dtype=bool)
        if len(g):
            new_user[0] = True
            new_user[1:] = uid[1:] != uid[:-1]
        brk = np.empty(len(g), dtype=np.int64)
        if len(g):
            brk[0] = 0
            brk[1:] = (~new_user[1:] & (ts_us[1:] - ts_us[:-1] > gap_us)).astype(
                np.int64
            )
        # per-user session counter: cumsum of breaks, reset per user
        cum = np.cumsum(brk)
        base = np.zeros(len(g), dtype=np.int64)
        starts = np.flatnonzero(new_user)
        base[starts] = cum[starts]
        base = np.maximum.accumulate(base)
        g = g.assign(session_id=cum - base)
        out = g.groupby(["user_id", "session_id"], sort=False).agg(
            n_events=("event_id", "size"),
            value_cents=("cents", "sum"),
            t_start=("ts", "min"),
            t_end=("ts", "max"),
        )
        return out.reset_index()

    if _is_bucketed(events):
        return events.map_batches(sess, batch_format="pandas", batch_size=None)
    return (
        events.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(sess, batch_format="pandas")
    )
