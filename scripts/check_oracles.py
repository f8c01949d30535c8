"""Run EVERY queries() entry against its DuckDB oracle and report
row/schema/value matches — the driver gate's protocol over the full
50-entry registry (exactly the gate's 50-row window).

Usage:
    python scripts/check_oracles.py [SF_DIR] [name ...]

SF_DIR defaults to /root/testdata/sf0.01; optional names restrict the
sweep.  Exit code 0 iff every checked entry matches.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(df):
    import pandas as pd

    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    import duckdb
    import pandas as pd

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, REPO)
    import __ray_entry__ as entry

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:] if args and os.path.isdir(args[0]) else args)

    def fresh_con():
        # fresh connection per query: one shared in-memory connection
        # accumulates buffer-pool blocks across 50 unrolled-CTE oracles
        # and eventually hits bad_alloc on the late queries
        c = duckdb.connect()
        for t in TABLES:
            path = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(path):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        return c

    qs, osql = entry.queries(), entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            import pyarrow as pa

            import ray.data

            res = fn(sf)
            if isinstance(res, ray.data.Dataset):
                res = res.to_pandas()
            elif isinstance(res, pa.Table):
                res = res.to_pandas()
            con = fresh_con()
            try:
                exp = con.execute(osql[name]).df()
            finally:
                # close on failure too: a leaked connection per failing
                # query re-creates the accumulating-buffer bad_alloc
                con.close()
                del con
            import gc

            gc.collect()  # release the closed db's buffers promptly
            r, s = norm(res), norm(exp)
            assert list(r.columns) == list(s.columns), (
                "columns", list(r.columns), list(s.columns),
            )
            assert len(r) == len(s), ("rows", len(r), len(s))
            pd.testing.assert_frame_equal(r, s, check_dtype=False)
            print(f"{name}: OK rows={len(r)} {time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            fails.append(name)
            print(f"{name}: FAIL {e}", flush=True)
    ray.shutdown()
    total = len(only) if only else len(qs)
    print(
        f"RESULT: {total - len(fails)}/{total} green"
        + (f"; FAILS: {fails}" if fails else "")
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
