"""Generic side-table lookup: join a large streaming Dataset against a
key-value side table held in actor memory — the reference's LevelDB
content-store pattern (/root/reference/code/features/structure.py:37-46,
handle opened once, ``ldb.Get(content_hash)`` per record) as a first-class
operator rather than a stub.

The side table is loaded ONCE per actor in ``__init__`` (from a parquet
path or a broadcast ``ray.put`` ref), and each batch is joined against it
with the pandas C merge path.  For side tables too big for one actor's
heap, fall back to ``bucketed_join`` (a shuffle) — this operator is the
broadcast-hash-join side of that trade."""

from __future__ import annotations

import pandas as pd

import ray
import ray.data


class SideTableLookup:
    """map_batches actor class: ``map_batches(SideTableLookup,
    fn_constructor_kwargs=dict(side=..., key=...), concurrency=N)``.

    ``side``: parquet path (each actor reads it once) or an ObjectRef to a
    pandas DataFrame (``ray.put`` once, zero-copy reads).
    ``key``: join key column present in both sides.
    ``how``: 'left' (default) keeps unmatched rows with nulls; 'inner'
    drops them."""

    def __init__(self, side, key: str, how: str = "left"):
        if isinstance(side, str):
            import pyarrow.parquet as pq

            self.side = pq.read_table(side).to_pandas()
        elif isinstance(side, ray.ObjectRef):
            self.side = ray.get(side)
        else:
            self.side = side
        assert how in ("left", "inner"), how
        self.key = key
        self.how = how
        self.side = self.side.drop_duplicates(key)
        # left-merge on a partially-matched batch would widen the side's
        # int columns to float64 NaN (silently corrupting ids > 2^53 and
        # producing inconsistent dtypes across batches); pad with pandas
        # nullable Int64 instead — same mitigation as bucketed_join
        self._int_cols = [
            c
            for c in self.side.columns
            if c != key and self.side[c].dtype.kind in "iu"
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.merge(self.side, on=self.key, how=self.how)
        if self.how == "left":
            for c in self._int_cols:
                out[c] = out[c].astype("Int64")
        return out


def side_table_lookup(
    ds: ray.data.Dataset,
    side,
    key: str,
    how: str = "left",
    concurrency: int = 2,
) -> ray.data.Dataset:
    if isinstance(side, pd.DataFrame):
        side = ray.put(side)
    return ds.map_batches(
        SideTableLookup,
        fn_constructor_kwargs={"side": side, "key": key, "how": how},
        batch_format="pandas",
        concurrency=concurrency,
    )
