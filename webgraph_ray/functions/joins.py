"""Explicit partitioned hash join for Ray Data.

``Dataset.join`` (Ray 2.49) fails on hash partitions that come up empty
("No match for FieldRef" from Acero on empty-schema blocks), which any
small-or-skewed input can produce.  This is the portable pattern instead:
add ``bucket = hash(keys) % B`` to both sides, union them with a side tag
and null-padded columns, ``groupby(bucket)``, and pandas-merge each bucket
— an explicit partitioned hash join with B-way parallelism and no
broadcast.  Skewed keys can be salted by raising ``num_buckets``.

Contract: both sides use the SAME key column names; non-key column names
must be disjoint.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from webgraph_ray.functions.hashing import hash_keys

_SIDE = "__side"
_BUCKET = "__bucket"


def _key_bucket(df: pd.DataFrame, keys: Sequence[str], num_buckets: int) -> np.ndarray:
    if len(keys) == 1:
        k = df[keys[0]]
        if pd.api.types.is_integer_dtype(k):
            return (k.to_numpy(dtype=np.int64) % num_buckets).astype(np.int32)
        composite = k.astype(str).to_numpy(dtype=object)
    else:
        composite = (
            df[list(keys)].astype(str).agg("\x1f".join, axis=1).to_numpy(dtype=object)
        )
    return (hash_keys(composite) % num_buckets).astype(np.int32)


def _schema_dtypes(sch) -> dict:
    """Column -> castable pandas dtype, from an Arrow or pandas block
    schema.  Columns whose type numpy can't interpret (nested arrays,
    tensor extension types) are omitted — they pass through uncast."""
    out = {}
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            try:
                typ = typ.to_pandas_dtype()
            except NotImplementedError:
                continue
        try:
            np.dtype(typ)
        except TypeError:
            continue
        out[str(name)] = typ
    return out


def bucketed_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    keys: Sequence[str],
    how: str = "inner",
    num_buckets: int = 32,
    semi_broadcast_threshold: int = 5_000_000,
) -> ray.data.Dataset:
    """how: 'inner' | 'left_semi' | 'left'.  Returns the joined Dataset
    (inner/left: all columns of both sides; left_semi: left columns only).
    For 'left', unmatched right-side integer columns come back as pandas
    nullable Int64 so the dtype is identical across buckets (plain NaN
    would widen some buckets to float64 and poison the union).

    A semi join whose right side is below ``semi_broadcast_threshold``
    rows broadcasts the distinct right keys instead (ray.put once, C-path
    membership mask per batch): the left payload never shuffles at all.
    Note the gate's count() executes a lazy right side once before the
    key collection re-executes it — pass a materialized right to avoid
    recompute."""
    keys = list(keys)
    assert how in ("inner", "left_semi", "left"), how

    if how == "left_semi" and right.count() <= semi_broadcast_threshold:
        rschema0 = right.schema(fetch_if_missing=True)
        if rschema0 is None:
            return left.limit(0)
        rkeys = (
            right.map_batches(
                lambda df: df[keys].drop_duplicates(), batch_format="pandas"
            )
            .to_pandas()
            .drop_duplicates()
        )
        import ray as _ray

        ref = _ray.put(rkeys)

        def semi(df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(_ray.get(ref), on=keys, how="inner")

        return left.map_batches(semi, batch_format="pandas")

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out[_SIDE] = np.int8(side)
            out[_BUCKET] = _key_bucket(df, keys, num_buckets)
            return out

        return fn

    lschema = left.schema(fetch_if_missing=True)
    rschema = right.schema(fetch_if_missing=True)
    if lschema is None:  # empty left -> empty join
        return left
    if rschema is None:
        if how == "left":
            # empty right: keep every left row.  The right-side columns
            # cannot be inferred from an empty Dataset, so they are ABSENT
            # from the result (callers needing them must handle the
            # no-rows-at-all case anyway).
            return left
        return left.limit(0)  # inner/semi join with empty right is empty

    lt = left.map_batches(tag(0), batch_format="pandas")
    rt = right.map_batches(tag(1), batch_format="pandas")

    # harmonize schemas for the union: null-pad each side's missing columns.
    # CRITICAL: pad integer columns as pandas nullable Int64 — plain reindex
    # creates float64 NaN blocks and the union then widens the *other* side's
    # int64 column to float64, silently destroying vertex ids above 2^53.
    lcols = [str(c) for c in lschema.names]
    rcols = [str(c) for c in rschema.names]
    all_cols = lcols + [c for c in rcols if c not in lcols] + [_SIDE, _BUCKET]
    ldt = _schema_dtypes(lschema)
    rdt = _schema_dtypes(rschema)
    union_dtypes = {}
    for col, dt in {**rdt, **ldt}.items():
        try:
            nd = np.dtype(dt) if not isinstance(dt, str) else np.dtype(object)
        except TypeError:  # exotic block types (e.g. ndarray-of-ndarray cols)
            continue
        if nd.kind == "i":
            union_dtypes[col] = f"Int{nd.itemsize * 8}"
        elif nd.kind == "u":
            union_dtypes[col] = f"UInt{nd.itemsize * 8}"
        elif nd.kind == "b":
            union_dtypes[col] = "boolean"

    def pad(df: pd.DataFrame) -> pd.DataFrame:
        out = df.reindex(columns=all_cols)
        return out.astype({c: t for c, t in union_dtypes.items()}, errors="raise")

    both = lt.map_batches(pad, batch_format="pandas").union(
        rt.map_batches(pad, batch_format="pandas")
    )

    lval = [c for c in lcols if c not in keys]
    rval = [c for c in rcols if c not in keys]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g[_SIDE] == 0][keys + lval].astype(ldt, errors="raise")
        r = g[g[_SIDE] == 1][keys + rval].astype(
            {k: v for k, v in rdt.items() if k in rval or k in keys}, errors="raise"
        )
        if how == "left_semi":
            out = l.merge(r[keys].drop_duplicates(), on=keys, how="inner")
        elif how == "left":
            out = l.merge(r, on=keys, how="left")
            for col in rval:
                dt = rdt.get(col)
                if dt is not None and np.dtype(dt).kind in "iu":
                    out[col] = out[col].astype("Int64")
        else:
            out = l.merge(r, on=keys, how="inner")
        return out

    out = both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pandas")
    return out
