"""Small distributed-shuffle helpers built on the patterns that survive
Ray Data 2.49's sharp edges (see memory: sort-based ``groupby().aggregate``
collapses at high key cardinality; ``Dataset.join`` fails on empty hash
partitions).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data

_BUCKET = "__distinct_bucket"


def default_num_buckets() -> int:
    """Bucket-shuffle fan-out: a few buckets per cluster CPU so per-bucket
    groups parallelize on any cluster size (floor 64 keeps small clusters
    skew-tolerant)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    return max(64, 4 * cpus)


def bucket_distinct(
    ds: ray.data.Dataset, cols: Sequence[str], num_buckets: int | None = None
) -> ray.data.Dataset:
    """Distinct rows over integer key columns: per-batch drop_duplicates
    (map-side combine) -> bucket-hash groupby (low, fixed cardinality) ->
    per-bucket drop_duplicates.  The scalable replacement for
    ``groupby(cols).aggregate(Count)``-style dedup when the key cardinality
    is high."""
    if num_buckets is None:
        num_buckets = default_num_buckets()
    cols = list(cols)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        from webgraph_ray.functions.hashing import hash_keys

        df = df.drop_duplicates(cols)[cols].copy()
        h = np.zeros(len(df), dtype=np.int64)
        for c in cols:
            if pd.api.types.is_integer_dtype(df[c]):
                v = df[c].to_numpy(np.int64)
            else:
                v = hash_keys(df[c].astype(str).to_numpy(dtype=object))
            h = (h * 1_000_003) ^ v
        df[_BUCKET] = np.abs(h) % num_buckets
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(cols)[cols]

    return (
        ds.map_batches(pre, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas")
    )
