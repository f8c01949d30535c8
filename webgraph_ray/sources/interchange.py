"""CSV interchange for the edge table.

The reference's durable interchange format is ``graph.csv`` re-read by the
stage-2 extraction entry point (/root/reference/code/run.py:190-194,
/root/reference/code/run_extraction.py:253-256).  Parquet is this engine's
native format, but the same contract is kept available over CSV for
interop: write a directory of part files, read them back with the schema
restored (CSV loses Arrow types; the reader re-casts to the EDGES schema
and re-derives the hashed ids from the keys, which keeps the file format
engine-independent)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from webgraph_ray.functions.hashing import hash_keys
from webgraph_ray.schemas import EDGES

_CSV_COLS = ["src_key", "dst_key", "edge_type", "weight", "conv_id", "ts"]


def write_edges_csv(edges: ray.data.Dataset, out_dir: str) -> None:
    """Write the engine-independent CSV form (keys, not hashed ids)."""
    edges.select_columns(_CSV_COLS).write_csv(out_dir)


def read_edges_csv(path: str) -> ray.data.Dataset:
    """CSV -> full EDGES-schema Dataset (ids re-derived from keys)."""
    ds = ray.data.read_csv(path)

    def restore(df: pd.DataFrame) -> pa.Table:
        src_key = df["src_key"].to_numpy(dtype=object)
        dst_key = df["dst_key"].to_numpy(dtype=object)
        n = len(df)
        return pa.table(
            {
                "src": pa.array(hash_keys(src_key)),
                "dst": pa.array(hash_keys(dst_key)),
                "src_key": pa.array(src_key, pa.string()),
                "dst_key": pa.array(dst_key, pa.string()),
                "edge_type": pa.array(df["edge_type"].to_numpy(dtype=object), pa.string()),
                "weight": pa.array(df["weight"].to_numpy(dtype=np.int64)),
                "conv_id": pa.array(df["conv_id"].to_numpy(dtype=object), pa.string()),
                "ts": pa.Array.from_pandas(
                    pd.to_datetime(df["ts"])
                ).cast(pa.timestamp("us")),
            },
            schema=EDGES,
        )

    return ds.map_batches(restore, batch_format="pandas")
