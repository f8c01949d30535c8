"""Sequence packing: the global ordered prefix scan a pretraining data
loader needs to concatenate a document stream into fixed-budget context
windows (GPT-style "pack then chunk" tokenizer-sharding).

Reference analog: none — WebGraph has no training-data packer; this is one
of the beyond-reference LLM-pipeline operators (like dedup/ANN/quality),
kept to the same house standard: exact integer arithmetic, an ANSI-SQL
oracle (window-function prefix sum), and partitioning-invariant output.

The distributed shape is the classic two-phase scan, NOT a global sort:

1. one vectorized token-count pass over ``documents`` (Arrow
   ``count_substring_regex`` — the text column never becomes Python), with
   each doc routed to a contiguous doc-id RANGE bucket (``doc_id //
   width``, so bucket order == scan order);
2. per-batch partial sums reduce to a ``num_buckets``-row table on the
   driver (bytes, not data: one int per bucket), whose exclusive cumsum is
   the bucket offset vector;
3. one bucket-grouped pass computes the in-bucket cumsum (numpy, C path)
   and adds the broadcast offset — no bucket ever sees another bucket's
   rows, and no all-to-all sort happens anywhere.

At 100 TB the counts projection (two int64s per doc, step 1's output) is
~0.1% of corpus bytes; it is materialized once so phases 2 and 3 don't
re-tokenize (swap ``materialize()`` for a parquet spool directory when the
count table itself exceeds object-store comfort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# whitespace-token budget per packed context window (the test/bench
# default; real runs pass their model's context length)
DEFAULT_BUDGET = 512

# must match stages/text.py TOKEN_RE and every text oracle
TOKEN_PATTERN = r"\S+"


def sequence_pack(
    docs: ray.data.Dataset,
    budget: int = DEFAULT_BUDGET,
    num_buckets: int | None = None,
    max_doc_id: int | None = None,
) -> ray.data.Dataset:
    """Assign every document its position in the packed token stream.

    Documents are concatenated in ``doc_id`` order into windows of
    ``budget`` tokens; a document may straddle windows (chunking, not
    bin-packing — the deterministic rule real pretraining shards use).

    Output columns (all int64): ``doc_id``, ``n_tokens``,
    ``global_start`` (exclusive prefix sum of n_tokens in doc_id order),
    ``pack_id`` (= global_start // budget), ``pack_pos``
    (= global_start % budget) and ``n_packs_spanned`` (how many windows
    the doc's tokens touch; an empty doc counts as touching 1).

    ``max_doc_id``: pass it when known (e.g. from table metadata) to skip
    the pruned-column max() pre-pass.
    """
    from webgraph_ray.functions.shuffle import default_num_buckets

    if budget <= 0:
        raise ValueError("budget must be positive")
    if num_buckets is None:
        num_buckets = default_num_buckets()
    ids = docs.select_columns(["doc_id", "text"])
    if max_doc_id is None:
        # column-pruned scan of the id column only; max() is None on an
        # empty input — return the empty result with the output schema
        max_doc_id = docs.select_columns(["doc_id"]).max("doc_id")
        if max_doc_id is None:
            empty = pa.array([], pa.int64())
            return ray.data.from_arrow(
                pa.table(
                    {
                        c: empty
                        for c in (
                            "doc_id",
                            "n_tokens",
                            "global_start",
                            "pack_id",
                            "pack_pos",
                            "n_packs_spanned",
                        )
                    }
                )
            )
        max_doc_id = int(max_doc_id)
    width = max(1, (int(max_doc_id) + num_buckets) // num_buckets)

    def count_batch(t: pa.Table) -> pa.Table:
        doc_id = pc.cast(t["doc_id"], pa.int64())
        n_tok = pc.cast(
            pc.count_substring_regex(t["text"], TOKEN_PATTERN), pa.int64()
        )
        # doc_id >= 0, so integer (truncating) divide == floor divide
        bucket = pc.divide(doc_id, pa.scalar(width, pa.int64()))
        return pa.table(
            {"doc_id": doc_id, "n_tokens": n_tok, "__b": bucket}
        )

    # the tiny (doc_id, n_tokens, bucket) projection both phases share
    counts = ids.map_batches(count_batch, batch_format="pyarrow").materialize()

    # ---- phase 2: per-bucket sums -> exclusive bucket offsets (driver) ----
    def bucket_partials(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "__b": t["__b"].to_numpy(zero_copy_only=False),
                "n": t["n_tokens"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("__b", sort=False)["n"].sum().reset_index()

    partials = counts.map_batches(
        bucket_partials, batch_format="pyarrow"
    ).to_pandas()  # <= num_blocks * num_buckets tiny rows
    sums = (
        partials.groupby("__b", sort=True)["n"].sum().astype(np.int64)
        if len(partials)
        else pd.Series(dtype=np.int64)
    )
    # exclusive cumsum in bucket (== doc_id) order
    offsets = {
        int(b): int(v)
        for b, v in zip(sums.index, np.concatenate([[0], np.cumsum(sums.to_numpy())[:-1]]))
    }

    # ---- phase 3: in-bucket ordered cumsum + broadcast offset ----
    def scan_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy(np.int64)
        start = offsets[int(g["__b"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(n)[:-1]]
        )
        pack_id = start // budget
        last = start + np.maximum(n, 1) - 1
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "global_start": start,
                "pack_id": pack_id,
                "pack_pos": start % budget,
                "n_packs_spanned": last // budget - pack_id + 1,
            }
        )

    return counts.groupby("__b").map_groups(scan_group, batch_format="pandas")


def sequence_pack_sql(
    budget: int = DEFAULT_BUDGET, table: str = "documents"
) -> str:
    """Exact DuckDB mirror: window-function prefix sum in doc_id order."""
    return f"""
WITH tc AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT)
               AS n_tokens
    FROM {table}
),
s AS (
    SELECT doc_id, n_tokens,
           CAST(coalesce(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS global_start
    FROM tc
)
SELECT doc_id, n_tokens, global_start,
       global_start // {budget} AS pack_id,
       global_start % {budget} AS pack_pos,
       (global_start + greatest(n_tokens, 1) - 1) // {budget}
           - global_start // {budget} + 1 AS n_packs_spanned
FROM s"""
