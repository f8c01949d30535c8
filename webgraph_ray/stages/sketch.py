"""Mergeable sketches and deterministic sampling.

Two operators a 100-TB training-data pipeline leans on constantly, both
built so a DuckDB oracle can mirror them bit-for-bit:

- ``kmv_distinct``: K-Minimum-Values distinct-count sketch over the token
  universe of the ``documents`` table.  Each batch contributes its k
  smallest distinct token hashes (a partial sketch of <= k rows,
  independent of batch size); partial sketches merge by "union then keep
  the k smallest" — associative and commutative, so the reduction tree
  shape doesn't matter and the driver only ever sees O(blocks * k) tiny
  rows.  The estimator is the classic (k-1) / F(h_k) with the uniform
  hash fraction F computed in exact integer arithmetic (floor division),
  which is why the estimate — normally a float — is bit-stable across
  engines.  At 100 TB this is the cheap answer to "how many distinct
  tokens/urls/users" that an exact ``unique`` (an all-to-all shuffle of
  every distinct value) cannot afford; the sketch ships k int64s per
  block instead.

- ``stratified_sample``: deterministic per-stratum uniform sample — the n
  events of each type with the smallest affine hash of their id.  Because
  membership is a pure function of the row, the sample is reproducible
  across runs, resumable, and needs no global sort: each batch keeps its
  per-type n smallest candidates (map-side partial top-n, like
  ``windows.grouped_topk``) and the survivors — O(blocks * types * n)
  rows — reduce in one tiny pass.

Reference analog: the reference samples per-visit data with pandas
``sample`` inside one process (no distributed or deterministic story);
these are the scale-path counterparts.  Hash primitives and their SQL
mirrors are shared with ``functions/texthash.py`` (token hash) so the
oracle uses the very same integer universe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from webgraph_ray.functions.texthash import M, sql_token_hash_expr
from webgraph_ray.stages.text import TOKEN_RE

KMV_K = 256

# KMV needs a UNIFORM hash; the polynomial token hash is collision-free
# but locality-preserving (tokens differing in the last char hash to
# consecutive values), which biases the k-th-minimum estimator badly on
# structured vocabularies.  A quadratic finisher scatters it:
#     g = (((h*h) % M) * C1 + h * C2 + C3) % M   (term-wise mods)
# Every intermediate fits int64 (h < 2^31 so h*h < 2^62, partials < 2^31
# before the final sum), so numpy and DuckDB BIGINT agree bit-for-bit.
# The map is ~2-to-1 in the worst case (quadratic mod prime) but expected
# collisions at n distinct tokens are n^2/2M — noise next to the
# estimator's own 1/sqrt(k).
KMV_C1 = 1_779_033_703 % M
KMV_C2 = 2_654_435_761 % M
KMV_C3 = 97_531


def _kmv_mix(h: np.ndarray) -> np.ndarray:
    hh = (h * h) % M
    return ((hh * KMV_C1) % M + (h * KMV_C2) % M + KMV_C3) % M

# affine hash for integer ids: (A*x + B) mod M.  A, B < 2^31 and ids are
# int64 well below 2^31 in the testdata universe, so A*x + B < 2^62 is
# exact in int64 on both engines; M = 2^31 - 1 (shared with texthash).
SAMPLE_A = 1_103_515_245
SAMPLE_B = 12_345


def _token_hashes(texts: pd.Series) -> np.ndarray:
    """Distinct token hashes of a batch of documents (sorted int64)."""
    from webgraph_ray.functions.texthash import hash_token_list

    tokens: list[str] = []
    for t in texts:
        tokens.extend(TOKEN_RE.findall(t))
    if not tokens:
        return np.empty(0, dtype=np.int64)
    return np.unique(_kmv_mix(hash_token_list(tokens)))


def kmv_distinct(docs: ray.data.Dataset, k: int = KMV_K) -> pd.DataFrame:
    """One row (k, kth_hash, est_distinct): KMV estimate of the number of
    distinct tokens in ``docs.text``.

    est = (k-1) * M // h_k when >= k distinct hashes exist (exact integer
    floor, hence bit-stable), else the exact distinct count (the sketch
    degenerates to an exact set below k)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = _token_hashes(df["text"])
        return pd.DataFrame({"h": u[:k]})

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    u = np.unique(parts["h"].to_numpy(np.int64))
    if len(u) >= k:
        kth = int(u[k - 1])
        est = (k - 1) * M // kth
    else:
        kth = int(u[-1]) if len(u) else 0
        est = len(u)
    return pd.DataFrame(
        {
            "k": np.array([k], dtype=np.int64),
            "kth_hash": np.array([kth], dtype=np.int64),
            "est_distinct": np.array([est], dtype=np.int64),
        }
    )


def kmv_distinct_sql(k: int = KMV_K, doc_table: str = "documents") -> str:
    """DuckDB mirror: same token regex, same token hash, same floor-divide
    estimator.  COALESCE handles the empty-corpus edge identically to the
    Ray path's 0."""
    tok_hash = sql_token_hash_expr("t")
    return f"""
WITH th AS MATERIALIZED (
    SELECT {tok_hash} AS h
    FROM {doc_table}, unnest(regexp_extract_all(text, '\\S+')) AS u(t)
),
toks AS (
    SELECT DISTINCT (((h * h) % {M}) * {KMV_C1} % {M}
                     + (h * {KMV_C2}) % {M} + {KMV_C3}) % {M} AS h
    FROM th
),
ranked AS (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM toks
),
sel AS (SELECT h FROM ranked WHERE rn <= {k})
SELECT CAST({k} AS BIGINT) AS k,
       CAST(COALESCE(max(h), 0) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN count(*) < {k} THEN count(*)
            ELSE (CAST({k - 1} AS BIGINT) * {M}) // max(h) END AS BIGINT) AS est_distinct
FROM sel"""


def stratified_sample(
    events: ray.data.Dataset, n: int = 5
) -> pd.DataFrame:
    """The ``n`` events of each event_type with the smallest affine hash
    of event_id (ties by event_id): a reproducible uniform per-stratum
    sample.  Map-side partial top-n means the reduce sees
    O(blocks * types * n) rows however many events exist."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        e = df[["event_type", "event_id"]].copy()
        ids = e["event_id"].to_numpy(np.int64)
        e["h"] = (SAMPLE_A * ids + SAMPLE_B) % M
        e = e.sort_values(["h", "event_id"], kind="mergesort")
        return e.groupby("event_type", sort=False).head(n)

    parts = (
        events.select_columns(["event_type", "event_id"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    parts = parts.sort_values(["h", "event_id"], kind="mergesort")
    out = parts.groupby("event_type", sort=False).head(n).copy()
    out["sample_rank"] = out.groupby("event_type", sort=False).cumcount() + 1
    out = out.sort_values(["event_type", "sample_rank"], kind="mergesort")
    return pd.DataFrame(
        {
            "event_type": out["event_type"].to_numpy(),
            "sample_rank": out["sample_rank"].to_numpy(np.int64),
            "event_id": out["event_id"].to_numpy(np.int64),
        }
    )


def stratified_sample_sql(n: int = 5, table: str = "events") -> str:
    return f"""
SELECT event_type,
       CAST(rn AS BIGINT) AS sample_rank,
       event_id
FROM (
    SELECT event_type, event_id,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY ({SAMPLE_A} * event_id + {SAMPLE_B}) % {M}, event_id
           ) AS rn
    FROM {table})
WHERE rn <= {n}"""
