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

from webgraph_ray.functions.texthash import M, hash_token_list, sql_token_hash_expr
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


# ---------------------------------------------------------------------------
# HyperLogLog — the third mergeable cardinality sketch (vs KMV's k-th
# minimum): 256 one-byte registers estimate distinct count with ~6.5%
# relative error at ANY corpus size; per-block partials are 256-byte
# register arrays merged by elementwise max, so the reduce tree ships a
# fixed few hundred bytes per block regardless of data volume.
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_WBITS = 31 - HLL_P  # low bits of the 31-bit mixed hash -> rank
HLL_WMOD = 1 << HLL_WBITS
# alpha_m bias constant (Flajolet et al. 2007) for m >= 128; both engines
# evaluate the identical double literals, so the product is bit-stable
HLL_ALPHA_EXPR = "0.7213/(1.0+1.079/256.0)"


def _hll_registers(texts: pd.Series) -> np.ndarray:
    """256 register maxima of a batch (exact integers).

    rho = rank of the leftmost 1-bit in the low 23 hash bits (24 when
    they're all zero).  Bit length via ``np.frexp`` exponents — exact for
    integers < 2^53 and C-vectorized — mirroring DuckDB's
    ``length(bin(w))`` string idiom bit-for-bit."""
    u = _token_hashes(texts)
    regs = np.zeros(HLL_M, dtype=np.int64)
    if len(u):
        j = u >> HLL_WBITS
        w = u & (HLL_WMOD - 1)
        rho = (HLL_WBITS + 1) - np.frexp(w.astype(np.float64))[1]
        np.maximum.at(regs, j, rho.astype(np.int64))
    return regs


def hll_distinct(docs: ray.data.Dataset) -> pd.DataFrame:
    """One row (m, nonzero_registers, register_sum, est_distinct): HLL
    estimate of the number of distinct tokens in ``docs.text`` — the same
    distinct-token universe and mixed uniform hash as ``kmv_distinct``,
    so the two sketches cross-validate.  ``register_sum`` is an exact
    integer fingerprint of the full register state (any engine diff shows
    up there before it shows in the estimate).

    Estimator: raw E = alpha_m * m^2 / sum(2^-rho); the small-range
    linear-counting branch (E <= 2.5m with empty registers) is
    m*ln(m/V).  All floats are IEEE-exact-reproducible in DuckDB: each
    2^-rho is dyadic, their sum (< 256, granularity 2^-24) fits a double
    mantissa exactly, and both engines parse the identical alpha
    literals, so the branch decision and the floor agree bit-for-bit
    (ln only runs in the small-V regime where its argument is one of 256
    rationals — still identical inputs on both sides)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_registers(df["text"])
        nz = np.flatnonzero(regs)
        return pd.DataFrame({"j": nz, "rho": regs[nz]})

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    regs = np.zeros(HLL_M, dtype=np.int64)
    if len(parts):
        np.maximum.at(
            regs,
            parts["j"].to_numpy(np.int64),
            parts["rho"].to_numpy(np.int64),
        )
    v = int(np.count_nonzero(regs == 0))
    s = float(np.sum(np.ldexp(1.0, -regs)))  # exact dyadic sum
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    e_raw = alpha * HLL_M * HLL_M / s
    if e_raw <= 2.5 * HLL_M and v > 0:
        est = int(np.floor(HLL_M * np.log(HLL_M / v)))
    else:
        est = int(np.floor(e_raw))
    return pd.DataFrame(
        {
            "m": np.array([HLL_M], dtype=np.int64),
            "nonzero_registers": np.array([HLL_M - v], dtype=np.int64),
            "register_sum": np.array([int(regs.sum())], dtype=np.int64),
            "est_distinct": np.array([est], dtype=np.int64),
        }
    )


def hll_distinct_sql(doc_table: str = "documents") -> str:
    """DuckDB mirror: same token regex/hash/mix, rank via the exact
    ``length(bin(w))`` string idiom, identical float literals."""
    tok_hash = sql_token_hash_expr("t")
    rmax = HLL_WBITS + 1
    e_raw = (
        f"({HLL_ALPHA_EXPR}) * {HLL_M}.0 * {HLL_M}.0 / "
        f"(CAST({HLL_M} - nz AS DOUBLE) + COALESCE(s_nz, 0.0))"
    )
    return f"""
WITH hll_th AS MATERIALIZED (
    SELECT {tok_hash} AS h
    FROM {doc_table}, unnest(regexp_extract_all(text, '\\S+')) AS u(t)
),
hll_toks AS (
    SELECT DISTINCT (((h * h) % {M}) * {KMV_C1} % {M}
                     + (h * {KMV_C2}) % {M} + {KMV_C3}) % {M} AS h
    FROM hll_th
),
hll_regs AS (
    SELECT h // {HLL_WMOD} AS j,
           max(CASE WHEN h % {HLL_WMOD} = 0 THEN {rmax}
               ELSE {rmax} - length(bin(h % {HLL_WMOD})) END) AS rho
    FROM hll_toks GROUP BY 1
),
hll_agg AS (
    SELECT count(*) AS nz,
           COALESCE(sum(rho), 0) AS rsum,
           sum(pow(2.0, -rho)) AS s_nz
    FROM hll_regs
)
SELECT CAST({HLL_M} AS BIGINT) AS m,
       CAST(nz AS BIGINT) AS nonzero_registers,
       CAST(rsum AS BIGINT) AS register_sum,
       CAST(CASE WHEN {e_raw} <= {2.5 * HLL_M} AND nz < {HLL_M}
            THEN floor({HLL_M}.0 * ln({HLL_M}.0 / ({HLL_M} - nz)))
            ELSE floor({e_raw}) END AS BIGINT) AS est_distinct
FROM hll_agg"""


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


# ---------------------------------------------------------------------------
# Count-min sketch: hot-key (heavy-hitter) detection over an edge stream.
#
# The engine's hub handling (salted splits for high fan-in vertices,
# graph/engine.py) needs to KNOW the hot keys before it partitions; an exact
# per-key count is a full all-to-all groupby over every edge.  A count-min
# sketch is the linear-sketch answer: a depth x width int64 counter array
# where every occurrence increments one counter per row.  Linearity is the
# whole point — per-batch partial sketches merge by elementwise ADDITION, so
# the result is independent of batch boundaries and reduction order, and a
# block contributes at most depth*width counters no matter how many rows it
# holds.  Estimates only ever OVER-count (min over depth rows of colliding
# sums), so a >= threshold scan never misses a true heavy hitter.
#
# Reference analog: WebGraph hard-codes its hub set implicitly (one visit's
# graph fits in pandas); at 10^12 edges hot-key discovery must be a
# streaming pre-pass, which is exactly this sketch.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 4096
# (a, b) per row: a*g + b stays < 2^62 for g < M, exact in int64 on both
# engines (same argument as the affine sample hash above).
CMS_PARAMS = (
    (1_664_525, 1_013_904_223),
    (22_695_477, 1),
    (747_796_405, 743_852_806),
    (1_103_515_245, 12_345),
)


def _cms_buckets(g: np.ndarray, j: int, width: int) -> np.ndarray:
    a, b = CMS_PARAMS[j]
    return ((a * g + b) % M) % width


def _hash_keys_cms(keys: list) -> np.ndarray:
    """Key hash tolerant of empty strings: hash_token_list's reduceat
    segments require non-empty tokens (its \\S+ precondition), while the
    SQL mirror computes 0 for '' — match that explicitly."""
    out = np.zeros(len(keys), dtype=np.int64)
    nonempty = [i for i, k in enumerate(keys) if k]
    if nonempty:
        out[nonempty] = hash_token_list([keys[i] for i in nonempty])
    return out


def cms_hot_keys(
    edges: "ray.data.Dataset",
    key_col: str = "dst_key",
    width: int = CMS_WIDTH,
    min_count: int = 500,
) -> pd.DataFrame:
    """Keys of ``key_col`` whose count-min estimate is >= ``min_count``
    (superset of the true heavy hitters), with their estimates.

    Two passes, neither materializing per-key counts globally:

    1. sketch: ``map_batches`` emits each block's nonzero CMS counters
       (<= depth*width rows/block); the driver streams the partials and
       elementwise-adds them into one (depth, width) array — the same
       bounded-partial reduction as ``cluster.kmeans_clusters``.
    2. probe: distinct keys (``bucket_distinct`` — map-side combine, one
       bucket shuffle) are estimated against the broadcast sketch
       (``ray.put`` once, plasma-local in every task) and filtered.

    At production scale the probe set would come from candidate generation
    (e.g. per-block local top-C) instead of a full distinct — the sketch
    itself never changes; the full-distinct probe here is what makes the
    DuckDB mirror exact.

    Key hashing uses the shared capped polynomial token hash, so the SQL
    mirror reuses ``sql_token_hash_expr``; hash collisions (same g for two
    keys) only inflate estimates identically on both engines."""
    from webgraph_ray.functions.shuffle import bucket_distinct

    keys_only = edges.select_columns([key_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = _hash_keys_cms(df[key_col].tolist())
        js, buckets, counts = [], [], []
        for j in range(CMS_DEPTH):
            cnt = np.bincount(_cms_buckets(g, j, width), minlength=width)
            nz = np.nonzero(cnt)[0]
            js.append(np.full(len(nz), j, dtype=np.int64))
            buckets.append(nz.astype(np.int64))
            counts.append(cnt[nz].astype(np.int64))
        return pd.DataFrame(
            {
                "j": np.concatenate(js) if js else np.empty(0, np.int64),
                "bucket": np.concatenate(buckets) if buckets else np.empty(0, np.int64),
                "cnt": np.concatenate(counts) if counts else np.empty(0, np.int64),
            }
        )

    cms = np.zeros((CMS_DEPTH, width), dtype=np.int64)
    for part in keys_only.map_batches(partial, batch_format="pandas").iter_batches(
        batch_format="pandas", batch_size=None
    ):
        np.add.at(cms, (part["j"].to_numpy(np.int64), part["bucket"].to_numpy(np.int64)),
                  part["cnt"].to_numpy(np.int64))

    import ray as _ray

    cms_ref = _ray.put(cms)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        sk = _ray.get(cms_ref)
        g = _hash_keys_cms(df[key_col].tolist())
        est = np.minimum.reduce(
            [sk[j][_cms_buckets(g, j, width)] for j in range(CMS_DEPTH)]
        ) if len(g) else np.empty(0, np.int64)
        out = pd.DataFrame({"vertex_key": df[key_col].to_numpy(), "est_count": est})
        return out[out["est_count"] >= min_count]

    hot = (
        bucket_distinct(keys_only, [key_col])
        .map_batches(estimate, batch_format="pandas")
        .to_pandas()
    )
    if hot.empty:
        # typed empty frame (an all-filtered Ray result can lose columns)
        hot = pd.DataFrame(
            {
                "vertex_key": pd.Series([], dtype=object),
                "est_count": pd.Series([], dtype=np.int64),
            }
        )
    return hot.sort_values(
        ["est_count", "vertex_key"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def cms_hot_keys_sql(
    edges_cte: str,
    key_col: str = "dst_key",
    width: int = CMS_WIDTH,
    min_count: int = 500,
) -> str:
    """DuckDB mirror: same key hash, same per-row affine bucket maps, same
    integer counter sums, same min-over-rows estimator and threshold.
    ``edges_cte`` must be a complete WITH clause defining ``edges``."""
    vals = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(CMS_PARAMS))
    ghash = sql_token_hash_expr(key_col)
    return f"""{edges_cte}, occ AS MATERIALIZED (
    SELECT {key_col} AS key, {ghash} AS g FROM edges
),
params(j, a, b) AS (VALUES {vals}),
cms AS (
    SELECT j, ((a * g + b) % {M}) % {width} AS bucket,
           CAST(count(*) AS BIGINT) AS c
    FROM occ, params GROUP BY 1, 2
),
probes AS (SELECT DISTINCT key, g FROM occ)
SELECT key AS vertex_key, CAST(min(c.c) AS BIGINT) AS est_count
FROM probes p
CROSS JOIN params pr
JOIN cms c ON c.j = pr.j AND c.bucket = ((pr.a * p.g + pr.b) % {M}) % {width}
GROUP BY 1
HAVING min(c.c) >= {min_count}
ORDER BY est_count DESC, vertex_key"""


# ---------------------------------------------------------------------------
# Bloom filter — the mergeable MEMBERSHIP sketch (vs KMV/HLL's cardinality
# estimates): "have we seen this token/url before?" is the primitive a
# 100-TB crawl dedup front-end asks billions of times, and an exact seen-set
# (an all-to-all shuffle of every distinct key) cannot afford.  The filter is
# a fixed m-bit bitmap; per-block partials are the block's set-bit positions
# (bounded by m regardless of data volume) and partials merge by bitwise OR
# (here: union of position sets) — associative/commutative like the HLL
# register max, so the reduce tree shape doesn't matter and the driver sees
# at most m positions total (~1 MB at m = 2^20).
#
# Same distinct-token universe and uniform mix as KMV/HLL so the three
# sketches cross-validate; k probe positions per element via double hashing
# pos_i = (u + i*g) mod m with stride g = mix2(u) mod (m-1) + 1 (m prime =>
# every stride cycles the full table).  All intermediates < 2^62, so numpy
# int64 and DuckDB BIGINT agree bit-for-bit.
#
# Reference analog: the closest thing the reference has is pandas
# ``isin``-style exact membership inside one process; this is the scale
# path.  Bloom 1970; sizing/estimator formulas are the textbook ones
# (Broder & Mitzenmacher 2004 survey).
# ---------------------------------------------------------------------------

BLOOM_M = 1_048_573          # prime near 2^20: full-cycle double-hash strides
BLOOM_K = 4                  # probes per element
BLOOM_PROBES = 64            # absent-key probes for the fp-rate demo row
# second-mix constants for the stride hash (xxhash/Murmur-style odd primes)
BLOOM_C4 = 2_246_822_519 % M
BLOOM_C5 = 3_266_489_917 % M


def _bloom_positions(u: np.ndarray) -> np.ndarray:
    """(n, k) probe positions of mixed hashes ``u`` (int64, exact).

    u < 2^31 and BLOOM_C4 < 2^31 keep u*C4 < 2^62; i*g < 4*2^20 — every
    term exact in int64 on both engines."""
    g = ((u * BLOOM_C4 + BLOOM_C5) % M) % (BLOOM_M - 1) + 1
    i = np.arange(BLOOM_K, dtype=np.int64)
    return ((u % BLOOM_M)[:, None] + i[None, :] * g[:, None]) % BLOOM_M


def bloom_seen(docs: ray.data.Dataset) -> pd.DataFrame:
    """One row (m, k, n_set_bits, bit_sum, est_distinct, fp_probes_hit):
    Bloom filter over the distinct-token universe of ``docs.text``.

    - ``n_set_bits`` / ``bit_sum`` (sum of set positions): exact integer
      fingerprints of the full bitmap state — any engine divergence shows
      up there before it shows in the estimate.
    - ``est_distinct``: the standard occupancy inversion
      floor((m/k) * ln(m / (m - X))) with X = n_set_bits; the ln argument
      is one of m rationals computed identically on both engines (same
      IEEE division, same literal m/k = 262143.25), mirroring the HLL
      linear-counting precedent; -1 if the filter ever saturates.
    - ``fp_probes_hit``: of BLOOM_PROBES keys drawn from a disjoint
      namespace ('bloomprobe#i', never corpus tokens), how many the filter
      (falsely) reports present — the measured false-positive demo the
      membership guarantee is about.  No-false-negative is pytest-pinned.
    """
    import math

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = _token_hashes(df["text"])
        if not len(u):
            return pd.DataFrame({"p": np.empty(0, dtype=np.int64)})
        return pd.DataFrame({"p": np.unique(_bloom_positions(u))})

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    bits = (
        np.unique(parts["p"].to_numpy(np.int64))
        if len(parts)
        else np.empty(0, dtype=np.int64)
    )
    x = int(len(bits))
    probes = [f"bloomprobe#{i}" for i in range(BLOOM_PROBES)]
    ppos = _bloom_positions(_kmv_mix(hash_token_list(probes)))
    hits = int(np.isin(ppos, bits).all(axis=1).sum())
    if x >= BLOOM_M:
        est = -1
    else:
        est = int(
            math.floor((BLOOM_M / BLOOM_K) * math.log(BLOOM_M / (BLOOM_M - x)))
        )
    return pd.DataFrame(
        {
            "m": np.array([BLOOM_M], dtype=np.int64),
            "k": np.array([BLOOM_K], dtype=np.int64),
            "n_set_bits": np.array([x], dtype=np.int64),
            "bit_sum": np.array([int(bits.sum())], dtype=np.int64),
            "est_distinct": np.array([est], dtype=np.int64),
            "fp_probes_hit": np.array([hits], dtype=np.int64),
        }
    )


def bloom_seen_sql(doc_table: str = "documents") -> str:
    """DuckDB mirror: same token regex/hash/mix, same double-hash probe
    positions, same occupancy-inversion estimator with identical float
    literals; absent-key probes built from the same literal namespace."""
    tok_hash = sql_token_hash_expr("t")
    mix = (
        f"(((h * h) % {M}) * {KMV_C1} % {M}"
        f" + (h * {KMV_C2}) % {M} + {KMV_C3}) % {M}"
    )
    stride = f"((u * {BLOOM_C4} + {BLOOM_C5}) % {M}) % {BLOOM_M - 1} + 1"
    probe_idx = "[" + ", ".join(str(i) for i in range(BLOOM_K)) + "]"
    e_est = (
        f"floor({BLOOM_M / BLOOM_K!r} * "
        f"ln(CAST({BLOOM_M} AS DOUBLE) / ({BLOOM_M} - x)))"
    )
    return f"""
WITH bl_th AS MATERIALIZED (
    SELECT {tok_hash} AS h
    FROM {doc_table}, unnest(regexp_extract_all(text, '\\S+')) AS un(t)
),
bl_mix AS (
    SELECT DISTINCT {mix} AS u FROM bl_th
),
bl_pos AS MATERIALIZED (
    SELECT DISTINCT (u % {BLOOM_M} + i * ({stride})) % {BLOOM_M} AS p
    FROM bl_mix, unnest({probe_idx}) AS pk(i)
),
bl_probe AS (
    SELECT {mix} AS u FROM (
        SELECT {tok_hash} AS h
        FROM (SELECT 'bloomprobe#' || CAST(r.i AS VARCHAR) AS t
              FROM range({BLOOM_PROBES}) r(i))
    )
),
bl_fp AS (
    SELECT count(*) AS hits FROM bl_probe pr
    WHERE NOT EXISTS (
        SELECT 1 FROM unnest({probe_idx}) AS pk(i)
        WHERE (pr.u % {BLOOM_M} + pk.i *
               ((pr.u * {BLOOM_C4} + {BLOOM_C5}) % {M} % {BLOOM_M - 1} + 1))
              % {BLOOM_M}
              NOT IN (SELECT p FROM bl_pos)
    )
),
bl_agg AS (
    SELECT count(*) AS x, COALESCE(sum(p), 0) AS psum FROM bl_pos
)
SELECT CAST({BLOOM_M} AS BIGINT) AS m,
       CAST({BLOOM_K} AS BIGINT) AS k,
       CAST(x AS BIGINT) AS n_set_bits,
       CAST(psum AS BIGINT) AS bit_sum,
       CAST(CASE WHEN x >= {BLOOM_M} THEN -1 ELSE {e_est} END AS BIGINT)
           AS est_distinct,
       CAST((SELECT hits FROM bl_fp) AS BIGINT) AS fp_probes_hit
FROM bl_agg"""


# ---------------------------------------------------------------------------
# log-bucket quantile sketch: the mergeable-quantile path for UNBOUNDED
# value domains (windows.value_quantiles is exact but only feasible when
# the distinct-value domain is bounded — its own docstring defers to "a
# sketch" otherwise; this is that sketch).  Per-block partials are
# (event_type, bucket, count) with bucket = bit_length(cents), at most
# ~66 rows per type per block at ANY data size, merged by addition; the
# q-quantile estimate is the lower bound of the bucket containing the
# ceil(q*n)-th value — a guaranteed 2x-range bracket of the exact
# discrete quantile.  Everything is exact integer arithmetic, so the
# DuckDB mirror is bit-identical.
# ---------------------------------------------------------------------------

LBQ_QUANTILES = (25, 50, 75, 90, 99)


def lbq_bucket(cents: np.ndarray) -> np.ndarray:
    """bit_length bucketing kernel: -1 for negative cents, 0 for zero,
    else bit_length(cents) — via frexp exponents (exact for |c| < 2^53,
    the same idiom as the HLL rank and SQL's length(bin(cents)))."""
    c = np.asarray(cents, dtype=np.int64)
    pos = np.maximum(c, 1).astype(np.float64)
    blen = np.frexp(pos)[1]
    return np.where(c < 0, -1, np.where(c == 0, 0, blen)).astype(np.int64)


def logbucket_quantiles(
    events: "ray.data.Dataset",
    quantiles: tuple[int, ...] = LBQ_QUANTILES,
) -> pd.DataFrame:
    """(event_type, quantile_pct, bucket, est_lo_cents) per event type:
    mergeable approximate quantiles over the half-up cent values (the
    shared windows convention).  bucket = -1 for negative cents, 0 for
    zero, else bit_length(cents); est_lo_cents = the bucket's lower
    bound (the estimate's guarantee: est_lo <= exact quantile <
    2*est_lo for positive buckets, pinned in tests/test_lbq.py)."""
    from webgraph_ray.stages.windows import _cents

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = lbq_bucket(_cents(df["value"]))
        g = (
            pd.DataFrame({"event_type": df["event_type"].astype(str), "bucket": b})
            .groupby(["event_type", "bucket"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    parts = (
        events.select_columns(["event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    rows = []
    if len(parts):
        h = (
            parts.groupby(["event_type", "bucket"], sort=True)["cnt"]
            .sum()
            .reset_index()
        )
        for et, grp in h.groupby("event_type", sort=True):
            grp = grp.sort_values("bucket", kind="mergesort")
            cnt = grp["cnt"].to_numpy(np.int64)
            buckets = grp["bucket"].to_numpy(np.int64)
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            for pct in quantiles:
                rank = (n * int(pct) + 99) // 100
                b = int(buckets[int(np.searchsorted(cum, rank))])
                lo = -1 if b == -1 else (0 if b == 0 else 1 << (b - 1))
                rows.append((et, int(pct), b, lo))
    return pd.DataFrame(
        rows, columns=["event_type", "quantile_pct", "bucket", "est_lo_cents"]
    ).astype(
        {
            "quantile_pct": np.int64,
            "bucket": np.int64,
            "est_lo_cents": np.int64,
        }
    )


def logbucket_quantiles_sql(
    quantiles: tuple[int, ...] = LBQ_QUANTILES, table: str = "events"
) -> str:
    """DuckDB mirror: same half-up cents, length(bin()) bucket, exact
    integer ceil-rank pick, identical lower-bound arithmetic."""
    qlist = "[" + ", ".join(str(int(q)) for q in quantiles) + "]"
    return f"""
WITH lbq_c AS (
    SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM {table}
),
lbq_h AS (
    SELECT event_type,
           CASE WHEN cents < 0 THEN -1 WHEN cents = 0 THEN 0
                ELSE length(bin(cents)) END AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lbq_c GROUP BY 1, 2
),
lbq_cum AS (
    SELECT event_type, bucket,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
           SUM(cnt) OVER (PARTITION BY event_type) AS n
    FROM lbq_h
),
lbq_pick AS (
    SELECT c.event_type, q.quantile_pct, MIN(c.bucket) AS bucket
    FROM lbq_cum c CROSS JOIN (SELECT unnest({qlist}) AS quantile_pct) q
    WHERE c.cum >= (c.n * q.quantile_pct + 99) // 100
    GROUP BY 1, 2
)
SELECT event_type,
       CAST(quantile_pct AS BIGINT) AS quantile_pct,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(CASE WHEN bucket = -1 THEN -1 WHEN bucket = 0 THEN 0
            ELSE (CAST(1 AS BIGINT) << CAST(bucket - 1 AS INT)) END
            AS BIGINT) AS est_lo_cents
FROM lbq_pick
ORDER BY event_type, quantile_pct"""


# ---------------------------------------------------------------------------
# Capped-proportional data-mixing weights — the pretraining mixture step:
# given per-source document counts, sample sources proportionally but cap
# any one source at cap_factor x the uniform share (the UniMax idea,
# Chung et al. 2023: head sources stop growing, tail sources keep their
# natural proportion).  Everything is exact integer floor arithmetic so
# the DuckDB mirror is bit-identical.  Scale shape: per-batch (source,
# count) partials collapse driver-side (the distinct-source table IS the
# result and is mixture-k sized); the corpus is scanned once with only
# the source column read.
# Reference analog: none (WebGraph has no corpus mixing); sibling of the
# quality/curation family in the LLM-data surface.
# ---------------------------------------------------------------------------

MIXING_SCALE = 10**9
MIXING_CAP_FACTOR = 2


def mixing_weights(
    docs: ray.data.Dataset,
    cap_factor: int = MIXING_CAP_FACTOR,
    scale: int = MIXING_SCALE,
) -> pd.DataFrame:
    """(source, n_docs, capped, weight_fp) per distinct source.

    cap = (cap_factor * total_docs) // n_sources; capped = min(count,
    cap); weight_fp = (scale * capped) // sum(capped).  All Python-int
    arithmetic (counts can exceed int64 products at design scale), each
    floor mirrored by DuckDB ``//`` over HUGEINT."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).size().rename("c").reset_index()
        return g

    parts = (
        docs.select_columns(["source"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "capped": pd.Series([], dtype=np.int64),
                "weight_fp": pd.Series([], dtype=np.int64),
            }
        )
    agg = parts.groupby("source", sort=True)["c"].sum().reset_index()
    k = len(agg)
    total = int(agg["c"].sum())
    cap = (cap_factor * total) // k
    counts = [int(c) for c in agg["c"]]
    capped = [min(c, cap) for c in counts]
    t = sum(capped)
    w = [(scale * c) // t for c in capped]
    return pd.DataFrame(
        {
            "source": agg["source"].to_numpy(object),
            "n_docs": np.array(counts, dtype=np.int64),
            "capped": np.array(capped, dtype=np.int64),
            "weight_fp": np.array(w, dtype=np.int64),
        }
    )


def mixing_weights_sql(
    cap_factor: int = MIXING_CAP_FACTOR,
    scale: int = MIXING_SCALE,
    doc_table: str = "documents",
) -> str:
    """DuckDB mirror: identical cap / floor-divide chain over HUGEINT."""
    return f"""
WITH mx_src AS (
    SELECT source, count(*) AS c FROM {doc_table} GROUP BY 1
),
mx_cap AS (
    SELECT ({cap_factor} * sum(c)) // count(*) AS cap FROM mx_src
),
mx_cpd AS (
    SELECT source, c, least(c, (SELECT cap FROM mx_cap)) AS cc FROM mx_src
),
mx_t AS (SELECT sum(cc) AS t FROM mx_cpd)
SELECT source,
       CAST(c AS BIGINT) AS n_docs,
       CAST(cc AS BIGINT) AS capped,
       CAST((CAST({scale} AS HUGEINT) * cc) // (SELECT t FROM mx_t)
            AS BIGINT) AS weight_fp
FROM mx_cpd
ORDER BY source"""


# ---------------------------------------------------------------------------
# Per-source token-distribution drift — corpus monitoring for pretraining
# mixtures: the exact total-variation distance between each source's token
# unigram distribution and the whole corpus's,
#
#     TV(s) = 1/2 * sum_g | p_g(s) - q_g |
#
# kept as a single fixed-point floor over arbitrary-precision integers
# (sum_g |sc_g*R - rc_g*S_s| spans ~2*S_s*R, far past int64; Python int /
# HUGEINT on the two engines).  The absent-gram tail (grams the source
# never emits) folds in closed form: S_s*(R - sum_present rc), so the
# scan only touches (gram, source) pairs that exist.  Scale shape: one
# token pass of mergeable (gram, source, cnt) partials, ONE gram-hash
# bucket combine (all sources of a gram land in its bucket, so per-gram
# corpus counts are computed in-group), then a per-batch (source, A, B)
# big-int partial fold — the driver sees #blocks x #sources tiny rows.
# Reference analog: none; sibling of mixing_weights in the mixture-ops
# family.
# ---------------------------------------------------------------------------

DRIFT_SCALE = 10**9


def source_drift(
    docs: ray.data.Dataset,
    scale: int = DRIFT_SCALE,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """(source, n_tokens, tv_fp): exact fixed-point total-variation drift
    of each source's token distribution from the corpus distribution.
    Sources with zero tokens carry no row (TV undefined)."""
    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.shuffle import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(r"\S+")
        n = toks.str.len().to_numpy(np.int64)
        src = np.repeat(df["source"].to_numpy(object), n)
        flat = np.concatenate([np.array(t, dtype=object) for t in toks]) \
            if int(n.sum()) else np.array([], dtype=object)
        t = pd.DataFrame({"gram": flat, "source": src})
        g = (
            t.groupby(["gram", "source"], sort=False)
            .size()
            .rename("sc")
            .reset_index()
        )
        g["__b"] = (
            hash_keys(g["gram"].to_numpy(object)) % num_buckets
        ).astype(np.int32)
        return g

    parts = (
        docs.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pandas")
        .materialize()
    )
    if parts.count() == 0:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_tokens": pd.Series(dtype=np.int64),
                "tv_fp": pd.Series(dtype=np.int64),
            }
        )

    # rc (per-gram corpus count) is attached INSIDE the gram-hash bucket
    # combine — a bucket holds every (gram, source) row of its grams, so
    # each output row is self-contained and any later batching of those
    # rows keeps the big-int fold exact
    def combine_rc(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["gram", "source"], sort=False)["sc"]
            .sum()
            .reset_index()
        )
        rc = agg.groupby("gram", sort=False)["sc"].transform("sum")
        agg["rc"] = rc.to_numpy(np.int64)
        return agg

    sgrc = (
        parts.groupby("__b")
        .map_groups(combine_rc, batch_format="pandas")
        .materialize()
    )

    # tiny scalars: per-source totals and the corpus total
    stot_df = (
        sgrc.map_batches(
            lambda df: df.groupby("source", sort=False)["sc"]
            .sum()
            .reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("source", sort=True)["sc"]
        .sum()
    )
    s_tot = {s: int(v) for s, v in stot_df.items()}
    R = sum(s_tot.values())
    import ray as _ray

    ref = _ray.put(s_tot)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        st = _ray.get(ref)
        rows = {}
        for gram, source, sc, rc in zip(
            df["gram"], df["source"], df["sc"], df["rc"]
        ):
            ss = st[source]
            a, b = rows.get(source, (0, 0))
            rows[source] = (
                a + abs(int(sc) * R - int(rc) * ss),
                b + int(rc),
            )
        return pd.DataFrame(
            {
                "source": list(rows),
                "A": [str(v[0]) for v in rows.values()],
                "B": [str(v[1]) for v in rows.values()],
            }
        )

    folded = sgrc.map_batches(fold, batch_format="pandas").to_pandas()
    out_rows = []
    for source in sorted(s_tot):
        sel = folded[folded["source"] == source]
        A = sum(int(x) for x in sel["A"])
        B = sum(int(x) for x in sel["B"])
        ss = s_tot[source]
        tv = (scale * (A + ss * (R - B))) // (2 * ss * R)
        out_rows.append((source, ss, tv))
    return pd.DataFrame(
        out_rows, columns=["source", "n_tokens", "tv_fp"]
    ).astype({"n_tokens": np.int64, "tv_fp": np.int64})


def source_drift_sql(
    scale: int = DRIFT_SCALE, doc_table: str = "documents"
) -> str:
    """DuckDB mirror: identical big-int TV fold over HUGEINT."""
    return f"""
WITH dr_toks AS MATERIALIZED (
    SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS t
    FROM {doc_table}
),
dr_sg AS MATERIALIZED (
    SELECT source, t, count(*) AS sc FROM dr_toks GROUP BY 1, 2
),
dr_gc AS (SELECT t, sum(sc) AS rc FROM dr_sg GROUP BY 1),
dr_ss AS (SELECT source, sum(sc) AS s_tot FROM dr_sg GROUP BY 1),
dr_tot AS (SELECT sum(sc) AS R FROM dr_sg),
dr_a AS (
    SELECT sg.source,
           sum(abs(CAST(sg.sc AS HUGEINT) * tot.R
                   - CAST(gc.rc AS HUGEINT) * ss.s_tot)) AS A,
           sum(gc.rc) AS B
    FROM dr_sg sg
    JOIN dr_gc gc ON gc.t = sg.t
    JOIN dr_ss ss ON ss.source = sg.source
    CROSS JOIN dr_tot tot
    GROUP BY 1
)
SELECT a.source,
       CAST(ss.s_tot AS BIGINT) AS n_tokens,
       CAST((CAST({scale} AS HUGEINT)
             * (a.A + ss.s_tot * (tot.R - a.B)))
            // (2 * CAST(ss.s_tot AS HUGEINT) * tot.R) AS BIGINT) AS tv_fp
FROM dr_a a
JOIN dr_ss ss ON ss.source = a.source
CROSS JOIN dr_tot tot
ORDER BY a.source"""
