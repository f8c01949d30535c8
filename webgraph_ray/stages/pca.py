"""PCA / dimensionality reduction over the embedding table.

The 100-TB shape of PCA is two streaming passes and one tiny driver
step: (1) a map-side partial-moment pass — each batch contributes its
exact integer count / per-dim sum / d x d Gram over fixed-point
quantized values, reduced on the driver with arbitrary-precision ints
(d*d + d + 1 numbers per block, independent of row count); (2) an
eigendecomposition of the resulting d x d covariance on the driver
(d=64: microseconds); (3) a shuffle-free ``map_batches`` projection of
every vector onto the top components.  No shuffle anywhere; the only
driver materialization is O(blocks * d^2) partial rows.

Correctness contract: the distributed part (the moments) is EXACT —
values are quantized q = floor(float64(x) * 2^20) so every sum is an
integer and the DuckDB mirror (`pca_moments_sql`) reproduces count,
per-dim sums and a Mersenne-prime fingerprint of the full d x d Gram
bit-for-bit.  The driver-side eigendecomposition (not distributed, not
SQL-expressible) is pytest-pinned against a single-shot
``numpy.linalg.eigh`` reference and for determinism across
partitionings (tests/test_pca.py).

Reference analog: the reference fits its classifier on a dense
hand-built feature matrix (/root/reference/code/classification/
classify.py:260-323) with no dimensionality reduction; PCA is the
standard pre-step a 100-TB embedding pipeline needs before clustering
/ dedup (SemDeDup's original recipe PCA-reduces before k-means).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

PCA_SCALE = 1 << 20  # fixed-point quantization: q = floor(x * 2^20)
PCA_FP_MOD = (1 << 61) - 1  # Mersenne prime for moment fingerprints


def pca_moments(
    embeddings: ray.data.Dataset, dim: int = 64
) -> tuple[int, np.ndarray, np.ndarray]:
    """Exact integer moments of the quantized embedding matrix.

    Returns ``(n, s, G)`` with ``s[i] = sum_rows q_i`` (object-dtype
    Python ints, length ``dim``) and ``G[i, j] = sum_rows q_i * q_j``
    (object dtype, ``dim x dim``) where ``q = floor(float64(x) * 2^20)``.
    One streaming pass; per-batch partials are int64-safe (|q| < 2^21
    for |x| < 2, 4096-row batches => |partial| < 2^54)."""
    d = int(dim)

    from webgraph_ray.stages.embed import _matrix

    def partial(t: pa.Table) -> pa.Table:
        x = _matrix(t) if t.num_rows else np.zeros((0, d))
        if x.shape[1] != d:
            raise ValueError(f"expected dim={d}, got {x.shape[1]}")
        q = np.floor(x * PCA_SCALE).astype(np.int64)
        g = q.T @ q  # exact int64 (see bound in docstring)
        return pa.table(
            {
                "n": pa.array([len(q)], pa.int64()),
                "s": pa.array([q.sum(axis=0, dtype=np.int64)]),
                "g": pa.array([g.reshape(-1)]),
            }
        )

    n = 0
    s = np.zeros(d, dtype=object)
    G = np.zeros((d, d), dtype=object)
    for b in (
        embeddings.select_columns(["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for row in range(b.num_rows):
            n += int(b["n"][row].as_py())
            s += np.array([int(v) for v in b["s"][row].as_py()], dtype=object)
            G += np.array(
                [int(v) for v in b["g"][row].as_py()], dtype=object
            ).reshape(d, d)
    return n, s, G


def pca_moment_rows(embeddings: ray.data.Dataset, dim: int = 64) -> pd.DataFrame:
    """Long-format exact-integer gate rows for the moment pass —
    ``(key, value)`` with keys ``n``, ``trace_fp``, ``gram_fp`` and
    ``s{i:02d}_fp`` — every value reproduced bit-for-bit by
    `pca_moments_sql` (mod-P fingerprints so the row survives row
    counts where the raw sums would overflow int64)."""
    d = int(dim)
    P = PCA_FP_MOD
    n, s, G = pca_moments(embeddings, dim=d)
    trace = sum(int(G[i, i]) for i in range(d))
    gram = (
        sum(
            (int(G[i, j]) % P) * (i * d + j + 1)
            for i in range(d)
            for j in range(d)
        )
        % P
    )
    rows = [("n", n), ("trace_fp", trace % P), ("gram_fp", gram)]
    rows += [(f"s{i:02d}_fp", int(s[i]) % P) for i in range(d)]
    return pd.DataFrame(rows, columns=["key", "value"]).astype(
        {"value": np.int64}
    )


def pca_moments_sql(dim: int = 64, table: str = "embeddings") -> str:
    """DuckDB mirror of `pca_moment_rows`: same quantization
    (floor(float64 * 2^20)), same mod-P fingerprints (DuckDB's C-style
    ``%`` is corrected to the non-negative residue to match Python)."""
    d = int(dim)
    P = PCA_FP_MOD
    S = PCA_SCALE
    qv = (
        f"SELECT vec_id, unnest(range({d})) AS i, "
        f"CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {S}.0) AS BIGINT)"
        f" AS q FROM {table}"
    )
    # COALESCE + the range(d) LEFT JOIN keep the mirror's 3 + d row
    # shape (with zero values) on an EMPTY table, matching the Python
    # side exactly
    return f"""
    WITH qv AS ({qv}),
    gm AS (
        SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS gij
        FROM qv a JOIN qv b USING (vec_id) GROUP BY a.i, b.i
    )
    SELECT 'n' AS key, CAST(count(*) AS BIGINT) AS value FROM {table}
    UNION ALL
    SELECT 'trace_fp',
           CAST(((COALESCE(SUM(CAST(q AS HUGEINT) * q), 0) % {P}) + {P})
                % {P} AS BIGINT)
    FROM qv
    UNION ALL
    SELECT 'gram_fp',
           CAST(((COALESCE(SUM(CAST(((gij % {P}) + {P}) % {P} AS HUGEINT)
                               * (i * {d} + j + 1)), 0) % {P}) + {P}) % {P}
                AS BIGINT)
    FROM gm
    UNION ALL
    SELECT 's' || lpad(CAST(dims.i AS VARCHAR), 2, '0') || '_fp',
           CAST(((COALESCE(SUM(CAST(q AS HUGEINT)), 0) % {P}) + {P}) % {P}
                AS BIGINT)
    FROM (SELECT unnest(range({d})) AS i) dims
    LEFT JOIN qv ON qv.i = dims.i
    GROUP BY dims.i
    """


def pca_fit(
    embeddings: ray.data.Dataset, n_components: int = 4, dim: int = 64
) -> dict:
    """Fit PCA from the exact distributed moments: covariance
    ``C = (n*G - s s^T) / (n^2 * SCALE^2)`` assembled from the integer
    moments (so the fit is a pure function of the exact sums —
    deterministic under any partitioning), then ``numpy.linalg.eigh``
    on the tiny d x d matrix.  Sign convention: each component's
    largest-|coordinate| entry is made positive (ties -> lowest index).

    Returns ``{"n", "mean", "components" (d x r, columns = top
    components by descending eigenvalue), "explained_variance" (r,)}``."""
    d, r = int(dim), int(n_components)
    n, s, G = pca_moments(embeddings, dim=d)
    if n == 0:
        raise ValueError("pca_fit: empty embeddings input")
    num = n * G - np.outer(s, s)  # object ints, exact
    C = np.array(
        [[float(num[i, j]) for j in range(d)] for i in range(d)],
        dtype=np.float64,
    ) / (float(n) * float(n) * float(PCA_SCALE) ** 2)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:r]
    comps = V[:, order]
    for c in range(comps.shape[1]):
        j = int(np.argmax(np.abs(comps[:, c])))
        if comps[j, c] < 0:
            comps[:, c] = -comps[:, c]
    mean = np.array([float(int(v)) for v in s], dtype=np.float64) / (
        float(n) * PCA_SCALE
    )
    return {
        "n": n,
        "mean": mean,
        "components": comps,
        "explained_variance": w[order],
        "total_variance": float(np.trace(C)),
    }


def pca_project(
    embeddings: ray.data.Dataset, fit: dict
) -> ray.data.Dataset:
    """Shuffle-free streaming projection: every vector's coordinates in
    the fitted component basis, as columns ``pc0..pc{r-1}`` keyed by
    ``vec_id``.  The (tiny) fit ships to plasma once via the closure."""
    mean = np.asarray(fit["mean"], dtype=np.float64)
    comps = np.asarray(fit["components"], dtype=np.float64)
    r = comps.shape[1]

    from webgraph_ray.stages.embed import _matrix

    def project(t: pa.Table) -> pa.Table:
        x = _matrix(t) if t.num_rows else np.zeros((0, len(mean)))
        sc = (x - mean) @ comps
        cols = {"vec_id": t["vec_id"]}
        for c in range(r):
            cols[f"pc{c}"] = pa.array(sc[:, c], pa.float64())
        return pa.table(cols)

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow"
    )
