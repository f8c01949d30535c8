"""Product quantization (PQ) ANN — the compressed-vector scale path.

At 100 TB an embedding column cannot be rescanned per query; PQ stores an
m-byte code per vector (here m=8 subspaces x 256 codes, 1 byte/code =
8-byte codes vs 512 for the raw float64[64]) and answers queries with an
asymmetric-distance (ADC) scan over the codes.  Everything is exact int64 fixed-point so a
DuckDB oracle mirrors it bit-for-bit:

- training: per-subspace Lloyd, SAME arithmetic as `stages/cluster.py`
  (floor fixed-point scaling, int64 d2, ties to the smaller code,
  truncating-division updates, empty codes keep previous centroids) —
  but ONE streaming pass per iteration updates ALL m codebooks at once
  (per-batch partials are m*k*sub rows regardless of batch size, reduced
  by exact addition on the driver: the mergeable-partials pattern);
- encode: one pass emits each vector's m codes;
- probe: the per-query (m x k) distance LUT is computed on the driver
  from the raw query vectors and broadcast; the code scan is a numpy
  gather+sum per batch with per-batch partial top-k (smallest ADC
  distance, ties to the smaller vec_id), merged once on the driver.

Reference analog: none (WebGraph has no vector search); sibling of the
LSH (`stages/embed.py`) and IVF (`stages/cluster.py`) scale paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.stages.cluster import (
    EMB_DIM,
    KMEANS_BATCH_ROWS,
    SCALE,
    _assign_ids,
    _scaled_matrix,
    _trunc_div,
)

PQ_M = 8  # subspaces
PQ_K = 256  # codes per subspace (standard PQ: one byte per code)
PQ_ITERS = 2  # Lloyd rounds per subspace


def _matrix(t: pa.Table, col: str = "embedding", prescaled: bool = False) -> np.ndarray:
    """Batch -> int64 scaled matrix.  ``prescaled`` reads an int64
    fixed-size-list column as-is (the IVF-PQ residual path); otherwise the
    float embedding column goes through the shared floor fixed-point
    scaling."""
    if not prescaled:
        return _scaled_matrix(t)
    arr = t[col].combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat.reshape(len(t), arr.type.list_size)


def _init_rows(
    ds: ray.data.Dataset, k: int, col: str, prescaled: bool
) -> np.ndarray:
    """Scaled vectors of the k smallest vec_ids (per-batch partial min-k,
    no global sort) — cluster._init_centroids generalized to any column."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.argsort(ids, kind="stable")[:k]
        return t.select(["vec_id", col]).take(pa.array(keep))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values("vec_id", kind="mergesort").head(k)
    M = np.stack(parts[col].to_numpy())
    if prescaled:
        return M.astype(np.int64)
    return np.floor(M.astype(np.float64) * SCALE).astype(np.int64)


def pq_fit(
    embeddings: ray.data.Dataset,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
    col: str = "embedding",
    prescaled: bool = False,
) -> np.ndarray:
    """Train m codebooks; returns int64 (m, k, dim//m).  One streaming
    pass per iteration covers every subspace.  ``col``/``prescaled``
    select the input column (float embeddings by default; int64 residual
    lists for IVF-PQ)."""
    assert dim % m == 0, (dim, m)
    sub = dim // m
    init = _init_rows(embeddings, k, col, prescaled)  # (k, dim) scaled rows
    C = np.stack([init[:, j * sub : (j + 1) * sub] for j in range(m)])

    for _ in range(iters):
        ref = ray.put(C)

        def partial_sums(t: pa.Table) -> pa.Table:
            Ct = ray.get(ref)  # (m, k, sub)
            mm, kk, ss = Ct.shape
            if len(t) == 0:
                empty = pa.array([], pa.int64())
                return pa.table(
                    {"sub": empty, "cid": empty, "dim": empty, "s": empty, "n": empty}
                )
            X = _matrix(t, col, prescaled)
            subs, cids, dims, sums, ns = [], [], [], [], []
            for j in range(mm):
                Xj = X[:, j * ss : (j + 1) * ss]
                a = _assign_ids(Xj, Ct[j])
                S = np.zeros((kk, ss), dtype=np.int64)
                np.add.at(S, a, Xj)
                counts = np.bincount(a, minlength=kk).astype(np.int64)
                subs.append(np.full(kk * ss, j, np.int64))
                cids.append(np.repeat(np.arange(kk, dtype=np.int64), ss))
                dims.append(np.tile(np.arange(ss, dtype=np.int64), kk))
                sums.append(S.reshape(-1))
                ns.append(np.repeat(counts, ss))
            return pa.table(
                {
                    "sub": pa.array(np.concatenate(subs)),
                    "cid": pa.array(np.concatenate(cids)),
                    "dim": pa.array(np.concatenate(dims)),
                    "s": pa.array(np.concatenate(sums)),
                    "n": pa.array(np.concatenate(ns)),
                }
            )

        parts = embeddings.map_batches(
            partial_sums,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=KMEANS_BATCH_ROWS,
        ).to_pandas()
        agg = (
            parts.groupby(["sub", "cid", "dim"], sort=True)[["s", "n"]]
            .sum()
            .reset_index()
        )
        newC = C.copy()
        for (j, cid), grp in agg.groupby(["sub", "cid"], sort=True):
            n = int(grp["n"].iloc[0])
            if n > 0:
                newC[int(j), int(cid)] = _trunc_div(
                    grp.sort_values("dim")["s"].to_numpy(np.int64), np.int64(n)
                )
        C = newC
    return C


def _encode(
    embeddings: ray.data.Dataset,
    C: np.ndarray,
    col: str = "embedding",
    prescaled: bool = False,
) -> ray.data.Dataset:
    """(vec_id, codes fixed-size list<int64> of length m)."""
    ref = ray.put(C)
    m, _, sub = C.shape

    def enc(t: pa.Table) -> pa.Table:
        Ct = ray.get(ref)
        if len(t) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "codes": pa.array([], pa.list_(pa.int64(), Ct.shape[0])),
                }
            )
        X = _matrix(t, col, prescaled)
        codes = np.stack(
            [
                _assign_ids(X[:, j * sub : (j + 1) * sub], Ct[j])
                for j in range(Ct.shape[0])
            ],
            axis=1,
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.int64()), Ct.shape[0]
                ),
            }
        )

    return embeddings.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_codes(
    embeddings: ray.data.Dataset,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> ray.data.Dataset:
    """Long-format codes (vec_id, subspace, code) — the stored index."""
    C = pq_fit(embeddings, m=m, k=k, iters=iters)
    enc = _encode(embeddings, C)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        codes = t["codes"].combine_chunks()
        flat = codes.values.to_numpy(zero_copy_only=False)
        mm = codes.type.list_size
        return pa.table(
            {
                "vec_id": pa.array(
                    np.repeat(
                        t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                        mm,
                    )
                ),
                "subspace": pa.array(np.tile(np.arange(mm, dtype=np.int64), n)),
                "code": pa.array(flat.astype(np.int64)),
            }
        )

    return enc.map_batches(explode, batch_format="pyarrow")


def pq_ann_topk(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_K,
    iters: int = PQ_ITERS,
) -> pd.DataFrame:
    """ADC top-k: (query_id, rank, neighbor_id) ranked by exact-int64
    approximate distance (sum of per-subspace LUT entries over the
    neighbor's codes), ties to the smaller neighbor_id; the query row
    itself is excluded."""
    C = pq_fit(embeddings, m=m, k=ksub, iters=iters)
    sub = C.shape[2]
    ksub = C.shape[1]  # fewer vectors than codes -> shrunken codebooks

    # raw query vectors (tiny: is_in filter inside map_batches)
    qdf = (
        embeddings.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(
                    t["vec_id"],
                    value_set=pa.array([int(q) for q in query_ids], pa.int64()),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.floor(np.stack(qdf["embedding"].to_numpy()).astype(np.float64) * SCALE).astype(
        np.int64
    )
    qids = qdf["vec_id"].to_numpy(np.int64)
    # LUT[qi, j, c] = ||Q[qi, j] - C[j, c]||^2, exact int64
    lut = np.zeros((len(qids), m, ksub), dtype=np.int64)
    for j in range(m):
        Qj = Q[:, j * sub : (j + 1) * sub]
        diff = Qj[:, None, :] - C[j][None, :, :]
        lut[:, j, :] = (diff * diff).sum(axis=2, dtype=np.int64)
    lut_ref = ray.put((qids, lut))

    enc = _encode(embeddings, C)

    def partial_topk(t: pa.Table) -> pd.DataFrame:
        qids_, lut_ = ray.get(lut_ref)
        if len(t) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "d2": []}
            ).astype(np.int64)
        vec_id = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes_arr = t["codes"].combine_chunks()
        mm = codes_arr.type.list_size
        codes = (
            codes_arr.values.to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .reshape(len(vec_id), mm)
        )
        out = []
        for qi, q in enumerate(qids_):
            d2 = lut_[qi, np.arange(mm)[None, :], codes].sum(
                axis=1, dtype=np.int64
            )
            keep = vec_id != q
            d2k, vk = d2[keep], vec_id[keep]
            order = np.lexsort((vk, d2k))[:k]
            out.append(
                pd.DataFrame(
                    {"query_id": q, "neighbor_id": vk[order], "d2": d2k[order]}
                )
            )
        return pd.concat(out, ignore_index=True)

    parts = enc.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["query_id", "d2", "neighbor_id"], kind="mergesort"
    )
    top = parts.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id", sort=False).cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True).astype(
        np.int64
    )


# ---------------------------------------------------------------------------
# DuckDB oracle
# ---------------------------------------------------------------------------


def _pq_sub_ctes(j: int, sub: int, k: int, iters: int) -> list[str]:
    """Per-subspace unrolled Lloyd chain on the sliced lists (1-based
    inclusive DuckDB slices); mirrors stages/cluster.py arithmetic."""
    lo, hi = j * sub + 1, (j + 1) * sub
    p = f"p{j}"
    ctes = [
        f"""{p}_s AS (
    SELECT vec_id, e[{lo}:{hi}] AS e FROM pq_scaled
)""",
        f"""{p}_cen0 AS (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
           e AS c
    FROM (SELECT vec_id, e FROM {p}_s ORDER BY vec_id LIMIT {k})
)""",
    ]
    for t in range(iters + 1):
        ctes.append(
            f"""{p}_d{t} AS (
    SELECT s.vec_id, c.cid,
           list_sum(list_transform(list_zip(s.e, c.c),
               p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
    FROM {p}_s s CROSS JOIN {p}_cen{t} c
)""",
        )
        ctes.append(
            f"""{p}_a{t} AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM {p}_d{t}) WHERE rn = 1
)"""
        )
        if t == iters:
            break
        ctes.append(
            f"""{p}_s{t} AS (
    SELECT a.cid, r.i AS dim,
           sum(s.e[CAST(r.i AS INT)]) AS sm, count(*) AS n
    FROM {p}_a{t} a JOIN {p}_s s USING (vec_id)
         CROSS JOIN range(1, {sub + 1}) r(i)
    GROUP BY a.cid, r.i
)"""
        )
        ctes.append(
            f"""{p}_cen{t + 1} AS (
    SELECT c0.cid, COALESCE(u.c, c0.c) AS c
    FROM {p}_cen{t} c0 LEFT JOIN (
        SELECT cid, list(sm // n ORDER BY dim) AS c FROM {p}_s{t} GROUP BY cid
    ) u USING (cid)
)"""
        )
    return ctes


def pq_codes_sql(
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
    table: str = "embeddings",
) -> str:
    sub = dim // m
    ctes = [
        f"""pq_scaled AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0) AS BIGINT)) AS e
    FROM {table}
)"""
    ]
    for j in range(m):
        ctes.extend(_pq_sub_ctes(j, sub, k, iters))
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, CAST({j} AS BIGINT) AS subspace, CAST(cid AS BIGINT) AS code FROM p{j}_a{iters}"
        for j in range(m)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def pq_ann_sql(
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_K,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
    table: str = "embeddings",
) -> str:
    sub = dim // m
    ids = "(" + ", ".join(str(int(q)) for q in query_ids) + ")"
    ctes = [
        f"""pq_scaled AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0) AS BIGINT)) AS e
    FROM {table}
)"""
    ]
    for j in range(m):
        ctes.extend(_pq_sub_ctes(j, sub, ksub, iters))
        lo, hi = j * sub + 1, (j + 1) * sub
        ctes.append(
            f"""p{j}_lut AS (
    SELECT q.vec_id AS query_id, c.cid,
           list_sum(list_transform(list_zip(q.e[{lo}:{hi}], c.c),
               p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
    FROM (SELECT vec_id, e FROM pq_scaled WHERE vec_id IN {ids}) q
         CROSS JOIN p{j}_cen{iters} c
)"""
        )
    codes_union = "\nUNION ALL\n".join(
        f"SELECT vec_id, {j} AS j, cid AS code FROM p{j}_a{iters}"
        for j in range(m)
    )
    lut_union = "\nUNION ALL\n".join(
        f"SELECT query_id, {j} AS j, cid, d2 FROM p{j}_lut" for j in range(m)
    )
    ctes.append(f"pq_codes AS ({codes_union})")
    ctes.append(f"pq_lut AS ({lut_union})")
    ctes.append(
        """pq_ad AS (
    SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.d2) AS d2
    FROM pq_codes c JOIN pq_lut l ON l.j = c.j AND l.cid = c.code
    GROUP BY 1, 2
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
               PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
    FROM pq_ad WHERE neighbor_id <> query_id)
WHERE rank <= {k}"""
    )
