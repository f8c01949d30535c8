"""Similarity search over the ``embeddings`` table (``list<float>``).

- ``ann_topk``        brute-force cosine top-k: numpy matmul per batch
                      against a broadcast query matrix (ray.put once),
                      per-batch partial top-k, tiny driver-side merge.
- ``lsh_ann_topk``    the scale path: seeded random-hyperplane buckets;
                      only same-bucket candidates are scored (recall
                      measured in tests against the brute-force oracle).
- ``cosine_dup_pairs``embedding near-duplicate pairs (cosine >= t) via a
                      broadcast normalized matrix at this scale; the LSH
                      bucketing above is the >memory variant.

Batches decode the Arrow ``list<float>`` column via ``flatten()`` +
reshape — no per-row python, and correct under Ray's zero-copy batch
slicing (see ``_matrix``).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    """Chunk-wise list<float> -> (n, dim) float64 matrix.

    Uses ``flatten()``, NOT ``.values``: Ray hands map_batches zero-copy
    Table slices, and ``.values`` on a sliced ListArray returns the FULL
    parent buffer (silently wrong rows); ``flatten()`` respects the slice
    offset."""
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        chunks = arr.chunks
    else:
        chunks = [arr]
    mats = []
    for c in chunks:
        flat = c.flatten().to_numpy(zero_copy_only=False)
        mats.append(flat.reshape(len(c), -1))
    return np.concatenate(mats).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ann_topk(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
) -> pd.DataFrame:
    """(query_id, rank, neighbor_id) — exact cosine top-k, self excluded.
    Deterministic tie-break: higher similarity first, then smaller
    neighbor_id."""
    qtab = embeddings.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["vec_id"], value_set=pa.array(list(query_ids), pa.int64()))
        ),
        batch_format="pyarrow",
    ).to_pandas()
    Q = _normalize(np.stack(qtab["embedding"].to_numpy()).astype(np.float64))
    q_ids = qtab["vec_id"].to_numpy(np.int64)
    q_ref = ray.put((q_ids, Q))

    def partial(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        if len(t) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        m = _normalize(_matrix(t))
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # rank on sims rounded to 9 decimals: DuckDB's list_cosine_similarity
        # and this numpy dot associate floats in different orders (~1e-16
        # divergence), so ranking on raw doubles is fragile for near-tied
        # neighbors; both sides round before ordering (ties -> neighbor_id)
        sims = np.round(m @ qm.T, 9)  # (batch, nq)
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(len(qids)):
            s = sims[:, qi]
            mask = vids != qids[qi]
            v, sv = vids[mask], s[mask]
            top = min(k, len(v))
            # tie-break identical sims by smaller neighbor_id even at the
            # batch-truncation boundary (matches the SQL oracle ordering)
            idx = np.lexsort((v, -sv))[:top]
            rows_q.append(np.full(top, qids[qi], dtype=np.int64))
            rows_v.append(v[idx])
            rows_s.append(sv[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                "neighbor_id": pa.array(np.concatenate(rows_v)),
                "sim": pa.array(np.concatenate(rows_s)),
            }
        )

    parts = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out_rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        out_rows.append(
            pd.DataFrame(
                {
                    "query_id": qid,
                    "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                    "neighbor_id": g["neighbor_id"].to_numpy(np.int64),
                }
            )
        )
    return pd.concat(out_rows, ignore_index=True)


# LSH defaults shared by the index, the queries, and the SQL oracle
LSH_NUM_PLANES = 4
LSH_NUM_TABLES = 8
LSH_SEED = 11
EMB_DIM = 64  # testdata embedding dimensionality (oracle literal planes)


def lsh_planes(
    dim: int,
    num_planes: int = LSH_NUM_PLANES,
    num_tables: int = LSH_NUM_TABLES,
    seed: int = LSH_SEED,
) -> np.ndarray:
    """(tables, dim, planes) deterministic Gaussian hyperplanes — the same
    values are embedded as literals into the DuckDB oracle."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_tables, dim, num_planes))


@dataclass(frozen=True)
class LshIndex:
    """Handle to a bucket-partitioned on-disk LSH index.

    ``path`` holds hive-partitioned parquet (``bucket_key=K/`` directories,
    one per (table, sign-bucket) cell), so a probe opens ONLY the matching
    bucket directories — block pruning, not a row filter over a full scan.
    On a multi-node cluster ``path`` must be shared storage (same contract
    as GraphEngine.work_dir)."""

    path: str
    num_planes: int
    num_tables: int
    seed: int
    dim: int


def build_lsh_index(
    embeddings: ray.data.Dataset,
    num_planes: int = LSH_NUM_PLANES,
    num_tables: int = LSH_NUM_TABLES,
    seed: int = LSH_SEED,
    dim: int | None = None,
    path: str | None = None,
) -> ray.data.Dataset | LshIndex:
    """LSH index: each vector replicated once per table with a
    ``bucket_key = table_id * 2^planes + sign-bucket`` column.  Built ONCE.
    Bucket signs use the RAW embedding (sign is normalization-invariant),
    mirroring the SQL oracle.

    With ``path`` set, the index is persisted as parquet hive-partitioned
    by ``bucket_key`` and an :class:`LshIndex` handle is returned — probes
    then read only the matching bucket directories (the keyed content
    store capability of /root/reference/code/features/structure.py:37-46
    at scale).  Without ``path`` the exploded index is returned as an
    in-object-store Dataset (used by the in-memory near-dup path; probing
    it is a filtered full scan, not block-pruned).

    ``dim`` skips the ``take(1)`` schema probe (which partially executes a
    lazy input); pass it when known."""
    if dim is None:
        first = embeddings.take(1)[0]
        dim = len(first["embedding"])
    planes = lsh_planes(dim, num_planes, num_tables, seed)
    pref = ray.put(planes)
    pw = 1 << np.arange(num_planes)
    with_bk = path is not None  # duplicate data column: the hive write
    # moves bucket_key into directory names, and a pruned read of leaf
    # dirs does not reconstruct it

    def explode(t: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        if len(t) == 0:
            cols = {
                "bucket_key": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "embedding": t["embedding"],
            }
            if with_bk:
                cols["bk"] = pa.array([], pa.int64())
            return pa.table(cols)
        m = _matrix(t)
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for ti in range(len(pl)):
            bucket = ((m @ pl[ti]) > 0) @ pw
            key = (ti * (1 << num_planes) + bucket).astype(np.int64)
            cols = {
                "bucket_key": pa.array(key),
                "vec_id": pa.array(vids),
                "embedding": t["embedding"],
            }
            if with_bk:
                cols["bk"] = pa.array(key)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    exploded = embeddings.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    if path is None:
        return exploded.materialize()
    exploded.write_parquet(path, partition_cols=["bucket_key"])
    return LshIndex(
        path=path,
        num_planes=num_planes,
        num_tables=num_tables,
        seed=seed,
        dim=dim,
    )


def _index_partition_dirs(path: str) -> dict[int, str]:
    return {
        int(name.split("=", 1)[1]): os.path.join(path, name)
        for name in os.listdir(path)
        if name.startswith("bucket_key=")
    }


def _dir_files(dirs) -> list[str]:
    out = []
    for d in dirs:
        for root, _, files in os.walk(d):
            out.extend(os.path.join(root, f) for f in files)
    return out


def lsh_ann_topk(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    num_planes: int = LSH_NUM_PLANES,
    num_tables: int = LSH_NUM_TABLES,
    seed: int = LSH_SEED,
    index: ray.data.Dataset | LshIndex | None = None,
    stats_out: dict | None = None,
) -> pd.DataFrame:
    """Approximate top-k via the multi-table LSH index: a vector is a
    candidate iff it shares a (table, bucket) with the query.

    With an :class:`LshIndex` (or ``index=None``, which builds a temporary
    one), the probe opens ONLY the parquet partition directories matching
    the queries' bucket keys — block-pruned I/O ~ tables * 2^-planes of
    the index, reported via ``stats_out`` as files/bytes read fractions.
    A plain Dataset index (in-memory variant) is probed with a vectorized
    row filter instead, which still scans every index block — pass a
    persisted index for the scale path.  Exact cosine ordering on the
    candidates; deterministic; mirrored by the DuckDB oracle
    (lsh_ann_sql)."""
    qtab = embeddings.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(
                t["vec_id"], value_set=pa.array(list(query_ids), pa.int64())
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    Q = _normalize(np.stack(qtab["embedding"].to_numpy()).astype(np.float64))
    Qraw = np.stack(qtab["embedding"].to_numpy()).astype(np.float64)
    q_ids = qtab["vec_id"].to_numpy(np.int64)
    dim = Q.shape[1]
    planes = lsh_planes(dim, num_planes, num_tables, seed)
    pw = 1 << np.arange(num_planes)
    q_keys = np.stack(
        [
            ti * (1 << num_planes) + (((Qraw @ planes[ti]) > 0) @ pw)
            for ti in range(num_tables)
        ],
        axis=1,
    ).astype(np.int64)  # (nq, tables)
    all_keys = np.unique(q_keys.ravel())

    own_tmp = None
    if index is None:
        own_tmp = tempfile.mkdtemp(prefix="webgraph_lshidx_")
        index = build_lsh_index(
            embeddings,
            num_planes,
            num_tables,
            seed,
            dim=dim,
            path=os.path.join(own_tmp, "idx"),
        )
    try:
        if isinstance(index, LshIndex):
            # block-pruned probe: open only matching bucket_key=K dirs
            dirs = _index_partition_dirs(index.path)
            match = [dirs[k] for k in all_keys.tolist() if k in dirs]
            match_files = _dir_files(match)
            if match_files:
                filtered = ray.data.read_parquet(
                    match_files, columns=["bk", "vec_id", "embedding"]
                )
            else:
                filtered = ray.data.from_arrow(
                    pa.table(
                        {
                            "bk": pa.array([], pa.int64()),
                            "vec_id": pa.array([], pa.int64()),
                            "embedding": pa.array(
                                [], pa.list_(pa.float64())
                            ),
                        }
                    )
                )
            if stats_out is not None:
                read_files = match_files
                all_files = _dir_files(dirs.values())
                bytes_read = sum(os.path.getsize(f) for f in read_files)
                bytes_total = sum(os.path.getsize(f) for f in all_files)
                stats_out["files_read"] = len(read_files)
                stats_out["files_total"] = len(all_files)
                stats_out["bytes_read"] = bytes_read
                stats_out["bytes_total"] = bytes_total
                # footer-only row counts: no data pages are scanned
                stats_out["scanned_rows"] = sum(
                    pq.read_metadata(f).num_rows for f in read_files
                )
                stats_out["index_rows"] = sum(
                    pq.read_metadata(f).num_rows for f in all_files
                )
                stats_out["scan_fraction"] = bytes_read / max(bytes_total, 1)
        else:
            # compat: in-object-store Dataset index — vectorized row filter,
            # but every index block is still read
            filtered = index.map_batches(
                lambda t: t.filter(
                    pa.compute.is_in(t["bucket_key"], value_set=pa.array(all_keys))
                ),
                batch_format="pyarrow",
            )
            if stats_out is not None:
                filtered = filtered.materialize()
                scanned = filtered.count()
                total = index.count()
                stats_out["scanned_rows"] = scanned
                stats_out["index_rows"] = total
                stats_out["scan_fraction"] = scanned / max(total, 1)
        return _score_candidates(filtered, q_ids, Q, q_keys, k)
    finally:
        if own_tmp is not None:
            shutil.rmtree(own_tmp, ignore_errors=True)


def _score_candidates(
    filtered: ray.data.Dataset,
    q_ids: np.ndarray,
    Q: np.ndarray,
    q_keys: np.ndarray,
    k: int,
) -> pd.DataFrame:
    ref = ray.put((q_ids, Q, q_keys))

    def partial(t: pa.Table) -> pa.Table:
        qids, qm, qk = ray.get(ref)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        m = _normalize(_matrix(t))
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key_col = "bk" if "bk" in t.column_names else "bucket_key"
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(keys, qk[qi]) & (vids != qids[qi])
            if not mask.any():
                continue
            # a vector may match the query in several tables: dedup
            v, first_pos = np.unique(vids[mask], return_index=True)
            # rounded to 9 decimals before ranking (see ann_topk partial)
            s = np.round((m[mask] @ qm[qi])[first_pos], 9)
            top = min(k, len(v))
            idx_ = np.lexsort((v, -s))[:top]
            rows_q.append(np.full(top, qids[qi], dtype=np.int64))
            rows_v.append(v[idx_])
            rows_s.append(s[idx_])
        if not rows_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                "neighbor_id": pa.array(np.concatenate(rows_v)),
                "sim": pa.array(np.concatenate(rows_s)),
            }
        )

    parts = filtered.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out_rows = []
    if len(parts):
        for qid, g in parts.groupby("query_id"):
            g = g.drop_duplicates("neighbor_id").sort_values(
                ["sim", "neighbor_id"], ascending=[False, True]
            ).head(k)
            out_rows.append(
                pd.DataFrame(
                    {
                        "query_id": qid,
                        "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                        "neighbor_id": g["neighbor_id"].to_numpy(np.int64),
                    }
                )
            )
    if not out_rows:
        return pd.DataFrame(
            {"query_id": [], "rank": [], "neighbor_id": []}, dtype=np.int64
        )
    return pd.concat(out_rows, ignore_index=True)


def lsh_ann_sql(
    query_ids: list[int],
    k: int = 10,
    dim: int = EMB_DIM,
    num_planes: int = LSH_NUM_PLANES,
    num_tables: int = LSH_NUM_TABLES,
    seed: int = LSH_SEED,
) -> str:
    """DuckDB oracle for lsh_ann_topk: the hyperplanes are embedded as
    float literals (repr round-trips to the identical double), bucket =
    sign pattern of raw-embedding dot products, candidates = shared
    (table, bucket), exact cosine rank."""
    planes = lsh_planes(dim, num_planes, num_tables, seed)
    ids = "(" + ", ".join(str(int(i)) for i in query_ids) + ")"

    def plane_lit(ti: int, pj: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[ti, :, pj]) + "]"

    blocks = []
    for ti in range(num_tables):
        bucket = " + ".join(
            f"{1 << pj} * (CASE WHEN list_dot_product(embedding, "
            f"{plane_lit(ti, pj)}) > 0 THEN 1 ELSE 0 END)"
            for pj in range(num_planes)
        )
        blocks.append(
            f"    SELECT vec_id, {ti} AS table_id, {bucket} AS bucket"
            f" FROM embeddings"
        )
    buckets_sql = "\n    UNION ALL\n".join(blocks)
    return f"""
WITH lsh_b AS MATERIALIZED (
{buckets_sql}
), lsh_q AS (
    SELECT * FROM lsh_b WHERE vec_id IN {ids}
), lsh_cand AS (
    SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS neighbor_id
    FROM lsh_b e JOIN lsh_q q
      ON e.table_id = q.table_id AND e.bucket = q.bucket
     AND e.vec_id <> q.vec_id
), lsh_s AS (
    SELECT c.query_id, c.neighbor_id,
           list_cosine_similarity(a.embedding, b.embedding) AS sim
    FROM lsh_cand c
    JOIN embeddings a ON a.vec_id = c.query_id
    JOIN embeddings b ON b.vec_id = c.neighbor_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY round(sim, 9) DESC, neighbor_id) AS BIGINT) AS rank,
       neighbor_id
FROM lsh_s
QUALIFY rank <= {k}"""


# target mean bucket occupancy for the LSH near-dup path: per-bucket exact
# verification is O(occupancy^2), so planes grow ~log2(n / target)
COSINE_LSH_TARGET_BUCKET = 2000


def cosine_lsh_num_planes(
    n: int, target_bucket: int = COSINE_LSH_TARGET_BUCKET
) -> int:
    """planes = ceil(log2(n / target_bucket)), floored at 5 — keeps the
    MEAN bucket occupancy n / 2^planes <= target_bucket however large n
    grows (hyperplane buckets over correlated data are skewed, so the
    bound is on the mean; heavy buckets still verify chunk-wise)."""
    if n <= target_bucket:
        return 5
    return max(5, int(np.ceil(np.log2(n / target_bucket))))


def cosine_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.4,
    broadcast_threshold: int = 2_000_000,
    num_planes: int | None = None,
    num_tables: int = 14,
    seed: int = 13,
) -> ray.data.Dataset:
    """(vec_a < vec_b) pairs with cosine >= threshold.

    Size-gated like triangle_counts: up to ``broadcast_threshold`` rows the
    full normalized matrix is broadcast (ray.put once) and each batch
    computes its rows against it — O(n*batch) flops, no shuffle, exact.
    Above the gate it switches to the multi-table hyperplane-LSH bucket
    groupby with exact-cosine verification inside buckets — no driver
    materialization, approximate recall (cross-bucket pairs are missed;
    raise ``num_tables`` to trade compute for recall).  ``num_planes``
    defaults to ``cosine_lsh_num_planes(n)`` so per-bucket verify cost
    stays bounded as n grows (a fixed plane count would make every bucket
    O((n/2^planes)^2) — the round-2 scale review's finding)."""
    n = embeddings.count()
    if n <= broadcast_threshold:
        return _cosine_pairs_broadcast(embeddings, threshold)
    if num_planes is None:
        num_planes = cosine_lsh_num_planes(n)
    return _cosine_pairs_lsh(embeddings, threshold, num_planes, num_tables, seed)


def _cosine_pairs_broadcast(
    embeddings: ray.data.Dataset, threshold: float
) -> ray.data.Dataset:
    full = embeddings.to_pandas()
    M = _normalize(np.stack(full["embedding"].to_numpy()).astype(np.float64))
    ids = full["vec_id"].to_numpy(np.int64)
    ref = ray.put((ids, M))

    def pairs(t: pa.Table) -> pa.Table:
        aids, am = ray.get(ref)
        if len(t) == 0:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        m = _normalize(_matrix(t))
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ am.T
        ii, jj = np.nonzero(sims >= threshold)
        va, vb = vids[ii], aids[jj]
        keep = va < vb
        return pa.table(
            {"vec_a": pa.array(va[keep]), "vec_b": pa.array(vb[keep])}
        )

    return embeddings.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def _cosine_pairs_lsh(
    embeddings: ray.data.Dataset,
    threshold: float,
    num_planes: int,
    num_tables: int,
    seed: int,
) -> ray.data.Dataset:
    """Streaming near-dup pairs: explode vectors to (table, bucket) keys,
    group by bucket, exact-cosine verify within each bucket, bucket-hash
    distinct across tables.  Embeddings travel as float64 blobs (arrow
    binary — object columns of ndarrays cannot shuffle)."""
    from webgraph_ray.functions.shuffle import bucket_distinct

    idx = build_lsh_index(embeddings, num_planes, num_tables, seed)

    def to_blob(t: pa.Table) -> pa.Table:
        m = _normalize(_matrix(t))
        return pa.table(
            {
                "bucket_key": t["bucket_key"],
                "vec_id": t["vec_id"],
                "blob": pa.array([row.tobytes() for row in m], pa.binary()),
            }
        )

    blobbed = idx.map_batches(to_blob, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64")}
            )
        ids = g["vec_id"].to_numpy(np.int64)
        M = np.frombuffer(b"".join(g["blob"]), dtype=np.float64).reshape(n, -1)
        sims = M @ M.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        va, vb = ids[ii], ids[jj]
        swap = va > vb
        va[swap], vb[swap] = vb[swap], va[swap].copy()
        return pd.DataFrame({"vec_a": va, "vec_b": vb})

    pairs = blobbed.groupby("bucket_key").map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return bucket_distinct(pairs, ["vec_a", "vec_b"])
