"""Distributed k-means (Lloyd's) in exact fixed-point arithmetic, and an
IVF (inverted-file) ANN index built on top of it — the coarse-quantizer
scale path complementing the hyperplane-LSH index in ``stages/embed.py``.

Reference analog: the content-store keyed lookup
(/root/reference/code/features/structure.py:37-46) is the reference's only
"index"; k-means/IVF is part of the beyond-reference training-data surface
(cluster-then-search is the standard sub-linear ANN at 10^9+ vectors).

Scale shape (the part that must survive 100 TB):

- Each Lloyd iteration is ONE streaming pass: ``map_batches`` computes
  per-batch per-cluster per-dimension partial sums (k*d long rows per
  batch, independent of batch row count); the bounded partial stream
  (O(num_batches * k * d) rows, batch size ``KMEANS_BATCH_ROWS``)
  reduces by exact int64 addition on the driver — the same
  mergeable-partials contract as the KMV sketch, and ~2 s/iteration
  cheaper than a Ray sort-shuffle groupby over so small a table.
  Centroids broadcast via ``ray.put`` once per iteration — never
  re-shipped per batch.
- The IVF index is hive-partitioned parquet (one directory per cluster);
  a probe computes its ``nprobe`` nearest centroids driver-side (k tiny)
  and READS ONLY those directories — block pruning, same contract as the
  LSH index; ``stats_out`` reports true bytes-read fraction.

Exactness contract (what makes the DuckDB oracle bit-stable):

- Coordinates are fixed-point: ``floor(float64(x) * 2^20)`` as int64.
  floor (not round) because float32 values scaled by a power of two are
  exactly representable in float64 and land on exact .5 fractions often
  enough that numpy's half-even vs DuckDB's half-away rounding would
  diverge; floor is unambiguous in both engines.
- Squared L2 distances and per-cluster sums are exact int64 (unit-norm
  64-dim inputs: |coord| < 2^20, d2 < 2^46 — no overflow).
- Centroid update is truncating integer division (DuckDB ``//``
  semantics, which truncate toward zero unlike numpy's floor division);
  empty clusters keep their previous centroid.
- Assignment ties (equal d2) break to the smaller cluster id; the final
  labeling is one more assignment pass against the post-update centroids.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

SCALE_BITS = 20
SCALE = 1 << SCALE_BITS
EMB_DIM = 64
# rows per Lloyd partial-sum batch: each batch contributes k*d partial
# rows however many embedding rows it holds, so a larger batch keeps the
# driver-side merge volume (num_batches * k * d) small at scale
KMEANS_BATCH_ROWS = 65536


def _scaled_matrix(t: pa.Table) -> np.ndarray:
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    return np.floor(m * SCALE).astype(np.int64)


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Elementwise integer division truncating toward zero (DuckDB //)."""
    q = np.abs(s) // n
    return np.where(s < 0, -q, q)


def _assign_ids(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 with ties to the smaller cid — exact int64."""
    # d2[n,k] = |x|^2 - 2 x.c + |c|^2 ; all int64 exact at these magnitudes
    d2 = (
        (X * X).sum(axis=1, dtype=np.int64)[:, None]
        - 2 * (X @ C.T)
        + (C * C).sum(axis=1, dtype=np.int64)[None, :]
    )
    return np.argmin(d2, axis=1).astype(np.int64)  # first min = smallest cid


def _init_centroids(embeddings: ray.data.Dataset, k: int) -> np.ndarray:
    """Scaled vectors of the k smallest vec_ids (deterministic; per-batch
    partial min-k so no global sort)."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.argsort(ids, kind="stable")[:k]
        return t.select(["vec_id", "embedding"]).take(pa.array(keep))

    parts = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values("vec_id", kind="mergesort").head(k)
    return np.floor(
        np.stack(parts["embedding"].to_numpy()).astype(np.float64) * SCALE
    ).astype(np.int64)


def kmeans_fit(
    embeddings: ray.data.Dataset,
    k: int = 8,
    iters: int = 3,
) -> tuple[np.ndarray, ray.data.Dataset]:
    """Run ``iters`` exact Lloyd rounds; return (final centroids int64
    (k, d), final-assignment Dataset (vec_id, cluster))."""
    C = _init_centroids(embeddings, k)
    dim = C.shape[1]

    for _ in range(iters):
        ref = ray.put(C)

        def partial_sums(t: pa.Table) -> pa.Table:
            Ct = ray.get(ref)
            kk, dd = Ct.shape
            if len(t) == 0:
                empty = pa.array([], pa.int64())
                return pa.table({"cid": empty, "dim": empty, "s": empty, "n": empty})
            X = _scaled_matrix(t)
            a = _assign_ids(X, Ct)
            S = np.zeros((kk, dd), dtype=np.int64)
            np.add.at(S, a, X)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            cid = np.repeat(np.arange(kk, dtype=np.int64), dd)
            dims = np.tile(np.arange(1, dd + 1, dtype=np.int64), kk)
            return pa.table(
                {
                    "cid": pa.array(cid),
                    "dim": pa.array(dims),
                    "s": pa.array(S.reshape(-1)),
                    "n": pa.array(np.repeat(counts, dd)),
                }
            )

        # partials are bounded — k*d rows per BATCH regardless of row
        # count — so they stream to the driver and reduce by exact int64
        # addition (the mergeable-partials pattern, same contract as the
        # KMV sketch).  A Ray groupby here costs ~2 s of sort-shuffle
        # fixed overhead per iteration for a table this small; the driver
        # sees O(num_batches * k * d) rows, bounded by KMEANS_BATCH_ROWS.
        parts = embeddings.map_batches(
            partial_sums,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=KMEANS_BATCH_ROWS,
        ).to_pandas()
        agg = (
            parts.groupby(["cid", "dim"], sort=True)[["s", "n"]]
            .sum()
            .reset_index()
        )
        s_col, n_col = "s", "n"
        newC = C.copy()
        for cid, grp in agg.groupby("cid", sort=True):
            n = int(grp[n_col].iloc[0])
            if n > 0:
                newC[int(cid)] = _trunc_div(
                    grp[s_col].to_numpy(np.int64), np.int64(n)
                )
        C = newC

    def final_assign(t: pa.Table) -> pa.Table:
        Ct = ray.get(final_ref)
        if len(t) == 0:
            empty = pa.array([], pa.int64())
            return pa.table({"vec_id": empty, "cluster": empty})
        X = _scaled_matrix(t)
        a = _assign_ids(X, Ct)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(a),
            }
        )

    final_ref = ray.put(C)
    assign = embeddings.map_batches(
        final_assign, batch_format="pyarrow", zero_copy_batch=True
    )
    return C, assign


def kmeans_clusters(
    embeddings: ray.data.Dataset, k: int = 8, iters: int = 3
) -> ray.data.Dataset:
    """(vec_id, cluster) after ``iters`` exact fixed-point Lloyd rounds."""
    return kmeans_fit(embeddings, k=k, iters=iters)[1]


# ---------------------------------------------------------------------------
# IVF index: cluster-partitioned parquet, probe reads only matching dirs
# ---------------------------------------------------------------------------


def ivf_ann_topk(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 3,
    index_dir: str | None = None,
    stats_out: dict | None = None,
) -> pd.DataFrame:
    """(query_id, rank, neighbor_id): cosine top-k among vectors whose
    k-means cluster is one of the query's ``nprobe`` nearest clusters
    (ties by cid).  Rank on similarities rounded to 9 decimals, then
    neighbor_id — identical to ann_topk's contract.

    The index is written hive-partitioned by cluster and the probe READS
    ONLY the probed cluster directories (block pruning, not a row filter);
    ``stats_out`` reports files/bytes read vs total."""
    C, _assign = kmeans_fit(embeddings, k=nlist, iters=iters)

    own_tmp = None
    if index_dir is None:
        own_tmp = tempfile.mkdtemp(prefix="ivf_index_")
        index_dir = own_tmp
    try:
        # vectors + cluster label, partitioned by cluster.  Labels are
        # recomputed per batch against the broadcast final centroids (no
        # driver-side materialization of the assignment table); `cl` is a
        # data-column copy of the partition key because hive partitioning
        # moves `cluster` into the directory name.
        c_ref = ray.put(C)

        def attach(t: pa.Table) -> pa.Table:
            Ct = ray.get(c_ref)
            if len(t) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "embedding": pa.array([], pa.list_(pa.float32())),
                        "cl": pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int64()),
                    }
                )
            a = _assign_ids(_scaled_matrix(t), Ct)
            return pa.table(
                {
                    "vec_id": t["vec_id"],
                    "embedding": t["embedding"],
                    "cl": pa.array(a),
                    "cluster": pa.array(a),
                }
            )

        embeddings.map_batches(attach, batch_format="pyarrow").write_parquet(
            index_dir, partition_cols=["cluster"]
        )

        # driver-side probe selection: nprobe nearest centroids per query
        qtab = embeddings.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(
                    t["vec_id"], value_set=pa.array(list(query_ids), pa.int64())
                )
            ),
            batch_format="pyarrow",
        ).to_pandas()
        qtab = qtab.sort_values("vec_id", kind="mergesort")
        q_ids = qtab["vec_id"].to_numpy(np.int64)
        Qs = np.floor(
            np.stack(qtab["embedding"].to_numpy()).astype(np.float64) * SCALE
        ).astype(np.int64)
        d2 = (
            (Qs * Qs).sum(axis=1, dtype=np.int64)[:, None]
            - 2 * (Qs @ C.T)
            + (C * C).sum(axis=1, dtype=np.int64)[None, :]
        )
        probe = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]  # ties -> cid

        probed_clusters = sorted({int(c) for row in probe for c in row})
        dirs = {
            c: os.path.join(index_dir, f"cluster={c}") for c in probed_clusters
        }
        read_dirs = [d for d in dirs.values() if os.path.isdir(d)]

        def _files(root):
            out = []
            for dp, _, fns in os.walk(root):
                out += [os.path.join(dp, f) for f in fns if f.endswith(".parquet")]
            return out

        read_files = [f for d in read_dirs for f in _files(d)]
        if not read_files:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "rank": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                }
            )
        cand = ray.data.read_parquet(
            read_files, columns=["vec_id", "embedding", "cl"]
        )

        if stats_out is not None:
            all_files = _files(index_dir)
            stats_out["files_read"] = len(read_files)
            stats_out["files_total"] = len(all_files)
            stats_out["bytes_read"] = sum(os.path.getsize(f) for f in read_files)
            stats_out["bytes_total"] = sum(os.path.getsize(f) for f in all_files)
            stats_out["scan_fraction"] = stats_out["bytes_read"] / max(
                stats_out["bytes_total"], 1
            )
            stats_out["scanned_rows"] = sum(
                pq.read_metadata(f).num_rows for f in read_files
            )

        # per-query allowed clusters; normalized float64 queries for cosine
        def _norm(m):
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            return m / n

        Qf = _norm(np.stack(qtab["embedding"].to_numpy()).astype(np.float64))
        q_allow = {int(q_ids[i]): set(int(c) for c in probe[i]) for i in range(len(q_ids))}
        b_ref = ray.put((q_ids, Qf, q_allow))

        def score(t: pa.Table) -> pa.Table:
            qids, qm, allow = ray.get(b_ref)
            empty = pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
            if len(t) == 0:
                return empty
            m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            m = _norm(m)
            vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cl = t["cl"].to_numpy(zero_copy_only=False).astype(np.int64)
            rows_q, rows_v, rows_s = [], [], []
            for qi in range(len(qids)):
                mask = (
                    np.isin(cl, np.fromiter(allow[int(qids[qi])], dtype=np.int64))
                    & (vids != qids[qi])
                )
                if not mask.any():
                    continue
                v = vids[mask]
                s = np.round(m[mask] @ qm[qi], 9)
                top = min(k, len(v))
                idx = np.lexsort((v, -s))[:top]
                rows_q.append(np.full(top, qids[qi], dtype=np.int64))
                rows_v.append(v[idx])
                rows_s.append(s[idx])
            if not rows_q:
                return empty
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(rows_q)),
                    "neighbor_id": pa.array(np.concatenate(rows_v)),
                    "sim": pa.array(np.concatenate(rows_s)),
                }
            )

        parts = cand.map_batches(
            score, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        out_rows = []
        for qid in q_ids:
            g = parts[parts["query_id"] == qid]
            g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
            out_rows.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(g), qid, dtype=np.int64),
                        "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                        "neighbor_id": g["neighbor_id"].to_numpy(np.int64),
                    }
                )
            )
        return pd.concat(out_rows, ignore_index=True)
    finally:
        if own_tmp is not None:
            import shutil

            shutil.rmtree(own_tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# DuckDB oracles — machine-generated unrolled Lloyd iterations
# ---------------------------------------------------------------------------


def _kmeans_ctes(k: int, iters: int, dim: int) -> tuple[str, str]:
    """Shared CTE chain: returns (cte_sql, final_assign_name).  Mirrors
    kmeans_fit exactly: floor fixed-point scaling, int64 d2, ties to
    smaller cid, truncating-division centroid update, empty clusters keep
    previous centroids, final labels = one assignment pass after the last
    update."""
    ctes = [
        f"""scaled AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE}.0) AS BIGINT)) AS e
    FROM embeddings
)""",
        f"""cen0 AS (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
           e AS c
    FROM (SELECT vec_id, e FROM scaled ORDER BY vec_id LIMIT {k})
)""",
    ]
    for t in range(iters + 1):
        ctes.append(
            f"""d{t} AS (
    SELECT s.vec_id, c.cid,
           list_sum(list_transform(list_zip(s.e, c.c),
               p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
    FROM scaled s CROSS JOIN cen{t} c
)"""
        )
        ctes.append(
            f"""a{t} AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d{t}) WHERE rn = 1
)"""
        )
        if t == iters:
            break
        ctes.append(
            f"""s{t} AS (
    SELECT a.cid, r.i AS dim,
           sum(s.e[CAST(r.i AS INT)]) AS sm, count(*) AS n
    FROM a{t} a JOIN scaled s USING (vec_id)
         CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY a.cid, r.i
)"""
        )
        ctes.append(
            f"""cen{t + 1} AS (
    SELECT c0.cid, COALESCE(u.c, c0.c) AS c
    FROM cen{t} c0 LEFT JOIN (
        SELECT cid, list(sm // n ORDER BY dim) AS c FROM s{t} GROUP BY cid
    ) u USING (cid)
)"""
        )
    return "WITH " + ",\n".join(ctes), f"a{iters}"


def kmeans_sql(k: int = 8, iters: int = 3, dim: int = EMB_DIM) -> str:
    cte, final = _kmeans_ctes(k, iters, dim)
    return f"""{cte}
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM {final}"""


def ivf_ann_sql(
    query_ids: list[int] | None,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 3,
    dim: int = EMB_DIM,
) -> str:
    """``query_ids=None`` means EVERY vector is a query — the k-NN-graph
    mirror (same probe/candidate/rank arithmetic, no id filter)."""
    cte, final = _kmeans_ctes(nlist, iters, dim)
    if query_ids is None:
        where = ""
    else:
        ids = "(" + ", ".join(str(int(i)) for i in query_ids) + ")"
        where = f"WHERE s.vec_id IN {ids}"
    return f"""{cte},
qd AS (
    SELECT s.vec_id AS query_id, c.cid,
           list_sum(list_transform(list_zip(s.e, c.c),
               p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
    FROM scaled s CROSS JOIN cen{iters} c
    {where}
),
qprobe AS (
    SELECT query_id, cid FROM (
        SELECT query_id, cid,
               row_number() OVER (PARTITION BY query_id ORDER BY d2, cid) AS rn
        FROM qd) WHERE rn <= {nprobe}
),
cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id
    FROM qprobe p JOIN {final} a ON a.cid = p.cid
    WHERE a.vec_id <> p.query_id
),
sims AS (
    SELECT c.query_id, c.neighbor_id,
           round(list_cosine_similarity(qa.embedding, nb.embedding), 9) AS sim
    FROM cand c
    JOIN embeddings qa ON qa.vec_id = c.query_id
    JOIN embeddings nb ON nb.vec_id = c.neighbor_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank,
       neighbor_id
FROM sims
QUALIFY rank <= {k}"""


# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-prune semantic deduplication
# ---------------------------------------------------------------------------

SEMDEDUP_MAX_CLUSTER = 200_000
SEMDEDUP_SHARD_BITS = 12  # max 4096-way LSH split of one dense cluster
SEMDEDUP_SHARD_SEED = 29


def semdedup(
    embeddings: ray.data.Dataset,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.4,
    max_cluster: int = SEMDEDUP_MAX_CLUSTER,
    shard_bits: int = SEMDEDUP_SHARD_BITS,
) -> ray.data.Dataset:
    """Semantic near-duplicate pruning in the SemDeDup shape (Abbas et
    al. 2023: k-means the embedding space, then compare pairs ONLY within
    a cluster): one row per vector with (vec_id, cluster, dup_of, is_dup)
    where ``dup_of`` is the smallest same-cluster vec_id with cosine
    similarity >= ``threshold`` (rounded to 9 decimals, the repo's
    float-tie convention) and -1 when the vector is kept.

    Scale shape: the coarse quantizer caps the quadratic — per-cluster
    work is O((n/k)^2) and k grows with n; the per-batch assign reuses
    the broadcast centroids (ray.put once), vectors travel to their
    cluster's group as float64 blobs through ONE cluster groupby.

    Skewed-cluster recovery (real 100-TB web text is NOT isotropic — one
    dense k-means cluster is the norm, not the exception): a tiny
    counting pre-pass histograms (cluster, lsh-code) sizes; any cluster
    above ``max_cluster`` is sharded in-cluster by the smallest
    power-of-two prefix of a deterministic hyperplane-LSH code that
    bounds every shard — pairs then compare within (cluster, shard).
    Finer sharding only tightens the approximation the coarse quantizer
    already makes (cross-shard near-dups are missed the same way
    cross-cluster ones are); clusters under the cap keep the exact
    oracle-mirrored semantics.  Only a shard that STILL exceeds the cap
    at full code width (a degenerate identical-point mass bigger than
    max_cluster) raises."""
    from webgraph_ray.stages.embed import _normalize, lsh_planes

    C, _ = kmeans_fit(embeddings, k=k, iters=iters)
    ref = ray.put(C)
    dim = C.shape[1]
    planes = lsh_planes(dim, shard_bits, 1, SEMDEDUP_SHARD_SEED)[0]
    pw = 1 << np.arange(shard_bits, dtype=np.int64)
    planes_ref = ray.put(planes)

    def _codes(t: pa.Table, Ct: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # hyperplane signs of the RESIDUAL from the assigned centroid: a
        # dense cluster is directionally tight (every member on the same
        # side of almost any hyperplane through the ORIGIN), but its
        # residuals spread in all directions around the centroid, so
        # centered planes split it evenly; identical points still share a
        # code (they must — no projection separates them)
        X = _scaled_matrix(t)
        a = _assign_ids(X, Ct)
        R = (X - Ct[a]).astype(np.float64)
        code = ((R @ ray.get(planes_ref)) > 0) @ pw
        return a, code.astype(np.int64)

    # pre-pass: (cluster, code) histogram — bounded at k * 2^shard_bits
    # rows per batch, reduced on the driver (mergeable-partials pattern)
    def count_partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame({"cluster": [], "code": [], "n": []}).astype(
                np.int64
            )
        a, code = _codes(t, ray.get(ref))
        df = pd.DataFrame({"cluster": a, "code": code})
        return (
            df.groupby(["cluster", "code"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    hist = (
        embeddings.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .to_pandas()
        .groupby(["cluster", "code"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    shard_mod: dict[int, int] = {}
    for c, g in hist.groupby("cluster"):
        total = int(g["n"].sum())
        if total <= max_cluster:
            continue
        chosen = None
        for j in range(1, shard_bits + 1):
            s = 1 << j
            worst = int(
                g.assign(r=g["code"].to_numpy(np.int64) & (s - 1))
                .groupby("r")["n"]
                .sum()
                .max()
            )
            if worst <= max_cluster:
                chosen = s
                break
        if chosen is None:
            raise ValueError(
                f"semdedup: cluster {int(c)} holds {total} rows and even "
                f"{1 << shard_bits}-way LSH sharding leaves a shard above "
                f"max_cluster={max_cluster} (degenerate identical-point "
                f"mass); raise max_cluster or shard_bits"
            )
        shard_mod[int(c)] = chosen
    shard_ref = ray.put(shard_mod)

    def assign_blob(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        Ct = ray.get(ref)
        if len(t) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "leaf": pa.array([], pa.int64()),
                    "blob": pa.array([], pa.binary()),
                }
            )
        a, code = _codes(t, Ct)
        smap = ray.get(shard_ref)
        shard = np.zeros(len(a), dtype=np.int64)
        for c, s in smap.items():
            m = a == c
            shard[m] = code[m] & (s - 1)
        leaf = a * (1 << shard_bits) + shard
        # np.stack over per-row ndarrays handles both list<float> and
        # tensor-extension layouts (and respects zero-copy block slices)
        M = _normalize(
            np.stack(
                t["embedding"].to_numpy(zero_copy_only=False)
            ).astype(np.float64)
        )
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "cluster": pa.array(a),
                "leaf": pa.array(leaf),
                "blob": pa.array([row.tobytes() for row in M], pa.binary()),
            }
        )

    def cluster_dups(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        n = len(g)
        if n > max_cluster:
            raise ValueError(
                f"semdedup: leaf of {n} rows exceeds max_cluster="
                f"{max_cluster} after sharding — should be unreachable"
            )
        ids = g["vec_id"].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": g["cluster"].to_numpy(np.int64),
                "dup_of": np.full(n, -1, dtype=np.int64),
                "is_dup": np.zeros(n, dtype=np.int64),
            }
        )
        if n < 2:
            return out
        M = np.frombuffer(b"".join(g["blob"]), dtype=np.float64).reshape(n, -1)
        hit = np.tril(np.round(M @ M.T, 9) >= threshold, k=-1)
        any_ = hit.any(axis=1)
        # rows and columns are vec_id-sorted, so argmax = first True =
        # smallest qualifying earlier id
        out.loc[any_, "dup_of"] = ids[np.argmax(hit[any_], axis=1)]
        out["is_dup"] = any_.astype(np.int64)
        return out

    return (
        embeddings.map_batches(
            assign_blob, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("leaf")
        .map_groups(cluster_dups, batch_format="pandas")
    )


def semdedup_sql(
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.4,
    dim: int = EMB_DIM,
) -> str:
    """DuckDB mirror: the exact fixed-point k-means CTEs feed a
    same-cluster pairwise cosine (rounded to 9 decimals) min-earlier-id
    aggregate."""
    ctes, asg = _kmeans_ctes(k, iters, dim)
    return f"""
{ctes}
, sd_pair AS (
    SELECT a.vec_id AS i, min(b.vec_id) AS dup_of
    FROM {asg} a
    JOIN {asg} b ON a.cid = b.cid AND b.vec_id < a.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
    WHERE round(list_cosine_similarity(ea.embedding, eb.embedding), 9)
          >= {threshold}
    GROUP BY 1
)
SELECT g.vec_id, CAST(g.cid AS BIGINT) AS cluster,
       CAST(coalesce(p.dup_of, -1) AS BIGINT) AS dup_of,
       CAST(p.dup_of IS NOT NULL AS BIGINT) AS is_dup
FROM {asg} g LEFT JOIN sd_pair p ON g.vec_id = p.i"""


# ---------------------------------------------------------------------------
# k-NN graph construction — every vector's top-k neighbors at once (the
# substrate of SemDeDup-style pruning, kNN-LM retrieval and graph-based
# curation).  Brute force is n^2; the scale shape is IVF-pruned: each
# vector probes only its nprobe nearest k-means clusters, so total
# similarity work drops to ~n^2 * nprobe/nlist and — unlike the per-query
# probe path above, which loops queries on the driver's broadcast list —
# the whole graph builds in two data-parallel exchanges:
#
#   1. fan-out: one streaming pass emits each vector once as a CANDIDATE
#      (keyed by its own cluster) and nprobe times as a QUERY (keyed by
#      each probed cluster) — a 1+nprobe data inflation, no driver state;
#   2. per-cluster matmul: groupby(cluster) -> one vectorized
#      queries x members similarity block per cluster, each query keeping
#      its local top-k (<= nprobe*k partial rows per query);
#   3. per-query reduce: groupby(query) -> global top-k merge.
#
# Skew note: an oversized cluster makes step 2's block big; at scale the
# same recursive re-quantize / LSH-shard recovery documented on semdedup
# applies (the group holds rows of ONE cluster only, so sharding is local).
# ---------------------------------------------------------------------------


def knn_graph(
    embeddings: ray.data.Dataset,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 3,
) -> pd.DataFrame:
    """(query_id, rank, neighbor_id): cosine top-k per vector among the
    members of its ``nprobe`` nearest clusters — identical probe
    selection, rounding (9 dp) and (sim desc, neighbor_id asc) tie-break
    as ``ivf_ann_topk``, so ``ivf_ann_sql(None, ...)`` mirrors it."""
    C, _ = kmeans_fit(embeddings, k=nlist, iters=iters)
    c_ref = ray.put(C)

    def _norm(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    def fan(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cid": pa.array([], pa.int64()),
                "role": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], t.schema.field("embedding").type),
            }
        )
        if len(t) == 0:
            return empty
        Ct = ray.get(c_ref)
        Xs = _scaled_matrix(t)
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        member = _assign_ids(Xs, Ct)
        d2 = (
            (Xs * Xs).sum(axis=1, dtype=np.int64)[:, None]
            - 2 * (Xs @ Ct.T)
            + (Ct * Ct).sum(axis=1, dtype=np.int64)[None, :]
        )
        probe = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]  # ties->cid
        n = len(vids)
        rep = np.repeat(np.arange(n, dtype=np.int64), nprobe)
        take = pa.array(np.r_[np.arange(n, dtype=np.int64), rep], pa.int64())
        return pa.table(
            {
                "cid": pa.array(np.r_[member, probe.reshape(-1)]),
                "role": pa.array(
                    np.r_[
                        np.zeros(n, np.int64),
                        np.ones(n * nprobe, np.int64),
                    ]
                ),
                "vec_id": pa.array(np.r_[vids, vids[rep]]),
                "embedding": t["embedding"].take(take)
                if isinstance(t["embedding"], pa.Array)
                else t["embedding"].combine_chunks().take(take),
            }
        )

    fanned = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        fan, batch_format="pyarrow"
    )

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            }
        )
        mem = df[df["role"] == 0]
        qr = df[df["role"] == 1]
        if mem.empty or qr.empty:
            return empty
        # members sorted by vec_id asc: a stable argsort on the (integer)
        # negated sims then breaks ties toward the smaller neighbor_id
        # with NO per-query python loop
        mem = mem.sort_values("vec_id", kind="mergesort")
        Mn = _norm(np.stack(mem["embedding"].to_numpy()).astype(np.float64))
        Qn = _norm(np.stack(qr["embedding"].to_numpy()).astype(np.float64))
        mv = mem["vec_id"].to_numpy(np.int64)
        qv = qr["vec_id"].to_numpy(np.int64)
        sims = np.round(Qn @ Mn.T, 9)
        # integer sort keys (9-dp sims scale exactly); self gets a sentinel
        # that still negates safely inside int64 (NOT iinfo.min: -min
        # overflows back to min and would sort the self row FIRST)
        sentinel = -(10**18)
        si = np.round(sims * 1e9).astype(np.int64)
        si[qv[:, None] == mv[None, :]] = sentinel
        top = min(k, si.shape[1])
        idx = np.argsort(-si, axis=1, kind="stable")[:, :top]
        rows = np.repeat(np.arange(len(qv)), top)
        cols = idx.reshape(-1)
        keep = si[rows, cols] != sentinel  # drop masked self
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "query_id": qv[rows[keep]],
                "neighbor_id": mv[cols[keep]],
                "sim": sims[rows[keep], cols[keep]],
            }
        )

    partials = fanned.groupby("cid").map_groups(
        per_cluster, batch_format="pandas"
    )

    def reduce_query(df: pd.DataFrame) -> pd.DataFrame:
        v = df["neighbor_id"].to_numpy(np.int64)
        s = df["sim"].to_numpy(np.float64)
        idx = np.lexsort((v, -s))[: min(k, len(v))]
        return pd.DataFrame(
            {
                "query_id": np.full(
                    len(idx), int(df["query_id"].iloc[0]), np.int64
                ),
                "rank": np.arange(1, len(idx) + 1, dtype=np.int64),
                "neighbor_id": v[idx],
            }
        )

    out = (
        partials.groupby("query_id")
        .map_groups(reduce_query, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"], kind="mergesort").reset_index(
        drop=True
    )
