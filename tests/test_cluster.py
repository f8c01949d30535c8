"""Fixed-point k-means + IVF ANN: hand-checkable geometry, exactness
invariants (truncating division, tie-to-smaller-cid, empty-cluster
carry-over), block pruning of the IVF probe, and full oracle parity at
sf0.001 (the comparison the driver gate runs)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from webgraph_ray.stages.cluster import (
    _trunc_div,
    ivf_ann_sql,
    ivf_ann_topk,
    kmeans_clusters,
    kmeans_fit,
    kmeans_sql,
)


def _emb_ds(mat, ids=None):
    ids = np.arange(len(mat), dtype=np.int64) if ids is None else np.asarray(ids)
    df = pd.DataFrame(
        {"vec_id": ids, "embedding": [np.asarray(r, np.float32) for r in mat]}
    )
    return ray.data.from_pandas(df)


def test_trunc_div_matches_duckdb():
    """DuckDB // truncates toward zero; numpy // floors — the helper must
    follow DuckDB."""
    s = np.array([-7, 7, -6, 5, 0], dtype=np.int64)
    n = np.int64(2)
    assert list(_trunc_div(s, n)) == [-3, 3, -3, 2, 0]


def test_kmeans_two_obvious_clusters():
    """Two well-separated blobs in 2D (padded to 64 dims): every point
    must land with its blob, centroids init from the 2 smallest vec_ids."""
    rng = np.random.default_rng(7)
    a = rng.normal(0.4, 0.01, size=(20, 2))
    b = rng.normal(-0.4, 0.01, size=(20, 2))
    mat = np.zeros((40, 64), dtype=np.float64)
    mat[:20, :2] = a
    mat[20:, :2] = b
    # interleave ids so init picks one seed from each blob (ids 0 and 1)
    order = np.argsort(np.r_[np.arange(0, 40, 2), np.arange(1, 40, 2)])
    got = (
        kmeans_clusters(_emb_ds(mat[order]), k=2, iters=3)
        .to_pandas()
        .sort_values("vec_id")
    )
    lab = got["cluster"].to_numpy()
    # cluster labels must be constant within each blob and differ across
    df = pd.DataFrame({"cluster": lab, "blob": mat[order][:, 0] > 0})
    per_blob = df.groupby("blob")["cluster"].nunique()
    assert (per_blob == 1).all()
    assert df.groupby("blob")["cluster"].first().nunique() == 2


def test_kmeans_oracle_parity(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    embs = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    got = (
        kmeans_clusters(embs, k=8, iters=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(kmeans_sql(k=8, iters=3))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got["cluster"].to_numpy() == exp["cluster"].to_numpy()).all()
    # sanity: more than one cluster actually populated
    assert got["cluster"].nunique() > 1


def test_ivf_probe_prunes_blocks(sf_dir, tmp_path):
    """The probe must read only the probed cluster directories — bytes
    read < bytes total, and every probed file belongs to a probed
    cluster."""
    embs = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    stats = {}
    out = ivf_ann_topk(
        embs,
        [0, 1],
        k=5,
        nlist=8,
        nprobe=1,
        iters=2,
        index_dir=str(tmp_path / "ivf"),
        stats_out=stats,
    )
    assert stats["bytes_read"] < stats["bytes_total"]
    assert stats["files_read"] < stats["files_total"]
    assert 0 < stats["scan_fraction"] < 1
    assert set(out.columns) == {"query_id", "rank", "neighbor_id"}
    assert (out.groupby("query_id")["rank"].min() == 1).all()


def test_ivf_oracle_parity(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    embs = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    got = ivf_ann_topk(embs, qids, k=10, nlist=8, nprobe=2, iters=3)
    exp = con.execute(ivf_ann_sql(qids, k=10, nlist=8, nprobe=2, iters=3)).df()
    cols = ["query_id", "rank", "neighbor_id"]
    a = got[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    b = exp[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(a, b)


def test_kmeans_empty_cluster_carryover():
    """k=3 over 2 tight blobs: one centroid goes empty after round 1 and
    must keep its previous position (COALESCE semantics) rather than NaN
    or crash; result stays oracle-parity deterministic."""
    mat = np.zeros((10, 64), dtype=np.float64)
    mat[:5, 0] = 0.4
    mat[5:, 0] = -0.4
    C, assign = kmeans_fit(_emb_ds(mat), k=3, iters=2)
    lab = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    assert len(np.unique(lab)) == 2  # only 2 real groups
    assert C.shape == (3, 64) and not np.isnan(C).any()


def test_semdedup_vs_duckdb_oracle():
    """Package-boundary mirror of the gate protocol for the semdedup op."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.queries()["semdedup"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    exp = con.execute(entry.oracle_sql()["semdedup"]).df()

    def norm(df):
        df = df[sorted(df.columns)].astype("int64")
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(norm(got), norm(exp), check_dtype=False)
    # the synthetic embeddings plant near-duplicates — pruning must fire,
    # every dup must point at a smaller same-cluster id, keepers at -1
    assert got["is_dup"].sum() > 0
    dups = got[got["is_dup"] == 1]
    assert (dups["dup_of"] < dups["vec_id"]).all()
    assert (got.loc[got["is_dup"] == 0, "dup_of"] == -1).all()


def test_semdedup_max_cluster_gate():
    """IDENTICAL points can't be split by any projection: the loud fail
    remains for a degenerate identical-point mass above max_cluster."""
    from webgraph_ray.stages.cluster import semdedup

    mat = np.tile(np.linspace(-1, 1, 64), (30, 1))  # one tight cluster
    with pytest.raises(ValueError, match="max_cluster"):
        semdedup(_emb_ds(mat), k=1, iters=1, max_cluster=5).materialize()


def test_semdedup_skewed_cluster_shards_instead_of_raising():
    """A dense-but-not-identical clump (the 100-TB web-text reality) that
    round 4 rejected now LSH-shards in-cluster: no raise, every vector
    accounted for exactly once, dup links stay within-cluster and
    deterministic across runs; planted exact twins still dedup."""
    from webgraph_ray.stages.cluster import semdedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal(64)
    mat = base[None, :] + 0.15 * rng.standard_normal((40, 64))
    mat[25] = mat[5]  # exact twin inside the clump
    got = (
        semdedup(_emb_ds(mat), k=1, iters=1, max_cluster=10)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(got["vec_id"]) == list(range(40))
    dups = got[got["is_dup"] == 1]
    assert (dups["dup_of"] < dups["vec_id"]).all()
    assert (got.loc[got["is_dup"] == 0, "dup_of"] == -1).all()
    again = (
        semdedup(_emb_ds(mat), k=1, iters=1, max_cluster=10)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)
    # identical vectors always share an LSH code, so the twin pair lands
    # in one shard: 25 must dedup against an id no larger than its twin 5
    assert got.loc[25, "is_dup"] == 1 and got.loc[25, "dup_of"] <= 5


# ---------------------------------------------------------------------------
# k-NN graph
# ---------------------------------------------------------------------------


def _rand_emb(n=80, d=64, seed=5):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


def test_knn_graph_oracle_parity_and_blocking_invariance():
    import duckdb

    from webgraph_ray.stages.cluster import knn_graph

    mat = _rand_emb()
    ds = _emb_ds(mat)
    got = knn_graph(ds, k=5, nlist=4, nprobe=2)
    assert got["query_id"].nunique() == len(mat)

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": np.arange(len(mat), dtype=np.int64),
                "embedding": [r for r in mat],
            }
        ),
    )
    exp = con.execute(
        "SELECT query_id, rank, neighbor_id FROM ("
        + ivf_ann_sql(None, k=5, nlist=4, nprobe=2)
        + ") ORDER BY query_id, rank"
    ).df()
    assert got.astype("int64").equals(exp.astype("int64"))

    other = knn_graph(ds.repartition(7), k=5, nlist=4, nprobe=2)
    assert got.equals(other)


def test_knn_graph_full_probe_equals_exact_brute():
    # nprobe = nlist => every query sees every candidate => the pruned
    # graph IS the exact brute-force graph (same rank contract)
    from webgraph_ray.stages.cluster import knn_graph
    from webgraph_ray.stages.embed import ann_topk

    import pyarrow as pa

    mat = _rand_emb(n=60, seed=9)
    # plain list<float> column (the fixture layout) — ann_topk's Arrow
    # path expects a ListArray, not the tensor extension from_pandas makes
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(60, dtype=np.int64)),
                "embedding": pa.array(
                    [r.tolist() for r in mat], pa.list_(pa.float32())
                ),
            }
        )
    )
    got = knn_graph(ds, k=5, nlist=4, nprobe=4)
    exact = ann_topk(ds, list(range(60)), k=5)
    exact = (
        exact[["query_id", "rank", "neighbor_id"]]
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(exact.astype("int64"))
