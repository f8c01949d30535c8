"""PCA moments / fit / projection: exact-moment determinism across
partitionings, fit vs a single-shot numpy reference, DuckDB mirror of
the moment fingerprints, projection correctness."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.stages.pca import (
    PCA_FP_MOD,
    PCA_SCALE,
    pca_fit,
    pca_moment_rows,
    pca_moments,
    pca_moments_sql,
    pca_project,
)


def _emb_table(mat):
    import pyarrow as pa

    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def _emb_ds(mat, nparts=1):
    # explicit Arrow list<float32> (the testdata parquet schema);
    # from_pandas would wrap numpy rows in Ray's tensor extension type
    ds = ray.data.from_arrow(_emb_table(mat))
    return ds.repartition(nparts) if nparts > 1 else ds


def _fixture(n=120, d=64, seed=11):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions so top components are
    # well-separated (eigh comparison is then sign/order stable)
    basis = rng.standard_normal((d, d))
    scales = np.concatenate([[8.0, 4.0, 2.0], np.full(d - 3, 0.3)])
    return (rng.standard_normal((n, d)) * scales) @ basis * 0.05


def _brute_moments(mat):
    # the dataset stores float32: quantize the float32-rounded values
    q = np.floor(
        mat.astype(np.float32).astype(np.float64) * PCA_SCALE
    ).astype(object)
    n = len(q)
    s = q.sum(axis=0)
    G = q.T @ q
    return n, s, G


def test_moments_exact_and_partition_invariant():
    mat = _fixture()
    bn, bs, bG = _brute_moments(mat)
    for nparts in (1, 7):
        n, s, G = pca_moments(_emb_ds(mat, nparts))
        assert n == bn
        assert all(int(a) == int(b) for a, b in zip(s, bs))
        assert all(
            int(G[i, j]) == int(bG[i, j])
            for i in range(64)
            for j in range(64)
        )


def test_moment_rows_match_duckdb_mirror():
    mat = _fixture(n=90, seed=3)
    rows = pca_moment_rows(_emb_ds(mat, 5)).sort_values("key").reset_index(
        drop=True
    )
    con = duckdb.connect()
    con.register("embeddings", _emb_table(mat))
    exp = (
        con.execute(pca_moments_sql())
        .df()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(rows, exp, check_dtype=False)


def test_fit_matches_numpy_reference_and_is_deterministic():
    mat = _fixture()
    fit1 = pca_fit(_emb_ds(mat, 1), n_components=3)
    fit2 = pca_fit(_emb_ds(mat, 9), n_components=3)
    # byte-identical across partitionings (pure function of exact moments)
    assert np.array_equal(fit1["components"], fit2["components"])
    assert np.array_equal(fit1["explained_variance"], fit2["explained_variance"])

    # reference: eigh of the float covariance of the QUANTIZED data
    # (quantization sees the float32-stored values)
    q = (
        np.floor(mat.astype(np.float32).astype(np.float64) * PCA_SCALE)
        / PCA_SCALE
    )
    C = np.cov(q, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:3]
    assert np.allclose(fit1["explained_variance"], w[order], rtol=1e-9)
    for c in range(3):
        ref = V[:, order[c]]
        got = fit1["components"][:, c]
        # same axis up to sign
        assert abs(abs(float(ref @ got)) - 1.0) < 1e-9
    # variance ordering + sign convention
    ev = fit1["explained_variance"]
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    for c in range(3):
        j = int(np.argmax(np.abs(fit1["components"][:, c])))
        assert fit1["components"][j, c] > 0


def test_project_matches_dense_reference():
    mat = _fixture(n=70, seed=8)
    fit = pca_fit(_emb_ds(mat), n_components=2)
    got = (
        pca_project(_emb_ds(mat, 4), fit)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    x32 = mat.astype(np.float32).astype(np.float64)
    ref = (x32 - fit["mean"]) @ fit["components"]
    assert np.allclose(got["pc0"].to_numpy(), ref[:, 0], atol=1e-12)
    assert np.allclose(got["pc1"].to_numpy(), ref[:, 1], atol=1e-12)
    # projection explains most variance along pc0 for the anisotropic
    # fixture: var(pc0) >= var(pc1)
    assert got["pc0"].var() >= got["pc1"].var()


def test_empty_and_fingerprint_range():
    mat = _fixture(n=25, seed=2)
    rows = pca_moment_rows(_emb_ds(mat))
    vals = rows.set_index("key")["value"]
    assert int(vals["n"]) == 25
    assert 0 <= int(vals["gram_fp"]) < PCA_FP_MOD
    assert 0 <= int(vals["trace_fp"]) < PCA_FP_MOD
    assert len(rows) == 3 + 64


def test_pca_semdedup_composition():
    """The SemDeDup recipe composes through the public API: project to
    the top components, rebuild an embedding table over the reduced
    vectors, run semdedup there.  An exact duplicate pair (cosine 1 in
    ANY projection) must still be caught in the reduced space."""
    import pyarrow as pa

    from webgraph_ray.stages.cluster import semdedup

    mat = _fixture(n=60, seed=4)
    mat[7] = mat[3]  # planted exact duplicate
    fit = pca_fit(_emb_ds(mat), n_components=8)
    proj = pca_project(_emb_ds(mat), fit).to_pandas().sort_values("vec_id")
    reduced = pa.table(
        {
            "vec_id": pa.array(proj["vec_id"].to_numpy(np.int64)),
            "embedding": pa.array(
                [
                    row.astype(np.float32)
                    for row in proj[[f"pc{i}" for i in range(8)]].to_numpy()
                ],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    res = (
        semdedup(ray.data.from_arrow(reduced), k=4, threshold=0.99)
        .to_pandas()
        .set_index("vec_id")
    )
    assert int(res.loc[7, "is_dup"]) == 1
    assert int(res.loc[7, "dup_of"]) == 3
    assert int(res.loc[3, "is_dup"]) == 0
