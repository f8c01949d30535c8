"""End-to-end corpus-curation funnel vs DuckDB oracle + planted-dup rules."""

import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.pipelines.curate import (
    curated_documents,
    curation_funnel,
    curation_verdict,
)


def test_curation_funnel_vs_duckdb_oracle():
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.queries()["curation_funnel"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = con.execute(entry.oracle_sql()["curation_funnel"]).df()

    def norm(df):
        df = df[sorted(df.columns)].copy()
        df["n_docs"] = df["n_docs"].astype("int64")
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(norm(got), norm(exp), check_dtype=False)
    f = dict(zip(got["stage"], got["n_docs"]))
    assert f["input"] >= f["quality_kept"] >= f["canonical_kept"] >= f["curated"]
    assert f["curated"] > 0


def _corpus_with_dups():
    """60 docs: quality-passing base text, 3 exact copies of doc 7, one
    too-short doc, one repetitive doc."""
    rng = np.random.default_rng(3)
    words = ["the", "a", "of", "and", "to"] + [f"tok{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(words, size=40)) for _ in range(60)
    ]
    texts[20] = texts[7]  # exact dup (20 > 7: 7 stays canonical)
    texts[41] = texts[7]  # another copy
    texts[30] = "x y z"  # too_short
    texts[50] = " ".join(["p q"] * 25)  # repetitive
    return pd.DataFrame(
        {"doc_id": np.arange(60, dtype=np.int64), "text": texts}
    )


def test_curation_verdict_planted_rules():
    df = _corpus_with_dups()
    v = (
        curation_verdict(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(v) == 60
    # dup copies lose canonicity; the min-id original keeps it
    assert v.loc[7, "is_canon"] == 1
    assert v.loc[20, "is_canon"] == 0 and v.loc[41, "is_canon"] == 0
    assert v.loc[20, "curated"] == 0 and v.loc[41, "curated"] == 0
    # quality rejections propagate
    assert v.loc[30, "keep"] == 0 and v.loc[30, "curated"] == 0
    assert v.loc[50, "keep"] == 0 and v.loc[50, "curated"] == 0
    # benchmark slice (doc_id % 20 == 0) never curated
    bench = v.index[v.index % 20 == 0]
    assert (v.loc[bench, "curated"] == 0).all()
    # curated implies all three flags
    cur = v[v["curated"] == 1]
    assert ((cur["keep"] == 1) & (cur["is_canon"] == 1) & (cur["clean"] == 1)).all()
    assert len(cur) > 0


def test_curated_documents_roundtrip(tmp_path):
    df = _corpus_with_dups()
    out = str(tmp_path / "curated")
    kept = curated_documents(ray.data.from_pandas(df), out_dir=out)
    n = kept.count()
    back = ray.data.read_parquet(out).to_pandas().sort_values("doc_id")
    assert len(back) == n
    v = curation_verdict(ray.data.from_pandas(df)).to_pandas()
    expect_ids = sorted(v.loc[v["curated"] == 1, "doc_id"])
    assert list(back["doc_id"]) == expect_ids
    # full original rows survive (text intact)
    orig = df.set_index("doc_id")
    assert (back.set_index("doc_id")["text"] == orig.loc[expect_ids, "text"]).all()


def test_curation_funnel_counts_planted():
    df = _corpus_with_dups()
    f = {
        r.stage: r.n_docs
        for r in curation_funnel(ray.data.from_pandas(df)).itertuples()
    }
    assert f["input"] == 60
    # canonical rule really drops the two kept dup copies
    assert f["canonical_kept"] < f["quality_kept"]
    assert f["curated"] <= f["canonical_kept"]
