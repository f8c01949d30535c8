"""Duplicate-substring (span) dedup — Lee et al. 2022 semantics:
pairs share a verbatim run of W consecutive whitespace tokens."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from webgraph_ray.stages.dedup import substring_dup_pairs, substring_pairs_sql

BOILER = "all rights reserved contact the webmaster for details"  # 8 tokens


def _ds(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(len(rows), dtype=np.int64),
                "text": rows,
            }
        )
    )


def _pairs(ds, **kw):
    df = substring_dup_pairs(ds, **kw).to_pandas()
    if "doc_a" not in df.columns:  # Ray quirk: empty to_pandas drops cols
        assert df.empty
        return []
    return sorted(map(tuple, df[["doc_a", "doc_b"]].to_numpy()))


def test_shared_boilerplate_pairs_low_jaccard_docs():
    # docs 0 and 1 share ONLY the 8-token boilerplate run; the rest of
    # each text is disjoint, so whole-doc Jaccard is far below 0.5 —
    # exactly the case span dedup exists for.  doc 2 shares nothing.
    rows = [
        "alpha beta gamma delta " * 8 + BOILER,
        BOILER + " omicron pi rho sigma tau " * 8,
        "epsilon zeta eta theta iota kappa " * 10,
    ]
    assert _pairs(_ds(rows), window=8) == [(0, 1)]


def test_window_boundary_exact():
    # share exactly W-1=5 consecutive tokens -> NOT a pair at W=6;
    # the same texts at W=5 ARE a pair
    shared5 = "one two three four five"
    rows = [f"aa bb {shared5} cc dd", f"xx yy zz {shared5} ww"]
    assert _pairs(_ds(rows), window=6) == []
    assert _pairs(_ds(rows), window=5) == [(0, 1)]


def test_internal_repetition_no_self_pair_and_one_row():
    # a doc repeating its own boilerplate never pairs with itself, and
    # its repeated gram still pairs it ONCE with a doc sharing the span
    rows = [BOILER + " filler " + BOILER, "prefix words " + BOILER]
    assert _pairs(_ds(rows), window=8) == [(0, 1)]


def test_hot_gram_gate_raises():
    rows = [f"unique{i} " + BOILER for i in range(10)]
    with pytest.raises(ValueError, match="max_gram_docs"):
        _pairs(_ds(rows), window=8, max_gram_docs=4)


def test_partitioning_invariance(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    a = _pairs(docs.repartition(1), window=6)
    b = _pairs(docs.repartition(13), window=6)
    assert a == b and len(a) > 0


def test_duckdb_mirror_parity(sf_dir):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    got = _pairs(docs, window=6)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(
        map(tuple, con.execute(substring_pairs_sql(6)).df().to_numpy())
    )
    assert got == want
