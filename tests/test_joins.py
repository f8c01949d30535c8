"""bucketed_join: the explicit partitioned hash join."""

import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.functions.joins import bucketed_join


def test_inner_basic():
    l = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3], "x": ["a", "b", "c"]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [2, 3, 4], "y": [20, 30, 40]}))
    out = bucketed_join(l, r, keys=["k"]).to_pandas().sort_values("k")
    assert out[["k", "y"]].values.tolist() == [[2, 20], [3, 30]]


def test_left_semi():
    l = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 2, 3], "x": list("abcd")}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [2, 2, 5]}))
    out = bucketed_join(l, r, keys=["k"], how="left_semi").to_pandas()
    assert sorted(out["x"]) == ["b", "c"]


def test_large_int64_keys_precision():
    """Keys above 2^53 must survive the union padding (float64 would
    corrupt them)."""
    ks = np.array(
        [2**62 + 1, 2**62 + 2, -(2**62) - 7, 12345], dtype=np.int64
    )
    l = ray.data.from_pandas(pd.DataFrame({"k": ks, "x": [1, 2, 3, 4]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": ks[:3], "y": [10, 20, 30]}))
    out = bucketed_join(l, r, keys=["k"]).to_pandas()
    assert len(out) == 3
    assert set(out["k"]) == set(ks[:3].tolist())


def test_chained_joins_keep_dtypes():
    l = ray.data.from_pandas(
        pd.DataFrame({"a": [2**60, 2**60 + 1], "b": [2**61, 2**61 + 1]})
    )
    da = ray.data.from_pandas(pd.DataFrame({"a": [2**60, 2**60 + 1], "da": [1, 2]}))
    db = ray.data.from_pandas(pd.DataFrame({"b": [2**61, 2**61 + 1], "db": [3, 4]}))
    out = bucketed_join(bucketed_join(l, da, keys=["a"]), db, keys=["b"]).to_pandas()
    assert len(out) == 2
    assert out.dtypes["a"] == np.int64 and out.dtypes["b"] == np.int64


def test_empty_sides():
    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "x": [9]}))
    empty = l.limit(0)
    assert bucketed_join(empty, l, keys=["k"]).count() == 0
    assert bucketed_join(l, empty, keys=["k"]).count() == 0


def test_string_keys():
    l = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b"], "x": [1, 2]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": ["b", "c"], "y": [9, 8]}))
    out = bucketed_join(l, r, keys=["k"]).to_pandas()
    assert out.values.tolist() == [["b", 2, 9]]
