"""Edge derivation: rule semantics vs a pandas oracle, shuffle-invariance,
vertex table, degrees."""

import numpy as np
import pandas as pd
import pytest

from webgraph_ray.functions.hashing import hash_keys, collision_audit
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges
from webgraph_ray.stages.vertices import derive_vertices, degrees


def oracle_edges(t: pd.DataFrame) -> pd.DataFrame:
    """Trusted driver-side derivation (plain pandas, independent code path)."""
    t = t.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rows = []
    for conv, g in t.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        recs = list(g.itertuples())
        for prev, cur in zip(recs, recs[1:]):
            rows.append(
                (f"{conv}#{prev.turn_idx}", f"{conv}#{cur.turn_idx}", "reply", cur.ts)
            )
        tools = [r for r in recs if isinstance(r.tool, str)]
        for r in tools:
            rows.append((f"{conv}#{r.turn_idx}", f"tool:{r.tool}", "tool_call", r.ts))
        for i, a in enumerate(tools):
            for b in tools[i + 1 :]:
                if a.tool == b.tool and a.turn_idx < b.turn_idx:
                    rows.append(
                        (f"{conv}#{a.turn_idx}", f"{conv}#{b.turn_idx}", "same_tool", b.ts)
                    )
    out = pd.DataFrame(rows, columns=["src_key", "dst_key", "edge_type", "ts"])
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out


def _canon(df):
    return (
        df.sort_values(["edge_type", "src_key", "dst_key"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def small():
    ds = generate_transcripts(25, seed=11)
    t = ds.to_pandas()
    edges = derive_edges(ds)
    e = edges.to_pandas()
    return t, edges, e


def test_edges_match_oracle(small):
    t, _, e = small
    exp = _canon(oracle_edges(t))
    got = _canon(e[["src_key", "dst_key", "edge_type", "ts"]])
    pd.testing.assert_frame_equal(got, exp)


def test_edge_ids_are_key_hashes(small):
    _, _, e = small
    assert (e["src"].to_numpy() == hash_keys(e["src_key"].to_numpy(dtype=object))).all()
    assert (e["dst"].to_numpy() == hash_keys(e["dst_key"].to_numpy(dtype=object))).all()
    assert collision_audit(
        np.concatenate([e["src_key"].to_numpy(dtype=object), e["dst_key"].to_numpy(dtype=object)]),
        np.concatenate([e["src"].to_numpy(), e["dst"].to_numpy()]),
    )


def test_edges_shuffle_invariant():
    ds = generate_transcripts(12, seed=5)
    a = _canon(derive_edges(ds).to_pandas()[["src_key", "dst_key", "edge_type"]])
    b = _canon(
        derive_edges(ds.random_shuffle(seed=9)).to_pandas()[
            ["src_key", "dst_key", "edge_type"]
        ]
    )
    pd.testing.assert_frame_equal(a, b)


def test_vertices(small):
    t, edges, e = small
    v = derive_vertices(edges).to_pandas()
    all_keys = set(e["src_key"]) | set(e["dst_key"])
    assert set(v["vertex_key"]) == all_keys
    assert v["vertex_key"].is_unique
    tool_rows = v[v["vertex_type"] == "tool"]
    assert (tool_rows["vertex_key"].str.startswith("tool:")).all()
    assert tool_rows["conv_id"].isna().all()
    # first_ts is the min ts over all edge rows mentioning the vertex
    exp_first = (
        pd.concat(
            [
                e[["src_key", "ts"]].rename(columns={"src_key": "k"}),
                e[["dst_key", "ts"]].rename(columns={"dst_key": "k"}),
            ]
        )
        .groupby("k")["ts"]
        .min()
    )
    got = v.set_index("vertex_key")["first_ts"]
    pd.testing.assert_series_equal(
        got.sort_index(), exp_first.sort_index(), check_names=False
    )


def test_degrees(small):
    _, edges, e = small
    d = degrees(edges).to_pandas().set_index("vertex_key")
    exp_out = e.groupby("src_key").size()
    exp_in = e.groupby("dst_key").size()
    for k in d.index:
        assert d.loc[k, "out_degree"] == exp_out.get(k, 0)
        assert d.loc[k, "in_degree"] == exp_in.get(k, 0)
