"""Greedy mutation loop invariants: deterministic candidates, strictly
decreasing accepted objective, exactly one accepted style per round."""

import numpy as np
import pytest

from webgraph_ray.pipelines.greedy import greedy_mutation
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges


@pytest.fixture(scope="module")
def edges():
    return derive_edges(generate_transcripts(30, seed=9)).materialize()


def test_greedy_loop_invariants(edges):
    df = greedy_mutation(edges, rounds=3)
    assert len(df) > 0
    rounds = sorted(df["round"].unique())
    # every finished round accepted at most one candidate; accepted rounds
    # form a strictly decreasing objective sequence
    prev = None
    for r in rounds:
        g = df[df["round"] == r]
        acc = g[g["accepted"]]
        assert len(acc) <= 1, r
        # candidate evaluation is complete: both styles tried
        assert set(g["style"]) == {"split_tool", "drop_tool_calls"}
        if len(acc):
            row = acc.iloc[0]
            assert row["obj_after_fp"] < row["obj_before_fp"]
            if prev is not None:
                assert row["obj_before_fp"] == prev
            prev = row["obj_after_fp"]
    assert df["accepted"].sum() >= 2  # the loop makes real progress
    # split_tool moves mass to a clone: affected partitions reported
    assert (df["affected_parts"] >= 1).all()
    assert (df["affected_parts"] <= df["total_parts"]).all()
