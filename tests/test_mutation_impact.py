"""Mutation-loop analog: PageRank invariance under consistent vertex
renaming (scores must transfer exactly through the obfuscation map)."""

import numpy as np

import __ray_entry__ as entrymod


def test_mutation_preserves_scores(sf_dir):
    df = entrymod.q_mutation_impact(sf_dir)
    assert len(df) > 0
    np.testing.assert_allclose(
        df["score_before"].to_numpy(), df["score_after"].to_numpy(), atol=1e-12
    )
    assert df["obf_key"].str.startswith("tool:obf_").all()
