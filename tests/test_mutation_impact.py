"""Mutation-loop analog: PageRank invariance under consistent vertex
renaming (scores must transfer exactly through the obfuscation map)."""

import numpy as np

import __ray_entry__ as entrymod


def test_mutation_preserves_scores(sf_dir):
    df = entrymod.q_mutation_impact(sf_dir)
    assert len(df) > 0
    # fixed-point pagerank is bit-exact under a bijective rename
    np.testing.assert_array_equal(
        df["score_before_fp"].to_numpy(), df["score_after_fp"].to_numpy()
    )
    assert df["obf_key"].str.startswith("tool:obf_").all()
