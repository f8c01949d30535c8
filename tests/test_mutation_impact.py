"""Mutation-loop analog across the six deterministic mutation styles:
PageRank invariance under the five bijective key renames (including the
suffix-then-strip roundtrip), and the digit-permutation text mutation
really changing the digit-value sums."""

import numpy as np
import pandas as pd

import __ray_entry__ as entrymod


def test_mutation_styles(sf_dir):
    df = entrymod.q_mutation_impact(sf_dir)
    assert set(df["style"]) == {
        "tool_rename", "key_suffix", "param_strip", "subdomain_prefix",
        "conv_rewrite", "text_digits",
    }

    pr = df[df["metric"] == "pagerank_fp"]
    assert len(pr) > 0
    # fixed-point pagerank is bit-exact under a bijective rename — for all
    # five key-level styles, including the vectorized conv-id rewrite and
    # the param_strip suffix->strip roundtrip back to baseline
    np.testing.assert_array_equal(
        pr["before_fp"].to_numpy(), pr["after_fp"].to_numpy()
    )
    assert (
        df.loc[df["style"] == "tool_rename", "new_key"]
        .str.startswith("tool:obf_").all()
    )
    # seeded suffix: consistent, key-derived, 6 hex chars after '~'
    sfx = df.loc[df["style"] == "key_suffix", "new_key"]
    assert sfx.str.match(r"^tool:.+~[0-9a-f]{6}$").all()
    # subdomain prefix: seeded single-hex group, original name preserved
    sub = df[df["style"] == "subdomain_prefix"]
    assert sub["new_key"].str.match(r"^tool:g[0-9a-f]\..+$").all()
    assert (
        sub["new_key"].str.replace(r"^tool:g[0-9a-f]\.", "tool:", regex=True)
        == sub["old_key"]
    ).all()
    # param_strip round-trips to the original key
    ps = df[df["style"] == "param_strip"]
    assert len(ps) > 0 and (ps["new_key"] == ps["old_key"]).all()

    # the content mutation really happened: digit-value sums change
    td = df[df["style"] == "text_digits"]
    assert len(td) > 0
    assert (td["before_fp"] != td["after_fp"]).any()


def test_conv_rewrite_is_bijective_and_consistent(sf_dir):
    """Same conv prefix -> same rewritten prefix everywhere; distinct
    convs stay distinct (md5-12 collision-free at test scale)."""
    from webgraph_ray.stages.features import conv_rewrite_edges

    edges = entrymod._edges(sf_dir)
    orig = edges.to_pandas()
    mut = conv_rewrite_edges(edges).to_pandas()

    def conv_of(s: pd.Series) -> pd.Series:
        return s.str.rpartition("#")[0]

    pairs = pd.DataFrame(
        {
            "old": pd.concat([conv_of(orig["src_key"]), conv_of(orig["dst_key"])]),
            "new": pd.concat([conv_of(mut["src_key"]), conv_of(mut["dst_key"])]),
        }
    )
    pairs = pairs[pairs["old"] != ""].drop_duplicates()
    # consistent: one new prefix per old prefix; bijective: no merging
    assert pairs.groupby("old")["new"].nunique().eq(1).all()
    assert pairs.groupby("new")["old"].nunique().eq(1).all()
    # tool keys pass through untouched
    tool_rows = orig["dst_key"].str.startswith("tool:")
    assert (mut.loc[tool_rows, "dst_key"] == orig.loc[tool_rows, "dst_key"]).all()


def test_mutate_text_digits_roundtrip(sf_dir):
    """The digit permutation is length-preserving and invertible."""
    from webgraph_ray.stages.features import DIGIT_PERM, mutate_text_digits

    t = entrymod._transcripts(sf_dir)
    orig = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    mut = (
        mutate_text_digits(t)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (orig["text"].str.len() == mut["text"].str.len()).all()
    inv = str.maketrans(DIGIT_PERM, "0123456789")
    assert (mut["text"].str.translate(inv) == orig["text"]).all()
