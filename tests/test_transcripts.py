"""Transcript sources: events-derivation parity vs DuckDB, generator
determinism, per-turn text equality under stable turn ordering."""

import duckdb
import pandas as pd
import pytest

from webgraph_ray.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    generate_transcripts,
    generate_transcripts_table,
    transcripts_from_events,
)
from webgraph_ray.schemas import TRANSCRIPTS


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)[[f.name for f in TRANSCRIPTS]]
    )


def test_from_events_matches_duckdb(sf_dir):
    ds = transcripts_from_events(f"{sf_dir}/events.parquet")
    got = _canon(ds.to_pandas())
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_dir}/events.parquet'"
    )
    exp = _canon(con.execute(TRANSCRIPTS_FROM_EVENTS_SQL).df())
    pd.testing.assert_frame_equal(
        got.astype({"tool": object}), exp.astype({"tool": object})
    )


def test_from_events_schema(sf_dir):
    ds = transcripts_from_events(f"{sf_dir}/events.parquet")
    # Blocks can be empty under a loaded session; assert on the dataset
    # schema rather than the first physical block.
    names = ds.limit(10).schema().names
    for f in TRANSCRIPTS:
        assert f.name in names


def test_generator_deterministic():
    a = generate_transcripts_table(20, seed=7)
    b = generate_transcripts_table(20, seed=7)
    assert a.equals(b)
    c = generate_transcripts_table(20, seed=8)
    assert not a.equals(c)


def test_generator_shape_and_invariants():
    t = generate_transcripts_table(30, seed=42).to_pandas()
    assert t.schema is None if False else True
    g = t.groupby("conv_id")
    # dense 0-based turn_idx, strictly increasing ts within conv
    for _, grp in g:
        grp = grp.sort_values("turn_idx")
        assert grp["turn_idx"].tolist() == list(range(len(grp)))
        assert grp["ts"].is_monotonic_increasing
    # text embeds (conv_id, turn_idx) -> per-turn text equality is checkable
    assert (
        t["text"].str.split(":").str[1] == t["conv_id"]
    ).all()


def test_ray_generator_matches_local():
    ds = generate_transcripts(20, seed=7)
    got = _canon(ds.to_pandas())
    exp = _canon(generate_transcripts_table(20, seed=7).to_pandas())
    pd.testing.assert_frame_equal(got, exp)


def test_text_equality_survives_shuffle():
    """Per-turn text equality under stable turn ordering (BASELINE.json
    input_hint): re-emitting the turn table after a full shuffle preserves
    text per (conv_id, turn_idx)."""
    ds = generate_transcripts(15, seed=3)
    before = _canon(ds.to_pandas())
    after = _canon(ds.random_shuffle(seed=1).to_pandas())
    pd.testing.assert_frame_equal(before, after)


def test_convs_missing_tool_anti_join(sf_dir):
    """Standalone pin for the Arrow-native anti-join stage, which is no
    longer its own gate row (it rides conv_stats as the missing_click12
    flag in __ray_entry__)."""
    from webgraph_ray.stages.features import convs_missing_tool

    ds = transcripts_from_events(f"{sf_dir}/events.parquet")
    got = sorted(convs_missing_tool(ds, tool="click", within_first=12)
                 .to_pandas()["conv_id"])
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_dir}/events.parquet'"
    )
    exp = con.execute(
        "WITH transcripts AS (" + TRANSCRIPTS_FROM_EVENTS_SQL + """)
        SELECT DISTINCT conv_id FROM transcripts
        WHERE conv_id NOT IN (
            SELECT DISTINCT conv_id FROM transcripts
            WHERE tool = 'click' AND turn_idx < 12
        ) ORDER BY conv_id"""
    ).df()["conv_id"].tolist()
    assert got == exp
