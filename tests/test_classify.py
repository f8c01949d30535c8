"""Classifier-stage units: model save/load round-trip and scorer equality;
fold assignment determinism."""

import numpy as np
import pandas as pd

from webgraph_ray.pipelines.classify import (
    MODEL_WEIGHTS,
    LinearScorer,
    save_model,
)


def _features_frame() -> pd.DataFrame:
    rng = np.random.default_rng(3)
    n = 50
    df = pd.DataFrame({c: rng.integers(0, 20, n) for c in MODEL_WEIGHTS})
    df["score_fp"] = rng.integers(0, 10**11, n)
    df["vertex_key"] = [
        f"conv_{i % 7}#{i}" if i % 5 else "tool:t" + str(i) for i in range(n)
    ]
    df["label"] = np.where(rng.integers(0, 2, n) == 1, "late_turn", "other")
    return df


def test_model_save_load_roundtrip(tmp_path):
    path = save_model(str(tmp_path / "model.json"))
    df = _features_frame()
    from_dict = LinearScorer()(df)
    from_file = LinearScorer(weights=path)(df)
    pd.testing.assert_frame_equal(from_dict, from_file)
    # scoring is exact int64 and deterministic
    pd.testing.assert_frame_equal(from_dict, LinearScorer()(df))
    assert from_dict["z"].dtype == np.int64
    # tool vertices carry fold -1; turn vertices fold in [0, k)
    tools = from_dict[from_dict["vertex_key"].str.startswith("tool:")]
    turns = from_dict[~from_dict["vertex_key"].str.startswith("tool:")]
    assert (tools["fold"] == -1).all()
    assert turns["fold"].between(0, 9).all()
