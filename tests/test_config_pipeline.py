"""Config-gated pipeline selection (the reference's features_to_extract /
mode-switch analog): gating works, unknown names fail loudly."""

import numpy as np
import pytest

from webgraph_ray.pipelines.config import DEFAULT_CONFIG, load_config, run_from_config


def test_gating_selects_stages(sf_dir, tmp_path):
    out = run_from_config(
        sf_dir,
        {
            "edge_rules": ["reply", "tool_call"],
            "features": ["degrees", "rule_labels"],
            "algorithms": ["components"],
        },
        work_dir=str(tmp_path),
    )
    assert set(out) == {
        "edges", "vertices", "degrees", "rule_labels", "components",
    }
    # same_tool gated out: no such edges derived
    et = set(
        out["edges"].select_columns(["edge_type"]).unique("edge_type")
    )
    assert et == {"reply", "tool_call"}
    assert out["components"].count() == out["vertices"].count()


def test_yaml_roundtrip_and_validation(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("features: [degrees]\nalgorithms: []\n")
    cfg = load_config(str(p))
    assert cfg["features"] == ["degrees"]
    assert cfg["edge_rules"] == DEFAULT_CONFIG["edge_rules"]  # defaulted
    with pytest.raises(ValueError, match="unknown features"):
        load_config({"features": ["nope"]})
    with pytest.raises(ValueError, match="unknown algorithms"):
        load_config({"algorithms": ["nope"]})
