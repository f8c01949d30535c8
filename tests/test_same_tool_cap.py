"""same_tool quadratic guard: capped derivation bounds pair fan-out while
the default stays exact."""

import numpy as np
import pandas as pd
import ray.data

from webgraph_ray.stages.edges import derive_edges


def _transcripts(n_turns: int) -> ray.data.Dataset:
    df = pd.DataFrame(
        {
            "conv_id": ["conv_1"] * n_turns,
            "turn_idx": np.arange(n_turns, dtype=np.int32),
            "role": ["assistant"] * n_turns,
            "text": ["x"] * n_turns,
            "tool": ["hammer"] * n_turns,  # every turn uses the same tool
            "ts": pd.to_datetime(np.arange(n_turns), unit="s").astype(
                "datetime64[us]"
            ),
        }
    )
    return ray.data.from_pandas(df)


def test_cap_bounds_pathological_conversation():
    t = _transcripts(40)
    exact = derive_edges(t).to_pandas()
    n_exact = (exact["edge_type"] == "same_tool").sum()
    assert n_exact == 40 * 39 // 2  # quadratic by definition

    capped = derive_edges(t, same_tool_max_turns=5).to_pandas()
    n_capped = (capped["edge_type"] == "same_tool").sum()
    assert n_capped == 5 * 4 // 2
    # the first max_turns tool turns participate (deterministic prefix)
    st = capped[capped["edge_type"] == "same_tool"]
    turns = {int(k.split("#")[1]) for k in st["src_key"]} | {
        int(k.split("#")[1]) for k in st["dst_key"]
    }
    assert turns == set(range(5))
    # other edge types unaffected
    assert (capped["edge_type"] == "reply").sum() == 39
    assert (capped["edge_type"] == "tool_call").sum() == 40
