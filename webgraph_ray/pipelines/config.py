"""Config-gated pipeline selection — the reference's ``features_to_extract``
YAML gating (/root/reference/code/features.yaml:15-19,
code/features/feature_extraction.py:40-47: a config list decides which
feature-family functions run; code/run.py:136-143: a mode switch decides
which graph components are built) as a first-class entry point over this
engine's registries.

A config is a dict (or a YAML/JSON file path):

    edge_rules:  [reply, tool_call, same_tool]   # stages/edges.py registry
    features:    [degrees, edge_type_counts, chain_depth, rule_labels,
                  endpoint_weight_stats, degree_histogram]
    algorithms:  [pagerank, components, labelprop, triangles]

Unknown names fail loudly (mirroring the reference's config validation,
code/run.py:229-231).  ``run_from_config`` returns a dict of lazy Datasets
/ result frames, so callers compose further or write selectively.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any

import ray.data

DEFAULT_CONFIG: dict[str, Any] = {
    "edge_rules": ["reply", "tool_call", "same_tool"],
    "features": [
        "degrees",
        "edge_type_counts",
        "chain_depth",
        "rule_labels",
        "endpoint_weight_stats",
        "degree_histogram",
    ],
    "algorithms": ["pagerank", "components", "labelprop", "triangles"],
}

KNOWN_FEATURES = (
    "degrees",
    "edge_type_counts",
    "chain_depth",
    "rule_labels",
    "endpoint_weight_stats",
    "degree_histogram",
    "vertex_features",
)
KNOWN_ALGORITHMS = ("pagerank", "pagerank_fixed", "components", "labelprop", "triangles")


def load_config(config: dict | str | None) -> dict[str, Any]:
    if config is None:
        return dict(DEFAULT_CONFIG)
    if isinstance(config, dict):
        cfg = dict(config)
    else:
        with open(config) as f:
            if config.endswith((".yaml", ".yml")):
                import yaml

                cfg = yaml.safe_load(f)
            else:
                import json

                cfg = json.load(f)
    out = dict(DEFAULT_CONFIG)
    out.update(cfg or {})
    unknown_f = set(out["features"]) - set(KNOWN_FEATURES)
    unknown_a = set(out["algorithms"]) - set(KNOWN_ALGORITHMS)
    if unknown_f:
        raise ValueError(
            f"unknown features {sorted(unknown_f)!r}; known: {KNOWN_FEATURES}"
        )
    if unknown_a:
        raise ValueError(
            f"unknown algorithms {sorted(unknown_a)!r}; known: {KNOWN_ALGORITHMS}"
        )
    return out


def run_from_config(
    sf_dir: str,
    config: dict | str | None = None,
    work_dir: str | None = None,
) -> dict[str, Any]:
    """events -> selected edge rules -> selected features + algorithms."""
    from webgraph_ray.sources.transcripts import transcripts_from_events
    from webgraph_ray.stages import features as F
    from webgraph_ray.stages.edges import derive_edges
    from webgraph_ray.stages.vertices import degrees, derive_vertices

    cfg = load_config(config)
    own_work = work_dir is None
    if own_work:
        work_dir = tempfile.mkdtemp(prefix="webgraph_cfg_")

    import shutil

    transcripts = transcripts_from_events(os.path.join(sf_dir, "events.parquet"))
    edges = derive_edges(transcripts, rules=cfg["edge_rules"]).materialize()
    vertices = derive_vertices(edges).materialize()
    out: dict[str, Any] = {"edges": edges, "vertices": vertices}

    deg = None
    for name in cfg["features"]:
        if name == "degrees":
            out["degrees"] = deg = degrees(edges)
        elif name == "edge_type_counts":
            out["edge_type_counts"] = F.edge_type_counts(edges)
        elif name == "chain_depth":
            out["chain_depth"] = F.chain_depth(edges)
        elif name == "rule_labels":
            out["rule_labels"] = F.rule_labels(vertices)
        elif name == "endpoint_weight_stats":
            out["endpoint_weight_stats"] = F.endpoint_weight_stats(edges)
        elif name == "degree_histogram":
            out["degree_histogram"] = F.degree_histogram(
                deg if deg is not None else degrees(edges)
            )
        elif name == "vertex_features":
            from webgraph_ray.pipelines.vertex_features import vertex_features

            out["vertex_features"] = vertex_features(
                edges, vertices, work_dir=os.path.join(work_dir, "vf")
            )

    for name in cfg["algorithms"]:
        if name == "triangles":
            from webgraph_ray.graph.triangles import triangle_counts

            total, per_vertex = triangle_counts(edges)
            out["triangle_total"] = total
            out["triangles_per_vertex"] = per_vertex
            continue
        from webgraph_ray.graph.engine import GraphEngine

        eng = GraphEngine(os.path.join(work_dir, name), num_parts=None)
        try:
            if name == "pagerank":
                eng.build(edges)
                out["pagerank"] = eng.pagerank(tol=1e-6).materialize()
            elif name == "pagerank_fixed":
                from webgraph_ray.functions.oracles import PR_FP_ITERS

                eng.build(edges)
                out["pagerank_fixed"] = eng.pagerank_fixed(
                    iters=PR_FP_ITERS
                ).materialize()
            elif name == "components":
                eng.build(edges, symmetrize=True)
                out["components"] = eng.components().materialize()
            else:  # labelprop
                import numpy as np
                import pyarrow.compute as pc

                eng.build(edges, symmetrize=True)
                tools = (
                    vertices.map_batches(
                        lambda t: t.filter(pc.equal(t["vertex_type"], "tool")),
                        batch_format="pyarrow",
                    )
                    .select_columns(["vertex_id"])
                    .to_pandas()["vertex_id"]
                    .to_numpy(np.int64)
                )
                out["labelprop"] = eng.labelprop(seeds=tools).materialize()
        finally:
            eng.shutdown()
    if own_work:
        # algorithm/feature results are materialized above, so the build
        # layout is no longer referenced
        shutil.rmtree(work_dir, ignore_errors=True)
    return out
