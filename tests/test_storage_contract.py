"""Engine work_dir storage contract: an actor whose node cannot see the
build layout must fail loudly, never compute over an empty partition."""

import os
import shutil

import pytest

from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges


def test_missing_layout_fails_loudly(tmp_path):
    edges = derive_edges(generate_transcripts(6, seed=3)).materialize()
    wd = str(tmp_path / "g")
    eng = GraphEngine(wd, num_parts=2)
    eng.build(edges)
    # simulate a node that sees the manifest but not the build layout
    # (partial / non-shared storage)
    shutil.rmtree(os.path.join(wd, "edges"))
    with pytest.raises(Exception, match="missing|shared|layout"):
        try:
            eng.start()
        finally:
            eng.shutdown()


def test_missing_manifest_fails_loudly(tmp_path):
    eng = GraphEngine(str(tmp_path / "never_built"), num_parts=2)
    with pytest.raises(Exception):
        eng.start()
    eng.shutdown()
