"""Triangle counting vs networkx oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from webgraph_ray.graph import oracle
from webgraph_ray.graph.triangles import triangle_counts
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges


@pytest.fixture(scope="module")
def tri_fixture():
    ds = generate_transcripts(25, seed=31)
    edges = derive_edges(ds).materialize()
    return edges, edges.to_pandas()


def test_total_and_per_vertex(tri_fixture):
    edges, pdf = tri_fixture
    exp_total, exp_per = oracle.triangles_oracle(pdf)
    got_total, got_per_ds = triangle_counts(edges, num_partitions=4)
    assert got_total == exp_total and exp_total > 0
    got = got_per_ds.to_pandas().set_index("vertex_id")["triangles"]
    for vid, cnt in exp_per.items():
        if cnt:
            assert int(got.loc[vid]) == cnt, vid
    # engine emits rows only for triangle-participating vertices
    assert set(got.index) == {v for v, c in exp_per.items() if c > 0}


def test_simple_known_graph():
    # K4 minus one edge has 2 triangles
    edges = pd.DataFrame(
        {
            "src": [1, 1, 1, 2, 2],
            "dst": [2, 3, 4, 3, 4],
            "weight": 1,
        }
    )
    ds = ray.data.from_pandas(edges)
    total, per = triangle_counts(ds, num_partitions=2)
    assert total == 2
    p = per.to_pandas().set_index("vertex_id")["triangles"]
    assert int(p.loc[1]) == 2 and int(p.loc[2]) == 2
    assert int(p.loc[3]) == 1 and int(p.loc[4]) == 1


def test_bucketed_path_matches_broadcast(tri_fixture):
    """Forcing broadcast_threshold=0 exercises the scale path (bucketed
    joins); result must be identical."""
    edges, pdf = tri_fixture
    exp_total, _ = oracle.triangles_oracle(pdf)
    got_total, _ = triangle_counts(edges, num_partitions=4, broadcast_threshold=0)
    assert got_total == exp_total


def test_directed_duplicates_collapse():
    # both directions + parallel edges count once
    edges = pd.DataFrame(
        {
            "src": [1, 2, 2, 3, 3, 1, 1],
            "dst": [2, 1, 3, 2, 1, 3, 2],
            "weight": 1,
        }
    )
    total, _ = triangle_counts(ray.data.from_pandas(edges), num_partitions=2)
    assert total == 1
