"""CSV interchange round trip for the edge table."""

import pandas as pd

from webgraph_ray.sources.interchange import read_edges_csv, write_edges_csv
from webgraph_ray.sources.transcripts import generate_transcripts
from webgraph_ray.stages.edges import derive_edges


def test_csv_roundtrip(tmp_path):
    ds = generate_transcripts(12, seed=9)
    edges = derive_edges(ds).materialize()
    out = str(tmp_path / "csv_out")
    write_edges_csv(edges, out)
    back = read_edges_csv(out)

    def canon(df):
        cols = list(df.columns)
        return df.sort_values(cols, kind="mergesort").reset_index(drop=True)

    a = canon(edges.to_pandas())
    b = canon(back.to_pandas())
    pd.testing.assert_frame_equal(a, b)
