"""webgraph_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the *capabilities* of spring-epfl/WebGraph
(graph construction from tabular event logs + per-vertex graph analytics,
reference at /root/reference) as an idiomatic Ray Data engine:

- input: Parquet tables of multi-turn conversation / agent transcripts
  ``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp[us])``
- edge derivation via ``map_batches`` over zero-copy Arrow batches
  (reply / tool_call / same_tool rules — the analogs of the reference's
  redirect-chain, storage and set->get indirect edges)
- global graph algorithms (PageRank, connected components, label
  propagation, triangle counting) as BSP iterations over per-partition CSR
  blocks held in actor-pool workers, with message exchange as
  groupby-aggregate-style combines keyed on destination-vertex ranges
- per-iteration, per-partition checkpoints with lineage + counters for
  mid-algorithm resume
- training-data ops (dedup families, ANN, text analysis, multimodal
  plumbing) over the ``documents`` / ``embeddings`` tables.

None of this code calls ``ray.init()`` — sessions are owned by the caller
(bench.py, test fixtures, the driver).
"""

__version__ = "0.1.0"
