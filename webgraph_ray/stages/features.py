"""Graph-feature operators rounding out the reference's per-node feature
families (SURVEY.md §2.6/§2.7) as global Ray Data stages.

- chain_depth:       per-vertex depth along reply chains — the analog of
                     the reference's redirect-depth reverse-walk
                     (/root/reference/code/features/utils.py:147-190),
                     computed by walking each conversation's successor map
                     inside hash-bucketed groups.
- RuleLabeller:      actor-pool rule classifier — the analog of the
                     compiled AdblockRules filter lists applied per node
                     (/root/reference/code/labelling/node_labelling.py:22-123,
                     rules compiled once per worker in __init__).
- remap_vertices:    consistent vertex-key rewrite against a broadcast
                     mapping — the analog of the robustness obfuscators
                     (/root/reference/robustness/content_mutation/content_mutation.py:23-71).
- degree_histogram:  global degree-distribution aggregate — the analog of
                     average-degree-connectivity computed once instead of
                     per node (/root/reference/code/features/structure.py:171).
- convs_missing_tool: anti-join (broadcast key set + negated membership) —
                     the analog of the reference's
                     ``~isin(completed_ids)`` anti-join
                     (/root/reference/code/graph/request_edges.py:266).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from webgraph_ray.functions.hashing import hash_keys


# ---------------------------------------------------------------------------
# chain depth
# ---------------------------------------------------------------------------


def chain_depth(edges: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """(vertex_key, chain_depth) for every vertex on a reply chain.

    Roots (never a reply target) get depth 0; each reply hop adds 1.  The
    walk runs per conversation inside conversation-hash buckets."""
    reply = edges.map_batches(
        lambda t: t.filter(pc.equal(t["edge_type"], "reply")).select(
            ["conv_id", "src_key", "dst_key"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucket(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "conv_bucket", pa.array((hash_keys(conv) % num_buckets).astype(np.int32))
        )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_d = [], []
        for _, cg in g.groupby("conv_id", sort=False):
            succ = dict(zip(cg["src_key"], cg["dst_key"]))
            targets = set(cg["dst_key"])
            roots = [s for s in succ if s not in targets]
            for root in roots:
                depth = 0
                out_k.append(root)
                out_d.append(depth)
                cur = root
                while cur in succ:
                    cur = succ[cur]
                    depth += 1
                    out_k.append(cur)
                    out_d.append(depth)
        return pd.DataFrame(
            {
                "vertex_key": pd.Series(out_k, dtype=object),
                "chain_depth": pd.Series(out_d, dtype=np.int64),
            }
        )

    return (
        reply.map_batches(bucket, batch_format="pyarrow")
        .groupby("conv_bucket")
        .map_groups(walk, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# rule labelling (actor pool)
# ---------------------------------------------------------------------------

# (rule_name, regex) applied in order; first match wins, else 'unlabelled'.
# Shared verbatim with the SQL oracle in __ray_entry__.py.
LABEL_RULES = (
    ("tool", r"^tool:"),
    ("conv_root", r"#0$"),
    ("early_turn", r"#[1-9]$"),
    ("late_turn", r"#\d{2,}$"),
)


class RuleLabeller:
    """Rules compiled ONCE per actor (__init__), applied per batch — the
    stateful-classifier pattern.  Use with map_batches(RuleLabeller,
    concurrency=N)."""

    def __init__(self):
        self.rules = [(name, re.compile(rx)) for name, rx in LABEL_RULES]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        keys = df["vertex_key"].astype(str)
        label = np.full(len(df), "unlabelled", dtype=object)
        unset = np.ones(len(df), dtype=bool)
        for name, rx in self.rules:
            m = unset & keys.str.contains(rx).to_numpy()
            label[m] = name
            unset &= ~m
        return pd.DataFrame({"vertex_key": keys, "label": label})


def rule_labels(vertices: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    return vertices.select_columns(["vertex_key"]).map_batches(
        RuleLabeller, batch_format="pandas", concurrency=concurrency
    )


# ---------------------------------------------------------------------------
# vertex remapping (obfuscation analog)
# ---------------------------------------------------------------------------


def tool_obfuscation_mapping(edges: ray.data.Dataset) -> dict[str, str]:
    """Deterministic mapping: sorted distinct tool keys -> tool:obf_<i>."""
    tool_keys = sorted(
        set(
            edges.map_batches(
                lambda t: t.filter(
                    pc.starts_with(t["dst_key"], "tool:")
                ).select(["dst_key"]),
                batch_format="pyarrow",
            )
            .unique("dst_key")
        )
    )
    return {k: f"tool:obf_{i}" for i, k in enumerate(tool_keys)}


def remap_vertices(
    edges: ray.data.Dataset, mapping: dict[str, str]
) -> ray.data.Dataset:
    """Rewrite src/dst keys (and ids) through a broadcast mapping —
    ray.put once, dict probe per batch; unmapped keys pass through."""
    ref = ray.put(mapping)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        out = df.copy()
        out["src_key"] = out["src_key"].map(lambda k: m.get(k, k))
        out["dst_key"] = out["dst_key"].map(lambda k: m.get(k, k))
        out["src"] = hash_keys(out["src_key"].to_numpy(dtype=object))
        out["dst"] = hash_keys(out["dst_key"].to_numpy(dtype=object))
        return out

    return edges.map_batches(rewrite, batch_format="pandas")


# ---------------------------------------------------------------------------
# degree histogram (avg-degree-connectivity analog)
# ---------------------------------------------------------------------------


def degree_histogram(degrees_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(out_degree, n_vertices, sum_in_degree) — one global aggregate
    instead of the reference's per-node recomputation."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("out_degree", sort=False).agg(
            n_vertices=("vertex_key", "size"), sum_in_degree=("in_degree", "sum")
        )
        return g.reset_index().astype(
            {"out_degree": np.int64, "n_vertices": np.int64, "sum_in_degree": np.int64}
        )

    return (
        degrees_ds.map_batches(partial, batch_format="pandas")
        .groupby("out_degree")
        .aggregate(
            Sum("n_vertices", alias_name="n_vertices"),
            Sum("sum_in_degree", alias_name="sum_in_degree"),
        )
    )


# ---------------------------------------------------------------------------
# anti-join
# ---------------------------------------------------------------------------


def convs_missing_tool(
    transcripts: ray.data.Dataset, tool: str = "click", within_first: int = 12
) -> ray.data.Dataset:
    """Conversations with no ``tool`` call in their first ``within_first``
    turns: broadcast the (small) matching conv set, anti-join by negated
    membership inside map_batches."""
    hits = (
        transcripts.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.equal(pc.coalesce(t["tool"], pa.scalar("")), tool),
                    pc.less(t["turn_idx"], within_first),
                )
            ).select(["conv_id"]),
            batch_format="pyarrow",
        ).unique("conv_id")
    )
    hit_ref = ray.put(frozenset(hits))

    def anti(t: pa.Table) -> pa.Table:
        hit = ray.get(hit_ref)
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        mask = np.array([c not in hit for c in conv])
        return pa.table({"conv_id": pa.array(np.unique(conv[mask]), pa.string())})

    # per-batch partial unique, then a global distinct
    return (
        transcripts.select_columns(["conv_id"])
        .map_batches(anti, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["conv_id"])
    )
