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
from ray.data.aggregate import Sum

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
        """Vectorized chain walk for path-shaped reply graphs (each vertex
        has at most one reply successor/predecessor — the derivation
        contract): sort by (conv, dst turn); a chain breaks where the edge's
        src is not the previous edge's dst; depth = position in chain.
        Replaces the round-1 per-row dict walk."""
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "vertex_key": pd.Series(dtype=object),
                    "chain_depth": pd.Series(dtype=np.int64),
                }
            )
        dst_turn = (
            g["dst_key"].str.extract(r"#(\d+)$")[0].astype(np.int64)
        )
        g = g.assign(__dst_turn=dst_turn).sort_values(
            ["conv_id", "__dst_turn"], kind="mergesort"
        )
        new_chain = (
            (g["conv_id"] != g["conv_id"].shift(1))
            | (g["src_key"] != g["dst_key"].shift(1))
        ).to_numpy()
        # depth of a dst = its 1-based position within its chain
        starts = np.flatnonzero(new_chain)
        counts = np.diff(np.append(starts, len(g)))
        depth = np.arange(len(g), dtype=np.int64) - np.repeat(starts, counts) + 1
        roots = g.loc[new_chain, "src_key"]
        return pd.DataFrame(
            {
                "vertex_key": pd.Series(
                    np.concatenate([roots.to_numpy(dtype=object), g["dst_key"].to_numpy(dtype=object)]),
                    dtype=object,
                ),
                "chain_depth": np.concatenate(
                    [np.zeros(len(roots), dtype=np.int64), depth]
                ),
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


# Content-side mutation styles — the analogs of the reference's
# query-string / domain randomizers
# (/root/reference/robustness/content_mutation/obfuscation.py:15-190),
# made deterministic (seeded md5 / fixed digit permutation) so every style
# has an exact DuckDB mirror.
MUTATION_SEED = "s42"
# fixed permutation of '0123456789' (the seeded translate table both
# engines share verbatim)
DIGIT_PERM = "5079328146"


def key_suffix_mapping(
    edges: ray.data.Dataset, seed: str = MUTATION_SEED
) -> dict[str, str]:
    """Seeded consistent key-suffix randomization: every tool key gains a
    deterministic 6-hex suffix (``tool:click`` -> ``tool:click~a3f0b1``) —
    the query-string *value* randomizer analog (same key always maps to
    the same obfuscated key, like the reference's per-URL consistent
    replacement)."""
    import hashlib

    tool_keys = sorted(
        set(
            edges.map_batches(
                lambda t: t.filter(
                    pc.starts_with(t["dst_key"], "tool:")
                ).select(["dst_key"]),
                batch_format="pyarrow",
            ).unique("dst_key")
        )
    )
    return {
        k: f"{k}~{hashlib.md5((seed + k).encode()).hexdigest()[:6]}"
        for k in tool_keys
    }


def subdomain_prefix_mapping(
    edges: ray.data.Dataset, seed: str = MUTATION_SEED
) -> dict[str, str]:
    """Seeded subdomain-style rewrite: every tool key gains a
    deterministic group prefix (``tool:click`` -> ``tool:g7.click`` with
    ``7`` = first hex char of md5(seed+key)) — the subdomain-rewrite
    obfuscator analog
    (/root/reference/robustness/content_mutation/obfuscation.py:15-190).
    The original name survives after the prefix, so the rename stays
    bijective and exact fixed-point PageRank is invariant."""
    import hashlib

    tool_keys = sorted(
        set(
            edges.map_batches(
                lambda t: t.filter(
                    pc.starts_with(t["dst_key"], "tool:")
                ).select(["dst_key"]),
                batch_format="pyarrow",
            ).unique("dst_key")
        )
    )
    return {
        k: (
            "tool:g"
            + hashlib.md5((seed + k).encode()).hexdigest()[:1]
            + "."
            + k[len("tool:") :]
        )
        for k in tool_keys
    }


def conv_rewrite_edges(
    edges: ray.data.Dataset, seed: str = MUTATION_SEED
) -> ray.data.Dataset:
    """Seeded conversation-id rewrite: every turn key's conv prefix is
    replaced by a 12-hex digest (``conv_12#5`` -> ``conv_a3f...#5``) — the
    domain-rename analog (the 'path' / turn index survives; the 'domain' /
    conversation identity is randomized consistently across EVERY key that
    embeds it, including same_tool edges whose endpoints live in other
    conversations).  Vectorized per batch with no driver-side mapping —
    the rewrite is pure key arithmetic, so it scales to any vertex count."""
    import hashlib

    def rewrite_col(keys: pd.Series) -> pd.Series:
        def one(k: str) -> str:
            if k.startswith("tool:"):
                return k
            conv, _, turn = k.rpartition("#")
            h = hashlib.md5((seed + conv).encode()).hexdigest()[:12]
            return f"conv_{h}#{turn}"

        return keys.map(one)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["src_key"] = rewrite_col(out["src_key"])
        out["dst_key"] = rewrite_col(out["dst_key"])
        out["src"] = hash_keys(out["src_key"].to_numpy(dtype=object))
        out["dst"] = hash_keys(out["dst_key"].to_numpy(dtype=object))
        return out

    return edges.map_batches(rewrite, batch_format="pandas")


def mutate_text_digits(
    transcripts: ray.data.Dataset, perm: str = DIGIT_PERM
) -> ray.data.Dataset:
    """Length-preserving content mutation: rewrite every digit in the turn
    text through a fixed permutation table — the numeric query-string-value
    randomizer analog (``random_with_N_digits`` keeps the digit count; this
    keeps it deterministically).  ``str.translate`` through a C-level table
    per batch; mirrored by DuckDB ``translate(text, ...)``."""
    table = str.maketrans("0123456789", perm)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["text"] = out["text"].str.translate(table)
        return out

    return transcripts.map_batches(rewrite, batch_format="pandas")


def remap_vertices(
    edges: ray.data.Dataset, mapping: dict[str, str]
) -> ray.data.Dataset:
    """Rewrite src/dst keys (and ids) through a broadcast mapping —
    ray.put once, dict probe per batch; unmapped keys pass through."""
    ref = ray.put(mapping)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        out = df.copy()
        # Series.map(dict) is the C lookup path; NaN -> key unchanged
        out["src_key"] = out["src_key"].map(m).fillna(out["src_key"])
        out["dst_key"] = out["dst_key"].map(m).fillna(out["dst_key"])
        out["src"] = hash_keys(out["src_key"].to_numpy(dtype=object))
        out["dst"] = hash_keys(out["dst_key"].to_numpy(dtype=object))
        return out

    return edges.map_batches(rewrite, batch_format="pandas")


# ---------------------------------------------------------------------------
# per-vertex typed edge counts (wide)
# ---------------------------------------------------------------------------

EDGE_TYPE_COUNT_COLS = (
    "reply_in", "reply_out", "tool_call_in", "tool_call_out",
    "same_tool_in", "same_tool_out",
)


def edge_type_counts(edges: ray.data.Dataset) -> ray.data.Dataset:
    """One row per vertex with in/out counts per edge type — the one-pass
    pivoted analog of the reference's per-node filtered edge-count features
    (/root/reference/code/features/dataflow.py:8-107).  Map-side partial
    pivot, then one groupby-Sum over the partial rows."""
    e = edges.select_columns(["src_key", "dst_key", "edge_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = (
            df.groupby(["src_key", "edge_type"], sort=False)
            .size()
            .unstack(fill_value=0)
            .rename(columns=lambda c: f"{c}_out")
        )
        ins = (
            df.groupby(["dst_key", "edge_type"], sort=False)
            .size()
            .unstack(fill_value=0)
            .rename(columns=lambda c: f"{c}_in")
        )
        merged = outs.join(ins, how="outer").fillna(0).astype(np.int64)
        merged = merged.reindex(columns=list(EDGE_TYPE_COUNT_COLS), fill_value=0)
        merged.index.name = "vertex_key"
        merged.columns.name = None  # unstack names the columns index
        return merged.reset_index()

    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = default_num_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (
            hash_keys(df["vertex_key"].to_numpy(dtype=object)) % nb
        ).astype(np.int32)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("vertex_key", sort=False)[list(EDGE_TYPE_COUNT_COLS)]
            .sum()
            .reset_index()
        )

    return (
        e.map_batches(partial, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# per-endpoint weight aggregates (sum/min/max/count, mean derivable)
# ---------------------------------------------------------------------------

_W_SENTINEL_MIN = np.int64(1 << 62)
_W_SENTINEL_MAX = np.int64(-(1 << 62))


def endpoint_weight_stats(edges: ray.data.Dataset) -> ray.data.Dataset:
    """One row per vertex with in/out edge-weight sum, min, max, count and
    a fixed-point mean (x1000, floored) — the analog of the reference's
    per-node mean/min/max in/out weight and size aggregates
    (/root/reference/code/features/dataflow.py:169-180,
    /root/reference/code/features/additional.py:60-160), computed as one
    map-side-combined groupby instead of per-node list scans.

    All outputs are exact integers (absent side -> 0), so the DuckDB
    oracle reproduces them bit-exactly."""
    e = edges.select_columns(["src_key", "dst_key", "weight"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # the DuckDB oracle CASTs (rounds) while int64 astype truncates;
        # enforce integer weights once so the two can never silently diverge
        if not pd.api.types.is_integer_dtype(df["weight"]):
            wv = df["weight"].to_numpy(np.float64)
            if not np.array_equal(wv, np.floor(wv)):
                raise ValueError(
                    "endpoint_weight_stats requires integer edge weights "
                    "(EDGES schema contract; oracle uses BIGINT arithmetic)"
                )
        outs = (
            df.groupby("src_key", sort=False)["weight"]
            .agg(["sum", "min", "max", "count"])
            .rename(
                columns={
                    "sum": "out_w_sum", "min": "out_w_min",
                    "max": "out_w_max", "count": "out_n",
                }
            )
        )
        ins = (
            df.groupby("dst_key", sort=False)["weight"]
            .agg(["sum", "min", "max", "count"])
            .rename(
                columns={
                    "sum": "in_w_sum", "min": "in_w_min",
                    "max": "in_w_max", "count": "in_n",
                }
            )
        )
        m = outs.join(ins, how="outer")
        m.index.name = "vertex_key"
        m = m.reset_index()
        # sentinel neutral elements so partial Min/Max combine correctly
        for c, fill in (
            ("out_w_sum", 0), ("out_n", 0), ("in_w_sum", 0), ("in_n", 0),
            ("out_w_min", _W_SENTINEL_MIN), ("in_w_min", _W_SENTINEL_MIN),
            ("out_w_max", _W_SENTINEL_MAX), ("in_w_max", _W_SENTINEL_MAX),
        ):
            m[c] = m[c].fillna(fill).astype(np.int64)
        return m

    # combine partials with the bucket-hash + vectorized-pandas pattern:
    # an 8-column sort-based groupby().aggregate() over high-cardinality
    # string keys is several times slower (round-1 pitfall list)
    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = default_num_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        from webgraph_ray.functions.hashing import hash_keys

        df = df.copy()
        df["__b"] = (
            hash_keys(df["vertex_key"].to_numpy(dtype=object)) % nb
        ).astype(np.int32)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("vertex_key", sort=False)
            .agg(
                in_w_sum=("in_w_sum", "sum"),
                in_w_min=("in_w_min", "min"),
                in_w_max=("in_w_max", "max"),
                in_n=("in_n", "sum"),
                out_w_sum=("out_w_sum", "sum"),
                out_w_min=("out_w_min", "min"),
                out_w_max=("out_w_max", "max"),
                out_n=("out_n", "sum"),
            )
            .reset_index()
        )

    agg = (
        e.map_batches(partial, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for side in ("in", "out"):
            n = df[f"{side}_n"].to_numpy(np.int64)
            absent = n == 0
            for c in (f"{side}_w_min", f"{side}_w_max"):
                v = df[c].to_numpy(np.int64).copy()
                v[absent] = 0
                df[c] = v
            s = df[f"{side}_w_sum"].to_numpy(np.int64)
            mean = np.zeros(len(df), dtype=np.int64)
            np.floor_divide(1000 * s, n, out=mean, where=~absent)
            df[f"{side}_w_mean_x1000"] = mean
        cols = ["vertex_key"]
        for side in ("in", "out"):
            cols += [
                f"{side}_w_sum", f"{side}_w_min", f"{side}_w_max",
                f"{side}_n", f"{side}_w_mean_x1000",
            ]
        return df[cols]

    return agg.map_batches(finalize, batch_format="pandas")


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
    hit_ref = ray.put(pa.array(sorted(hits), pa.string()))

    def anti(t: pa.Table) -> pa.Table:
        hit = ray.get(hit_ref)
        # Arrow-native anti-join mask: negated is_in against the broadcast set
        keep = pc.invert(pc.is_in(t["conv_id"], value_set=hit))
        conv = t["conv_id"].filter(keep).to_numpy(zero_copy_only=False)
        return pa.table({"conv_id": pa.array(np.unique(conv), pa.string())})

    # per-batch partial unique, then a global bucket-hash distinct
    from webgraph_ray.functions.shuffle import bucket_distinct

    return bucket_distinct(
        transcripts.select_columns(["conv_id"]).map_batches(
            anti, batch_format="pyarrow"
        ),
        ["conv_id"],
    )


def reciprocity(edges: ray.data.Dataset) -> pd.DataFrame:
    """One row (n_directed, n_reciprocated, ratio_fp): how much of the
    DISTINCT directed edge set (self-loops excluded) is mutual.

    Scale shape: the only shuffle is ONE bucket groupby keyed on a
    SYMMETRIC pair hash (h(src)+h(dst)), which lands both directions of an
    unordered pair in the same bucket; each bucket dedups its directed
    pairs and counts unordered pairs seen in both directions, and the
    driver sums the tiny per-bucket partials.  ratio_fp is the exact
    integer floor of n_reciprocated * 10^6 / n_directed, so the DuckDB
    mirror is bit-stable.

    Reference analog: graph-shape features of
    /root/reference/code/features/structure.py:129-177 (reciprocity is
    the standard directed companion of the degree features there)."""
    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.shuffle import default_num_buckets

    nb = default_num_buckets()

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["src_key"] != df["dst_key"]].drop_duplicates(
            ["src_key", "dst_key"]
        )[["src_key", "dst_key"]].copy()
        hs = hash_keys(df["src_key"].to_numpy(dtype=object))
        hd = hash_keys(df["dst_key"].to_numpy(dtype=object))
        # symmetric bucket key: both directions of a pair co-locate
        df["__b"] = (np.abs(hs + hd) % nb).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["src_key", "dst_key"])
        lo = np.minimum(g["src_key"].to_numpy(), g["dst_key"].to_numpy())
        hi = np.maximum(g["src_key"].to_numpy(), g["dst_key"].to_numpy())
        both = (
            pd.DataFrame({"lo": lo, "hi": hi})
            .groupby(["lo", "hi"], sort=False)
            .size()
        )
        return pd.DataFrame(
            {
                "n_directed": [np.int64(len(g))],
                "n_reciprocated": [np.int64(2 * int((both == 2).sum()))],
            }
        )

    parts = (
        edges.select_columns(["src_key", "dst_key"])
        .map_batches(pre, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    n_dir = int(parts["n_directed"].sum())
    n_rec = int(parts["n_reciprocated"].sum())
    return pd.DataFrame(
        {
            "n_directed": np.array([n_dir], dtype=np.int64),
            "n_reciprocated": np.array([n_rec], dtype=np.int64),
            "ratio_fp": np.array(
                [(n_rec * 1_000_000) // max(n_dir, 1)], dtype=np.int64
            ),
        }
    )


def reciprocity_sql(edges_cte: str) -> str:
    """DuckDB mirror: same distinct directed set, same integer ratio."""
    return (
        edges_cte
        + """, d AS MATERIALIZED (
    SELECT DISTINCT src_key AS s, dst_key AS t
    FROM edges WHERE src_key <> dst_key
)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_directed,
       CAST((SELECT count(*) FROM d a JOIN d b ON a.s = b.t AND a.t = b.s)
            AS BIGINT) AS n_reciprocated,
       CAST(((SELECT count(*) FROM d a JOIN d b ON a.s = b.t AND a.t = b.s)
             * 1000000)
            // greatest((SELECT count(*) FROM d), 1) AS BIGINT) AS ratio_fp"""
    )


def assortativity(
    edges,
    und=None,
    broadcast_threshold: int = 4_000_000,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """One row of exact degree-assortativity moments over the distinct
    undirected pair set (self-loops excluded):

    - ``und_m``  = 2 * |pairs| (each pair contributes both orientations),
    - ``und_s1`` = sum over pairs of ``deg(a) + deg(b)``,
    - ``und_s2`` = sum over pairs of ``deg(a)^2 + deg(b)^2``,
    - ``und_sxy``= 2 * sum over pairs of ``deg(a) * deg(b)``,
    - ``assort_fp`` — the degree Pearson correlation
      ``r = (m*sxy - s1^2) / (m*s2 - s1^2)`` as the exact integer
      ``(num * 10^6) // den`` TRUNCATED TOWARD ZERO (DuckDB's BIGINT
      ``//`` semantics, which the numpy path replicates sign-explicitly),
      0 when the denominator is 0 (all degrees equal).

    Scale shape: reuses :func:`undirected_pairs` /
    :func:`undirected_degrees` (one pair-hash groupby + one owner-bucket
    reduce, shareable with triangle counting / link prediction via
    ``und=``); endpoint degrees broadcast once via ``ray.put`` below
    ``broadcast_threshold`` vertices, two bucketed joins above; the
    driver receives only constant-size per-batch moment partials and
    combines them with arbitrary-precision Python ints, so no int64
    overflow at any corpus size (|r| <= 1 bounds assort_fp by 10^6).
    Reference analog: the degree-feature family of
    /root/reference/code/features/structure.py:129-177 (assortativity is
    its standard degree-correlation companion)."""
    import pyarrow as pa

    import ray

    from webgraph_ray.functions.joins import bucketed_join
    from webgraph_ray.graph.linkpred import undirected_degrees, undirected_pairs

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
    if und is None:
        und = undirected_pairs(edges, num_partitions)
    deg = undirected_degrees(und, num_partitions)

    _PART = pa.schema(
        [
            pa.field("m", pa.int64()),
            pa.field("s1", pa.int64()),
            pa.field("s2", pa.int64()),
            pa.field("sxy", pa.int64()),
        ]
    )

    def moments(da: np.ndarray, db: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "m": pa.array([2 * len(da)], pa.int64()),
                "s1": pa.array([int(np.sum(da + db))], pa.int64()),
                "s2": pa.array([int(np.sum(da * da + db * db))], pa.int64()),
                "sxy": pa.array([2 * int(np.sum(da * db))], pa.int64()),
            },
            schema=_PART,
        )

    n_v = deg.count()
    if n_v == 0:
        return pd.DataFrame(
            {
                c: np.array([0], dtype=np.int64)
                for c in ("und_m", "und_s1", "und_s2", "und_sxy", "assort_fp")
            }
        )
    if n_v <= broadcast_threshold:
        ddf = deg.to_pandas().sort_values("vertex_id")
        deg_ref = ray.put(
            (
                ddf["vertex_id"].to_numpy(dtype=np.int64),
                ddf["deg"].to_numpy(dtype=np.int64),
            )
        )

        def partial(t: pa.Table) -> pa.Table:
            vid, dv = ray.get(deg_ref)
            a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            # both endpoints of every pair appear in `und`, so lookups hit
            da = dv[np.searchsorted(vid, a)] if len(a) else np.empty(0, np.int64)
            db = dv[np.searchsorted(vid, b)] if len(b) else np.empty(0, np.int64)
            return moments(da, db)

        parts = und.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
    else:
        da_t = deg.map_batches(
            lambda df: df.rename(columns={"vertex_id": "a", "deg": "da"}),
            batch_format="pandas",
        )
        db_t = deg.map_batches(
            lambda df: df.rename(columns={"vertex_id": "b", "deg": "db"}),
            batch_format="pandas",
        )
        joined = bucketed_join(
            und, da_t, keys=["a"], how="inner", num_buckets=num_partitions
        )
        joined = bucketed_join(
            joined, db_t, keys=["b"], how="inner", num_buckets=num_partitions
        )

        def partial_big(df: pd.DataFrame) -> pd.DataFrame:
            return moments(
                df["da"].to_numpy(np.int64), df["db"].to_numpy(np.int64)
            ).to_pandas()

        parts = joined.map_batches(partial_big, batch_format="pandas").to_pandas()

    # driver-side combine in arbitrary precision
    m = int(parts["m"].sum())
    s1 = int(parts["s1"].sum())
    s2 = int(parts["s2"].sum())
    sxy = int(parts["sxy"].sum())
    num = m * sxy - s1 * s1
    den = m * s2 - s1 * s1
    if den == 0:
        fp = 0
    else:
        fp = (abs(num) * 1_000_000 // den) * (1 if num >= 0 else -1)
    return pd.DataFrame(
        {
            "und_m": np.array([m], dtype=np.int64),
            "und_s1": np.array([s1], dtype=np.int64),
            "und_s2": np.array([s2], dtype=np.int64),
            "und_sxy": np.array([sxy], dtype=np.int64),
            "assort_fp": np.array([fp], dtype=np.int64),
        }
    )


def reciprocity_assortativity_sql(edges_cte: str) -> str:
    """DuckDB mirror of the combined reciprocity + degree-assortativity
    gate row: same distinct directed set / distinct unordered pair set,
    HUGEINT moment arithmetic, truncated-toward-zero fixed-point ratios."""
    return (
        edges_cte
        + """, d AS MATERIALIZED (
    SELECT DISTINCT src_key AS s, dst_key AS t
    FROM edges WHERE src_key <> dst_key
), undx AS MATERIALIZED (
    SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM d
), degx AS (
    SELECT v, CAST(count(*) AS BIGINT) AS dd FROM (
        SELECT a AS v FROM undx UNION ALL SELECT b AS v FROM undx
    ) GROUP BY v
), ep AS (
    SELECT du.dd AS x, dv.dd AS y
    FROM undx JOIN degx du ON du.v = undx.a JOIN degx dv ON dv.v = undx.b
), mom AS (
    SELECT CAST(2 * count(*) AS HUGEINT) AS m,
           CAST(coalesce(sum(x + y), 0) AS HUGEINT) AS s1,
           CAST(coalesce(sum(x * x + y * y), 0) AS HUGEINT) AS s2,
           2 * CAST(coalesce(sum(x * y), 0) AS HUGEINT) AS sxy
    FROM ep
)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_directed,
       CAST((SELECT count(*) FROM d a JOIN d b ON a.s = b.t AND a.t = b.s)
            AS BIGINT) AS n_reciprocated,
       CAST(((SELECT count(*) FROM d a JOIN d b ON a.s = b.t AND a.t = b.s)
             * 1000000)
            // greatest((SELECT count(*) FROM d), 1) AS BIGINT) AS ratio_fp,
       CAST(m AS BIGINT) AS und_m,
       CAST(s1 AS BIGINT) AS und_s1,
       CAST(s2 AS BIGINT) AS und_s2,
       CAST(sxy AS BIGINT) AS und_sxy,
       CAST(CASE WHEN m * s2 - s1 * s1 = 0 THEN 0
                 ELSE ((m * sxy - s1 * s1) * 1000000) // (m * s2 - s1 * s1)
            END AS BIGINT) AS assort_fp
FROM mom"""
    )
