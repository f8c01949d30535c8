"""Strongly connected components via FW-BW min-label coloring.

Orzan-style coloring on the BSP engine: each round runs the min-label
fixpoint in BOTH directions of the remaining subgraph —

- ``F(v)`` = min id over ``{v} ∪ ancestors(v)``  (directed forward layout),
- ``B(v)`` = min id over ``{v} ∪ descendants(v)`` (reversed layout, derived
  from the forward build's parquet),

and settles every vertex with ``F(v) == B(v) == m``: m reaches v and v
reaches m, so v ∈ SCC(m) — and because mutually-reachable vertices share
both closures, a WHOLE SCC settles in the same round, which makes
dropping settled vertices' edges safe.  The remaining subgraph repeats.
Each round settles at least the SCC of the remaining graph's minimum id
(its F and B both equal itself), so the loop terminates; under hashed
vertex ids the expected round count is O(log V) (random-permutation
peeling), guarded by a loud ``max_rounds`` raise.

No SQL gate row: the round count is data-dependent (the unrolled-CTE
oracle convention needs a fixed iteration count, and a WITH RECURSIVE
transitive closure is quadratic on hub-dense transcript graphs), so this
operator is pytest-pinned against networkx instead — the same weaker-check
convention as PII redaction (COVERAGE.md).

Scale shape: per round, ONE directed build of the remaining edge set (the
reversed layout derived from its parquet, not rebuilt), two quiescent
min-label runs (delta exchange, converged partitions skip), one
settled-id broadcast filter over the edge table below the gate / bucketed
anti-join above it.  Reference analog: the reachability feature family of
/root/reference/code/features/structure.py:129-163 (SCC is its directed
closure companion).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.functions.joins import bucketed_join
from webgraph_ray.graph.engine import GraphEngine
from webgraph_ray.pipelines.flagship import attach_keys


def _drop_endpoint(
    cur: ray.data.Dataset, smarks: ray.data.Dataset, col: str
) -> ray.data.Dataset:
    """Anti-join: drop edges whose ``col`` endpoint appears in ``smarks``
    (a (vertex_id) marker table) — bucketed left join + unmatched filter."""
    marks = smarks.map_batches(
        lambda df, c=col: df.rename(columns={"vertex_id": c}).assign(
            __hit=np.int8(1)
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(cur, marks, keys=[col], how="left")
    return joined.map_batches(
        lambda df: df.loc[df["__hit"].isna(), ["src", "dst", "weight"]].astype(
            {"src": np.int64, "dst": np.int64, "weight": np.int64}
        ),
        batch_format="pandas",
    )


def scc_keyed(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    work_dir: str,
    max_rounds: int = 64,
    num_parts: int | None = None,
    broadcast_threshold: int = 50_000_000,
) -> pd.DataFrame:
    """(vertex_key, scc_key) — canonical min-member SCC labels for every
    vertex of the vertex table (vertices untouched by any directed cycle
    are their own singleton SCC)."""
    narrow = edges.select_columns(["src", "dst"]).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "weight": pa.array(
                    np.ones(t.num_rows, dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cur = narrow.materialize()
    settled_parts: list[pd.DataFrame] = []
    rounds = 0
    while cur.count() > 0:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"scc did not converge in {max_rounds} FW-BW rounds — "
                "pathological id ordering; raise max_rounds"
            )
        rdir = os.path.join(work_dir, f"r{rounds}")
        fwd = GraphEngine(
            os.path.join(rdir, "fwd"), num_parts=num_parts, actor_num_cpus=0
        )
        fwd.build(cur, symmetrize=False)
        try:
            # forward fixpoint: min ancestor-or-self
            F = fwd._min_label_run(
                "components", None, 5000, 0, False
            ).materialize()
            rev = GraphEngine(
                os.path.join(rdir, "rev"),
                num_parts=fwd.P,
                actor_num_cpus=0,
            )
            rev.build_reversed_from(os.path.join(rdir, "fwd"))
            try:
                B = rev._min_label_run(
                    "components", None, 5000, 0, False
                ).materialize()
            finally:
                rev.shutdown()
        finally:
            fwd.shutdown()

        fb = bucketed_join(
            F.map_batches(
                lambda df: df.rename(columns={"component": "f"}),
                batch_format="pandas",
            ),
            B.map_batches(
                lambda df: df.rename(columns={"component": "b"}),
                batch_format="pandas",
            ),
            keys=["vertex_id"],
            how="inner",
        )
        settled = fb.map_batches(
            lambda df: df.loc[df["f"] == df["b"], ["vertex_id", "f"]].rename(
                columns={"f": "scc"}
            ),
            batch_format="pandas",
        ).to_pandas()
        settled_parts.append(settled)
        # drop every edge touching a settled vertex (its whole SCC settled
        # with it, so no surviving SCC spans the cut)
        sids = np.sort(settled["vertex_id"].to_numpy(np.int64))
        if len(sids) == 0:
            raise AssertionError(
                "FW-BW round settled nothing — the remaining minimum id "
                "must always settle; engine invariant broken"
            )
        if len(sids) <= broadcast_threshold:
            sref = ray.put(sids)

            def drop_settled(t: pa.Table) -> pa.Table:
                s = ray.get(sref)
                a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
                b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
                ia = np.searchsorted(s, a)
                ib = np.searchsorted(s, b)
                hit_a = (ia < len(s)) & (s[np.minimum(ia, len(s) - 1)] == a)
                hit_b = (ib < len(s)) & (s[np.minimum(ib, len(s) - 1)] == b)
                return t.filter(pa.array(~(hit_a | hit_b)))

            cur = cur.map_batches(
                drop_settled, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        else:
            # scale path: two bucketed anti-joins (marker left-join, keep
            # unmatched) — nothing O(settled) ever reaches the driver
            smarks = ray.data.from_pandas(
                settled[["vertex_id"]].astype({"vertex_id": np.int64})
            )
            cur = _drop_endpoint(cur, smarks, "src")
            cur = _drop_endpoint(cur, smarks, "dst").materialize()
        shutil.rmtree(rdir, ignore_errors=True)
        rounds += 1

    settled_all = (
        pd.concat(settled_parts, ignore_index=True)
        if settled_parts
        else pd.DataFrame(
            {
                "vertex_id": pd.Series(dtype="int64"),
                "scc": pd.Series(dtype="int64"),
            }
        )
    )
    # singleton fill over the full vertex universe + canonical keys: the
    # scc label is the min member ID (min-label fixpoint), rendered as
    # that member's KEY
    sd = ray.data.from_pandas(
        settled_all.astype({"vertex_id": np.int64, "scc": np.int64})
    ) if len(settled_all) else None
    verts = vertices.select_columns(["vertex_id", "vertex_key"])
    if sd is None:
        merged = verts.map_batches(
            lambda df: df.assign(scc=df["vertex_id"].to_numpy(np.int64)),
            batch_format="pandas",
        )
    else:
        merged = bucketed_join(
            verts, sd, keys=["vertex_id"], how="left"
        ).map_batches(
            lambda df: df.assign(
                scc=df["scc"]
                .fillna(df["vertex_id"])
                .astype(np.int64)
            ),
            batch_format="pandas",
        )
    # scc id -> key of that member
    keyed = attach_keys(
        merged.map_batches(
            lambda df: df[["vertex_key", "scc"]].rename(
                columns={"vertex_key": "member_key", "scc": "vertex_id"}
            ),
            batch_format="pandas",
        ),
        vertices,
    )
    out = keyed.map_batches(
        lambda df: df[["member_key", "vertex_key"]].rename(
            columns={"member_key": "vertex_key", "vertex_key": "scc_key"}
        ),
        batch_format="pandas",
    ).to_pandas()
    return out.sort_values("vertex_key", kind="mergesort").reset_index(
        drop=True
    )
