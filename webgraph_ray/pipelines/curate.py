"""End-to-end corpus curation: the training-data funnel a 100-TB pipeline
actually runs — quality filter, canonical exact-dedup, benchmark
decontamination — composed over the ``documents`` table.

Reference analog: the per-visit filter -> dedup -> label chain in
/root/reference/code/run.py:140-160 (drop_duplicates + filter-list
labelling before feature extraction), lifted to the document-corpus
setting.

Scale shape: each signal is its own streaming pass over the corpus
(quality: one map_batches, no shuffle; exact dedup: the house bucket-hash
combine; decontamination: broadcast shingle membership, no shuffle), and
the three flag tables assemble into a per-document verdict through ONE
doc-id-hash bucket shuffle (the pad-union-pivot idiom).  Survivor rule is
deterministic and mirrored in SQL:

- ``keep``      quality_filter's first-match rule chain passed
- ``is_canon``  the document is its md5 group's canonical (min doc_id) —
                a group whose canonical fails quality dies entirely
- ``clean``     not flagged by decontamination AND not in the held-out
                benchmark slice (benchmark docs never enter the corpus)

``curated = keep AND is_canon AND clean``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

FUNNEL_STAGES = ("input", "quality_kept", "canonical_kept", "curated")


def curation_verdict(docs: ray.data.Dataset) -> ray.data.Dataset:
    """One row per document: (doc_id, keep, is_canon, clean, curated)."""
    from webgraph_ray.functions.hashing import hash_keys
    from webgraph_ray.functions.shuffle import default_num_buckets
    from webgraph_ray.stages.dedup import decontaminate, exact_dedup
    from webgraph_ray.stages.text import quality_filter

    flag_cols = ["keep", "is_canon", "clean"]
    all_cols = ["doc_id", *flag_cols]

    def padded(ds):
        def pad(df: pd.DataFrame) -> pd.DataFrame:
            out = df.reindex(columns=all_cols)
            out["doc_id"] = out["doc_id"].astype(np.int64)
            for c in flag_cols:
                out[c] = out[c].astype(np.float64)  # NaN-able
            return out

        return ds.map_batches(pad, batch_format="pandas")

    quality = quality_filter(docs).select_columns(["doc_id", "keep"])
    # canonical ids: one row per md5 group; every other doc defaults to 0
    canon = exact_dedup(docs).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["canonical_doc_id"],
                "is_canon": pa.array(
                    np.ones(t.num_rows, dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    clean = decontaminate(docs).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "clean": pa.compute.cast(
                    pa.compute.equal(t["contaminated"], 0), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    unioned = padded(quality).union(padded(canon)).union(padded(clean))
    nb = default_num_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (df["doc_id"].to_numpy(np.int64) % nb).astype(np.int32)
        return df

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", sort=False)[flag_cols].first()
        out = out.reset_index().fillna(0.0)
        for c in flag_cols:
            out[c] = out[c].astype(np.int64)
        out["curated"] = (
            out["keep"] & out["is_canon"] & out["clean"]
        ).astype(np.int64)
        return out

    return (
        unioned.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(pivot, batch_format="pandas")
    )


def curation_funnel(docs: ray.data.Dataset) -> pd.DataFrame:
    """(stage, n_docs) counts down the funnel — the tiny summary a driver
    dashboards; stage definitions exactly as in the module docstring."""
    v = curation_verdict(docs).to_pandas()
    rows = [
        ("input", len(v)),
        ("quality_kept", int(v["keep"].sum())),
        ("canonical_kept", int((v["keep"] & v["is_canon"]).sum())),
        ("curated", int(v["curated"].sum())),
    ]
    return pd.DataFrame(rows, columns=["stage", "n_docs"]).astype(
        {"n_docs": "int64"}
    )


def curated_documents(
    docs: ray.data.Dataset, out_dir: str | None = None
) -> ray.data.Dataset:
    """The surviving documents (full rows), via a bucketed semi-join of
    the corpus against the curated id set; optionally written as
    bucket-partitioned parquet (one directory per id-hash bucket, so a
    re-run can skip finished partitions)."""
    from webgraph_ray.functions.joins import bucketed_join

    ids = curation_verdict(docs).map_batches(
        lambda t: t.filter(pa.compute.equal(t["curated"], 1)).select(
            ["doc_id"]
        ),
        batch_format="pyarrow",
    ).materialize()
    kept = bucketed_join(docs, ids, keys=["doc_id"], how="left_semi")
    if out_dir is not None:
        kept = kept.materialize()
        kept.write_parquet(out_dir)
    return kept
