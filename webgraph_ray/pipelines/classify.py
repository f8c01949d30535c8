"""Model scoring + cross-validation folds over the vertex feature table —
the analog of the reference's classifier pipeline
(/root/reference/code/classification/classify.py:326-372: by-visit k-fold
split, per-fold fit/predict, per-fold metric reports), with the model
replaced by a fixed integer-weight linear scorer so every stage stays
deterministic and DuckDB-oracle-checkable.

- ``cv_folds``        deterministic by-conversation fold assignment
                      (classify.py:341-357 samples visit ids per fold; we
                      use the conversation's numeric id mod k so the split
                      is reproducible across engines)
- ``LinearScorer``    actor-pool stage: weights "loaded" once per actor
                      (__init__), batches scored vectorized — the
                      broadcast-model pattern of the reference's
                      RandomForest scorer
                      (/root/reference/robustness/structure_mutation/greedy_mutation.py:220)
- ``scored_vertices`` (vertex_key, fold, z, pred): exact int64 logit
- ``fold_metrics``    per-fold confusion counts (classify.py:77-235 writes
                      per-fold truth/pred files; we aggregate them)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

NUM_FOLDS = 10

# Fixed integer model weights over the vertex_features numeric columns.
# (a trained model would arrive the same way: broadcast constants / an
# artifact loaded in the actor's __init__)
MODEL_WEIGHTS: dict[str, int] = {
    "in_degree": 3,
    "out_degree": -2,
    "reply_in": 1,
    "reply_out": 1,
    "tool_call_in": -4,
    "tool_call_out": 5,
    "same_tool_in": 1,
    "same_tool_out": -1,
    "chain_depth": 7,
    "triangles": 2,
}
MODEL_BIAS = -40
# score_fp is in 1e-12 mass units; coarsen so its weight is comparable
SCORE_FP_SHIFT = 10**9
TARGET_LABEL = "late_turn"


def cv_folds(transcripts: ray.data.Dataset, k: int = NUM_FOLDS) -> ray.data.Dataset:
    """(conv_id, fold) — deterministic by-conversation split."""
    from webgraph_ray.functions.shuffle import bucket_distinct

    def fold_of(df: pd.DataFrame) -> pd.DataFrame:
        num = (
            df["conv_id"].str.replace("conv_", "", regex=False).astype(np.int64)
        )
        return pd.DataFrame({"conv_id": df["conv_id"], "fold": num % k})

    return bucket_distinct(
        transcripts.select_columns(["conv_id"]).map_batches(
            fold_of, batch_format="pandas"
        ),
        ["conv_id", "fold"],
    )


def save_model(path: str, weights: dict[str, int] | None = None, bias: int = MODEL_BIAS) -> str:
    """Persist the model artifact (the reference's joblib.dump analog,
    /root/reference/code/classification/classify.py:315-317) as JSON —
    scorer actors load it once in __init__."""
    import json

    with open(path, "w") as f:
        json.dump({"weights": dict(weights or MODEL_WEIGHTS), "bias": int(bias)}, f)
    return path


class LinearScorer:
    """Weights live in the actor (loaded once in __init__); __call__ scores
    a batch vectorized in exact int64 — z and pred reproduce in BIGINT SQL.
    ``weights`` may be a dict or a path to a save_model artifact (each
    actor reads it once — the model-load pattern)."""

    def __init__(
        self,
        weights: dict[str, int] | str | None = None,
        bias: int = MODEL_BIAS,
        k: int = NUM_FOLDS,
    ):
        if isinstance(weights, str):
            import json

            with open(weights) as f:
                art = json.load(f)
            self.w = {c: int(v) for c, v in art["weights"].items()}
            bias = art["bias"]
        else:
            self.w = dict(weights or MODEL_WEIGHTS)
        self.bias = int(bias)
        self.k = int(k)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        z = np.full(len(df), self.bias, dtype=np.int64)
        for col, w in self.w.items():
            z += w * df[col].to_numpy(np.int64)
        z += df["score_fp"].to_numpy(np.int64) // SCORE_FP_SHIFT
        conv = df["vertex_key"].str.replace(r"#\d+$", "", regex=True)
        is_tool = df["vertex_key"].str.startswith("tool:")
        fold = np.where(
            is_tool,
            -1,
            conv.str.replace("conv_", "", regex=False)
            .where(~is_tool, other="0")
            .astype(np.int64)
            % self.k,
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "vertex_key": df["vertex_key"],
                "fold": fold,
                "z": z,
                "pred": (z > 0).astype(np.int64),
                "is_target": (df["label"] == TARGET_LABEL).astype(np.int64),
            }
        )


def scored_vertices(
    features: ray.data.Dataset, concurrency: int = 2
) -> ray.data.Dataset:
    """Score the wide feature table with the actor-pool linear model."""
    return features.map_batches(
        LinearScorer, batch_format="pandas", concurrency=concurrency
    )


def fold_metrics(scored: ray.data.Dataset) -> ray.data.Dataset:
    """Per-fold confusion counts: n, predicted positives, target positives,
    agreement — all exact integers."""
    from ray.data.aggregate import Count, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(
            agree=(df["pred"] == df["is_target"]).astype(np.int64)
        ).groupby("fold", sort=False)
        out = g.agg(
            n=("fold", "size"),
            n_pred_pos=("pred", "sum"),
            n_target=("is_target", "sum"),
            n_agree=("agree", "sum"),
        ).reset_index()
        return out.astype(np.int64)

    return (
        scored.map_batches(partial, batch_format="pandas")
        .groupby("fold")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_pred_pos", alias_name="n_pred_pos"),
            Sum("n_target", alias_name="n_target"),
            Sum("n_agree", alias_name="n_agree"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generators
# ---------------------------------------------------------------------------


def cv_folds_sql(base_cte: str, k: int = NUM_FOLDS) -> str:
    return (
        base_cte
        + f"""
SELECT DISTINCT conv_id,
       CAST(replace(conv_id, 'conv_', '') AS BIGINT) % {k} AS fold
FROM transcripts"""
    )


def _scored_ctes(base_cte: str, k: int = NUM_FOLDS) -> str:
    from webgraph_ray.functions.oracles import vertex_features_ctes

    z_terms = " + ".join(
        f"({w}) * {col}" for col, w in MODEL_WEIGHTS.items()
    )
    return (
        vertex_features_ctes(base_cte)
        + f"""
, clf_scored AS MATERIALIZED (
    SELECT vertex_key,
           CASE WHEN vertex_key LIKE 'tool:%' THEN -1
                ELSE CAST(replace(regexp_replace(vertex_key, '#\\d+$', ''),
                          'conv_', '') AS BIGINT) % {k} END AS fold,
           {MODEL_BIAS} + {z_terms} + score_fp // {SCORE_FP_SHIFT} AS z,
           CAST(({MODEL_BIAS} + {z_terms} + score_fp // {SCORE_FP_SHIFT}) > 0
                AS BIGINT) AS pred,
           CAST(label = '{TARGET_LABEL}' AS BIGINT) AS is_target
    FROM vf_final
)"""
    )


def scored_vertices_sql(base_cte: str, k: int = NUM_FOLDS) -> str:
    return (
        _scored_ctes(base_cte, k)
        + "\nSELECT vertex_key, fold, CAST(z AS BIGINT) AS z, pred, is_target"
        + " FROM clf_scored"
    )


def fold_metrics_sql(base_cte: str, k: int = NUM_FOLDS) -> str:
    return (
        _scored_ctes(base_cte, k)
        + """
SELECT fold,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pred) AS BIGINT) AS n_pred_pos,
       CAST(sum(is_target) AS BIGINT) AS n_target,
       CAST(sum(CASE WHEN pred = is_target THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
FROM clf_scored GROUP BY fold"""
    )
