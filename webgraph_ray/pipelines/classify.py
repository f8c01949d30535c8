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
    """(conv_id, fold, in_sample) — deterministic by-conversation split,
    plus the 1-in-10 deterministic sample flag (the reference's seeded
    visit-id CV sampling analog,
    /root/reference/code/classification/classify.py:341-357)."""
    from webgraph_ray.functions.shuffle import bucket_distinct

    def fold_of(df: pd.DataFrame) -> pd.DataFrame:
        num = (
            df["conv_id"].str.replace("conv_", "", regex=False).astype(np.int64)
        )
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "fold": num % k,
                "in_sample": (num % 10 == 0).astype(np.int64),
            }
        )

    return bucket_distinct(
        transcripts.select_columns(["conv_id"]).map_batches(
            fold_of, batch_format="pandas"
        ),
        ["conv_id", "fold", "in_sample"],
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


PCTILE_SCALE = 10**6


def scored_with_percentiles(
    features: ray.data.Dataset, k: int = NUM_FOLDS, concurrency: int = 2
) -> ray.data.Dataset:
    """scored_vertices plus the per-fold prediction-probability report the
    reference writes per CV fold
    (/root/reference/code/classification/classify.py:77-235 emits per-row
    predict_proba files; the exact-integer analog is the empirical-CDF
    percentile of the fitted score within its fold):

        z_pctile_fp = (#same-fold rows with strictly smaller z)
                      * 10^6 // fold_n

    Distributed shape: pass 1 reduces a bounded (fold, z) histogram
    (map-side partials, z is a small-range integer score); the driver
    builds per-fold cumulative strictly-less tables (tiny) and broadcasts
    them; pass 2 attaches the percentile by vectorized searchsorted —
    no per-fold sort of the full table, order-independent exact ints."""
    scored = scored_vertices(features, concurrency=concurrency).materialize()

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["fold", "z"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return out.astype(np.int64)

    hist = (
        scored.map_batches(hist_partial, batch_format="pandas")
        .to_pandas()
        .groupby(["fold", "z"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    maps: dict[int, tuple[np.ndarray, np.ndarray, int]] = {}
    for fold, g in hist.groupby("fold", sort=True):
        zs = g["z"].to_numpy(np.int64)  # sorted ascending
        ns = g["n"].to_numpy(np.int64)
        less = np.concatenate([[0], np.cumsum(ns)[:-1]])
        maps[int(fold)] = (zs, less, int(ns.sum()))
    import ray as _ray

    mref = _ray.put(maps)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(mref)
        z = df["z"].to_numpy(np.int64)
        fold = df["fold"].to_numpy(np.int64)
        pct = np.zeros(len(df), dtype=np.int64)
        for f in np.unique(fold):
            zs, less, n = m[int(f)]
            sel = fold == f
            pct[sel] = less[np.searchsorted(zs, z[sel])] * PCTILE_SCALE // n
        out = df.copy()
        out["z_pctile_fp"] = pct
        return out

    return scored.map_batches(attach, batch_format="pandas")


AUC_SCALE = 10**9


def fold_auc(scored: ray.data.Dataset) -> pd.DataFrame:
    """(fold, auc_fp): the exact tie-corrected Mann-Whitney AUC of the
    fixed scorer's z against is_target within each CV fold (the standard
    threshold-free evaluation alongside the confusion counts; reference
    analog: per-fold metrics,
    /root/reference/code/classification/classify.py:77-235).

    Ties count half, kept integral by working in doubled units:

        num    = sum_z n_pos_z * (2*cum_neg_below + n_neg_z)
        auc_fp = (S * num) // (2 * P * N)        (-1 if a class is empty)

    Distributed shape: the same bounded (fold, z) histogram reduce the
    percentile report uses — map-side (fold, z, n, n_pos) partials, one
    tiny driver fold with Python ints (num exceeds int64 at design
    scale; DuckDB mirrors with HUGEINT).  No sort or per-pair work."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["fold", "z"], sort=False)["is_target"]
            .agg(n="size", npos="sum")
            .reset_index()
        )
        return g.astype(np.int64)

    hist = (
        scored.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["fold", "z"], sort=True)[["n", "npos"]]
        .sum()
        .reset_index()
    )
    rows = []
    for fold, g in hist.groupby("fold", sort=True):
        npos = g["npos"].to_numpy(np.int64)
        nneg = (g["n"] - g["npos"]).to_numpy(np.int64)
        P, N = int(npos.sum()), int(nneg.sum())
        if P == 0 or N == 0:
            rows.append((int(fold), -1))
            continue
        cum_less = np.concatenate([[0], np.cumsum(nneg)[:-1]])
        num = sum(
            int(p) * (2 * int(cl) + int(nn))
            for p, cl, nn in zip(npos, cum_less, nneg)
        )
        rows.append((int(fold), (AUC_SCALE * num) // (2 * P * N)))
    return pd.DataFrame(rows, columns=["fold", "auc_fp"]).astype(np.int64)


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
# Model FIT: leave-one-fold-out closed-form least squares
# ---------------------------------------------------------------------------

# Fit features: intercept + two bounded per-turn features.  Turn-vertex
# features stay small (chain depth <= turns per conversation, reply_out is
# 0/1-ish), so per-batch int64 partial sums cannot overflow; the global
# reduce and the Cramer solve run in arbitrary-precision Python ints, so
# fitted weights are bit-identical across any partitioning of the input.
FIT_FEATURES = ("chain_depth", "reply_out")
FIT_SCALE = 10**6
_FIT_SUMS = ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")
_FIT_FEATURE_BOUND = 1 << 20  # keeps x*x*batch_rows < 2^63


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (DuckDB's ``//``; Python's
    ``//`` floors, which differs on negative quotients)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _fold_of(vertex_key: pd.Series, k: int) -> np.ndarray:
    """Same fold rule as LinearScorer: conversation id mod k; tool
    vertices get -1 (excluded from the fit)."""
    conv = vertex_key.str.replace(r"#\d+$", "", regex=True)
    is_tool = vertex_key.str.startswith("tool:")
    return np.where(
        is_tool,
        -1,
        conv.str.replace("conv_", "", regex=False)
        .where(~is_tool, other="0")
        .astype(np.int64)
        % k,
    ).astype(np.int64)


def fit_fold_weights(
    features: ray.data.Dataset, k: int = NUM_FOLDS
) -> pd.DataFrame:
    """Train the linear scorer per CV fold and evaluate on the held-out
    fold — the reference's per-fold fit/predict cycle
    (/root/reference/code/classification/classify.py:260-323) with the
    RandomForest replaced by an exact closed-form least-squares fit so the
    whole train->evaluate loop has a DuckDB mirror.

    Pass 1 (distributed): one ``map_batches`` sweep computes per-fold
    integer Gram/moment partials (9 sums per fold per batch — the
    pre-aggregate-before-reduce rule; the reduce is O(k) rows).  Driver:
    leave-one-fold-out train sums are ``total - fold``, solved exactly by
    Cramer's rule in Python ints; weights come out as fixed-point
    ``FIT_SCALE`` integers (truncating division, matching DuckDB).
    Pass 2 (distributed): a second sweep scores each row with ITS OWN
    fold's fitted weights (the weights table rides into the task closure —
    k x 3 ints, the broadcast-small-side pattern) and reduces holdout
    agreement counts.

    Returns one row per fold: (fold, n_train, w0_fp, w1_fp, w2_fp,
    holdout_n, holdout_agree).  Deterministic across partitionings:
    integer sums are order-independent."""
    f1, f2 = FIT_FEATURES

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        fold = _fold_of(df["vertex_key"], k)
        keep = fold >= 0
        x1 = df[f1].to_numpy(np.int64)[keep]
        x2 = df[f2].to_numpy(np.int64)[keep]
        assert (np.abs(x1) < _FIT_FEATURE_BOUND).all() and (
            np.abs(x2) < _FIT_FEATURE_BOUND
        ).all(), "fit feature exceeds the int64 partial-sum bound"
        y = (df["label"].to_numpy() == TARGET_LABEL).astype(np.int64)[keep]
        fv = fold[keep]
        out = pd.DataFrame(
            {
                "fold": fv,
                "n": np.ones(len(fv), dtype=np.int64),
                "s1": x1,
                "s2": x2,
                "s11": x1 * x1,
                "s12": x1 * x2,
                "s22": x2 * x2,
                "sy": y,
                "s1y": x1 * y,
                "s2y": x2 * y,
            }
        )
        return out.groupby("fold", sort=False, as_index=False).sum()

    part_rows = features.map_batches(
        partials, batch_format="pandas"
    ).to_pandas()
    # exact reduce in Python ints (magnitudes can exceed int64 at scale)
    totals = {s: 0 for s in _FIT_SUMS}
    per_fold = {f: {s: 0 for s in _FIT_SUMS} for f in range(k)}
    for _, r in part_rows.iterrows():
        f = int(r["fold"])
        for s in _FIT_SUMS:
            v = int(r[s])
            per_fold[f][s] += v
            totals[s] += v

    def solve(t: dict) -> tuple[int, int, int]:
        g = [
            [t["n"], t["s1"], t["s2"]],
            [t["s1"], t["s11"], t["s12"]],
            [t["s2"], t["s12"], t["s22"]],
        ]
        b = [t["sy"], t["s1y"], t["s2y"]]

        def det3(m):
            return (
                m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
            )

        d = det3(g)
        if d == 0:
            return 0, 0, 0
        ws = []
        for j in range(3):
            gj = [[b[i] if c == j else g[i][c] for c in range(3)] for i in range(3)]
            ws.append(_tdiv(FIT_SCALE * det3(gj), d))
        return tuple(ws)

    rows = []
    weights = {}
    for f in range(k):
        train = {s: totals[s] - per_fold[f][s] for s in _FIT_SUMS}
        w0, w1, w2 = solve(train)
        weights[f] = (w0, w1, w2)
        rows.append((f, train["n"], w0, w1, w2))

    # pass 2: holdout scoring with the fitted weights (broadcast k x 3)
    def holdout(df: pd.DataFrame) -> pd.DataFrame:
        fold = _fold_of(df["vertex_key"], k)
        keep = fold >= 0
        fv = fold[keep]
        x1 = df[f1].to_numpy(np.int64)[keep]
        x2 = df[f2].to_numpy(np.int64)[keep]
        y = (df["label"].to_numpy() == TARGET_LABEL).astype(np.int64)[keep]
        warr = np.array([weights[f] for f in range(k)], dtype=np.int64)
        z = warr[fv, 0] + warr[fv, 1] * x1 + warr[fv, 2] * x2
        pred = (2 * z > FIT_SCALE).astype(np.int64)
        out = pd.DataFrame(
            {
                "fold": fv,
                "holdout_n": np.ones(len(fv), dtype=np.int64),
                "holdout_agree": (pred == y).astype(np.int64),
            }
        )
        return out.groupby("fold", sort=False, as_index=False).sum()

    ho = (
        features.map_batches(holdout, batch_format="pandas")
        .to_pandas()
        .groupby("fold", as_index=False)
        .sum()
    )
    res = pd.DataFrame(
        rows, columns=["fold", "n_train", "w0_fp", "w1_fp", "w2_fp"]
    ).merge(ho, on="fold", how="left")
    for c in res.columns:
        res[c] = res[c].fillna(0).astype(np.int64)
    return res.sort_values("fold").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Model FIT #2: per-fold depth-2 decision tree over feature histograms
# ---------------------------------------------------------------------------

# Tree features: every integer model column.  Split criterion is exact
# integer "training rows classified correctly by the best constant on each
# side" (majority-count accuracy) — Gini needs rational compares; the
# accuracy objective keeps every intermediate a plain int64 count, so the
# DuckDB mirror is bit-exact.  Ties: higher correct, then smaller feature
# index, then smaller threshold.
TREE_FEATURES = tuple(sorted(MODEL_WEIGHTS))


def _tree_best_split(h: pd.DataFrame):
    """Best (feat, thr) over a (feat, val, n, npos) training histogram.
    Returns (feat, thr, p_low, p_high) where p_low/p_high are the leaf
    majority predictions (1 iff 2*pos > n; ties -> 0) of the <=thr and
    >thr sides, or None on an empty histogram."""
    best = None  # (correct, feat, thr, p_low, p_high)
    for feat, g in h.groupby("feat", sort=True):
        g = g.sort_values("val", kind="mergesort")
        cn = g["n"].to_numpy(np.int64).cumsum()
        cp = g["npos"].to_numpy(np.int64).cumsum()
        tn, tp = cn[-1], cp[-1]
        correct = np.maximum(cp, cn - cp) + np.maximum(
            tp - cp, (tn - cn) - (tp - cp)
        )
        i = int(np.argmax(correct))  # first max = smallest threshold
        cand = (int(correct[i]), int(feat), int(g["val"].to_numpy()[i]))
        if best is None or (cand[0], -cand[1], -cand[2]) > (
            best[0], -best[1], -best[2]
        ):
            best = (
                cand[0],
                cand[1],
                cand[2],
                int(2 * cp[i] > cn[i]),
                int(2 * (tp - cp[i]) > (tn - cn[i])),
            )
    if best is None:
        return None
    return best[1], best[2], best[3], best[4]


def fit_fold_trees(
    features: ray.data.Dataset, k: int = NUM_FOLDS
) -> pd.DataFrame:
    """Leave-one-fold-out depth-2 decision tree per CV fold — the
    nonlinear analog of the reference's per-fold RandomForest fit
    (/root/reference/code/classification/classify.py:260-323), via
    distributed feature histograms (the XGBoost-style shape: per-batch
    (fold, feature, value) -> (count, positives) partials, tiny driver
    reduce; candidate thresholds are the observed values):

    pass 1  root histograms; leave-one-out train hist = totals - fold
            (same subtraction trick as fit_fold_weights); exact integer
            accuracy argmax -> root split per fold
    pass 2  per-(fold, root-side) histograms — each row contributes to
            the k-1 trees whose training set contains it, routed by that
            tree's root split (broadcast k x 2 ints) -> child splits +
            leaf majority predictions
    pass 3  holdout: each row routed through ITS OWN fold's tree (which
            never saw it); per-fold agreement counts

    Returns one row per fold with the fitted tree (feature ids index
    TREE_FEATURES) and holdout agreement; empty training sides carry the
    sentinel (feat=-1, thr=0, preds 0).  Deterministic across
    partitionings: histograms are order-independent integer sums."""

    def hist1_partial(df: pd.DataFrame) -> pd.DataFrame:
        fold = _fold_of(df["vertex_key"], k)
        keep = fold >= 0
        y = (df["label"].to_numpy() == TARGET_LABEL).astype(np.int64)[keep]
        fv = fold[keep]
        parts = []
        for fi, c in enumerate(TREE_FEATURES):
            x = df[c].to_numpy(np.int64)[keep]
            p = pd.DataFrame(
                {"fold": fv, "feat": np.int64(fi), "val": x, "n": 1, "npos": y}
            )
            parts.append(
                p.groupby(["fold", "feat", "val"], sort=False, as_index=False).sum()
            )
        if not parts:
            return pd.DataFrame(
                {"fold": [], "feat": [], "val": [], "n": [], "npos": []}
            ).astype(np.int64)
        return pd.concat(parts, ignore_index=True)

    hist1 = (
        features.map_batches(hist1_partial, batch_format="pandas")
        .to_pandas()
        .groupby(["fold", "feat", "val"], sort=True, as_index=False)
        .sum()
    )
    totals = hist1.groupby(["feat", "val"], sort=True, as_index=False)[
        ["n", "npos"]
    ].sum()
    roots: dict[int, tuple[int, int]] = {}
    for f in range(k):
        own = hist1[hist1["fold"] == f]
        train = totals.merge(
            own[["feat", "val", "n", "npos"]],
            on=["feat", "val"],
            how="left",
            suffixes=("", "_o"),
        ).fillna(0)
        train["n"] = (train["n"] - train["n_o"]).astype(np.int64)
        train["npos"] = (train["npos"] - train["npos_o"]).astype(np.int64)
        train = train[train["n"] > 0]
        s = _tree_best_split(train)
        assert s is not None, f"fold {f}: empty training set"
        roots[f] = (s[0], s[1])

    def hist2_partial(df: pd.DataFrame) -> pd.DataFrame:
        fold = _fold_of(df["vertex_key"], k)
        keep = fold >= 0
        y = (df["label"].to_numpy() == TARGET_LABEL).astype(np.int64)[keep]
        fv = fold[keep]
        X = {c: df[c].to_numpy(np.int64)[keep] for c in TREE_FEATURES}
        parts = []
        for f in range(k):
            m = fv != f
            if not m.any():
                continue
            rfeat, rthr = roots[f]
            side = (X[TREE_FEATURES[rfeat]][m] <= rthr).astype(np.int64)
            for fi, c in enumerate(TREE_FEATURES):
                p = pd.DataFrame(
                    {
                        "f": np.int64(f),
                        "side": side,
                        "feat": np.int64(fi),
                        "val": X[c][m],
                        "n": 1,
                        "npos": y[m],
                    }
                )
                parts.append(
                    p.groupby(
                        ["f", "side", "feat", "val"], sort=False, as_index=False
                    ).sum()
                )
        if not parts:
            return pd.DataFrame(
                {"f": [], "side": [], "feat": [], "val": [], "n": [], "npos": []}
            ).astype(np.int64)
        return pd.concat(parts, ignore_index=True)

    hist2 = (
        features.map_batches(hist2_partial, batch_format="pandas")
        .to_pandas()
        .groupby(["f", "side", "feat", "val"], sort=True, as_index=False)
        .sum()
    )
    children: dict[tuple[int, int], tuple[int, int, int, int]] = {}
    for f in range(k):
        for side in (0, 1):
            h = hist2[(hist2["f"] == f) & (hist2["side"] == side)]
            s = _tree_best_split(h)
            children[(f, side)] = s if s is not None else (-1, 0, 0, 0)

    trees_b = {
        f: (roots[f], children[(f, 1)], children[(f, 0)]) for f in range(k)
    }

    def holdout_partial(df: pd.DataFrame) -> pd.DataFrame:
        fold = _fold_of(df["vertex_key"], k)
        keep = fold >= 0
        y = (df["label"].to_numpy() == TARGET_LABEL).astype(np.int64)[keep]
        fv = fold[keep]
        X = {c: df[c].to_numpy(np.int64)[keep] for c in TREE_FEATURES}
        pred = np.zeros(len(fv), dtype=np.int64)
        for f in np.unique(fv):
            m = fv == f
            (rfeat, rthr), left, right = trees_b[int(f)]
            side = X[TREE_FEATURES[rfeat]][m] <= rthr
            for sval, (cfeat, cthr, p_low, p_high) in ((True, left), (False, right)):
                sm = side == sval
                if not sm.any():
                    continue
                if cfeat < 0:
                    p = np.zeros(int(sm.sum()), dtype=np.int64)
                else:
                    p = np.where(
                        X[TREE_FEATURES[cfeat]][m][sm] <= cthr, p_low, p_high
                    ).astype(np.int64)
                idx = np.flatnonzero(m)[sm]
                pred[idx] = p
        out = pd.DataFrame(
            {
                "fold": fv,
                "tree_holdout_n": np.ones(len(fv), dtype=np.int64),
                "tree_holdout_agree": (pred == y).astype(np.int64),
            }
        )
        return out.groupby("fold", sort=False, as_index=False).sum()

    ho = (
        features.map_batches(holdout_partial, batch_format="pandas")
        .to_pandas()
        .groupby("fold", as_index=False)
        .sum()
    )
    rows = []
    for f in range(k):
        (rfeat, rthr), (lf, lt, llp, lhp), (rf_, rt, rlp, rhp) = trees_b[f]
        rows.append(
            (f, rfeat, rthr, lf, lt, llp, lhp, rf_, rt, rlp, rhp)
        )
    res = pd.DataFrame(
        rows,
        columns=[
            "fold",
            "tree_root_feat",
            "tree_root_thr",
            "tree_left_feat",
            "tree_left_thr",
            "tree_ll_pred",
            "tree_lh_pred",
            "tree_right_feat",
            "tree_right_thr",
            "tree_rl_pred",
            "tree_rh_pred",
        ],
    ).merge(ho, on="fold", how="left")
    for c in res.columns:
        res[c] = res[c].fillna(0).astype(np.int64)
    return res.sort_values("fold").reset_index(drop=True)


def feature_importance(features: ray.data.Dataset) -> pd.DataFrame:
    """Per-weight contribution aggregates of the fixed linear model over
    the feature table — the analog of the reference's feature-importance
    report (/root/reference/code/classification/classify.py:277-301),
    exact integers: for each model feature, the signed and absolute total
    contribution w*x and the count of rows where the feature fires.
    Distributed shape: per-batch partials (one row per feature), tiny
    reduce."""
    cols = sorted(MODEL_WEIGHTS)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for c in cols:
            x = df[c].to_numpy(np.int64)
            wx = MODEL_WEIGHTS[c] * x
            recs.append(
                (c, int(wx.sum()), int(np.abs(wx).sum()), int((x != 0).sum()))
            )
        return pd.DataFrame(
            recs, columns=["feature", "contrib", "abs_contrib", "n_nonzero"]
        )

    out = (
        features.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("feature", as_index=False)
        .sum()
    )
    out["weight"] = out["feature"].map(MODEL_WEIGHTS).astype(np.int64)
    for c in ("contrib", "abs_contrib", "n_nonzero"):
        out[c] = out[c].astype(np.int64)
    return (
        out[["feature", "weight", "contrib", "abs_contrib", "n_nonzero"]]
        .sort_values("feature")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generators
# ---------------------------------------------------------------------------


def cv_folds_sql(base_cte: str, k: int = NUM_FOLDS) -> str:
    return (
        base_cte
        + f"""
SELECT DISTINCT conv_id,
       CAST(replace(conv_id, 'conv_', '') AS BIGINT) % {k} AS fold,
       CAST(CAST(replace(conv_id, 'conv_', '') AS BIGINT) % 10 = 0
            AS BIGINT) AS in_sample
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
    """Mirror of scored_with_percentiles: rank()-1 counts the same-fold
    rows with strictly smaller z (ties share the count), the exact
    empirical-CDF numerator of the Ray side's histogram lookup."""
    return (
        _scored_ctes(base_cte, k)
        + f"""
SELECT vertex_key, fold, CAST(z AS BIGINT) AS z, pred, is_target,
       CAST((rank() OVER (PARTITION BY fold ORDER BY z) - 1)
            * {PCTILE_SCALE}
            // (count(*) OVER (PARTITION BY fold)) AS BIGINT) AS z_pctile_fp
FROM clf_scored"""
    )


def fit_fold_weights_sql(base_cte: str, k: int = NUM_FOLDS) -> str:
    """Mirror of :func:`fit_fold_weights`: per-fold HUGEINT moment sums,
    leave-one-fold-out Cramer solve (DuckDB ``//`` truncates toward zero,
    matching the Ray side's _tdiv), holdout agreement with the fitted
    fixed-point weights."""
    f1, f2 = FIT_FEATURES
    S = FIT_SCALE

    def det3(m):
        return (
            f"({m[0][0]}*(({m[1][1]})*({m[2][2]}) - ({m[1][2]})*({m[2][1]}))"
            f" - ({m[0][1]})*(({m[1][0]})*({m[2][2]}) - ({m[1][2]})*({m[2][0]}))"
            f" + ({m[0][2]})*(({m[1][0]})*({m[2][1]}) - ({m[1][1]})*({m[2][0]})))"
        )

    g = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    b = ["sy", "s1y", "s2y"]
    d = det3(g)
    w_exprs = []
    for j in range(3):
        gj = [[b[i] if c == j else g[i][c] for c in range(3)] for i in range(3)]
        w_exprs.append(
            f"coalesce(({S}::HUGEINT * {det3(gj)}) // nullif({d}, 0), 0)"
        )
    return (
        _scored_ctes(base_cte, k)
        + f"""
, fit_rows AS MATERIALIZED (
    SELECT s.fold, v.{f1} AS x1, v.{f2} AS x2, s.is_target AS y
    FROM clf_scored s JOIN vf_final v USING (vertex_key)
    WHERE s.fold >= 0
), fit_fold_sums AS MATERIALIZED (
    SELECT fold,
           CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
           CAST(sum(x1*x1) AS HUGEINT) AS s11,
           CAST(sum(x1*x2) AS HUGEINT) AS s12,
           CAST(sum(x2*x2) AS HUGEINT) AS s22,
           CAST(sum(y) AS HUGEINT) AS sy,
           CAST(sum(x1*y) AS HUGEINT) AS s1y,
           CAST(sum(x2*y) AS HUGEINT) AS s2y
    FROM fit_rows GROUP BY fold
), fit_train AS MATERIALIZED (
    SELECT f.fold,
           t.n - coalesce(o.n, 0) AS n,
           t.s1 - coalesce(o.s1, 0) AS s1, t.s2 - coalesce(o.s2, 0) AS s2,
           t.s11 - coalesce(o.s11, 0) AS s11,
           t.s12 - coalesce(o.s12, 0) AS s12,
           t.s22 - coalesce(o.s22, 0) AS s22,
           t.sy - coalesce(o.sy, 0) AS sy,
           t.s1y - coalesce(o.s1y, 0) AS s1y,
           t.s2y - coalesce(o.s2y, 0) AS s2y
    FROM (SELECT unnest(range({k})) AS fold) f
    CROSS JOIN (SELECT sum(n) AS n, sum(s1) AS s1, sum(s2) AS s2,
                       sum(s11) AS s11, sum(s12) AS s12, sum(s22) AS s22,
                       sum(sy) AS sy, sum(s1y) AS s1y, sum(s2y) AS s2y
                FROM fit_fold_sums) t
    LEFT JOIN fit_fold_sums o ON o.fold = f.fold
), fit_weights AS MATERIALIZED (
    SELECT fold, n AS n_train,
           {w_exprs[0]} AS w0_fp,
           {w_exprs[1]} AS w1_fp,
           {w_exprs[2]} AS w2_fp
    FROM fit_train
), fit_holdout AS MATERIALIZED (
    SELECT r.fold,
           count(*) AS holdout_n,
           sum(CASE WHEN CAST(2*(w.w0_fp + w.w1_fp*r.x1 + w.w2_fp*r.x2)
                         > {S} AS BIGINT) = r.y
                    THEN 1 ELSE 0 END) AS holdout_agree
    FROM fit_rows r JOIN fit_weights w USING (fold)
    GROUP BY r.fold
)"""
        + _tree_ctes(k)
        + """
SELECT w.fold, CAST(w.n_train AS BIGINT) AS n_train,
       CAST(w.w0_fp AS BIGINT) AS w0_fp,
       CAST(w.w1_fp AS BIGINT) AS w1_fp,
       CAST(w.w2_fp AS BIGINT) AS w2_fp,
       CAST(coalesce(h.holdout_n, 0) AS BIGINT) AS holdout_n,
       CAST(coalesce(h.holdout_agree, 0) AS BIGINT) AS holdout_agree,
       t.tree_root_feat, t.tree_root_thr,
       t.tree_left_feat, t.tree_left_thr, t.tree_ll_pred, t.tree_lh_pred,
       t.tree_right_feat, t.tree_right_thr, t.tree_rl_pred, t.tree_rh_pred,
       t.tree_holdout_n, t.tree_holdout_agree
FROM fit_weights w LEFT JOIN fit_holdout h USING (fold)
     JOIN tr_final t ON t.fold = w.fold
ORDER BY w.fold"""
    )


def _tree_ctes(k: int = NUM_FOLDS) -> str:
    """Mirror of :func:`fit_fold_trees` (appended after _scored_ctes +
    vf_final): histogram CTEs, window-function prefix sums, exact integer
    accuracy argmax with the (correct DESC, feat, val) tie order, sentinel
    (-1, 0, 0, 0) for empty training sides."""
    nf = len(TREE_FEATURES)
    xcols = ",\n           ".join(
        f"v.{c} AS x{i}" for i, c in enumerate(TREE_FEATURES)
    )

    def case_x(pfx: str) -> str:
        return (
            "CASE "
            + " ".join(f"WHEN {pfx}.feat = {i} THEN r.x{i}" for i in range(nf))
            + " END"
        )

    h1_union = "\n    UNION ALL\n    ".join(
        f"SELECT fold, {i} AS feat, x{i} AS val, CAST(count(*) AS BIGINT) AS n,"
        f" CAST(sum(y) AS BIGINT) AS npos FROM tree_rows GROUP BY 1, 3"
        for i in range(nf)
    )
    h2_union = "\n    UNION ALL\n    ".join(
        f"SELECT f, side, {i} AS feat, x{i} AS val, CAST(count(*) AS BIGINT)"
        f" AS n, CAST(sum(y) AS BIGINT) AS npos FROM tr_rooted GROUP BY 1, 2, 4"
        for i in range(nf)
    )
    correct = (
        "(GREATEST(cp, cn - cp) + GREATEST(tp - cp, (tn - cn) - (tp - cp)))"
    )
    return f"""
, tree_rows AS MATERIALIZED (
    SELECT s.fold,
           {xcols},
           s.is_target AS y
    FROM clf_scored s JOIN vf_final v USING (vertex_key)
    WHERE s.fold >= 0
), tr_h1 AS MATERIALIZED (
    {h1_union}
), tr_tot AS (
    SELECT feat, val, sum(n) AS n, sum(npos) AS npos FROM tr_h1 GROUP BY 1, 2
), tr_train AS (
    SELECT f.fold, t.feat, t.val,
           t.n - coalesce(o.n, 0) AS n,
           t.npos - coalesce(o.npos, 0) AS npos
    FROM (SELECT unnest(range({k})) AS fold) f
    CROSS JOIN tr_tot t
    LEFT JOIN tr_h1 o ON o.fold = f.fold AND o.feat = t.feat AND o.val = t.val
), tr_sc1 AS (
    SELECT fold, feat, val,
           SUM(n) OVER w AS cn, SUM(npos) OVER w AS cp,
           SUM(n) OVER wp AS tn, SUM(npos) OVER wp AS tp
    FROM tr_train WHERE n > 0
    WINDOW w AS (PARTITION BY fold, feat ORDER BY val
                 ROWS UNBOUNDED PRECEDING),
           wp AS (PARTITION BY fold, feat)
), tr_root AS MATERIALIZED (
    SELECT fold, feat, val AS thr FROM (
        SELECT fold, feat, val,
               row_number() OVER (
                   PARTITION BY fold
                   ORDER BY {correct} DESC, feat, val) AS rn
        FROM tr_sc1) WHERE rn = 1
), tr_rooted AS MATERIALIZED (
    SELECT f.fold AS f, r.*,
           CAST(({case_x("rt")}) <= rt.thr AS BIGINT) AS side
    FROM tree_rows r
    JOIN (SELECT unnest(range({k})) AS fold) f ON r.fold <> f.fold
    JOIN tr_root rt ON rt.fold = f.fold
), tr_h2 AS MATERIALIZED (
    {h2_union}
), tr_sc2 AS (
    SELECT f, side, feat, val,
           SUM(n) OVER w AS cn, SUM(npos) OVER w AS cp,
           SUM(n) OVER wp AS tn, SUM(npos) OVER wp AS tp
    FROM tr_h2
    WINDOW w AS (PARTITION BY f, side, feat ORDER BY val
                 ROWS UNBOUNDED PRECEDING),
           wp AS (PARTITION BY f, side, feat)
), tr_child AS (
    SELECT f, side, feat, val AS thr,
           CAST(2 * cp > cn AS BIGINT) AS p_low,
           CAST(2 * (tp - cp) > (tn - cn) AS BIGINT) AS p_high
    FROM (
        SELECT f, side, feat, val, cn, cp, tn, tp,
               row_number() OVER (
                   PARTITION BY f, side
                   ORDER BY {correct} DESC, feat, val) AS rn
        FROM tr_sc2) WHERE rn = 1
), tr_child_full AS (
    SELECT g.fold AS f, g.side,
           CAST(coalesce(c.feat, -1) AS BIGINT) AS feat,
           CAST(coalesce(c.thr, 0) AS BIGINT) AS thr,
           CAST(coalesce(c.p_low, 0) AS BIGINT) AS p_low,
           CAST(coalesce(c.p_high, 0) AS BIGINT) AS p_high
    FROM (SELECT f.fold, s.side
          FROM (SELECT unnest(range({k})) AS fold) f
          CROSS JOIN (VALUES (0), (1)) s(side)) g
    LEFT JOIN tr_child c ON c.f = g.fold AND c.side = g.side
), tr_holdout AS (
    SELECT r.fold,
           CAST(count(*) AS BIGINT) AS tree_holdout_n,
           CAST(sum(CASE WHEN (CASE WHEN c.feat = -1 THEN 0
                               WHEN ({case_x("c")}) <= c.thr THEN c.p_low
                               ELSE c.p_high END) = r.y
                         THEN 1 ELSE 0 END) AS BIGINT) AS tree_holdout_agree
    FROM tree_rows r
    JOIN tr_root rt ON rt.fold = r.fold
    JOIN tr_child_full c ON c.f = r.fold
         AND c.side = CAST(({case_x("rt")}) <= rt.thr AS BIGINT)
    GROUP BY 1
), tr_final AS (
    SELECT rt.fold,
           CAST(rt.feat AS BIGINT) AS tree_root_feat,
           CAST(rt.thr AS BIGINT) AS tree_root_thr,
           l.feat AS tree_left_feat, l.thr AS tree_left_thr,
           l.p_low AS tree_ll_pred, l.p_high AS tree_lh_pred,
           rr.feat AS tree_right_feat, rr.thr AS tree_right_thr,
           rr.p_low AS tree_rl_pred, rr.p_high AS tree_rh_pred,
           CAST(coalesce(h.tree_holdout_n, 0) AS BIGINT) AS tree_holdout_n,
           CAST(coalesce(h.tree_holdout_agree, 0) AS BIGINT)
               AS tree_holdout_agree
    FROM tr_root rt
    JOIN tr_child_full l ON l.f = rt.fold AND l.side = 1
    JOIN tr_child_full rr ON rr.f = rt.fold AND rr.side = 0
    LEFT JOIN tr_holdout h ON h.fold = rt.fold
)"""


def feature_importance_sql(base_cte: str) -> str:
    sel = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS feature, CAST({MODEL_WEIGHTS[c]} AS BIGINT) AS weight,
       CAST(sum({MODEL_WEIGHTS[c]} * {c}) AS BIGINT) AS contrib,
       CAST(sum(abs({MODEL_WEIGHTS[c]} * {c})) AS BIGINT) AS abs_contrib,
       CAST(count(*) FILTER (WHERE {c} <> 0) AS BIGINT) AS n_nonzero
FROM vf_final"""
        for c in sorted(MODEL_WEIGHTS)
    )
    from webgraph_ray.functions.oracles import vertex_features_ctes

    return vertex_features_ctes(base_cte) + "\n" + sel + "\nORDER BY feature"


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


def fold_auc_sql(base_cte: str, k: int = NUM_FOLDS) -> str:
    """DuckDB mirror of :func:`fold_auc`: window cumulative negatives
    below each score, HUGEINT rank-sum, same -1 empty-class sentinel."""
    return (
        _scored_ctes(base_cte, k)
        + f"""
, auc_h AS (
    SELECT fold, z, count(*) AS n, sum(is_target) AS npos,
           count(*) - sum(is_target) AS nneg
    FROM clf_scored GROUP BY 1, 2
), auc_c AS (
    SELECT fold, npos, nneg,
           COALESCE(SUM(nneg) OVER (
               PARTITION BY fold ORDER BY z
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_less
    FROM auc_h
), auc_f AS (
    SELECT fold,
           sum(CAST(npos AS HUGEINT) * (2 * cum_less + nneg)) AS num,
           sum(npos) AS p, sum(nneg) AS nn
    FROM auc_c GROUP BY 1
)
SELECT fold,
       CAST(CASE WHEN p = 0 OR nn = 0 THEN -1
            ELSE (CAST({AUC_SCALE} AS HUGEINT) * num) // (2 * p * nn)
            END AS BIGINT) AS auc_fp
FROM auc_f"""
    )
