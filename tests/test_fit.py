"""Model-fit stage: closed-form per-fold least squares must be
deterministic across partitionings (integer Gram sums are
order-independent; the Cramer solve runs in exact Python ints)."""

import numpy as np
import pandas as pd

import ray.data

from webgraph_ray.pipelines.classify import (
    FIT_SCALE,
    MODEL_WEIGHTS,
    _tdiv,
    feature_importance,
    fit_fold_weights,
)

FEATURE_COLS = sorted(MODEL_WEIGHTS) + ["score_fp", "label"]


def _toy_features(n=400, k_convs=40, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        conv = i % k_convs
        turn = i // k_convs
        rec = {c: int(rng.integers(0, 5)) for c in sorted(MODEL_WEIGHTS)}
        rec["chain_depth"] = turn
        rec["reply_out"] = int(rng.integers(0, 2))
        rec["vertex_key"] = f"conv_{conv}#{turn}"
        rec["score_fp"] = int(rng.integers(0, 10**12))
        rec["label"] = "late_turn" if turn >= 6 else "early_turn"
        rows.append(rec)
    # a few tool vertices (must be excluded: fold -1)
    for t in range(3):
        rec = {c: 1 for c in sorted(MODEL_WEIGHTS)}
        rec["vertex_key"] = f"tool:tool_{t}"
        rec["score_fp"] = 10**11
        rec["label"] = "tool"
        rows.append(rec)
    return pd.DataFrame(rows)


def test_fit_deterministic_across_partitionings():
    df = _toy_features()
    a = fit_fold_weights(ray.data.from_pandas(df))
    shuffled = df.sample(frac=1.0, random_state=9).reset_index(drop=True)
    b = fit_fold_weights(
        ray.data.from_pandas(shuffled).repartition(7)
    )
    pd.testing.assert_frame_equal(a, b)


def test_fit_matches_numpy_lstsq():
    """Fixed-point weights must agree with float least squares on the
    training split (to within the fixed-point grid)."""
    df = _toy_features(n=300, k_convs=30, seed=11)
    out = fit_fold_weights(ray.data.from_pandas(df))
    conv = df["vertex_key"].str.replace(r"#\d+$", "", regex=True)
    is_tool = df["vertex_key"].str.startswith("tool:")
    fold = np.where(
        is_tool,
        -1,
        conv.str.replace("conv_", "", regex=False)
        .where(~is_tool, other="0")
        .astype(np.int64)
        % 10,
    )
    for f in range(10):
        train = df[(fold >= 0) & (fold != f)]
        X = np.column_stack(
            [
                np.ones(len(train)),
                train["chain_depth"].to_numpy(float),
                train["reply_out"].to_numpy(float),
            ]
        )
        y = (train["label"] == "late_turn").to_numpy(float)
        w, *_ = np.linalg.lstsq(X, y, rcond=None)
        row = out[out["fold"] == f].iloc[0]
        got = np.array([row.w0_fp, row.w1_fp, row.w2_fp]) / FIT_SCALE
        np.testing.assert_allclose(got, w, atol=2 / FIT_SCALE)
        assert row.n_train == len(train)


def test_fit_holdout_counts():
    df = _toy_features(n=200, k_convs=20, seed=5)
    out = fit_fold_weights(ray.data.from_pandas(df))
    assert int(out["holdout_n"].sum()) == 200  # every non-tool row once
    assert (out["holdout_agree"] <= out["holdout_n"]).all()


def test_tdiv_truncates_toward_zero():
    assert _tdiv(-7, 2) == -3 and _tdiv(7, -2) == -3 and _tdiv(7, 2) == 3


def test_feature_importance_exact():
    df = _toy_features(n=150, k_convs=15, seed=2)
    out = feature_importance(ray.data.from_pandas(df).repartition(5))
    assert list(out["feature"]) == sorted(MODEL_WEIGHTS)
    for _, r in out.iterrows():
        wx = MODEL_WEIGHTS[r.feature] * df[r.feature].to_numpy(np.int64)
        assert r.contrib == wx.sum()
        assert r.abs_contrib == np.abs(wx).sum()
        assert r.n_nonzero == int((df[r.feature] != 0).sum())


def test_tree_fit_deterministic_and_sane():
    """fit_fold_trees: identical output across partitionings (histogram
    sums are order-independent), holdout covers every non-tool row once,
    and the fitted root split beats or matches the constant classifier on
    its training set (the split criterion maximizes exactly that)."""
    from webgraph_ray.pipelines.classify import TREE_FEATURES, fit_fold_trees

    df = _toy_features(n=300, k_convs=30, seed=11)
    outs = [
        fit_fold_trees(ray.data.from_pandas(df).repartition(p))
        for p in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert int(out["tree_holdout_n"].sum()) == 300
    assert (out["tree_holdout_agree"] <= out["tree_holdout_n"]).all()
    assert out["tree_root_feat"].between(0, len(TREE_FEATURES) - 1).all()
    # chain_depth >= 6 defines the label, so the accuracy-maximizing
    # depth-2 tree must recover a chain_depth split at the root
    ci = TREE_FEATURES.index("chain_depth")
    assert (out["tree_root_feat"] == ci).all()
    assert (out["tree_root_thr"] == 5).all()
    # holdout agreement should be perfect for this separable toy
    assert (out["tree_holdout_agree"] == out["tree_holdout_n"]).all()


# ---------------------------------------------------------------------------
# exact Mann-Whitney AUC
# ---------------------------------------------------------------------------


def test_fold_auc_matches_bruteforce():
    import itertools

    import ray.data

    from webgraph_ray.pipelines.classify import AUC_SCALE, fold_auc

    rng = np.random.default_rng(13)
    n = 400
    scored = pd.DataFrame(
        {
            "fold": (np.arange(n) % 3).astype(np.int64),
            "z": rng.integers(-20, 20, size=n).astype(np.int64),
            "is_target": (rng.random(n) < 0.3).astype(np.int64),
        }
    )
    got = fold_auc(ray.data.from_pandas(scored).repartition(7)).set_index(
        "fold"
    )["auc_fp"]
    for fold, g in scored.groupby("fold"):
        pos = g.loc[g["is_target"] == 1, "z"].to_numpy()
        neg = g.loc[g["is_target"] == 0, "z"].to_numpy()
        num = sum(
            2 if p > q else (1 if p == q else 0)
            for p, q in itertools.product(pos, neg)
        )
        expect = (AUC_SCALE * num) // (2 * len(pos) * len(neg))
        assert int(got[fold]) == expect


def test_fold_auc_degenerate_class():
    import ray.data

    from webgraph_ray.pipelines.classify import fold_auc

    scored = pd.DataFrame(
        {
            "fold": np.zeros(5, dtype=np.int64),
            "z": np.arange(5, dtype=np.int64),
            "is_target": np.ones(5, dtype=np.int64),
        }
    )
    out = fold_auc(ray.data.from_pandas(scored))
    assert int(out["auc_fp"].iloc[0]) == -1
