"""KMV distinct sketch + deterministic stratified sampling."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from webgraph_ray.functions.texthash import M
from webgraph_ray.stages.sketch import (
    SAMPLE_A,
    SAMPLE_B,
    kmv_distinct,
    kmv_distinct_sql,
    stratified_sample,
    stratified_sample_sql,
)


def _docs_ds(n_docs=400, vocab=5000, seed=7, blocks=8):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(f"tok{v}" for v in rng.integers(0, vocab, size=40))
        for _ in range(n_docs)
    ]
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
    return ray.data.from_pandas(df).repartition(blocks), df


def test_kmv_estimator_accuracy_and_oracle():
    ds, df = _docs_ds()
    out = kmv_distinct(ds, k=128)
    exact = len({t for s in df["text"] for t in s.split()})
    assert exact > 128  # the real estimator path, not the exact-set fallback
    est = int(out["est_distinct"].iloc[0])
    # KMV relative error ~ 1/sqrt(k) ~ 9%; allow 3 sigma
    assert abs(est - exact) / exact < 0.27, (est, exact)

    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(kmv_distinct_sql(k=128)).df()
    assert int(exp["est_distinct"].iloc[0]) == est
    assert int(exp["kth_hash"].iloc[0]) == int(out["kth_hash"].iloc[0])


def test_kmv_merge_invariant_under_blocking():
    ds1, df = _docs_ds(blocks=2)
    ds2 = ray.data.from_pandas(df).repartition(16)
    a = kmv_distinct(ds1, k=64)
    b = kmv_distinct(ds2, k=64)
    assert a.equals(b)


def test_kmv_below_k_is_exact():
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "b c d"]})
    out = kmv_distinct(ray.data.from_pandas(df), k=256)
    assert int(out["est_distinct"].iloc[0]) == 4


def test_stratified_sample_matches_bruteforce_and_oracle():
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": rng.permutation(n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], size=n),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.zeros(n),
        }
    )
    got = stratified_sample(ray.data.from_pandas(df).repartition(7), n=4)

    # brute force
    bf = df[["event_type", "event_id"]].copy()
    bf["h"] = (SAMPLE_A * bf["event_id"].to_numpy(np.int64) + SAMPLE_B) % M
    bf = bf.sort_values(["h", "event_id"]).groupby("event_type").head(4)
    bf = bf.sort_values(["event_type", "h", "event_id"])
    bf["sample_rank"] = bf.groupby("event_type").cumcount() + 1
    exp = bf[["event_type", "sample_rank", "event_id"]].reset_index(drop=True)
    assert got.reset_index(drop=True).equals(exp)

    con = duckdb.connect()
    con.register("events", df)
    sql = con.execute(stratified_sample_sql(n=4)).df()
    sql = sql.sort_values(["event_type", "sample_rank"]).reset_index(drop=True)
    assert (sql["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()


def test_stratified_sample_membership_independent_of_blocking():
    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["x", "y"], size=n),
        }
    )
    a = stratified_sample(ray.data.from_pandas(df).repartition(3), n=6)
    b = stratified_sample(ray.data.from_pandas(df).repartition(13), n=6)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def _edges_df(seed=5, n=4000):
    rng = np.random.default_rng(seed)
    # skewed destinations: 3 hubs soak up ~60% of edges
    hubs = np.array(["tool:alpha", "tool:beta", "tool:gamma"])
    cold = np.array([f"conv{i:05d}#{i % 40}" for i in range(800)])
    pick_hub = rng.random(n) < 0.6
    dst = np.where(pick_hub, hubs[rng.integers(0, 3, n)], cold[rng.integers(0, 800, n)])
    return pd.DataFrame({"dst_key": dst})


def test_cms_superset_of_true_heavy_hitters_and_overcount_only():
    from webgraph_ray.stages.sketch import cms_hot_keys

    df = _edges_df()
    got = cms_hot_keys(ray.data.from_pandas(df).repartition(9), min_count=300)
    true = df["dst_key"].value_counts()
    heavy = set(true[true >= 300].index)
    assert heavy  # the fixture actually has hubs
    assert heavy <= set(got["vertex_key"])  # CMS never misses a heavy hitter
    est = dict(zip(got["vertex_key"], got["est_count"]))
    for k, e in est.items():
        assert e >= true.get(k, 0)  # estimates only over-count


def test_cms_blocking_invariance():
    from webgraph_ray.stages.sketch import cms_hot_keys

    df = _edges_df(seed=12)
    a = cms_hot_keys(ray.data.from_pandas(df).repartition(2), min_count=200)
    b = cms_hot_keys(ray.data.from_pandas(df).repartition(17), min_count=200)
    assert a.equals(b)


def test_cms_sql_oracle_bit_exact():
    from webgraph_ray.stages.sketch import cms_hot_keys, cms_hot_keys_sql

    df = _edges_df(seed=21, n=2500)
    got = cms_hot_keys(ray.data.from_pandas(df).repartition(5), min_count=250)
    con = duckdb.connect()
    con.register("edges_tbl", df)
    sql = cms_hot_keys_sql("WITH edges AS (SELECT * FROM edges_tbl)", min_count=250)
    exp = con.execute(sql).df()
    assert got["vertex_key"].tolist() == exp["vertex_key"].tolist()
    assert got["est_count"].tolist() == exp["est_count"].tolist()


def test_tfidf_topk_matches_oracle_and_bruteforce():
    from webgraph_ray.stages.text import TFIDF_SCALE, tfidf_topk, tfidf_topk_sql

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(120)
    ]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": texts})
    got = tfidf_topk(ray.data.from_pandas(df).repartition(6), k=3)

    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(tfidf_topk_sql(k=3)).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["term"].tolist() == exp["term"].tolist()
    assert got["score_fp"].tolist() == exp["score_fp"].tolist()

    # brute-force spot check of one doc
    doc = df.iloc[7]
    toks = pd.Series(doc["text"].split())
    tf = toks.value_counts()
    dfreq = {
        t: sum(t in set(x.split()) for x in df["text"]) for t in tf.index
    }
    scores = {t: (int(tf[t]) * TFIDF_SCALE) // dfreq[t] for t in tf.index}
    best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    mine = got[got["doc_id"] == 7][["term", "score_fp"]].to_records(index=False)
    assert [(t, s) for t, s in mine] == best


def test_tfidf_blocking_invariance():
    from webgraph_ray.stages.text import tfidf_topk

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [f"a b c d{i % 5} e{i % 7}" for i in range(40)],
        }
    )
    a = tfidf_topk(ray.data.from_pandas(df).repartition(2), k=2)
    b = tfidf_topk(ray.data.from_pandas(df).repartition(11), k=2)
    assert a.equals(b)


def test_reciprocity_bruteforce_and_oracle():
    from webgraph_ray.stages.features import reciprocity, reciprocity_sql

    rng = np.random.default_rng(5)
    n = 60
    src = rng.integers(0, n, 800)
    dst = rng.integers(0, n, 800)
    df = pd.DataFrame(
        {
            "src_key": [f"v{int(s):03d}" for s in src],
            "dst_key": [f"v{int(d):03d}" for d in dst],
        }
    )
    got = reciprocity(ray.data.from_pandas(df).repartition(7))

    d = df[df.src_key != df.dst_key].drop_duplicates()
    pairs = set(zip(d.src_key, d.dst_key))
    n_rec = sum(1 for s, t in pairs if (t, s) in pairs)
    assert int(got["n_directed"].iloc[0]) == len(pairs)
    assert int(got["n_reciprocated"].iloc[0]) == n_rec
    assert int(got["ratio_fp"].iloc[0]) == (n_rec * 1_000_000) // len(pairs)

    con = duckdb.connect()
    con.register("edges_tbl", df)
    exp = con.execute(
        reciprocity_sql("WITH edges AS (SELECT * FROM edges_tbl)")
    ).df()
    assert got.astype("int64").equals(exp.astype("int64"))


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_accuracy_oracle_and_blocking_invariance():
    from webgraph_ray.stages.sketch import hll_distinct, hll_distinct_sql

    ds, df = _docs_ds(n_docs=400, vocab=5000, seed=11)
    got = hll_distinct(ds)
    true = len({t for x in df["text"] for t in x.split()})
    est = int(got["est_distinct"].iloc[0])
    # 256 registers -> ~6.5% std error; allow 4 sigma
    assert abs(est - true) / true < 0.26, (est, true)

    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(hll_distinct_sql()).df()
    assert got.astype("int64").equals(exp.astype("int64"))

    other = hll_distinct(ds.repartition(1))
    assert got.equals(other)


def test_hll_register_merge_property():
    # registers of the whole = elementwise max of the halves' registers
    from webgraph_ray.stages.sketch import _hll_registers

    _, df = _docs_ds(n_docs=200, vocab=800, seed=3)
    whole = _hll_registers(df["text"])
    merged = np.maximum(
        _hll_registers(df["text"].iloc[:100]),
        _hll_registers(df["text"].iloc[100:]),
    )
    assert (whole == merged).all()


def test_hll_linear_branch_floor_agrees_with_duckdb_for_all_v():
    # the small-range branch est = floor(256*ln(256/V)) runs on one of
    # 255 possible arguments; pin numpy == DuckDB on every one so a libm
    # ulp difference can never flip a floor
    con = duckdb.connect()
    vs = list(range(1, 256))
    row = con.execute(
        "SELECT " + ",".join(f"floor(256.0*ln(256.0/{v}))" for v in vs)
    ).fetchone()
    for v, r in zip(vs, row):
        assert int(np.floor(256 * np.log(256 / v))) == int(r), v


def test_hll_empty_corpus():
    from webgraph_ray.stages.sketch import hll_distinct

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                      "text": pd.Series(dtype="object")})
    )
    got = hll_distinct(ds)
    assert int(got["est_distinct"].iloc[0]) == 0
    assert int(got["nonzero_registers"].iloc[0]) == 0


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_accuracy_oracle_and_blocking_invariance():
    from webgraph_ray.stages.sketch import bloom_seen, bloom_seen_sql

    ds, df = _docs_ds(n_docs=400, vocab=5000, seed=11)
    got = bloom_seen(ds)
    true = len({t for x in df["text"] for t in x.split()})
    est = int(got["est_distinct"].iloc[0])
    # occupancy inversion at ~2% fill: sub-percent expected; allow 5%
    assert abs(est - true) / true < 0.05, (est, true)

    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(bloom_seen_sql()).df()
    assert got.astype("int64").equals(exp.astype("int64"))

    other = bloom_seen(ds.repartition(1))
    assert got.equals(other)


def test_bloom_merge_property():
    # set positions of the whole = union of the halves' positions
    from webgraph_ray.stages.sketch import _bloom_positions, _token_hashes

    _, df = _docs_ds(n_docs=200, vocab=800, seed=3)

    def posset(texts):
        u = _token_hashes(texts)
        return set(np.unique(_bloom_positions(u)).tolist())

    whole = posset(df["text"])
    merged = posset(df["text"].iloc[:100]) | posset(df["text"].iloc[100:])
    assert whole == merged


def test_bloom_no_false_negatives():
    # every inserted token probes fully present (the membership guarantee)
    from webgraph_ray.functions.texthash import hash_token_list
    from webgraph_ray.stages.sketch import (
        _bloom_positions,
        _kmv_mix,
        _token_hashes,
    )

    _, df = _docs_ds(n_docs=150, vocab=3000, seed=9)
    bits = np.unique(_bloom_positions(_token_hashes(df["text"])))
    toks = sorted({t for x in df["text"] for t in x.split()})
    ppos = _bloom_positions(_kmv_mix(hash_token_list(toks)))
    assert bool(np.isin(ppos, bits).all()), "false negative"


def test_bloom_estimator_floor_agrees_with_duckdb_sweep():
    # est = floor((m/k) * ln(m/(m-x))): pin python floor == DuckDB floor
    # over a dense sweep of occupancies so a libm ulp difference can never
    # flip a floor at any realistic fill level
    import math

    from webgraph_ray.stages.sketch import BLOOM_K, BLOOM_M

    xs = list(range(1, BLOOM_M, 257)) + [BLOOM_M - 1]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT x, floor({BLOOM_M / BLOOM_K!r} * "
        f"ln(CAST({BLOOM_M} AS DOUBLE) / ({BLOOM_M} - x))) "
        f"FROM (SELECT unnest(?) AS x)",
        [xs],
    ).fetchall()
    for x, r in rows:
        py = math.floor(
            (BLOOM_M / BLOOM_K) * math.log(BLOOM_M / (BLOOM_M - x))
        )
        assert int(py) == int(r), x


def test_bloom_empty_corpus():
    from webgraph_ray.stages.sketch import bloom_seen

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                      "text": pd.Series(dtype="object")})
    )
    got = bloom_seen(ds)
    assert int(got["n_set_bits"].iloc[0]) == 0
    assert int(got["est_distinct"].iloc[0]) == 0
    assert int(got["fp_probes_hit"].iloc[0]) == 0


# ---------------------------------------------------------------------------
# capped-proportional mixing weights
# ---------------------------------------------------------------------------


def test_mixing_weights_matches_oracle():
    import duckdb

    from webgraph_ray.stages.sketch import mixing_weights, mixing_weights_sql

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "text": ["w"] * 100,
            "source": (["web"] * 70 + ["books"] * 20 + ["code"] * 9 + ["wiki"]),
        }
    )
    got = mixing_weights(ray.data.from_pandas(docs).repartition(7))
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(mixing_weights_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    # the capped head: web (70 > cap=2*100//4=50) is clipped, tail is not
    m = got.set_index("source")
    assert m.loc["web", "capped"] == 50
    assert m.loc["books", "capped"] == 20
    assert int(m["weight_fp"].sum()) <= 10**9


def test_mixing_weights_empty():
    from webgraph_ray.stages.sketch import mixing_weights

    docs = pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "text": pd.Series([], dtype=object),
         "source": pd.Series([], dtype=object)}
    )
    out = mixing_weights(ray.data.from_pandas(docs))
    assert len(out) == 0
    assert list(out.columns) == ["source", "n_docs", "capped", "weight_fp"]


# ---------------------------------------------------------------------------
# per-source total-variation drift
# ---------------------------------------------------------------------------


def test_source_drift_matches_oracle():
    import duckdb

    from webgraph_ray.stages.sketch import source_drift, source_drift_sql

    rng = np.random.default_rng(7)
    words_a = ["x", "y", "z", "common"]
    words_b = ["p", "q", "common"]
    rows = []
    for i in range(80):
        src = "a" if i % 3 else "b"
        words = words_a if src == "a" else words_b
        k = int(rng.integers(0, 7))
        rows.append((i, " ".join(rng.choice(words, size=k)), src))
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    got = source_drift(ray.data.from_pandas(docs).repartition(7))
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(source_drift_sql()).df().astype(
        {"n_tokens": np.int64, "tv_fp": np.int64}
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    # brute-force float cross-check
    from collections import Counter

    toks = {
        s: Counter(
            w for t in docs.loc[docs["source"] == s, "text"] for w in t.split()
        )
        for s in ("a", "b")
    }
    allc = toks["a"] + toks["b"]
    R = sum(allc.values())
    for s in ("a", "b"):
        ss = sum(toks[s].values())
        tv = 0.5 * sum(
            abs(toks[s][g] / ss - allc[g] / R) for g in allc
        )
        got_tv = int(got.set_index("source").loc[s, "tv_fp"]) / 1e9
        assert abs(got_tv - tv) < 2e-9


def test_source_drift_identical_distribution_is_zero():
    from webgraph_ray.stages.sketch import source_drift

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b", "a b", "a b", "a b"],
            "source": ["s1", "s1", "s2", "s2"],
        }
    )
    out = source_drift(ray.data.from_pandas(docs)).set_index("source")
    assert int(out.loc["s1", "tv_fp"]) == 0
    assert int(out.loc["s2", "tv_fp"]) == 0
