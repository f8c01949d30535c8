"""Text analysis + dedup families vs brute-force python oracles."""

import hashlib
import re

import numpy as np
import pandas as pd
import pytest
import ray.data

from webgraph_ray.stages import dedup, text


@pytest.fixture(scope="module")
def docs_ds(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pd(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def test_token_stats(docs_ds, docs_pd):
    got = text.token_stats(docs_ds).to_pandas().set_index("doc_id").sort_index()
    for _, row in docs_pd.head(50).iterrows():
        toks = re.findall(r"\S+", row["text"])
        assert got.loc[row["doc_id"], "n_tokens"] == len(toks)
        assert got.loc[row["doc_id"], "n_unique_tokens"] == len(set(toks))
        assert got.loc[row["doc_id"], "n_chars"] == len(row["text"])


def test_lang_id_runs(docs_ds):
    got = text.lang_id(docs_ds).to_pandas()
    assert set(got.columns) == {"doc_id", "pred_lang"}
    assert got["pred_lang"].isin(["en", "es", "fr", "de", "unknown"]).all()


def test_fingerprint_deterministic(docs_ds):
    key = ["doc_id", "fingerprint"]
    a = text.fingerprints(docs_ds).to_pandas().sort_values(key)
    b = text.fingerprints(docs_ds).to_pandas().sort_values(key)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_fingerprint_vs_naive_winnowing():
    """Vectorized gram-hash + winnow vs a transparent per-char oracle."""
    from webgraph_ray.functions import texthash as th

    text_s = "the quick brown fox jumps over the lazy dog"
    k, w, M = th.K_GRAM, th.WINNOW_W, th.M
    cps = [ord(c) for c in text_s]
    grams = []
    for i in range(len(cps) - k + 1):
        h = sum((cps[i + j] * int(th.POWERS[k - 1 - j])) % M for j in range(k)) % M
        grams.append(h)
    np.testing.assert_array_equal(th.gram_hashes(text_s), grams)
    naive = set()
    for p in range(min(w, len(grams)) - 1, len(grams)):
        naive.add(min(grams[max(0, p - w + 1) : p + 1]))
    assert set(th.fingerprint_set(text_s).tolist()) == naive
    # order sensitivity: permuted text fingerprints differ
    assert set(th.fingerprint_set("abcdefgh ijklmnop").tolist()) != set(
        th.fingerprint_set("ijklmnop abcdefgh").tolist()
    )


# ---------------------------------------------------------------------------
# dedup with planted duplicates
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted():
    """120 random docs + planted exact and near duplicates."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(30, 80)))
        for _ in range(120)
    ]
    # exact dups: 3 copies of doc 0, 2 of doc 1
    texts += [texts[0], texts[0], texts[1]]
    # near dups: doc 2 with small edits (drop last 3 tokens / swap 2)
    t2 = texts[2].split()
    texts.append(" ".join(t2[:-3]))
    texts.append(" ".join(t2[:10] + ["zzz"] + t2[11:]))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    return df


def test_exact_dedup(planted):
    ds = ray.data.from_pandas(planted)
    got = dedup.exact_dedup(ds).to_pandas()
    md5 = planted["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    exp = (
        planted.assign(text_md5=md5)
        .groupby("text_md5")["doc_id"]
        .agg(["min", "count"])
    )
    assert len(got) == len(exp)
    g = got.set_index("text_md5")
    for h, row in exp.iterrows():
        assert g.loc[h, "canonical_doc_id"] == row["min"]
        assert g.loc[h, "dup_count"] == row["count"]
    # the planted dups collapse
    assert (got["dup_count"] >= 3).sum() == 1
    assert (got["dup_count"] == 2).sum() == 1


def brute_jaccard_pairs(df, threshold):
    """All-pairs exact Jaccard over the SAME shingle universe the pipeline
    uses (char-k-gram hashes) — tests LSH recall/precision exhaustively."""
    from webgraph_ray.functions import texthash as th

    num, den = th.threshold_ratio(threshold)
    sets = {r.doc_id: th.shingle_set(r.text) for r in df.itertuples()}
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if len(sets[a]) == 0 or len(sets[b]) == 0:
                continue
            inter = len(np.intersect1d(sets[a], sets[b], assume_unique=True))
            uni = len(sets[a]) + len(sets[b]) - inter
            if inter * den >= num * uni:
                out.append((a, b))
    return set(out)


def test_minhash_lsh_finds_planted_near_dups(planted):
    ds = ray.data.from_pandas(planted)
    got = dedup.minhash_lsh_dedup(ds, threshold=0.7).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    exp_pairs = brute_jaccard_pairs(planted, 0.7)
    # verification makes precision exact; banding (8 bands of 4) puts
    # recall at J>=0.9 above 0.9999 — with the fixed seed this specific
    # fixture is fully recovered
    assert exp_pairs == got_pairs
    assert len(exp_pairs) >= 3  # exact copies + near dups found


def test_minhash_big_cluster_recovers_all_pairs():
    """A duplicate cluster far larger than max_bucket: the chunk-grid pair
    generation must emit every pair (round 1 truncated to the first 200)."""
    n_cluster = 300
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=50)) for _ in range(20)]
    dup = " ".join(rng.choice(vocab, size=60))
    texts += [dup] * n_cluster
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    ds = ray.data.from_pandas(df)
    got = dedup.minhash_lsh_dedup(ds, threshold=0.9, max_bucket=64).to_pandas()
    cluster_ids = set(range(20, 20 + n_cluster))
    cluster_pairs = {
        (a, b)
        for a, b in zip(got["doc_a"], got["doc_b"])
        if a in cluster_ids and b in cluster_ids
    }
    assert len(cluster_pairs) == n_cluster * (n_cluster - 1) // 2


def test_simhash_pairs(planted):
    ds = ray.data.from_pandas(planted)
    sh = dedup.simhash(ds).to_pandas()
    # independent scalar check on a few docs
    for r in planted.head(5).itertuples():
        assert (
            sh.set_index("doc_id").loc[r.doc_id, "simhash"]
            == dedup.simhash_value(r.text)
        )
    assert (sh["simhash"] < (1 << 31)).all() and (sh["simhash"] >= 0).all()
    pairs = dedup.simhash_dup_pairs(ds, max_hamming=3).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # brute-force oracle
    h = {r.doc_id: dedup.simhash_value(r.text) for r in planted.itertuples()}
    exp = set()
    ids = sorted(h)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            x = int(h[a]) ^ int(h[b])
            if bin(x).count("1") <= 3:
                exp.add((a, b))
    assert got == exp
    # exact copies have identical simhash -> hamming 0 pairs present
    assert any(pairs["hamming"] == 0)


def test_jaccard_dup_pairs_exact(planted):
    """Vectorized inverted-index broadcast path vs the all-pairs oracle."""
    ds = ray.data.from_pandas(planted)
    got = dedup.jaccard_dup_pairs(ds, threshold=0.5).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert got_pairs == brute_jaccard_pairs(planted, 0.5)
    assert len(got_pairs) >= 3


def test_jaccard_gate_raises_above_threshold(planted):
    """The exact all-pairs contract is size-gated: above the gate it must
    fail loudly unless the caller opts into the approximate fallback
    (round-2 ADVICE: no silent exact->approx swap)."""
    ds = ray.data.from_pandas(planted)
    with pytest.raises(ValueError, match="exact all-pairs"):
        dedup.jaccard_dup_pairs(ds, threshold=0.7, broadcast_threshold=10)
    got = dedup.jaccard_dup_pairs(
        ds, threshold=0.7, broadcast_threshold=10, approx_fallback=True
    ).to_pandas()
    # fallback is the minhash path: exact-verified, recall < 1 in general
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert got_pairs <= brute_jaccard_pairs(planted, 0.7)


def brute_repetition(texts):
    """Python reference for the Gopher repetition signals."""
    out = []
    for t in texts:
        toks = re.findall(r"\S+", t)
        bgs = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
        tgs = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
        if bgs:
            from collections import Counter

            top = Counter(bgs).most_common(1)[0][1]
            top_pct = 100 * top // len(bgs)
        else:
            top_pct = 0
        if tgs:
            dup_pct = 100 * (len(tgs) - len(set(tgs))) // len(tgs)
        else:
            dup_pct = 0
        out.append((top_pct, dup_pct))
    return out


def test_repetition_scores_vs_bruteforce():
    texts = [
        "a b a b a",            # top bigram 2/4=50, tri dup (3-2)/3=33
        "x",                    # no bigrams/trigrams
        "",                     # empty
        "w w w w w w",          # single repeated token: 100 / dup high
        "p q",                  # one bigram, no trigram
        "the cat sat on the cat sat again",
        "  leading  and   trailing   spaces  ",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        text.repetition_scores(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = brute_repetition(texts)
    assert list(zip(got["top_bigram_pct"], got["dup_trigram_pct"])) == exp
    # pin the hand-computed examples
    assert (got.loc[0, "top_bigram_pct"], got.loc[0, "dup_trigram_pct"]) == (50, 33)
    # 6x'w': 5 identical bigrams -> 100; 4 trigrams 1 distinct -> 75
    assert (got.loc[3, "top_bigram_pct"], got.loc[3, "dup_trigram_pct"]) == (100, 75)


def test_repetition_batch_boundary_independent():
    """Per-doc signals must not depend on how docs fall into batches."""
    rng = np.random.default_rng(7)
    vocab = np.array(["aa", "bb", "cc", "dd"])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        for _ in range(40)
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    one = (
        text.repetition_scores(ray.data.from_pandas(df).repartition(1))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    many = (
        text.repetition_scores(ray.data.from_pandas(df).repartition(13))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    assert list(zip(one["top_bigram_pct"], one["dup_trigram_pct"])) == brute_repetition(texts)


def test_decontaminate_vs_duckdb_oracle():
    """Package-boundary mirror of the gate protocol for the decontam op."""
    import duckdb
    import sys, os
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.queries()["decontam"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = con.execute(entry.oracle_sql()["decontam"]).df()

    def norm(df):
        df = df[sorted(df.columns)].astype("int64")
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(norm(got), norm(exp), check_dtype=False)
    # the synthetic documents table plants duplicates, so contamination
    # must actually fire (guards against a trivially-all-zero pass)
    assert got["contaminated"].sum() > 0
    assert (got["doc_id"] % 20 != 0).all()


def test_decontaminate_broadcast_gate():
    df = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [f"tok{i} a b c d e f g h {i}" for i in range(40)],
        }
    )
    with pytest.raises(ValueError, match="broadcast_limit"):
        dedup.decontaminate(
            ray.data.from_pandas(df), broadcast_limit=2
        ).materialize()


def test_quality_filter_vs_duckdb_oracle():
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry.queries()["quality_filter"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = con.execute(entry.oracle_sql()["quality_filter"]).df()

    def norm(df):
        df = df[sorted(df.columns)].copy()
        df["doc_id"] = df["doc_id"].astype("int64")
        df["keep"] = df["keep"].astype("int64")
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(norm(got), norm(exp), check_dtype=False)
    # both branches of the decision must be exercised, with real reasons
    assert 0 < got["keep"].sum() < len(got)
    assert set(got.loc[got["keep"] == 0, "reject_reason"]) <= set(
        text.QF_REASONS
    )
    assert (got.loc[got["keep"] == 1, "reject_reason"] == "").all()


def test_quality_filter_first_match_order():
    """A doc failing several rules must report the FIRST matching reason."""
    texts = [
        "x y",                              # too_short (also low_stopword)
        " ".join(["a b"] * 30),             # repetitive (stopword-rich)
        " ".join(f"w{i}" for i in range(30)),  # low_stopword
        "the a of and to " * 4,             # repetitive fires before low_stop? no: stop-rich, bigram-heavy -> repetitive
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        text.quality_filter(ray.data.from_pandas(df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.loc[0, "reject_reason"] == "too_short"
    assert got.loc[1, "reject_reason"] == "repetitive"
    assert got.loc[2, "reject_reason"] == "low_stopword"
    assert got.loc[3, "reject_reason"] == "repetitive"


def test_dup_clusters_transitive_and_singletons():
    """A~B and B~C must land in ONE cluster labeled min(doc_id) even when
    A and C are not a direct pair; untouched docs map to themselves."""
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    base = [" ".join(rng.choice(vocab, size=60)) for _ in range(30)]
    toks = base[5].split()
    chain_b = " ".join(toks[:-4])        # near dup of 5
    chain_c = " ".join(toks[:-8])        # near dup of B, farther from A
    texts = base + [chain_b, chain_c] + [base[9], base[9]]  # exact dups of 9
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = (
        dedup.dup_clusters(ray.data.from_pandas(df), threshold=0.6)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert len(got) == len(texts)
    # the chain collapses to min id 5
    assert got.loc[30, "cluster_id"] == 5 and got.loc[5, "cluster_id"] == 5
    assert got.loc[31, "cluster_id"] == 5
    # exact dups of 9
    assert got.loc[32, "cluster_id"] == 9 and got.loc[33, "cluster_id"] == 9
    # a random untouched doc is a singleton
    assert got.loc[0, "cluster_id"] == 0
    # cluster ids are always the min member
    for d, r in got.iterrows():
        assert r["cluster_id"] <= d


def test_dup_clusters_no_pairs():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [f"totally unique document number {i} " + "x" * i for i in range(5)],
        }
    )
    got = (
        dedup.dup_clusters(ray.data.from_pandas(df), threshold=0.99)
        .to_pandas().sort_values("doc_id")
    )
    assert list(got["cluster_id"]) == list(got["doc_id"])


def test_containment_catches_quote():
    """A short doc fully quoted inside a long one: containment = 1 while
    symmetric Jaccard is far below threshold — the one-sided criterion
    must find the pair, the symmetric one must not."""
    import duckdb

    from webgraph_ray.functions.texthash import containment_pairs_sql

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i:04d} paragraph body" for i in range(40))
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [quote, filler + " " + quote, "zzz " * 30]}
    )
    ds = ray.data.from_pandas(df)
    ct = dedup.jaccard_dup_pairs(ds, threshold=0.9, mode="containment").to_pandas()
    assert set(zip(ct["doc_a"], ct["doc_b"])) == {(1, 2)}
    jc = dedup.jaccard_dup_pairs(ds, threshold=0.9).to_pandas()
    assert len(jc) == 0
    # DuckDB mirror parity
    con = duckdb.connect()
    con.register("docs_fixture", df)
    sql = con.execute(containment_pairs_sql(0.9, doc_table="docs_fixture")).df()
    con.close()
    assert set(zip(sql["doc_a"], sql["doc_b"])) == {(1, 2)}


def test_containment_bucketed_path_matches_broadcast(planted):
    """Above the gate containment takes the EXACT bucketed inverted-index
    path (never the MinHash fallback — LSH approximates resemblance, not
    containment): pairs must equal the broadcast path's exactly."""
    ds = ray.data.from_pandas(planted)
    broad = dedup.jaccard_dup_pairs(ds, threshold=0.5, mode="containment")
    bp = set(zip(*[broad.to_pandas()[c] for c in ("doc_a", "doc_b")]))
    bucketed = dedup.jaccard_dup_pairs(
        ds,
        threshold=0.5,
        mode="containment",
        broadcast_threshold=1,
        approx_fallback=True,  # must be ignored in containment mode
    )
    kp = set(zip(*[bucketed.to_pandas()[c] for c in ("doc_a", "doc_b")]))
    assert kp == bp and len(bp) >= 1


def test_containment_hot_shingle_gate():
    """A shingle shared by more docs than max_shingle_docs fails loudly on
    the bucketed path (quadratic pair volume)."""
    common = "exactsharedboilerplateprefix"
    df = pd.DataFrame(
        {"doc_id": range(8), "text": [common + str(i) for i in range(8)]}
    )
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="max_shingle_docs"):
        dedup._containment_pairs_bucketed(
            ds, threshold=0.5, max_shingle_docs=3
        ).to_pandas()
