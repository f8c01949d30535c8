"""lm_scores: brute-force bigram-LM fixture + DuckDB parity + edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from webgraph_ray.stages.text import LM_SCALE, lm_scores, lm_scores_sql

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "zebra"),          # one token: no bigram -> absent from output
    (3, ""),               # empty -> absent
    (4, "on on on"),       # self-repetition
]


def _ds(docs):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )


def _brute(docs):
    uni, bi, occ = {}, {}, []
    for did, text in docs:
        toks = text.split()
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            g = f"{a} {b}"
            bi[g] = bi.get(g, 0) + 1
            occ.append((did, a, g))
    rows = {}
    for did, a, g in occ:
        fp = bi[g] * LM_SCALE // uni[a]
        rows.setdefault(did, []).append((fp, g))
    out = []
    for did in sorted(rows):
        scores = rows[did]
        n = len(scores)
        avg = sum(fp for fp, _ in scores) // n
        worst = min(scores)[1]
        out.append((did, n, worst, avg))
    return out


def test_brute_force_and_sql_parity():
    got = lm_scores(_ds(DOCS))
    exp = _brute(DOCS)
    assert list(map(tuple, got.to_numpy())) == exp
    # docs 2 and 3 have no bigram occurrences
    assert set(got["doc_id"]) == {0, 1, 4}
    # doc 4: 'on on' occurs twice, c('on on')=2, c('on')=4 (3 here + 1 in
    # doc 0) -> each occurrence fp = 2*LM_SCALE//4
    d4 = got[got["doc_id"] == 4].iloc[0]
    assert d4["n_bigrams"] == 2
    assert d4["lm_fp"] == 2 * LM_SCALE // 4
    assert d4["worst_bigram"] == "on on"

    con = duckdb.connect()
    con.register(
        "docs_fixture",
        pd.DataFrame({"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}),
    )
    sql = con.execute(lm_scores_sql("docs_fixture")).df()
    con.close()
    assert list(map(tuple, sql.to_numpy())) == exp


def test_worst_bigram_tiebreak():
    # 'p q' and 'p r' both score LM_SCALE//2 (c=1, c(p)=2) while 'q p'
    # scores LM_SCALE: the tie breaks by bigram text -> 'p q'
    docs = [(0, "p q p r")]
    got = lm_scores(_ds(docs)).iloc[0]
    assert got["worst_bigram"] == "p q"
    assert got["lm_fp"] == (2 * (LM_SCALE // 2) + LM_SCALE) // 3


def test_empty_corpus():
    got = lm_scores(_ds([(0, ""), (1, "x")]))
    assert got.empty


def test_vocab_topk():
    from webgraph_ray.stages.text import vocab_topk, vocab_topk_sql

    docs = [(0, "b a a c"), (1, "c b a"), (2, "")]
    got = vocab_topk(_ds(docs), k=2)
    # counts: a=3, b=2, c=2 -> top-2 = a(3), then b beats c by text
    assert list(got["token"]) == ["a", "b"]
    assert list(got["count"]) == [3, 2]
    assert list(got["rank"]) == [1, 2]

    con = duckdb.connect()
    con.register(
        "docs_fixture",
        pd.DataFrame({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}),
    )
    sql = con.execute(vocab_topk_sql(k=2, doc_table="docs_fixture")).df()
    con.close()
    assert list(sql["token"]) == ["a", "b"]
    assert list(sql["count"]) == [3, 2]

    assert vocab_topk(_ds([(0, "")]), k=5).empty


def test_join_path_matches_broadcast():
    """Forcing max_vocab=0 exercises the over-gate scale path (distributed
    count reduce + two gram-key bucketed joins + doc re-aggregation): it
    must be bit-identical to the broadcast path."""
    broadcast = lm_scores(_ds(DOCS))
    joined = lm_scores(_ds(DOCS), max_vocab=0)
    assert broadcast.equals(joined)


def test_vocab_distributed_path_matches():
    from webgraph_ray.stages.text import vocab_topk

    docs = [(0, "b a a c d d d"), (1, "c b a e"), (2, "f f")]
    a = vocab_topk(_ds(docs), k=3)
    b = vocab_topk(_ds(docs), k=3, max_vocab=0)
    assert a.equals(b)
