"""Hypothesis property tests for the round-4 exact kernels: the
vectorized implementations must agree with transparent pure-python
references on arbitrary inputs (not just the curated fixtures)."""

import re
from collections import Counter

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# token alphabet exercises repeats, unicode, and 1-char tokens
_token = st.text(
    alphabet=st.sampled_from(list("ab€x")), min_size=1, max_size=3
)
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)


def _brute_repetition(texts):
    out = []
    for t in texts:
        toks = re.findall(r"\S+", t)
        bgs = list(zip(toks, toks[1:]))
        tgs = list(zip(toks, toks[1:], toks[2:]))
        top = (
            100 * Counter(bgs).most_common(1)[0][1] // len(bgs) if bgs else 0
        )
        dup = 100 * (len(tgs) - len(set(tgs))) // len(tgs) if tgs else 0
        out.append((top, dup))
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_repetition_kernel_matches_brute(texts):
    import pyarrow as pa
    import pyarrow.compute as pc

    from webgraph_ray.stages.text import (
        _explode_ws_tokens,
        _repetition_from_codes,
    )

    doc_idx, tokens = _explode_ws_tokens(pa.array(texts, pa.string()))
    if len(tokens):
        enc = pc.dictionary_encode(tokens)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        codes = np.empty(0, np.int64)
    top, dup = _repetition_from_codes(doc_idx, codes, len(texts))
    assert list(zip(top, dup)) == _brute_repetition(texts)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(_doc, min_size=1, max_size=8),
    st.integers(min_value=1, max_value=4),
)
def test_shingle_kernel_matches_brute(texts, n):
    import pyarrow as pa

    from webgraph_ray.stages.dedup import _shingle_strings

    doc_idx, sh = _shingle_strings(pa.array(texts, pa.string()), n)
    got = sorted(zip(doc_idx.tolist(), sh.to_pylist()))
    exp = []
    for i, t in enumerate(texts):
        toks = re.findall(r"\S+", t)
        for j in range(len(toks) - n + 1):
            exp.append((i, "\t".join(toks[j : j + n])))
    assert got == sorted(exp)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=4),
)
def test_frame_sampler_matches_brute(bodies, frame_len, every):
    import pyarrow as pa

    from webgraph_ray.stages.media import VIDEO_MAGIC, FrameSampler

    payloads, exp = [], []
    for i, body in enumerate(bodies):
        n_frames = (len(body) + frame_len - 1) // frame_len
        pad = (-len(body)) % frame_len
        payloads.append(
            VIDEO_MAGIC
            + n_frames.to_bytes(4, "big")
            + frame_len.to_bytes(4, "big")
            + body
            + b"\x00" * pad
        )
        padded = body + b"\x00" * pad
        for f in range(0, n_frames, every):
            exp.append((i, f, padded[f * frame_len : (f + 1) * frame_len]))
    t = pa.table(
        {
            "doc_id": pa.array(range(len(bodies)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = FrameSampler(every=every)(t).to_pandas()
    got = sorted(
        zip(out["doc_id"], out["frame_idx"], (bytes(b) for b in out["frame"]))
    )
    assert got == sorted(exp)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0.01, 9999.99, allow_nan=False),
            st.floats(0.0, 0.5, allow_nan=False),
        ),
        min_size=0,
        max_size=20,
    )
)
def test_revenue_cents_matches_duckdb_expression(rows):
    """The Ray side's floor(x*(1-d)*100+0.5) must equal DuckDB's identical
    expression bit-for-bit on arbitrary float inputs."""
    import duckdb

    price = np.array([p for p, _ in rows], np.float64)
    disc = np.array([d for _, d in rows], np.float64)
    ray_cents = np.floor(price * (1 - disc) * 100 + 0.5).astype(np.int64)
    con = duckdb.connect()
    df = pd.DataFrame({"p": price, "d": disc})
    con.register("t", df)
    sql = con.execute(
        "SELECT CAST(floor(p * (1 - d) * 100 + 0.5) AS BIGINT) FROM t"
    ).df()
    assert list(ray_cents) == list(sql.iloc[:, 0])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(_doc, min_size=0, max_size=8),
    st.integers(min_value=2, max_value=4),
)
def test_wgram_kernel_matches_brute(texts, w):
    from webgraph_ray.stages.dedup import wgram_table

    import pyarrow as pa

    tbl = wgram_table(
        pa.array(texts, pa.string()),
        np.arange(len(texts), dtype=np.int64),
        w,
    )
    got = set(zip(
        tbl["gram"].to_pylist(), tbl["doc_id"].to_pylist()
    ))
    want = set()
    for i, t in enumerate(texts):
        toks = re.findall(r"\S+", t)
        for j in range(len(toks) - w + 1):
            want.add((" ".join(toks[j : j + w]), i))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=0, max_size=8))
def test_hll_register_kernel_matches_brute(texts):
    from webgraph_ray.stages.sketch import (
        HLL_M,
        HLL_WBITS,
        _hll_registers,
        _token_hashes,
    )

    got = _hll_registers(pd.Series(texts, dtype="object"))
    want = np.zeros(HLL_M, dtype=np.int64)
    for h in _token_hashes(pd.Series(texts, dtype="object")):
        j, w = int(h) >> HLL_WBITS, int(h) & ((1 << HLL_WBITS) - 1)
        rho = (HLL_WBITS + 1) - w.bit_length()
        want[j] = max(want[j], rho)
    assert (got == want).all()


# ---------------------------------------------------------------------------
# round-5 kernels: ANF register init, LBQ bucketing, BM25 score shape
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, (1 << 31) - 2), min_size=1, max_size=50))
def test_anf_register_init_matches_pure_python(ths):
    from webgraph_ray.functions.texthash import M
    from webgraph_ray.graph.anf import (
        ANF_M,
        ANF_RMAX,
        ANF_WBITS,
        ANF_WMOD,
        _registers_from_th,
    )
    from webgraph_ray.stages.sketch import KMV_C1, KMV_C2, KMV_C3

    j, rho = _registers_from_th(np.array(ths, dtype=np.int64))
    for i, th in enumerate(ths):
        u = (((th * th) % M) * KMV_C1 % M + (th * KMV_C2) % M + KMV_C3) % M
        w = u & (ANF_WMOD - 1)
        exp_rho = ANF_RMAX if w == 0 else ANF_RMAX - w.bit_length()
        assert int(j[i]) == u >> ANF_WBITS
        assert 0 <= int(j[i]) < ANF_M
        assert int(rho[i]) == exp_rho
        assert 1 <= int(rho[i]) <= ANF_RMAX


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-(10**12), 10**12), min_size=1, max_size=60))
def test_lbq_bucket_is_bit_length_and_brackets(cents):
    # drive the REPO kernel (not a local re-derivation): bucket ==
    # bit_length for positive cents, and the bucket lower bound 2^(b-1)
    # brackets the value within a 2x range
    from webgraph_ray.stages.sketch import lbq_bucket

    b = lbq_bucket(np.array(cents, dtype=np.int64))
    for ci, bi in zip(cents, b):
        if ci > 0:
            assert int(bi) == int(ci).bit_length()
            assert (1 << (bi - 1)) <= ci < (1 << bi)
        elif ci == 0:
            assert bi == 0
        else:
            assert bi == -1


@settings(max_examples=100, deadline=None)
@given(
    st.integers(1, 10**6),  # total tokens TT
    st.integers(1, 10**3),  # n docs
    st.integers(1, 100),  # dl
    st.integers(1, 50),  # tf
    st.integers(1, 10**3),  # df
)
def test_bm25_integer_score_shape(tt, n, dl, tf, df):
    # drive the REPO kernels (bm25_idf / bm25_tf_part), not local copies
    from webgraph_ray.stages.text import (
        BM25_TP_SCALE,
        bm25_idf,
        bm25_tf_part,
    )

    df = min(df, n)

    def idf(dfv):
        return int(bm25_idf(n, dfv))

    def tp(tfv, dlv):
        return int(bm25_tf_part(tt, n, dlv, tfv))

    # BM25 shape: tf saturation (non-decreasing in tf), length
    # normalization (non-increasing in dl), idf non-increasing in df
    assert tp(tf + 1, dl) >= tp(tf, dl)
    assert tp(tf, dl + 1) <= tp(tf, dl)
    if df + 1 <= n:
        assert idf(df + 1) <= idf(df)
    # score bounded: tf_part < (k1+1) * TP_SCALE = 2.2 * TP_SCALE
    assert 0 <= tp(tf, dl) <= (22 * BM25_TP_SCALE) // 10 + 1
    assert idf(df) >= 0
