"""Exact-arithmetic text-hash primitives shared by the fingerprint /
MinHash / SimHash stages AND their DuckDB oracles.

Everything here is defined over int64 values < 2^31 (modulus M = 2^31-1,
a Mersenne prime), with per-term mod before every sum, so that:

- the numpy path is fully vectorized (no per-byte Python — the fix for the
  round-1 ``rolling_fingerprint`` scale-killer), and
- the identical computation is expressible in DuckDB BIGINT arithmetic
  (``unicode(substr(..))`` char codepoints, ``list_transform`` lambdas),
  giving every hash-family query an exact driver-side oracle.

Definitions (mirrored verbatim by the SQL generators at the bottom):

- char-gram hash at position i (k chars):
    h_i = ( sum_j (cp[i+j] * B^(k-1-j) mod M) ) mod M
- token hash (first ``cap`` chars, length L = min(len, cap)):
    h(t) = ( sum_{j<L} (cp[j] * B^(L-1-j) mod M) ) mod M
- winnowed fingerprints: distinct minima of trailing-w windows over the
  gram-hash sequence (standard winnowing, value-deduped so tie-breaking
  position conventions cannot diverge)
- minhash signature p over the distinct-gram set G:
    sig_p = min_{g in G} (a_p*g + b_p) mod M      (a_p,b_p < M => products < 2^62)
- simhash (31 bits): bit j set iff strictly more than half of the token
  hashes have bit j set (ties -> 0), duplicates counted with multiplicity.

The reference's per-URL md5/sha1 cookie-value encodings
(/root/reference/code/features/utils.py:208-392) are the closest analog of
this hash-primitives family.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

M = (1 << 31) - 1
BASE = 1_000_003 % M
_MAX_POW = 4096
POWERS = np.empty(_MAX_POW, dtype=np.int64)
POWERS[0] = 1
for _i in range(1, _MAX_POW):
    POWERS[_i] = (POWERS[_i - 1] * BASE) % M

K_GRAM = 8          # char-gram width (fingerprints + minhash shingles)
WINNOW_W = 4        # winnowing window (in grams)
TOKEN_CAP = 16      # token hashing uses the first 16 chars
SIMHASH_BITS = 31

# MinHash / LSH defaults
NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS
_PERM_SEED = 7
_BAND_C = 0x9E3779B1 % M


def perm_params(num_perm: int = NUM_PERM, seed: int = _PERM_SEED):
    """Deterministic (a_p, b_p) < M for the minhash permutations; embedded
    as literals into the SQL oracle so both sides share them."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, M, size=num_perm).astype(np.int64)
    b = rng.integers(0, M, size=num_perm).astype(np.int64)
    return a, b


def band_combine_consts(rows: int = ROWS_PER_BAND) -> np.ndarray:
    return np.array([pow(_BAND_C, j, M) for j in range(rows)], dtype=np.int64)


def threshold_ratio(threshold: float) -> tuple[int, int]:
    """Jaccard threshold as an exact small rational (num, den): the compare
    ``inter * den >= num * union`` is then identical int64 arithmetic on
    both sides (no float compare in the gate)."""
    f = Fraction(threshold).limit_denominator(10**6)
    return f.numerator, f.denominator


# ---------------------------------------------------------------------------
# numpy implementations (vectorized)
# ---------------------------------------------------------------------------


def codepoints(text: str) -> np.ndarray:
    """Unicode codepoints as int64 (one C-level encode, no per-char loop)."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def gram_hashes(text: str, k: int = K_GRAM) -> np.ndarray:
    """Rolling char-k-gram hashes (length max(0, len-k+1)), vectorized.

    Arithmetic note: the definition (mirrored in SQL) mods each term, but
    c*B^e < 2^52 and a k-term sum < 2^56 fit int64 exactly, so one final
    ``% M`` yields the identical residue with k fewer integer divisions
    per char.  Chunked so the (chunk, k) temporary stays ~16 MB no matter
    the document size."""
    cp = codepoints(text)
    n = len(cp)
    if n < k:
        return np.empty(0, dtype=np.int64)
    pk = POWERS[k - 1 :: -1]  # exponent k-1-j at offset j
    # shifted multiply-accumulate over contiguous slices: ~4-8x faster than
    # a (n, k) sliding-window product (no strided temporary, cache-linear)
    m = n - k + 1
    acc = cp[:m] * pk[0]
    for j in range(1, k):
        acc += cp[j : m + j] * pk[j]
    return acc % M


def winnow(h: np.ndarray, w: int = WINNOW_W) -> np.ndarray:
    """Distinct trailing-window minima (sorted)."""
    import pandas as pd

    if len(h) == 0:
        return np.empty(0, dtype=np.int64)
    if len(h) < w:
        return np.unique(h.min(keepdims=True))
    m = len(h) - w + 1
    acc = h[:m].copy()
    for j in range(1, w):
        np.minimum(acc, h[j : m + j], out=acc)
    # hash-distinct first (window minima repeat heavily), sort the survivors
    return np.sort(pd.unique(acc))


def fingerprint_set(text: str, k: int = K_GRAM, w: int = WINNOW_W) -> np.ndarray:
    return winnow(gram_hashes(text, k), w)


def shingle_set(text: str, k: int = K_GRAM) -> np.ndarray:
    """Sorted distinct char-k-gram hashes (the minhash/Jaccard universe)."""
    return np.unique(gram_hashes(text, k))


def hash_token_list(tokens: list[str], cap: int = TOKEN_CAP) -> np.ndarray:
    """Vectorized hash of many variable-length tokens: one joined encode,
    exponents aligned per token via reduceat segments."""
    if not tokens:
        return np.empty(0, dtype=np.int64)
    capped = [t[:cap] for t in tokens]
    lens = np.fromiter((len(t) for t in capped), dtype=np.int64, count=len(capped))
    cp = codepoints("".join(capped))
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    tok_of = np.repeat(np.arange(len(lens)), lens)
    local = np.arange(len(cp), dtype=np.int64) - starts[tok_of]
    exp = (lens[tok_of] - 1) - local
    # products < 2^52, <=cap-term segments sum < 2^56: exact in int64, so
    # the per-term mod of the shared definition is deferred to the end
    terms = cp * POWERS[exp]
    # \S+ tokens are never empty, so every reduceat segment is non-trivial
    sums = np.add.reduceat(terms, starts)
    return sums % M


def simhash_value(tokens: list[str]) -> int:
    """31-bit simhash over token hashes (duplicates weighted)."""
    h = hash_token_list(tokens)
    n = len(h)
    if n == 0:
        return 0
    bits = (h[:, None] >> np.arange(SIMHASH_BITS, dtype=np.int64)[None, :]) & 1
    ones = bits.sum(axis=0)
    set_bits = ((2 * ones) > n).astype(np.int64)
    return int((set_bits << np.arange(SIMHASH_BITS)).sum())


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) signature; empty set -> all-M sentinel (never banded)."""
    if len(shingles) == 0:
        return np.full(len(a), M, dtype=np.int64)
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % M
    return vals.min(axis=1)


def band_values(sig: np.ndarray, bands: int = BANDS) -> np.ndarray:
    """Combine each band's rows into one value < M (per-term mod, exact)."""
    rows = len(sig) // bands
    c = band_combine_consts(rows)
    v = sig.reshape(bands, rows)
    return ((v * c[None, :]) % M).sum(axis=1) % M


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount (numpy 1.x has no bitwise_count)."""
    b = x.astype(np.int64).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(b, axis=1).sum(axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# DuckDB SQL generators (exact mirrors of the above)
# ---------------------------------------------------------------------------


def sql_gram_hash_expr(text_col: str, pos_var: str, k: int = K_GRAM) -> str:
    """Gram hash at 1-based char position ``pos_var`` of ``text_col``."""
    terms = " + ".join(
        f"(CAST(unicode(substr({text_col}, {pos_var}+{j}, 1)) AS BIGINT)"
        f" * {int(POWERS[k - 1 - j])}) % {M}"
        for j in range(k)
    )
    return f"(({terms}) % {M})"


def sql_grams_list(text_col: str, k: int = K_GRAM) -> str:
    """List of all gram hashes of ``text_col`` (empty when len < k)."""
    return (
        f"list_transform(generate_series(1, length({text_col}) - {k - 1}), "
        f"i -> {sql_gram_hash_expr(text_col, 'i', k)})"
    )


def sql_token_hash_expr(tok_var: str, cap: int = TOKEN_CAP) -> str:
    """Token hash with the first-``cap``-chars truncation; power index is
    L-1-j with L = least(length, cap) (1-based SQL list indexing)."""
    plist = "[" + ", ".join(str(int(POWERS[e])) for e in range(cap)) + "]"
    terms = " + ".join(
        f"(CASE WHEN length({tok_var}) >= {j + 1} THEN "
        f"(CAST(unicode(substr({tok_var}, {j + 1}, 1)) AS BIGINT) * "
        f"({plist})[least(length({tok_var}), {cap}) - {j}]) % {M} ELSE 0 END)"
        for j in range(cap)
    )
    return f"(({terms}) % {M})"


def fingerprints_sql(doc_table: str = "documents", k: int = K_GRAM, w: int = WINNOW_W) -> str:
    return f"""
WITH fp_g AS MATERIALIZED (
    SELECT doc_id,
           unnest({sql_grams_list('text', k)}) AS h,
           unnest(generate_series(1, length(text) - {k - 1})) AS pos
    FROM {doc_table} WHERE length(text) >= {k}
), fp_w AS (
    SELECT doc_id, pos,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS mn,
           count(*) OVER (PARTITION BY doc_id) AS m
    FROM fp_g
)
SELECT DISTINCT doc_id, CAST(mn AS BIGINT) AS fingerprint
FROM fp_w WHERE pos >= least({w}, m)"""


def simhash_sql(doc_table: str = "documents") -> str:
    tok_hash = sql_token_hash_expr("t")
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h // {1 << j}) % 2 = 1)) "
        f"> len(hs) THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH sh_t AS MATERIALIZED (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '\\S+'), t -> {tok_hash}) AS hs
    FROM {doc_table}
)
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM sh_t"""


def jaccard_pairs_sql(
    threshold: float, doc_table: str = "documents", k: int = K_GRAM
) -> str:
    """Exact all-pairs char-gram Jaccard oracle (mirrors
    stages/dedup.py:jaccard_dup_pairs below its broadcast gate)."""
    num, den = threshold_ratio(threshold)
    return f"""
WITH jp_g AS MATERIALIZED (
    SELECT doc_id, list_distinct({sql_grams_list('text', k)}) AS g
    FROM {doc_table} WHERE length(text) >= {k}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM jp_g a JOIN jp_g b ON a.doc_id < b.doc_id
 AND least(len(a.g), len(b.g)) * {den} >= {num} * greatest(len(a.g), len(b.g))
WHERE len(list_intersect(a.g, b.g)) * {den}
      >= {num} * (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))"""


def containment_pairs_sql(
    threshold: float, doc_table: str = "documents", k: int = K_GRAM
) -> str:
    """Exact all-pairs char-gram CONTAINMENT oracle (mirrors
    stages/dedup.py:jaccard_dup_pairs mode='containment'): keep (a, b)
    when |A∩B| / min(|A|, |B|) clears the threshold — no size prune, a
    tiny doc fully inside a huge one must qualify."""
    num, den = threshold_ratio(threshold)
    return f"""
WITH cp_g AS MATERIALIZED (
    SELECT doc_id, list_distinct({sql_grams_list('text', k)}) AS g
    FROM {doc_table} WHERE length(text) >= {k}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM cp_g a JOIN cp_g b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.g, b.g)) * {den}
      >= {num} * least(len(a.g), len(b.g))"""


def minhash_pairs_sql(
    threshold: float,
    doc_table: str = "documents",
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    k: int = K_GRAM,
) -> str:
    a, b = perm_params(num_perm)
    rows = num_perm // bands
    c = band_combine_consts(rows)
    num, den = threshold_ratio(threshold)
    sig_cols = ",\n           ".join(
        f"list_aggregate(list_transform(g, x -> (x*{int(a[p])} + {int(b[p])}) % {M}),"
        f" 'min') AS s{p}"
        for p in range(num_perm)
    )
    band_selects = "\n    UNION ALL\n".join(
        "    SELECT doc_id, {bid} AS band_id, ({expr}) % {m} AS bh FROM mh_sigs".format(
            bid=bi,
            m=M,
            expr=" + ".join(
                f"(s{bi * rows + j} * {int(c[j])}) % {M}" for j in range(rows)
            ),
        )
        for bi in range(bands)
    )
    return f"""
WITH mh_g AS MATERIALIZED (
    SELECT doc_id, list_distinct({sql_grams_list('text', k)}) AS g
    FROM {doc_table} WHERE length(text) >= {k}
), mh_sigs AS MATERIALIZED (
    SELECT doc_id, g,
           {sig_cols}
    FROM mh_g
), mh_bands AS MATERIALIZED (
{band_selects}
), mh_cand AS MATERIALIZED (
    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
    FROM mh_bands l JOIN mh_bands r
      ON l.band_id = r.band_id AND l.bh = r.bh AND l.doc_id < r.doc_id
), mh_ver AS (
    SELECT c.doc_a, c.doc_b,
           len(list_intersect(x.g, y.g)) AS inter,
           len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)) AS uni
    FROM mh_cand c
    JOIN mh_g x ON x.doc_id = c.doc_a
    JOIN mh_g y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b FROM mh_ver WHERE inter * {den} >= {num} * uni"""
