"""Stable 64-bit vertex-id hashing, vectorized.

Vertex keys are human-readable strings (``"{conv_id}#{turn_idx}"``,
``"tool:{name}"`` — FIXTURES.md §2); algorithms run on ``int64`` ids so the
shuffle keys are fixed-width and the per-partition state is numpy arrays.

We use pandas' C-implemented SipHash (``pd.util.hash_array``) with a pinned
key string so the mapping is deterministic across processes, sessions and
partition counts (tests pin known digests to catch library drift).

Scale note: 64-bit ids collide with non-trivial probability beyond ~10^9
distinct vertices (birthday bound). At the 10^12-turn design scale the id
would widen to 128 bits (two int64 columns) or use an explicit dictionary
build; ``collision_audit`` below is the cheap production check
(count-distinct keys vs count-distinct ids must match).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "webgraph-ray-v1\x00"  # 16 bytes, pinned forever


def hash_keys(keys) -> np.ndarray:
    """Vectorized: array-like of str -> int64 ids (deterministic).

    The 64 SipHash bits are reinterpreted as signed int64 (negative ids are
    fine — partitioning uses numpy's non-negative modulo).  int64 rather
    than uint64 because Ray Data's groupby/shuffle path round-trips key
    columns through pandas/python ints and overflows on uint64 values
    above 2^63."""
    arr = np.asarray(keys, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False).view(
        np.int64
    )


def hash_key(key: str) -> int:
    """Scalar convenience wrapper (tests, oracle)."""
    return int(hash_keys([key])[0])


def collision_audit(keys, ids=None) -> bool:
    """True iff no two distinct keys map to the same id (small-side check)."""
    arr = np.asarray(keys, dtype=object)
    if ids is None:
        ids = hash_keys(arr)
    df = pd.DataFrame({"k": arr, "i": ids}).drop_duplicates()
    return df["i"].nunique() == len(df)
