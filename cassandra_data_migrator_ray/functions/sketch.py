"""Mergeable cardinality sketches (HyperLogLog) for distributed
approximate-distinct counts.

An HLL partial is a tiny fixed-size register array (2**p bytes — 16 KiB at
the default p=14, relative error ≈ 1.04/sqrt(2**p) ≈ 0.8%); per-batch
partials are merged with an element-wise ``np.maximum``, so the shuffle/
driver traffic is independent of row count — the right shape for a
100-TB distinct-count.  All steps are numpy-vectorized (no per-row Python).

Merge is associative, commutative and idempotent (register max), so the
operator is exactly-once-safe under retries and reduction-order independent
— the same algebraic contract as the engine's counter/LWW folds.

Reference analogue: the reference's JobCounter aggregates exact run counts
(jobtracking/JobCounter.java) — it has no approximate-distinct surface; this
is one of the beyond-reference training-data ops (SURVEY §9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pandas.util import hash_array

DEFAULT_P = 14  # 16384 registers


def _mix64(v: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — avalanches int64 keys to uniform
    uint64 (same construction as stages.staging._hash64)."""
    x = v.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


def _hash_values(values) -> np.ndarray:
    """uint64 hashes for a column of ids or strings (SipHash for objects,
    splitmix64 for integers — both stable across processes)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return _mix64(arr.astype(np.int64))
    return hash_array(pd.Series(arr).to_numpy(dtype=object), categorize=False).astype(
        np.uint64
    )


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (6 masked passes — exact,
    no float log2 precision loss above 2**52)."""
    n = np.zeros(len(x), dtype=np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v < (np.uint64(1) << np.uint64(64 - s))
        n[m] += s
        v[m] = v[m] << np.uint64(s)
    n[x == 0] = 64
    return n


def hll_partial(values, p: int = DEFAULT_P) -> np.ndarray:
    """One batch → HLL register array (uint8[2**p]).

    Register index = top ``p`` hash bits; register value = 1 + number of
    leading zeros of the remaining ``64-p`` bits (capped at 64-p+1).
    """
    h = _hash_values(values)
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    rank = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(*registers: np.ndarray) -> np.ndarray:
    """Element-wise max — associative, commutative, idempotent."""
    out = registers[0].copy()
    for r in registers[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with linear-counting small-range correction
    (Flajolet et al. 2007, 'HyperLogLog: the analysis of a near-optimal
    cardinality estimation algorithm')."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))  # exact 2**-r
    raw = alpha * m * m / float(inv.sum())
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)  # linear counting
    return raw


def hll_partial_grouped(keys, values, p: int = DEFAULT_P) -> pd.DataFrame:
    """One batch → one HLL register array PER GROUP KEY: (key, regs-bytes).

    Fully vectorized: factorize keys once, then a single ``np.maximum.at``
    over a flat (n_groups × 2**p) register block.  The grouped-aggregation
    shape for approximate COUNT(DISTINCT v) GROUP BY k — the shuffle carries
    one fixed-size sketch per (group, batch), independent of row count.
    Registers are deterministic for a given value multiset, so any batch
    split produces byte-identical merged sketches (exactly-once-safe).
    """
    s = pd.Series(keys)
    codes, uniques = pd.factorize(s, use_na_sentinel=False)
    m = 1 << p
    regs = np.zeros(len(uniques) * m, dtype=np.uint8)
    h = _hash_values(values)
    if len(h):
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        rank = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
        np.maximum.at(regs, codes.astype(np.int64) * m + idx, rank)
    return pd.DataFrame(
        {
            "key": uniques,
            "regs": [regs[i * m : (i + 1) * m].tobytes() for i in range(len(uniques))],
        }
    )
