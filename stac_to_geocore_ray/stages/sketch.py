"""Mergeable cardinality sketches (HyperLogLog).

The one aggregate family the registry lacked: APPROXIMATE distinct
counting whose shuffle volume is INDEPENDENT of data size.  Exact
COUNT(DISTINCT) (``events_distinct_users``) must move every distinct
(group, key) pair through the sort — |users| rows per group at any
scale.  An HLL register table moves at most ``groups x m`` rows
(m = 2^p registers, 4096 at the default p=12) no matter whether the
input is 10 k rows or 100 TB, and the register MAX-merge is fully
reassociative, so it rides the same ``sorted_combine`` max path as
every other partial/combine aggregate in this repo.

Public HLL algorithm (Flajolet/Fusy/Gandouet/Meunier 2007) with the
standard small-range linear-counting correction; the 64-bit hash makes
the large-range correction irrelevant.  Everything is vectorized
numpy — hashing, register extraction, rank (leading-zero count via an
exact two-halves frexp, since float64 can't represent 64-bit ints but
represents 32-bit ints exactly).

No counterpart in the reference (it has no aggregation at all beyond
counters — /root/reference/stac-to-geocore/app.py); this is part of the
beyond-reference large-scale-pipeline surface (SURVEY.md §2.8 spirit).
"""

from __future__ import annotations

import numpy as np

DEFAULT_P = 12  # 4096 registers; standard error 1.04/sqrt(m) ~ 1.6%

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 -> well-mixed uint64.

    Public-domain mixing constants (Steele/Lea/Flood, JDK
    SplittableRandom).  Deterministic across runs, hosts, and
    shardings — the property the merge-equivalence tests pin.
    """
    z = np.asarray(x, dtype=np.uint64) + _C1
    z = (z ^ (z >> np.uint64(30))) * _C2
    z = (z ^ (z >> np.uint64(27))) * _C3
    return z ^ (z >> np.uint64(31))


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (0 -> 0).

    np.log2 on 64-bit ints is wrong near powers of two (float64 has 53
    mantissa bits); frexp's EXPONENT on an exactly-represented 32-bit
    int IS its bit length, so split into halves.
    """
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    return np.where(hi > 0,
                    32 + np.frexp(hi)[1],
                    np.frexp(lo)[1]).astype(np.int64)


def hll_idx_rank(keys: np.ndarray, p: int = DEFAULT_P):
    """(register index, rank) per key — the per-row HLL observation.

    index = top ``p`` hash bits; rank = 1 + leading zeros of the
    remaining ``64-p`` bits (so rank in [1, 64-p+1]).  Duplicate keys
    produce identical (idx, rank) pairs, which is what makes the
    register table a pure MAX-semilattice: merge order, sharding and
    re-observation are all invisible.
    """
    h = splitmix64(np.asarray(keys, dtype=np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rank = (64 - p) - _bit_length_u64(w) + 1
    return idx, rank.astype(np.int64)


def hll_estimate(registers: np.ndarray, p: int = DEFAULT_P) -> int:
    """Cardinality estimate from a DENSE register array of size 2^p.

    Raw harmonic-mean estimator with the standard alpha_m bias factor
    and the linear-counting small-range correction (E <= 2.5 m with
    empty registers).  64-bit hashing makes collisions at the hash
    level negligible, so no large-range correction.
    """
    m = 1 << p
    regs = np.asarray(registers, dtype=np.float64)
    if regs.shape != (m,):
        raise ValueError(f"expected {m} registers, got {regs.shape}")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return int(np.floor(e + 0.5))


def hll_estimate_from_pairs(idx: np.ndarray, rank: np.ndarray,
                            p: int = DEFAULT_P) -> int:
    """Estimate from a SPARSE (idx, max rank) pair table — the shape a
    distributed max-merge hands back (absent registers are zero)."""
    regs = np.zeros(1 << p, dtype=np.int64)
    # pairs arriving from sorted_combine are already max-merged per
    # idx, but tolerate raw duplicates for the direct/numpy callers
    np.maximum.at(regs, np.asarray(idx, dtype=np.int64),
                  np.asarray(rank, dtype=np.int64))
    return hll_estimate(regs, p)


def hll_add_dense(registers: np.ndarray, keys: np.ndarray,
                  p: int = DEFAULT_P) -> np.ndarray:
    """Single-machine reference path: fold keys into a dense register
    array in place (tests pin the distributed pipeline against this)."""
    idx, rank = hll_idx_rank(keys, p)
    np.maximum.at(registers, idx, rank)
    return registers
