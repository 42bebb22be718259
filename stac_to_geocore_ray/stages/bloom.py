"""Distributed Bloom-filter build / probe for semi-join pruning.

The scale pattern: when a semi-join's build side is too large to
broadcast as an exact key set but its MEMBERSHIP can be approximated
in a fixed-size bitmap, build the bitmap distributively (per-batch
partial bitmaps, one bitwise-OR fold — OR is commutative/associative,
so the fold is exact under any batching), broadcast the bits once via
``ray.put`` (kilobytes-to-megabytes instead of the key set), prune the
probe side per batch with two vectorized hash probes, and run the
EXACT confirm (a distributed hash join) only on the survivors.  False
positives cost only wasted confirm work — never wrong results.

Sizing: with ``m`` bits, ``k=2`` probes and ``n`` keys, the false-
positive rate is ~``(1 - e^(-2n/m))^2``; keep ``m >= 8n`` for ~5% FP.
The default 2^20 bits (128 KiB) covers ~130k keys; scale ``m_bits``
with the expected build-side cardinality (a 2^30-bit / 128 MiB filter
still broadcasts once per node, vs shuffling the full probe side).
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def mix64(keys) -> np.ndarray:
    """splitmix64 finalizer over int keys — vectorized, wrap-exact."""
    x = np.asarray(keys).astype(np.uint64, copy=True)
    x += _MIX1
    x ^= x >> np.uint64(30)
    x *= _MIX2
    x ^= x >> np.uint64(27)
    x *= _MIX3
    x ^= x >> np.uint64(31)
    return x


def bloom_partial(keys, m_bits: int) -> bytes:
    """One batch's partial bitmap (two probes per key) as bytes."""
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    mask = np.uint64(m_bits - 1)
    h = mix64(keys)
    idx = np.concatenate([h & mask, (h >> np.uint64(32)) & mask]) \
        .astype(np.int64)
    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    np.bitwise_or.at(bits, idx >> 3,
                     np.left_shift(np.uint8(1), (idx & 7).astype(np.uint8)))
    return bits.tobytes()


def bloom_or(partials) -> bytes:
    """Exact bitwise-OR fold of partial bitmaps."""
    stacked = np.stack([np.frombuffer(p, dtype=np.uint8)
                        for p in partials])
    return np.bitwise_or.reduce(stacked, axis=0).tobytes()


def bloom_probe_mask(keys, bits: bytes, m_bits: int) -> np.ndarray:
    """Vectorized membership test: True = possibly present (bloom
    semantics: no false negatives)."""
    mask = np.uint64(m_bits - 1)
    arr = np.frombuffer(bits, dtype=np.uint8)
    h = mix64(keys)
    i1 = (h & mask).astype(np.int64)
    i2 = ((h >> np.uint64(32)) & mask).astype(np.int64)
    hit1 = (arr[i1 >> 3] >> (i1 & 7).astype(np.uint8)) & 1
    hit2 = (arr[i2 >> 3] >> (i2 & 7).astype(np.uint8)) & 1
    return (hit1 & hit2).astype(bool)
