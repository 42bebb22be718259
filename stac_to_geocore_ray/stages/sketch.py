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


# ------------------------------------------------------------------ bloom

class BloomFilter:
    """REGISTER-BLOCKED Bloom filter over int64 keys — the
    bounded-memory SEMI-JOIN PRE-FILTER for fact-to-fact joins whose
    build side is too big for an exact broadcast key set (q3's exact
    ``is_in`` template stops at worker heap; a filter over 1e9 keys
    at ~1%% false positives is a fixed ~2 GB of bits REGARDLESS of key
    width, and false positives are harmless when an exact join
    follows).

    Blocked design (Putze/Sanders/Singler): ONE splitmix64 hash picks
    the 64-bit word, a second derives K in-word bit positions folded
    into a single mask — membership is one gather + one compare, ~5
    flat (n,) temporaries total.  The first cut used textbook
    k-independent bit probes via an (n, k) position matrix; at 18M
    probes that allocated ~6 GB of temporaries and cost 14+ s
    single-thread — the blocked form is ~20x cheaper at a slightly
    worse (still <1%% at 16 bits/key) false-positive rate.

    Build distributed via per-block partial bitsets OR-folded on the
    driver (``bloom_from_dataset``); probe via a broadcast of the
    packed uint64 word array (plasma zero-copies flat buffers).
    """

    K = 4                       # in-word probe bits (24 hash bits used)

    def __init__(self, n_bits: int, words: "np.ndarray | None" = None):
        if n_bits <= 0 or n_bits % 64:
            raise ValueError(f"n_bits must be a positive multiple of "
                             f"64, got {n_bits}")
        self.n_bits = n_bits
        self.n_words = n_bits // 64
        self.words = (np.zeros(self.n_words, dtype=np.uint64)
                      if words is None else words)
        if len(self.words) != self.n_words:
            raise ValueError("words length does not match n_bits")

    def _word_mask(self, keys: np.ndarray):
        """(word index, in-word K-bit mask) per key, flat (n,) arrays.

        All mixing runs IN PLACE on two reused buffers: on this host
        every large fresh numpy temporary is a new mmap whose page
        faults cost ~4 s/GB (malloc returns big blocks to the OS on
        free), so the out-of-place form — ~20 temporaries — spent 14 s
        faulting pages for an 18M-key probe; this form allocates 4.
        """
        k = np.ascontiguousarray(keys).view(np.uint64) \
            if keys.dtype == np.int64 else keys.astype(np.uint64)
        z = k + _C1                              # buffer 1 (h state)
        t = np.empty_like(z)                     # buffer 2 (scratch)

        def _mix(z, t):                          # splitmix64, in place
            np.right_shift(z, np.uint64(30), out=t)
            np.bitwise_xor(z, t, out=z)
            np.multiply(z, _C2, out=z)
            np.right_shift(z, np.uint64(27), out=t)
            np.bitwise_xor(z, t, out=z)
            np.multiply(z, _C3, out=z)
            np.right_shift(z, np.uint64(31), out=t)
            np.bitwise_xor(z, t, out=z)

        _mix(z, t)                               # z = h1
        np.remainder(z, np.uint64(self.n_words), out=t)
        idx = t.astype(np.int64)                 # buffer 3
        np.add(z, _C1, out=z)
        _mix(z, t)                               # z = h2
        np.bitwise_and(z, np.uint64(63), out=t)
        mask = np.uint64(1) << t                 # buffer 4
        for _ in range(1, self.K):
            np.right_shift(z, np.uint64(6), out=z)
            np.bitwise_and(z, np.uint64(63), out=t)
            np.left_shift(np.uint64(1), t, out=t)
            np.bitwise_or(mask, t, out=mask)
        return idx, mask

    def add(self, keys: np.ndarray) -> "BloomFilter":
        keys = np.asarray(keys)
        if len(keys) == 0:
            return self
        idx, mask = self._word_mask(keys)
        # NOT bitwise_or.at (the unbuffered ufunc costs ~100x a
        # vectorized pass): sort by word, OR each word's run with one
        # C-level reduceat.
        order = np.argsort(idx, kind="stable")
        w_sorted = idx[order]
        starts = np.flatnonzero(np.r_[True, w_sorted[1:] != w_sorted[:-1]])
        self.words[w_sorted[starts]] |= np.bitwise_or.reduceat(
            mask[order], starts)
        return self

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask; NO false negatives, <1%% false positives."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        idx, mask = self._word_mask(keys)
        return (self.words[idx] & mask) == mask

    @staticmethod
    def size_for(n_keys: int, bits_per_key: int = 16) -> int:
        return max(64, ((n_keys * bits_per_key + 63) // 64) * 64)


def bloom_from_dataset(ds, col: str, n_bits: int) -> "BloomFilter":
    """Build a BloomFilter over one int64 column of a Dataset:
    per-block partial bitsets (each a packed uint64 array) OR-fold on
    the driver.  Driver traffic is blocks x n_bits/8 bytes — bounded
    by the FILTER size, never the key count."""
    import pyarrow as pa

    def partial(batch: "pa.Table") -> "pa.Table":
        bf = BloomFilter(n_bits)
        bf.add(batch[col].to_numpy())
        return pa.table({"words": pa.array([bf.words.tobytes()],
                                           pa.binary())})

    words = np.zeros(n_bits // 64, dtype=np.uint64)
    for part in ds.map_batches(partial,
                               batch_format="pyarrow").iter_batches(
                                   batch_format="pyarrow"):
        for buf in part["words"].to_pylist():
            words |= np.frombuffer(buf, dtype=np.uint64)
    return BloomFilter(n_bits, words)


# ------------------------------------------------------------ misra-gries

def mg_compress(values: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries compress: keep at most ``k`` (value, count) rows.

    If more than ``k`` distinct values are present, subtract the
    (k+1)-th largest count from every count and keep the positives —
    the mergeable-summaries compress (Agarwal et al., PODS'12).  The
    invariant that makes MG a GUARANTEED candidate prune: each
    compress decrements any single value's count by at most the
    amount it decrements ALL values, and the total decrement across a
    dataset of n rows is < n/(k+1), so every value with true count
    > n/(k+1) is still present in the final summary.
    """
    if len(values) <= k:
        return values, counts
    order = np.argsort(counts)[::-1]
    thresh = counts[order[k]]
    keep = order[:k]
    dec = counts[keep] - thresh
    pos = dec > 0
    return values[keep][pos], dec[pos]


def mg_block_summary(values: np.ndarray, k: int):
    """Exact value counts of one block, MG-compressed to ``k`` rows."""
    import pandas as pd
    vc = pd.Series(values).value_counts()
    return mg_compress(vc.index.to_numpy(),
                       vc.to_numpy().astype(np.int64), k)


def mg_merge(values: np.ndarray, counts: np.ndarray, k: int):
    """Merge concatenated MG summaries (exact groupby-sum of the
    partial counts, then one compress).  Summing the partials exactly
    before the final compress only tightens the bound relative to
    pairwise compress-as-you-merge."""
    import pandas as pd
    s = pd.Series(counts).groupby(pd.Series(values)).sum()
    return mg_compress(s.index.to_numpy(), s.to_numpy().astype(np.int64), k)


# ------------------------------------------------- equi-depth quantiles

def quantile_block_summary(values: np.ndarray, m: int):
    """Deterministic equi-depth summary of one block: at most ``m``
    (value, weight) rows whose weighted CDF tracks the block's true
    CDF within one bucket (<= ceil(n/m) rows of rank error).

    Buckets are consecutive runs of the SORTED block with integer
    weights summing exactly to n (first ``n % m`` buckets take the
    extra row); each bucket is represented by its middle element.
    No randomness, no float weight drift — summaries are reproducible
    and merge-order invariant.
    """
    v = np.sort(np.asarray(values))
    n = len(v)
    if n == 0:
        return v[:0], np.zeros(0, dtype=np.int64)
    if n <= m:
        return v, np.ones(n, dtype=np.int64)
    base, extra = divmod(n, m)
    w = np.full(m, base, dtype=np.int64)
    w[:extra] += 1
    starts = np.concatenate([[0], np.cumsum(w)[:-1]])
    return v[starts + w // 2], w


def quantile_merge(values: np.ndarray, weights: np.ndarray,
                   qs) -> np.ndarray:
    """Weighted-quantile read-off over concatenated block summaries.

    Sorts the (value, weight) rows, and for each q returns the first
    value whose cumulative weight reaches ``ceil(q * W)`` (the
    quantile_disc convention the exact histogram path uses).  Total
    rank error is bounded by the sum of per-block bucket sizes:
    <= n/m + #blocks rows — independent of how blocks were split,
    which the tests pin.
    """
    order = np.argsort(values, kind="stable")
    v = np.asarray(values)[order]
    w = np.asarray(weights)[order]
    cum = np.cumsum(w)
    total = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        target = max(1, int(np.ceil(q * total)))
        out.append(v[np.searchsorted(cum, target)])
    return np.asarray(out)
