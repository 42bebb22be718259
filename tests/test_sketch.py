"""HyperLogLog sketch (stages/sketch.py) + the two round-5 event ops
built on the sorted-stream kernels: events_hll_users (cardinality
sketch) and events_user_paths (ordered string aggregation)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from stac_to_geocore_ray.stages.sketch import (
    DEFAULT_P,
    hll_add_dense,
    hll_estimate,
    hll_estimate_from_pairs,
    hll_idx_rank,
    splitmix64,
    _bit_length_u64,
)

SF = "/root/testdata/sf0.001"


class TestHllKernels:
    def test_bit_length_exact_vs_python(self):
        rng = np.random.default_rng(7)
        # adversarial values: powers of two and their neighbours are
        # exactly where a float64 log2 goes wrong
        pows = np.array([1 << k for k in range(64)], dtype=np.uint64)
        vals = np.concatenate([
            pows, pows - np.uint64(1), pows | np.uint64(1),
            rng.integers(0, 1 << 63, 1000).astype(np.uint64),
            np.array([0], dtype=np.uint64)])
        got = _bit_length_u64(vals)
        ref = np.array([int(v).bit_length() for v in vals])
        assert np.array_equal(got, ref)

    def test_idx_rank_vs_scalar_reference(self):
        rng = np.random.default_rng(11)
        keys = rng.integers(0, 1 << 62, 500).astype(np.uint64)
        p = DEFAULT_P
        idx, rank = hll_idx_rank(keys, p)
        h = splitmix64(keys)
        for i in range(len(keys)):
            hv = int(h[i])
            assert idx[i] == hv >> (64 - p)
            w = hv & ((1 << (64 - p)) - 1)
            assert rank[i] == (64 - p) - w.bit_length() + 1
        assert rank.min() >= 1 and rank.max() <= (64 - p) + 1

    def test_splitmix64_is_a_bijection_sample(self):
        # no collisions over a large sample (injective on uint64)
        keys = np.arange(200_000, dtype=np.uint64)
        assert len(np.unique(splitmix64(keys))) == len(keys)

    def test_merge_equals_single_pass(self):
        """Register max-merge is shard-invariant: any partition of the
        keys folds to the identical dense register array."""
        rng = np.random.default_rng(3)
        keys = rng.integers(0, 10_000, 50_000).astype(np.uint64)
        single = hll_add_dense(np.zeros(1 << DEFAULT_P, np.int64), keys)
        merged = np.zeros(1 << DEFAULT_P, np.int64)
        for shard in np.array_split(keys, 13):
            part = hll_add_dense(np.zeros(1 << DEFAULT_P, np.int64), shard)
            np.maximum(merged, part, out=merged)
        assert np.array_equal(single, merged)

    @pytest.mark.parametrize("n", [10, 1_000, 50_000, 400_000])
    def test_estimate_accuracy(self, n):
        """Relative error within 3 sigma (sigma = 1.04/sqrt(m)) at
        every cardinality regime incl. the linear-counting branch."""
        rng = np.random.default_rng(n)
        keys = rng.integers(0, 1 << 62, n).astype(np.uint64)
        truth = len(np.unique(keys))
        regs = hll_add_dense(np.zeros(1 << DEFAULT_P, np.int64), keys)
        est = hll_estimate(regs)
        sigma = 1.04 / np.sqrt(1 << DEFAULT_P)
        assert abs(est - truth) <= max(1, 3 * sigma * truth)

    def test_estimate_from_pairs_matches_dense(self):
        rng = np.random.default_rng(5)
        keys = rng.integers(0, 5_000, 20_000).astype(np.uint64)
        regs = hll_add_dense(np.zeros(1 << DEFAULT_P, np.int64), keys)
        idx = np.flatnonzero(regs)
        assert hll_estimate_from_pairs(idx, regs[idx]) == \
            hll_estimate(regs)

    def test_estimate_shape_guard(self):
        with pytest.raises(ValueError):
            hll_estimate(np.zeros(17))


class TestEventsHllUsers:
    def test_matches_numpy_reference_exactly(self, ray_session):
        """The distributed pipeline is a pure function of the distinct
        user set — its estimate must EQUAL the single-machine dense
        fold, not just approximate the truth."""
        from stac_to_geocore_ray.queries import events_hll_users
        got = events_hll_users(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "user_id"])
        rows = []
        for t, g in ev.groupby("event_type"):
            regs = hll_add_dense(np.zeros(1 << DEFAULT_P, np.int64),
                                 g.user_id.to_numpy().astype(np.uint64))
            rows.append((t, hll_estimate(regs)))
        ref = pd.DataFrame(rows, columns=["event_type", "hll_users"]) \
            .sort_values("event_type").reset_index(drop=True)
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.hll_users.tolist() == ref.hll_users.tolist()

    def test_close_to_exact_counts(self, ray_session):
        from stac_to_geocore_ray.queries import events_hll_users
        got = events_hll_users(SF).to_pandas()
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "user_id"])
        exact = ev.groupby("event_type").user_id.nunique()
        sigma = 1.04 / np.sqrt(1 << DEFAULT_P)
        for _, r in got.iterrows():
            truth = int(exact[r.event_type])
            assert abs(int(r.hll_users) - truth) <= \
                max(1, 3 * sigma * truth)


class TestEventsUserPaths:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import events_user_paths
        got = events_user_paths(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        ev = pd.read_parquet(
            f"{SF}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"])
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        ref = ev.groupby("user_id").agg(
            path=("event_type", ",".join),
            n_events=("event_type", "size")).reset_index()
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert got.path.tolist() == ref.path.tolist()
        assert got.n_events.tolist() == ref.n_events.tolist()

    def test_order_sensitivity_is_real(self, ray_session):
        """The fixture must actually exercise ordering: at least one
        user's path differs from its sorted-multiset rendering."""
        from stac_to_geocore_ray.queries import events_user_paths
        got = events_user_paths(SF).to_pandas()
        scrambled = got.path.map(
            lambda s: ",".join(sorted(s.split(","))))
        assert (got.path != scrambled).any()


class TestBloomFilter:
    def test_no_false_negatives_and_low_fp(self):
        from stac_to_geocore_ray.stages.sketch import BloomFilter
        rng = np.random.RandomState(3)
        keys = rng.randint(0, 1 << 62, 50_000).astype(np.int64)
        bf = BloomFilter(BloomFilter.size_for(len(keys)))
        bf.add(keys)
        assert bf.contains(keys).all()            # never a false negative
        probe = rng.randint(0, 1 << 62, 100_000).astype(np.int64)
        outside = probe[~np.isin(probe, keys)]
        fp = bf.contains(outside).mean()
        assert fp < 0.02, fp                      # ~1% at 10 bits/key

    def test_incremental_add_equals_bulk(self):
        from stac_to_geocore_ray.stages.sketch import BloomFilter
        keys = np.arange(1, 10_001, dtype=np.int64)
        bulk = BloomFilter(1 << 17).add(keys)
        inc = BloomFilter(1 << 17)
        for lo in range(0, 10_000, 1_000):
            inc.add(keys[lo:lo + 1_000])
        assert np.array_equal(bulk.words, inc.words)

    def test_invalid_sizes_fail_loud(self):
        from stac_to_geocore_ray.stages.sketch import BloomFilter
        import pytest
        with pytest.raises(ValueError):
            BloomFilter(100)                      # not a multiple of 64
        with pytest.raises(ValueError):
            BloomFilter(128, words=np.zeros(1, dtype=np.uint64))

    def test_distributed_build_matches_local(self, ray_session):
        import ray.data as rd
        from stac_to_geocore_ray.stages.sketch import (BloomFilter,
                                                       bloom_from_dataset)
        keys = np.arange(7, 40_007, dtype=np.int64) * 13
        ds = rd.from_arrow(pa.table({"k": keys})).repartition(8)
        n_bits = BloomFilter.size_for(len(keys))
        dist = bloom_from_dataset(ds, "k", n_bits)
        local = BloomFilter(n_bits).add(keys)
        assert np.array_equal(dist.words, local.words)


class TestMisraGries:
    def _blocks(self, values, n_blocks):
        return np.array_split(values, n_blocks)

    def test_guarantee_no_heavy_hitter_lost(self):
        """Every value with true count > n/(k+1) survives per-block
        compress + merge — the bound the heavy-hitters prune rests on."""
        from stac_to_geocore_ray.stages.sketch import (mg_block_summary,
                                                       mg_merge)
        rng = np.random.RandomState(7)
        k = 64
        # zipf-flavored stream over a domain far larger than k
        vals = (rng.zipf(1.3, 200_000) % 10_000).astype(np.int64)
        n = len(vals)
        true = pd.Series(vals).value_counts()
        heavy = set(true[true > n // (k + 1)].index)
        assert heavy, "fixture must actually contain heavy hitters"
        pv, pc_ = [], []
        for blk in self._blocks(vals, 13):
            v, c = mg_block_summary(blk, k)
            assert len(v) <= k
            pv.append(v)
            pc_.append(c)
        mv, mc = mg_merge(np.concatenate(pv), np.concatenate(pc_), k)
        assert len(mv) <= k
        assert heavy <= set(mv.tolist())
        # estimates only ever UNDER-count, by < n/(k+1)
        est = dict(zip(mv.tolist(), mc.tolist()))
        for v in heavy:
            assert 0 < est[v] <= true[v]
            assert true[v] - est[v] < n / (k + 1)

    def test_compress_noop_under_k(self):
        from stac_to_geocore_ray.stages.sketch import mg_compress
        v = np.arange(10, dtype=np.int64)
        c = np.arange(1, 11, dtype=np.int64)
        rv, rc = mg_compress(v, c, 64)
        assert np.array_equal(rv, v) and np.array_equal(rc, c)

    def test_block_summary_partition_invariance(self):
        """Merging summaries of ANY block split yields the same
        candidate superset for the same stream."""
        from stac_to_geocore_ray.stages.sketch import (mg_block_summary,
                                                       mg_merge)
        rng = np.random.RandomState(11)
        vals = np.repeat(np.arange(30, dtype=np.int64),
                         rng.randint(1, 400, 30))
        rng.shuffle(vals)
        n, k = len(vals), 8
        true = pd.Series(vals).value_counts()
        heavy = set(true[true > n // (k + 1)].index)
        for n_blocks in (1, 3, 9):
            pv, pc_ = [], []
            for blk in self._blocks(vals, n_blocks):
                v, c = mg_block_summary(blk, k)
                pv.append(v)
                pc_.append(c)
            mv, _ = mg_merge(np.concatenate(pv), np.concatenate(pc_), k)
            assert heavy <= set(mv.tolist()), n_blocks


class TestEventsHeavyHitters:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import events_heavy_hitters
        from stac_to_geocore_ray.queries.events import HH_PHI_INV
        got = events_heavy_hitters("/root/testdata/sf0.001").to_pandas()
        ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                             columns=["user_id"])
        vc = ev.user_id.value_counts()
        ref = vc[vc * HH_PHI_INV > len(ev)].sort_index()
        got = got.sort_values("user_id").reset_index(drop=True)
        assert got.user_id.tolist() == ref.index.tolist()
        assert got.n.tolist() == ref.tolist()


class TestQuantileSummary:
    def test_lossless_when_block_fits(self):
        from stac_to_geocore_ray.stages.sketch import (
            quantile_block_summary, quantile_merge)
        rng = np.random.RandomState(5)
        vals = rng.randint(0, 10_000, 200).astype(np.int64)
        v, w = quantile_block_summary(vals, 256)
        assert len(v) == 200 and (w == 1).all()
        # quantile_disc read-off equals the exact definition
        for q in (0.5, 0.9, 0.99):
            exact = np.sort(vals)[int(np.ceil(q * 200)) - 1]
            assert quantile_merge(v, w, [q])[0] == exact

    def test_rank_error_bound_any_split(self):
        """Estimated quantile's true rank is within n/m + #blocks of
        the target rank, for every block split — the mergeable bound
        the sketch advertises."""
        from stac_to_geocore_ray.stages.sketch import (
            quantile_block_summary, quantile_merge)
        rng = np.random.RandomState(9)
        vals = np.concatenate([rng.lognormal(3, 1, 60_000),
                               rng.uniform(0, 5, 40_000)])
        vals = (vals * 100).astype(np.int64)
        n, m = len(vals), 128
        sv = np.sort(vals)
        for n_blocks in (1, 7, 40):
            pv, pw = [], []
            for blk in np.array_split(vals, n_blocks):
                v, w = quantile_block_summary(blk, m)
                assert len(v) <= m
                pv.append(v)
                pw.append(w)
            est = quantile_merge(np.concatenate(pv), np.concatenate(pw),
                                 (0.5, 0.9, 0.99))
            for q, e in zip((0.5, 0.9, 0.99), est):
                # true rank range of the estimated value
                lo = np.searchsorted(sv, e, side="left")
                hi = np.searchsorted(sv, e, side="right")
                target = np.ceil(q * n)
                err = max(lo - target, target - hi, 0)
                assert err <= n / m + n_blocks, (q, n_blocks, err)

    def test_weights_sum_exactly(self):
        from stac_to_geocore_ray.stages.sketch import quantile_block_summary
        for n in (1, 255, 256, 257, 10_000):
            v, w = quantile_block_summary(
                np.arange(n, dtype=np.int64), 256)
            assert int(w.sum()) == n


class TestEventsQuantileSketch:
    def test_exact_in_lossless_regime(self, ray_session):
        """At sf0.001 every per-(block, type) run fits in m=256 rows,
        so the sketch must EQUAL the exact bounded-domain histogram."""
        from stac_to_geocore_ray.queries import (events_quantile_sketch,
                                                 events_value_quantiles)
        got = events_quantile_sketch("/root/testdata/sf0.001") \
            .to_pandas().sort_values("event_type").reset_index(drop=True)
        exact = events_value_quantiles("/root/testdata/sf0.001") \
            .to_pandas().sort_values("event_type").reset_index(drop=True)
        assert got.event_type.tolist() == exact.event_type.tolist()
        for sk, ex in (("p50_cents", "p50"), ("p90_cents", "p90"),
                       ("p99_cents", "p99")):
            assert got[sk].tolist() == exact[ex].tolist(), sk


class TestHLLOverlap:
    def test_union_intersection_accuracy(self, ray_session):
        from stac_to_geocore_ray.queries import (events_hll_overlap,
                                                 events_type_overlap)
        got = events_hll_overlap("/root/testdata/sf0.001").to_pandas() \
            .set_index(["type_a", "type_b"])
        exact = events_type_overlap("/root/testdata/sf0.001") \
            .to_pandas().set_index(["type_a", "type_b"])
        assert set(got.index) == set(exact.index)
        for key in got.index:
            g, e = got.loc[key], exact.loc[key]
            # p=12 registers: ~1.6% standard error; allow 6%
            for est, true in ((g.hll_a, e.n_a), (g.hll_b, e.n_b),
                              (g.hll_union, e.n_union),
                              (g.hll_inter, e.n_inter)):
                if true >= 100:
                    assert abs(est - true) <= 0.06 * true, (key, est, true)
        # sketch identities hold exactly: inter = a + b - union, >= 0
        flat = got.reset_index()
        assert (flat.hll_inter
                == (flat.hll_a + flat.hll_b - flat.hll_union)
                .clip(lower=0)).all()

    def test_merge_is_register_max(self, ray_session):
        # determinism: two runs produce identical estimates
        from stac_to_geocore_ray.queries import events_hll_overlap
        a = events_hll_overlap("/root/testdata/sf0.001").to_pandas()
        b = events_hll_overlap("/root/testdata/sf0.001").to_pandas()
        pd.testing.assert_frame_equal(a, b)
