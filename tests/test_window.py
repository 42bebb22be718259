"""Window-function / pivot / vocab query semantics.

The oracle gate (tools/verify_queries.py, driver CORRECTNESS) checks
these against DuckDB SQL; here an INDEPENDENT pandas reference pins the
semantics in CI, with the block size forced tiny so the sort produces
many blocks and the window query's boundary-user fold path is actually
exercised (at sf0.001 a default read can yield one block, which would
leave split/fold dead code in the test).
"""
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _cents(v):
    v = np.asarray(v, dtype=np.float64)
    return (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype("int64")


class TestEventsWindowRank:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_window_rank
        got = events_window_rank(SF).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "user_id", "ts", "value"])
        ev = ev.sort_values(["user_id", "ts", "event_id"]) \
            .reset_index(drop=True)
        ev["cents"] = _cents(ev.value.to_numpy())
        g = ev.groupby("user_id", sort=False)
        ref = pd.DataFrame({
            "event_id": ev.event_id,
            "user_id": ev.user_id,
            "rn": g.cumcount() + 1,
            "prev_cents": g["cents"].shift(1),
            "gap_us": g["ts"].diff().dt.total_seconds() * 1e6,
            "cum_cents": g["cents"].cumsum(),
        }).sort_values("event_id").reset_index(drop=True)

        assert len(got) == len(ref)
        assert (got.event_id.to_numpy() == ref.event_id.to_numpy()).all()
        assert (got.rn.to_numpy() == ref.rn.to_numpy()).all()
        assert (got.cum_cents.to_numpy() == ref.cum_cents.to_numpy()).all()
        for col in ("prev_cents", "gap_us"):
            a = got[col].to_numpy(dtype="float64")
            b = ref[col].to_numpy(dtype="float64")
            assert np.allclose(a, b, equal_nan=True)

    def test_first_event_rows_are_null_lagged(self, ray_session):
        from stac_to_geocore_ray.queries import events_window_rank
        df = events_window_rank(SF).to_pandas()
        first = df[df.rn == 1]
        assert first.prev_cents.isna().all()
        assert first.gap_us.isna().all()
        # every user has exactly one rn==1 row
        assert first.user_id.is_unique
        assert set(first.user_id) == set(df.user_id)


class TestEventsTypePivot:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import PIVOT_TYPES, events_type_pivot
        got = events_type_pivot(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "event_type", "value"])
        ev["cents"] = _cents(ev.value.to_numpy())
        users = np.sort(ev.user_id.unique())
        assert (got.user_id.to_numpy() == users).all()
        for t in PIVOT_TYPES:
            sub = ev[ev.event_type == t]
            n = sub.groupby("user_id").size().reindex(users, fill_value=0)
            c = sub.groupby("user_id")["cents"].sum() \
                .reindex(users, fill_value=0)
            assert (got[f"n_{t}"].to_numpy() == n.to_numpy()).all()
            assert (got[f"cents_{t}"].to_numpy() == c.to_numpy()).all()

    def test_counts_conserve_events(self, ray_session):
        from stac_to_geocore_ray.queries import PIVOT_TYPES, events_type_pivot
        got = events_type_pivot(SF).to_pandas()
        n_total = sum(got[f"n_{t}"].sum() for t in PIVOT_TYPES)
        ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type"])
        assert n_total == ev.event_type.isin(PIVOT_TYPES).sum()


class TestDocWordFreq:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import doc_word_freq
        got = doc_word_freq(SF).to_pandas()
        docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        vc = docs.text.str.lower().str.split().explode().dropna() \
            .value_counts()
        ref = vc.reset_index()
        ref.columns = ["token", "n"]
        ref = ref.sort_values(["n", "token"], ascending=[False, True]) \
            .head(50).reset_index(drop=True)
        assert got.token.tolist() == ref.token.tolist()
        assert got.n.tolist() == ref.n.tolist()

    def test_topk_is_sorted_and_bounded(self, ray_session):
        from stac_to_geocore_ray.queries import doc_word_freq
        got = doc_word_freq(SF).to_pandas()
        assert len(got) <= 50
        n = got.n.to_numpy()
        assert (n[:-1] >= n[1:]).all()


class TestSortedCombine:
    """Direct pin of stages/util.sorted_combine (lesson 21): the sort +
    in-block combine + boundary-key fold must equal a driver pandas
    groupby for every agg kind, including when one hot key spans many
    blocks."""

    def _run(self, df, keys, aggs, ray_session):
        import ray.data
        from stac_to_geocore_ray.stages.util import sorted_combine
        ctx = ray.data.DataContext.get_current()
        old = ctx.target_max_block_size
        ctx.target_max_block_size = 4 * 1024   # force many tiny blocks
        try:
            ds = ray.data.from_pandas(df).repartition(16)
            out = sorted_combine(ds, keys=keys, aggs=aggs).to_pandas()
        finally:
            ctx.target_max_block_size = old
        return out.sort_values(keys).reset_index(drop=True)

    def test_matches_pandas_all_agg_kinds(self, ray_session):
        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "k": rng.integers(0, 500, size=20_000),
            "a": rng.integers(-100, 100, size=20_000),
            "b": rng.integers(0, 1_000_000, size=20_000)})
        aggs = {"a": "sum", "b": "min"}
        got = self._run(df, ["k"], aggs, None)
        ref = df.groupby("k", as_index=False).agg(aggs) \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)

    def test_hot_key_spanning_blocks(self, ray_session):
        # one key holds half the rows -> present in most sorted blocks;
        # its partials must fold to ONE exact row
        rng = np.random.default_rng(11)
        k = rng.integers(0, 200, size=10_000)
        k[: 5_000] = 42
        df = pd.DataFrame({"k": k, "v": np.ones(10_000, dtype="int64"),
                           "m": np.arange(10_000, dtype="int64")})
        got = self._run(df, ["k"], {"v": "sum", "m": "max"}, None)
        ref = df.groupby("k", as_index=False).agg({"v": "sum", "m": "max"}) \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        assert int(got.loc[got.k == 42, "v"].iloc[0]) == int((k == 42).sum())

    def test_multi_key(self, ray_session):
        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "k1": rng.choice(["x", "y", "z"], size=5_000),
            "k2": rng.integers(0, 50, size=5_000),
            "v": rng.integers(0, 10, size=5_000)})
        got = self._run(df, ["k1", "k2"], {"v": "sum"}, None)
        ref = df.groupby(["k1", "k2"], as_index=False).agg({"v": "sum"}) \
            .sort_values(["k1", "k2"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)

    def test_rejects_unknown_agg(self, ray_session):
        import ray.data
        from stac_to_geocore_ray.stages.util import sorted_combine
        ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
        with pytest.raises(ValueError):
            sorted_combine(ds, keys=["k"], aggs={"v": "mean"})
        with pytest.raises(ValueError):
            sorted_combine(ds, keys=["k"])


class TestEventsDistinctUsers:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_distinct_users
        got = events_distinct_users(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "user_id"])
        ref = ev.groupby("event_type") \
            .agg(n_users=("user_id", "nunique"),
                 n_events=("user_id", "size")).reset_index() \
            .sort_values("event_type").reset_index(drop=True)
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.n_users.tolist() == ref.n_users.tolist()
        assert got.n_events.tolist() == ref.n_events.tolist()


class TestEventsRetention:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_retention
        got = events_retention(SF).to_pandas() \
            .sort_values(["cohort_day", "activity_day"]) \
            .reset_index(drop=True)
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts"])
        ev["activity_day"] = ev.ts.dt.floor("D")
        first = ev.groupby("user_id")["activity_day"].min() \
            .rename("cohort_day")
        ev = ev.join(first, on="user_id")
        ref = ev.drop_duplicates(["user_id", "activity_day"]) \
            .groupby(["cohort_day", "activity_day"]).size() \
            .reset_index(name="n_users") \
            .sort_values(["cohort_day", "activity_day"]) \
            .reset_index(drop=True)
        assert len(got) == len(ref)
        assert (got.cohort_day.to_numpy() == ref.cohort_day.to_numpy()).all()
        assert (got.activity_day.to_numpy()
                == ref.activity_day.to_numpy()).all()
        assert (got.n_users.to_numpy() == ref.n_users.to_numpy()).all()

    def test_diagonal_dominance_and_totals(self, ray_session):
        # every user appears on their own cohort day (cohort row where
        # activity == cohort covers all cohort members), and total
        # distinct (user, day) pairs are conserved
        from stac_to_geocore_ray.queries import events_retention
        got = events_retention(SF).to_pandas()
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts"])
        ev["day"] = ev.ts.dt.floor("D")
        n_pairs = len(ev.drop_duplicates(["user_id", "day"]))
        assert int(got.n_users.sum()) == n_pairs
        diag = got[got.cohort_day == got.activity_day]
        n_users = ev.user_id.nunique()
        assert int(diag.n_users.sum()) == n_users


class TestEventsRollup:
    def test_levels_reconcile(self, ray_session):
        from stac_to_geocore_ray.queries import events_rollup
        got = events_rollup(SF).to_pandas()
        finest = got[got.event_type.notna() & got.day.notna()]
        per_type = got[got.event_type.notna() & got.day.isna()]
        total = got[got.event_type.isna()]
        assert len(total) == 1
        # every level sums to the same totals
        for col in ("n_events", "sum_cents"):
            assert int(finest[col].sum()) == int(total[col].iloc[0])
            assert int(per_type[col].sum()) == int(total[col].iloc[0])
        # per-type rows equal the finest rolled up by type
        ref = finest.groupby("event_type")[["n_events", "sum_cents"]] \
            .sum().reset_index().sort_values("event_type") \
            .reset_index(drop=True)
        cmp = per_type[["event_type", "n_events", "sum_cents"]] \
            .sort_values("event_type").reset_index(drop=True)
        assert cmp.equals(ref)
        # grand total equals the raw table
        ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
        assert int(total.n_events.iloc[0]) == len(ev)


class TestPartsNeverBulkOrdered:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import parts_never_bulk_ordered
        got = parts_never_bulk_ordered(SF).to_pandas() \
            .sort_values("p_brand").reset_index(drop=True)
        part = pd.read_parquet(f"{SF}/part.parquet",
                               columns=["p_partkey", "p_brand"])
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_partkey", "l_quantity"])
        bulk = set(li.loc[li.l_quantity > 45, "l_partkey"])
        surv = part[~part.p_partkey.isin(bulk)]
        ref = surv.groupby("p_brand").size().reset_index(name="n_parts") \
            .sort_values("p_brand").reset_index(drop=True)
        assert got.p_brand.tolist() == ref.p_brand.tolist()
        assert got.n_parts.tolist() == ref.n_parts.tolist()


class TestKeyedBoundaryDecompose:
    """Direct pin of stages/util.keyed_boundary_decompose — the shared
    sort -> interior-kernel -> keyed-fold machinery under the window /
    as-of / retention queries."""

    def test_toy_kernel_matches_pandas(self, ray_session, tiny_blocks):
        import ray.data
        from stac_to_geocore_ray.stages.util import keyed_boundary_decompose
        rng = np.random.default_rng(23)
        n = 8_000
        df = pd.DataFrame({
            "k": rng.integers(0, 300, size=n).astype("int64"),
            "seq": np.arange(n, dtype="int64"),
            "v": rng.integers(-5, 6, size=n).astype("int64")})
        # hot key spanning many sorted blocks
        df.loc[: n // 3, "k"] = 42

        def kernel(g):
            if len(g) == 0:
                return pd.DataFrame({
                    "seq": pd.Series([], dtype="int64"),
                    "k": pd.Series([], dtype="int64"),
                    "cum": pd.Series([], dtype="int64")})
            kv = g.k.to_numpy()
            v = g.v.to_numpy()
            new = np.empty(len(g), dtype=bool)
            new[0] = True
            new[1:] = kv[1:] != kv[:-1]
            idx = np.arange(len(g))
            seg_start = idx[new][np.cumsum(new) - 1]
            total = np.cumsum(v)
            cum = total - (total - v)[seg_start]
            return pd.DataFrame({"seq": g.seq.to_numpy(), "k": kv,
                                 "cum": cum.astype("int64")})

        ds = ray.data.from_pandas(df).repartition(16)
        got = keyed_boundary_decompose(
            ds, sort_keys=["k", "seq"], key_col="k",
            raw_cols=["k", "seq", "v"], kernel=kernel).to_pandas() \
            .sort_values("seq").reset_index(drop=True)

        ref_sorted = df.sort_values(["k", "seq"])
        ref = pd.DataFrame({
            "seq": ref_sorted.seq,
            "k": ref_sorted.k,
            "cum": ref_sorted.groupby("k")["v"].cumsum()}) \
            .sort_values("seq").reset_index(drop=True)
        assert len(got) == len(ref)
        assert (got.seq.to_numpy() == ref.seq.to_numpy()).all()
        assert (got.cum.to_numpy() == ref.cum.to_numpy()).all()


class TestEventsRangeJoin:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import events_range_join
        got = events_range_join(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts"])
        vip = ev[ev.user_id % 50 == 0].groupby("user_id") \
            .agg(lo=("ts", "min"), hi=("ts", "max")).reset_index()
        rows = []
        for _, r in vip.iterrows():
            n = int(((ev.ts >= r.lo) & (ev.ts <= r.hi)).sum())
            rows.append((int(r.user_id), n))
        ref = pd.DataFrame(rows, columns=["user_id", "n_events"]) \
            .sort_values("user_id").reset_index(drop=True)
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert got.n_events.tolist() == ref.n_events.tolist()
        # intervals genuinely overlap events of OTHER users
        assert (got.n_events > 1).any()


class TestQ4OrderPriority:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q4_order_priority
        got = q4_order_priority(SF).to_pandas() \
            .sort_values("o_orderpriority").reset_index(drop=True)
        orders = pd.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority", "o_orderdate"])
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_quantity"])
        window = orders[(orders.o_orderdate >= "1996-01-01")
                        & (orders.o_orderdate < "1996-04-01")]
        bulk = set(li.loc[li.l_quantity > 48, "l_orderkey"])
        surv = window[window.o_orderkey.isin(bulk)]
        ref = surv.groupby("o_orderpriority").size() \
            .reset_index(name="n_orders") \
            .sort_values("o_orderpriority").reset_index(drop=True)
        assert got.o_orderpriority.tolist() == ref.o_orderpriority.tolist()
        assert got.n_orders.tolist() == ref.n_orders.tolist()


class TestQ17SmallQtyRevenue:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q17_small_qty_revenue
        got = q17_small_qty_revenue(SF).to_pandas()
        part = pd.read_parquet(f"{SF}/part.parquet",
                               columns=["p_partkey", "p_brand"])
        li = pd.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"])
        pk = set(part.loc[part.p_brand.isin(["Brand#23", "Brand#42"]),
                          "p_partkey"])
        sub = li[li.l_partkey.isin(pk)]
        avg = sub.groupby("l_partkey")["l_quantity"].mean()
        small = sub[sub.l_quantity
                    < 0.2 * sub.l_partkey.map(avg).to_numpy()]
        cents = (np.floor(np.abs(small.l_extendedprice.to_numpy())
                          * 100.0 + 0.5)
                 * np.sign(small.l_extendedprice.to_numpy())) \
            .astype("int64").sum()
        ref = int(np.sign(cents) * np.floor(abs(cents) / 700.0 + 0.5))
        assert len(got) == 1
        assert int(got.avg_yearly.iloc[0]) == ref


class TestQ13CustomerDistribution:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q13_customer_distribution
        got = q13_customer_distribution(SF).to_pandas() \
            .sort_values("c_count").reset_index(drop=True)
        cust = pd.read_parquet(f"{SF}/customer.parquet",
                               columns=["c_custkey"])
        orders = pd.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"])
        kept = orders[orders.o_orderpriority == "1-URGENT"]
        per_cust = kept.groupby("o_custkey").size()
        c_count = cust.c_custkey.map(per_cust).fillna(0).astype("int64")
        ref = c_count.value_counts().rename_axis("c_count") \
            .reset_index(name="custdist") \
            .sort_values("c_count").reset_index(drop=True)
        assert got.c_count.tolist() == ref.c_count.tolist()
        assert got.custdist.tolist() == ref.custdist.tolist()
        # the LEFT OUTER semantics are actually exercised: some
        # customer placed no qualifying order
        assert 0 in got.c_count.tolist()


class TestQ12PriorityByReturnflag:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q12_priority_by_returnflag
        got = q12_priority_by_returnflag(SF).to_pandas() \
            .sort_values("l_returnflag").reset_index(drop=True)
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_returnflag",
                                      "l_shipdate"])
        orders = pd.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"])
        win = li[(li.l_shipdate >= "1997-01-01")
                 & (li.l_shipdate < "1998-01-01")]
        j = win.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        j["is_high"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"]) \
            .astype("int64")
        ref = j.groupby("l_returnflag").agg(
            high_count=("is_high", "sum"),
            low_count=("is_high", lambda s: int((1 - s).sum()))) \
            .reset_index().sort_values("l_returnflag") \
            .reset_index(drop=True)
        assert got.l_returnflag.tolist() == ref.l_returnflag.tolist()
        assert got.high_count.tolist() == ref.high_count.tolist()
        assert got.low_count.tolist() == ref.low_count.tolist()
        # both CASE branches are non-trivial
        assert (got.high_count > 0).all() and (got.low_count > 0).all()


class TestQ18LargeVolumeCustomers:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q18_large_volume_customers
        got = q18_large_volume_customers(SF).to_pandas()
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_quantity"])
        orders = pd.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_totalprice"])
        cust = pd.read_parquet(f"{SF}/customer.parquet",
                               columns=["c_custkey", "c_name"])
        qty = li.groupby("l_orderkey")["l_quantity"].sum()
        surv = qty[qty > 300].rename("sum_qty").reset_index()
        ref = orders.merge(surv, left_on="o_orderkey",
                           right_on="l_orderkey") \
            .merge(cust, left_on="o_custkey", right_on="c_custkey") \
            .sort_values(["o_totalprice", "o_orderdate", "o_orderkey"],
                         ascending=[False, True, True]).head(100) \
            .reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.o_orderkey.tolist() == ref.o_orderkey.tolist()
        assert got.sum_qty.tolist() == ref.sum_qty.tolist()
        assert got.c_name.tolist() == ref.c_name.tolist()
        assert got.o_totalprice.tolist() == ref.o_totalprice.tolist()


class TestQ2MinCostPart:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q2_min_cost_part
        got = q2_min_cost_part(SF).to_pandas() \
            .sort_values("p_partkey").reset_index(drop=True)
        part = pd.read_parquet(f"{SF}/part.parquet",
                               columns=["p_partkey", "p_brand", "p_size"])
        li = pd.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_suppkey",
                     "l_orderkey"])
        first = li.sort_values(["l_partkey", "l_extendedprice",
                                "l_suppkey", "l_orderkey"]) \
            .drop_duplicates("l_partkey", keep="first")
        small = part[part.p_size <= 5]
        ref = first.merge(small, left_on="l_partkey",
                          right_on="p_partkey") \
            .sort_values("p_partkey").reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.p_partkey.tolist() == ref.p_partkey.tolist()
        assert got.cheapest_supp.tolist() == ref.l_suppkey.tolist()
        assert got.in_order.tolist() == ref.l_orderkey.tolist()
        cents = (np.floor(np.abs(ref.l_extendedprice.to_numpy())
                          * 100.0 + 0.5)
                 * np.sign(ref.l_extendedprice.to_numpy())).astype("int64")
        assert got.min_price_cents.tolist() == cents.tolist()


class TestQ21LateSoleSupplier:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q21_late_sole_supplier
        got = q21_late_sole_supplier(SF).to_pandas()
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_suppkey",
                                      "l_shipdate"])
        orders = pd.read_parquet(f"{SF}/orders.parquet",
                                 columns=["o_orderkey", "o_orderdate"])
        j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        j["late"] = (j.l_shipdate
                     > j.o_orderdate + pd.Timedelta(days=60)).astype(int)
        per_supp = j.groupby(["l_orderkey", "l_suppkey"])["late"].max() \
            .reset_index()
        per_order = per_supp.groupby("l_orderkey").agg(
            n_supp=("l_suppkey", "size"), n_late=("late", "sum"),
            late_supp=("late", lambda s: 0)).reset_index()
        sole = per_supp.merge(per_order, on="l_orderkey")
        sole = sole[(sole.n_supp >= 2) & (sole.n_late == 1)
                    & (sole.late == 1)]
        ref = sole.groupby("l_suppkey").size().reset_index(name="numwait") \
            .sort_values(["numwait", "l_suppkey"],
                         ascending=[False, True]).head(20) \
            .reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.s_suppkey.tolist() == ref.l_suppkey.tolist()
        assert got.numwait.tolist() == ref.numwait.tolist()
        # the multi-existence predicate actually bites: some orders
        # have >=2 suppliers late (excluded) and some exactly one
        assert (per_order.n_late > 1).any()


class TestQ22SalesOpportunity:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q22_sales_opportunity
        got = q22_sales_opportunity(SF).to_pandas() \
            .sort_values("c_mktsegment").reset_index(drop=True)
        cust = pd.read_parquet(f"{SF}/customer.parquet",
                               columns=["c_custkey", "c_acctbal",
                                        "c_mktsegment"])
        orders = pd.read_parquet(f"{SF}/orders.parquet",
                                 columns=["o_custkey", "o_orderpriority"])
        bal = cust.c_acctbal.to_numpy()
        cents = (np.floor(np.abs(bal) * 100.0 + 0.5)
                 * np.sign(bal)).astype("int64")
        cust = cust.assign(cents=cents)
        pos = cust.cents[cust.cents > 0]
        avg_cents = int(pos.sum()) // len(pos)
        urgent = set(orders.loc[orders.o_orderpriority == "1-URGENT",
                                "o_custkey"])
        keep = cust[(cust.cents > avg_cents)
                    & ~cust.c_custkey.isin(urgent)]
        ref = keep.groupby("c_mktsegment").agg(
            n_cust=("cents", "size"), bal_cents=("cents", "sum")) \
            .reset_index().sort_values("c_mktsegment") \
            .reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.c_mktsegment.tolist() == ref.c_mktsegment.tolist()
        assert got.n_cust.tolist() == ref.n_cust.tolist()
        assert got.bal_cents.tolist() == ref.bal_cents.tolist()


class TestDocTfidfTopk:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import doc_tfidf_topk
        got = doc_tfidf_topk(SF).to_pandas() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        n = len(docs)
        toks = docs.assign(token=docs.text.str.lower().str.split()) \
            .explode("token").dropna(subset=["token"])
        tf = toks.groupby(["doc_id", "token"]).size().reset_index(name="tf")
        df = toks.drop_duplicates(["doc_id", "token"]) \
            .groupby("token").size()
        idf = (n << 20) // df
        tf["score"] = tf.tf * tf.token.map(idf)
        tf = tf.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True])
        top = tf.groupby("doc_id").head(3).copy()
        top["rank"] = top.groupby("doc_id").cumcount() + 1
        ref = top[["doc_id", "rank", "token", "score"]] \
            .reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.doc_id.tolist() == ref.doc_id.tolist()
        assert got.token.tolist() == ref.token.tolist()
        assert got.score.tolist() == ref.score.tolist()
        # idf actually discriminates: the top term is not simply the
        # most frequent term for every document
        mf = tf.sort_values(["doc_id", "tf", "token"],
                            ascending=[True, False, True]) \
            .groupby("doc_id").head(1)
        top1 = top[top["rank"] == 1]
        assert (mf.token.to_numpy() != top1.token.to_numpy()).any()


class TestEventsFunnel:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import events_funnel
        from stac_to_geocore_ray.queries.events import FUNNEL_WINDOW_S
        got = events_funnel(SF).to_pandas() \
            .sort_values("step").reset_index(drop=True)
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "event_type"])
        win = pd.Timedelta(seconds=FUNNEL_WINDOW_S)
        t1 = ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
        c = ev[ev.event_type == "click"].copy()
        c["t1"] = c.user_id.map(t1)
        t2 = c[c.ts > c.t1].groupby("user_id")["ts"].min()
        p = ev[ev.event_type == "purchase"].copy()
        p["t2"] = p.user_id.map(t2)
        t3 = p[p.ts > p.t2].groupby("user_id")["ts"].min()
        users = t1.index
        d2 = t2.reindex(users) - t1
        d3 = t3.reindex(users) - t1
        ref = [len(t1), int((d2 <= win).sum()), int((d3 <= win).sum())]
        assert got.step.tolist() == [1, 2, 3]
        assert got.n_users.tolist() == ref
        # the funnel discriminates: monotone, neither empty nor total
        assert ref[0] > ref[1] > ref[2] > 0


class TestDocStratifiedSample:
    def test_rebalances_and_is_deterministic(self, ray_session):
        from stac_to_geocore_ray.queries import doc_stratified_sample
        got = doc_stratified_sample(SF).to_pandas() \
            .set_index("lang")["n_sampled"]
        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "lang"])
        h = (docs.doc_id.to_numpy().astype(np.uint64)
             * np.uint64(2654435761)) % np.uint64(1 << 32)
        thr = np.where(docs.lang.to_numpy() == "en",
                       np.uint64(429496729), np.uint64(2147483648))
        ref = docs[h < thr].groupby("lang").size()
        assert got.sort_index().tolist() == ref.sort_index().tolist()
        # the strata actually rebalance: en dominates the corpus but
        # not the sample
        full = docs.groupby("lang").size()
        assert full.idxmax() == "en"
        assert got.idxmax() != "en"


def _cents_ref(v):
    v = np.asarray(v, dtype=np.float64)
    return (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype("int64")


class TestQ6ForecastRevenue:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q6_forecast_revenue
        got = q6_forecast_revenue(SF).to_pandas()
        li = pd.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_shipdate", "l_discount", "l_quantity",
                     "l_extendedprice"])
        sel = li[(li.l_shipdate >= "1996-01-01")
                 & (li.l_shipdate < "1997-01-01")
                 & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
                 & (li.l_quantity < 24)]
        assert len(sel), "fixture slice must be non-empty"
        cents = _cents_ref(sel.l_extendedprice.to_numpy()
                           * sel.l_discount.to_numpy()).sum()
        ref = int(np.sign(cents) * np.floor(abs(cents) / 100.0 + 0.5))
        assert len(got) == 1
        assert int(got.revenue.iloc[0]) == ref


class TestQ14PromoRevenue:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q14_promo_revenue
        got = q14_promo_revenue(SF).to_pandas()
        part = pd.read_parquet(f"{SF}/part.parquet",
                               columns=["p_partkey", "p_type"])
        li = pd.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice",
                     "l_discount"])
        sel = li[(li.l_shipdate >= "1996-03-01")
                 & (li.l_shipdate < "1996-04-01")].copy()
        sel["cents"] = _cents_ref(sel.l_extendedprice.to_numpy()
                                  * (1 - sel.l_discount.to_numpy()))
        promo_keys = set(part.loc[part.p_type == "PROMO", "p_partkey"])
        promo = int(sel.loc[sel.l_partkey.isin(promo_keys), "cents"].sum())
        total = int(sel.cents.sum())
        ref = (100_000_000 * promo) // total
        assert len(got) == 1
        assert int(got.promo_pct_micro.iloc[0]) == ref
        # the ratio discriminates: neither 0% nor 100%
        assert 0 < ref < 100_000_000


class TestQ19DisjunctiveRevenue:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q19_disjunctive_revenue
        got = q19_disjunctive_revenue(SF).to_pandas()
        part = pd.read_parquet(f"{SF}/part.parquet",
                               columns=["p_partkey", "p_brand", "p_size"])
        li = pd.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_discount"])
        df = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        keep = (
            ((df.p_brand == "Brand#12") & df.p_size.between(1, 5)
             & df.l_quantity.between(1, 11))
            | ((df.p_brand == "Brand#23") & df.p_size.between(1, 10)
               & df.l_quantity.between(10, 20))
            | ((df.p_brand == "Brand#24") & df.p_size.between(1, 15)
               & df.l_quantity.between(20, 30)))
        sel = df[keep]
        assert len(sel), "disjunctive slice must be non-empty"
        cents = _cents_ref(sel.l_extendedprice.to_numpy()
                           * (1 - sel.l_discount.to_numpy())).sum()
        ref = int(np.sign(cents) * np.floor(abs(cents) / 100.0 + 0.5))
        assert len(got) == 1
        assert int(got.revenue.iloc[0]) == ref


class TestQ7VolumeShipping:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q7_volume_shipping
        got = q7_volume_shipping(SF).to_pandas()
        nat = pd.read_parquet(f"{SF}/nation.parquet")
        reg = pd.read_parquet(f"{SF}/region.parquet")
        nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        sup = pd.read_parquet(f"{SF}/supplier.parquet") \
            .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        cus = pd.read_parquet(f"{SF}/customer.parquet") \
            .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        orders = pd.read_parquet(f"{SF}/orders.parquet")
        df = li[(li.l_shipdate >= "1995-01-01")
                & (li.l_shipdate < "1997-01-01")] \
            .merge(sup[sup.r_name == "EUROPE"][["s_suppkey", "n_name"]]
                   .rename(columns={"n_name": "supp_nation"}),
                   left_on="l_suppkey", right_on="s_suppkey") \
            .merge(orders[["o_orderkey", "o_custkey"]],
                   left_on="l_orderkey", right_on="o_orderkey") \
            .merge(cus[cus.r_name == "ASIA"][["c_custkey", "n_name"]]
                   .rename(columns={"n_name": "cust_nation"}),
                   left_on="o_custkey", right_on="c_custkey")
        df["l_year"] = df.l_shipdate.dt.year.astype("int64")
        df["cents"] = _cents_ref(df.l_extendedprice.to_numpy()
                                 * (1 - df.l_discount.to_numpy()))
        ref = df.groupby(["supp_nation", "cust_nation", "l_year"],
                         as_index=False)["cents"].sum()
        c = ref.pop("cents").to_numpy()
        ref["revenue"] = (np.sign(c) * np.floor(np.abs(c) / 100 + 0.5)) \
            .astype("int64")
        ref = ref.sort_values(["supp_nation", "cust_nation", "l_year"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
        # bilateral: several nation pairs and both years appear
        assert got.supp_nation.nunique() >= 2
        assert got.l_year.nunique() == 2


class TestQ8MarketShare:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q8_market_share
        got = q8_market_share(SF).to_pandas()
        nat = pd.read_parquet(f"{SF}/nation.parquet")
        reg = pd.read_parquet(f"{SF}/region.parquet")
        nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        part = pd.read_parquet(f"{SF}/part.parquet")
        sup = pd.read_parquet(f"{SF}/supplier.parquet") \
            .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        cus = pd.read_parquet(f"{SF}/customer.parquet") \
            .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        orders = pd.read_parquet(f"{SF}/orders.parquet")
        df = li.merge(part[part.p_type == "ECONOMY"][["p_partkey"]],
                      left_on="l_partkey", right_on="p_partkey") \
            .merge(sup[["s_suppkey", "n_name"]],
                   left_on="l_suppkey", right_on="s_suppkey") \
            .merge(orders[(orders.o_orderdate >= "1995-01-01")
                          & (orders.o_orderdate < "1997-01-01")]
                   [["o_orderkey", "o_custkey", "o_orderdate"]],
                   left_on="l_orderkey", right_on="o_orderkey") \
            .merge(cus[cus.r_name == "AMERICA"][["c_custkey"]],
                   left_on="o_custkey", right_on="c_custkey")
        df["o_year"] = df.o_orderdate.dt.year.astype("int64")
        df["cents"] = _cents_ref(df.l_extendedprice.to_numpy()
                                 * (1 - df.l_discount.to_numpy()))
        df["nat"] = np.where(df.n_name == "NATION_3", df.cents, 0)
        ref = df.groupby("o_year", as_index=False).agg(
            nat=("nat", "sum"), tot=("cents", "sum"))
        ref["share_micro"] = [(1_000_000 * int(a)) // int(t)
                              for a, t in zip(ref.nat, ref.tot)]
        ref = ref[["o_year", "share_micro"]].sort_values("o_year") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


class TestQ9ProductProfit:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q9_product_profit
        got = q9_product_profit(SF).to_pandas()
        nat = pd.read_parquet(f"{SF}/nation.parquet")
        part = pd.read_parquet(f"{SF}/part.parquet")
        sup = pd.read_parquet(f"{SF}/supplier.parquet") \
            .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        orders = pd.read_parquet(f"{SF}/orders.parquet")
        df = li.merge(part[part.p_name.str.contains("gizmo")]
                      [["p_partkey", "p_retailprice"]],
                      left_on="l_partkey", right_on="p_partkey") \
            .merge(sup[["s_suppkey", "n_name"]],
                   left_on="l_suppkey", right_on="s_suppkey") \
            .merge(orders[["o_orderkey", "o_orderdate"]],
                   left_on="l_orderkey", right_on="o_orderkey")
        df["o_year"] = df.o_orderdate.dt.year.astype("int64")
        amount = (df.l_extendedprice.to_numpy()
                  * (1 - df.l_discount.to_numpy())
                  - 0.1 * df.p_retailprice.to_numpy()
                  * df.l_quantity.to_numpy())
        df["cents"] = _cents_ref(amount)
        ref = df.rename(columns={"n_name": "nation"}) \
            .groupby(["nation", "o_year"], as_index=False)["cents"].sum()
        c = ref.pop("cents").to_numpy()
        ref["profit"] = (np.sign(c) * np.floor(np.abs(c) / 100 + 0.5)) \
            .astype("int64")
        ref = ref.sort_values(["nation", "o_year"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
        assert got.nation.nunique() > 5


class TestQ10ReturnedItems:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q10_returned_items
        got = q10_returned_items(SF).to_pandas()
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        orders = pd.read_parquet(f"{SF}/orders.parquet")
        cust = pd.read_parquet(f"{SF}/customer.parquet")
        nat = pd.read_parquet(f"{SF}/nation.parquet")
        df = li[li.l_returnflag == "R"].merge(
            orders[(orders.o_orderdate >= "1996-07-01")
                   & (orders.o_orderdate < "1996-10-01")],
            left_on="l_orderkey", right_on="o_orderkey")
        df["cents"] = _cents_ref(df.l_extendedprice.to_numpy()
                                 * (1 - df.l_discount.to_numpy()))
        r = df.groupby("o_custkey", as_index=False)["cents"].sum() \
            .sort_values(["cents", "o_custkey"],
                         ascending=[False, True]).head(20)
        c = r.pop("cents").to_numpy()
        r["revenue"] = (np.sign(c) * np.floor(np.abs(c) / 100 + 0.5)) \
            .astype("int64")
        ref = r.rename(columns={"o_custkey": "c_custkey"}) \
            .merge(cust, on="c_custkey") \
            .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        ref = ref[["c_custkey", "c_name", "revenue", "c_acctbal",
                   "n_name"]].sort_values(
            ["revenue", "c_custkey"], ascending=[False, True]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
        assert len(got) == 20


class TestQ15TopSupplier:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q15_top_supplier
        got = q15_top_supplier(SF).to_pandas()
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        sup = pd.read_parquet(f"{SF}/supplier.parquet")
        sel = li[(li.l_shipdate >= "1996-01-01")
                 & (li.l_shipdate < "1996-04-01")].copy()
        sel["cents"] = _cents_ref(sel.l_extendedprice.to_numpy()
                                  * (1 - sel.l_discount.to_numpy()))
        r = sel.groupby("l_suppkey", as_index=False)["cents"].sum()
        best = r.cents.max()
        win = r[r.cents == best].rename(columns={"l_suppkey": "s_suppkey"})
        ref = win.merge(sup[["s_suppkey", "s_name"]], on="s_suppkey")
        c = ref.pop("cents").to_numpy()
        ref["total_revenue"] = (np.sign(c)
                                * np.floor(np.abs(c) / 100 + 0.5)) \
            .astype("int64")
        ref = ref[["s_suppkey", "s_name", "total_revenue"]] \
            .sort_values("s_suppkey").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
        assert len(got) >= 1


class TestQ11ImportantParts:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q11_important_parts
        got = q11_important_parts(SF).to_pandas()
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        sup = pd.read_parquet(f"{SF}/supplier.parquet")
        nat = pd.read_parquet(f"{SF}/nation.parquet")
        reg = pd.read_parquet(f"{SF}/region.parquet")
        europe = set(reg.loc[reg.r_name == "EUROPE", "r_regionkey"])
        nk = set(nat.loc[nat.n_regionkey.isin(europe), "n_nationkey"])
        sk = set(sup.loc[sup.s_nationkey.isin(nk), "s_suppkey"])
        sel = li[li.l_suppkey.isin(sk)].copy()
        sel["cents"] = _cents_ref(sel.l_extendedprice.to_numpy()
                                  * (1 - sel.l_discount.to_numpy()))
        v = sel.groupby("l_partkey", as_index=False)["cents"].sum()
        total, n = int(v.cents.sum()), len(v)
        ref = v[v.cents * 2 * n > 3 * total] \
            .rename(columns={"cents": "value_cents"}) \
            .sort_values("l_partkey").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
        # discriminates: non-empty, non-total
        assert 0 < len(ref) < n


class TestQ16SupplierCount:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q16_supplier_count
        got = q16_supplier_count(SF).to_pandas()
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_partkey", "l_suppkey"])
        part = pd.read_parquet(f"{SF}/part.parquet")
        sup = pd.read_parquet(f"{SF}/supplier.parquet")
        bad = set(sup.loc[sup.s_acctbal < 0, "s_suppkey"])
        df = li[~li.l_suppkey.isin(bad)].merge(
            part[(part.p_brand != "Brand#5")
                 & part.p_size.isin([1, 4, 9, 16, 25])],
            left_on="l_partkey", right_on="p_partkey")
        ref = df.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"] \
            .nunique().reset_index(name="supplier_cnt") \
            .sort_values(["p_brand", "p_type", "p_size"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
        assert len(got) > 0


class TestQ20ExcessShippers:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import q20_excess_shippers
        got = q20_excess_shippers(SF).to_pandas()
        li = pd.read_parquet(f"{SF}/lineitem.parquet")
        part = pd.read_parquet(f"{SF}/part.parquet")
        sup = pd.read_parquet(f"{SF}/supplier.parquet")
        hot = set(part.loc[part.p_name.str.startswith("hot"),
                           "p_partkey"])
        sel = li[li.l_partkey.isin(hot)
                 & (li.l_shipdate >= "1996-01-01")
                 & (li.l_shipdate < "1997-01-01")]
        ps = sel.groupby(["l_partkey", "l_suppkey"], as_index=False) \
            .agg(qty=("l_quantity", "sum"))
        ps["qty"] = ps.qty.round().astype("int64")
        pt = ps.groupby("l_partkey", as_index=False).agg(
            tot=("qty", "sum"))
        j = ps.merge(pt, on="l_partkey")
        winners = sorted(set(j.loc[10 * j.qty > 4 * j.tot, "l_suppkey"]))
        ref = pd.DataFrame({"s_suppkey": winners}).merge(
            sup[["s_suppkey", "s_name"]], on="s_suppkey")
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
        # discriminates: some but not all suppliers dominate a part
        assert 0 < len(ref) < sup.s_suppkey.nunique()

    def test_join_fallback_matches_broadcast_path(self, ray_session,
                                                  monkeypatch):
        # force the wide path (pt "too big to broadcast") and pin it
        # to the broadcast path's output
        from stac_to_geocore_ray.queries import q20_excess_shippers
        broadcast = q20_excess_shippers(SF).to_pandas()
        monkeypatch.setenv("GRAFT_PT_BROADCAST_MAX_ROWS", "0")
        joined = q20_excess_shippers(SF).to_pandas()
        pd.testing.assert_frame_equal(joined, broadcast)


class TestEventsGlobalScan:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_global_scan
        got = events_global_scan(SF).to_pandas() \
            .sort_values("rn").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "ts", "value"])
        ev = ev.sort_values(["ts", "event_id"]).reset_index(drop=True)
        cents = _cents(ev.value.to_numpy())
        ref = pd.DataFrame({
            "event_id": ev.event_id.to_numpy(),
            "rn": np.arange(1, len(ev) + 1, dtype="int64"),
            "run_cents": np.cumsum(cents)})

        assert len(got) == len(ref)
        assert (got.event_id.to_numpy() == ref.event_id.to_numpy()).all()
        assert (got.run_cents.to_numpy() == ref.run_cents.to_numpy()).all()
        # the final running sum is the global total — the scan's
        # cross-block offsets must stitch exactly
        assert got.run_cents.iloc[-1] == cents.sum()

    def test_multi_block_offsets_stitch(self, ray_session, tiny_blocks):
        """With ~16 KiB blocks the sorted stream spans many blocks;
        rn must still be the dense sequence 1..n with no resets."""
        from stac_to_geocore_ray.queries import events_global_scan
        df = events_global_scan(SF).to_pandas().sort_values("rn")
        rn = df.rn.to_numpy()
        assert rn[0] == 1 and rn[-1] == len(df)
        assert (np.diff(rn) == 1).all()


class TestEventsCube:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_cube
        got = events_cube(SF).to_pandas() \
            .sort_values(["etype", "dow"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "ts", "value"])
        base = pd.DataFrame({
            "etype": ev.event_type,
            "dow": ev.ts.dt.dayofweek.astype("int64").astype(str),
            "cents": _cents(ev.value.to_numpy())})
        frames = []
        for cols in (["etype", "dow"], ["etype"], ["dow"], []):
            if cols:
                g = base.groupby(cols, as_index=False).agg(
                    n_events=("cents", "size"), sum_cents=("cents", "sum"))
            else:
                g = pd.DataFrame({"n_events": [len(base)],
                                  "sum_cents": [base.cents.sum()]})
            for m in {"etype", "dow"} - set(cols):
                g[m] = "ALL"
            frames.append(g[["etype", "dow", "n_events", "sum_cents"]])
        ref = pd.concat(frames, ignore_index=True) \
            .sort_values(["etype", "dow"]).reset_index(drop=True)

        assert len(got) == len(ref)
        for c in ("etype", "dow", "n_events", "sum_cents"):
            assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c

    def test_lattice_consistency(self, ray_session):
        """Every coarser level's totals equal the finest level's —
        the invariant the contracted-partial expansion must keep."""
        from stac_to_geocore_ray.queries import events_cube
        df = events_cube(SF).to_pandas()
        fine = df[(df.etype != "ALL") & (df.dow != "ALL")]
        grand = df[(df.etype == "ALL") & (df.dow == "ALL")]
        assert len(grand) == 1
        assert grand.n_events.iloc[0] == fine.n_events.sum()
        assert grand.sum_cents.iloc[0] == fine.sum_cents.sum()
        by_type = df[(df.etype != "ALL") & (df.dow == "ALL")]
        assert by_type.n_events.sum() == grand.n_events.iloc[0]


class TestEventsEwma:
    def test_matches_scalar_reference(self, ray_session, tiny_blocks):
        """Vectorized segmented EWMA == a per-user scalar recurrence
        (the textbook iterative form), under forced-tiny blocks so
        users straddle blocks and exercise the keyed fold."""
        from stac_to_geocore_ray.queries import events_ewma
        from stac_to_geocore_ray.queries.events import EWMA_ALPHA
        got = events_ewma(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "user_id", "ts", "value"])
        ev = ev.sort_values(["user_id", "ts", "event_id"]) \
            .reset_index(drop=True)
        ev["cents"] = _cents(ev.value.to_numpy())
        a = EWMA_ALPHA
        rows = []
        for u, g in ev.groupby("user_id", sort=True):
            # closed form, scalar: (1-a) * sum(v_i * a^(N-i))
            v = g.cents.to_numpy().astype(float)
            e = 0.0
            for i, x in enumerate(v):
                e += x * a ** (len(v) - 1 - i)
            rows.append((u, (1 - a) * e))
        ref = pd.DataFrame(rows, columns=["user_id", "ewma"])
        assert got.user_id.tolist() == ref.user_id.tolist()
        # engine rounds half-away at 6 dp; scalar sum order differs by
        # ulps only (sum bounded by max_cents/(1-a))
        assert np.allclose(got.ewma_r.to_numpy(), ref.ewma.to_numpy(),
                           rtol=0, atol=1e-6)

    def test_recency_weighting(self, ray_session):
        """The last event dominates: a user whose final event is huge
        must have a larger EWMA than the same history without it."""
        from stac_to_geocore_ray.queries import events_ewma
        from stac_to_geocore_ray.queries.events import EWMA_ALPHA
        got = events_ewma(SF).to_pandas().set_index("user_id")
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "event_id", "value"])
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        u = int(ev.user_id.iloc[0])
        last_cents = float(_cents(
            ev[ev.user_id == u].value.to_numpy())[-1])
        # ewma lies between 0 and max cents; last event carries weight
        # (1-a) exactly
        assert 0 <= got.loc[u].ewma_r <= float(
            _cents(ev[ev.user_id == u].value.to_numpy()).max() + 1)
        assert got.loc[u].ewma_r >= (1 - EWMA_ALPHA) * last_cents - 1e-6


class TestEventsRegression:
    def test_matches_scalar_least_squares(self, ray_session, tiny_blocks):
        """Exact-integer sufficient statistics == numpy lstsq per type
        (to float tolerance), under forced-tiny blocks so partials fold
        across many blocks."""
        from stac_to_geocore_ray.queries import events_regression
        from stac_to_geocore_ray.queries.events import REGR_EPOCH
        got = events_regression(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "event_type", "value"])
        epoch = np.datetime64(REGR_EPOCH)
        x = ((ev.ts.dt.floor("h").to_numpy() - epoch)
             // np.timedelta64(1, "h")).astype(np.int64)
        y = _cents(ev.value.to_numpy())
        for _, row in got.iterrows():
            m = (ev.event_type == row.event_type).to_numpy()
            assert row.n == int(m.sum())
            slope, inter = np.polyfit(x[m].astype(float),
                                      y[m].astype(float), 1)
            assert abs(row.slope_micro / 1e6 - slope) < 1e-4
            assert abs(row.intercept_micro / 1e6 - inter) < 1e-2

    def test_degenerate_single_hour(self, ray_session):
        """A type whose events all fall in one hour has zero x-variance:
        slope/intercept must be NULL, not a crash or a garbage value."""
        import pyarrow as pa
        from stac_to_geocore_ray.queries import events_regression
        import pyarrow.parquet as pq
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            t = pa.table({
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(["2024-01-05 10:01", "2024-01-05 10:59",
                                    "2024-01-05 10:30"]).values,
                    pa.timestamp("us")),
                "user_id": pa.array([1, 2, 3], pa.int64()),
                "event_type": pa.array(["x"] * 3, pa.string()),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "props": pa.array(["{}"] * 3, pa.string())})
            pq.write_table(t, os.path.join(d, "events.parquet"))
            out = events_regression(d).to_pandas()
        assert out.n.iloc[0] == 3
        assert pd.isna(out.slope_micro.iloc[0])
        assert pd.isna(out.intercept_micro.iloc[0])


class TestEventsCompactLatest:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        """Keep-last compaction == pandas sort + drop_duplicates(last),
        under forced-tiny blocks so groups straddle blocks and exercise
        the keyed fold."""
        from stac_to_geocore_ray.queries import events_compact_latest
        got = events_compact_latest(SF).to_pandas() \
            .sort_values(["user_id", "event_type"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ref = ev.sort_values(["user_id", "event_type", "ts", "event_id"]) \
            .drop_duplicates(["user_id", "event_type"], keep="last") \
            .sort_values(["user_id", "event_type"]).reset_index(drop=True)
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.last_event_id.tolist() == ref.event_id.tolist()
        assert (got.last_ts.to_numpy().astype("datetime64[us]")
                == ref.ts.to_numpy().astype("datetime64[us]")).all()
        assert got.last_cents.tolist() == _cents(
            ref.value.to_numpy()).tolist()

    def test_one_row_per_group_and_latest_wins(self, ray_session):
        """Output cardinality == distinct (user, type) pairs; every
        kept ts is the group max."""
        from stac_to_geocore_ray.queries import events_compact_latest
        got = events_compact_latest(SF).to_pandas()
        ev = pd.read_parquet(
            f"{SF}/events.parquet",
            columns=["user_id", "event_type", "ts"])
        n_groups = ev.groupby(["user_id", "event_type"]).ngroups
        assert len(got) == n_groups
        gmax = ev.groupby(["user_id", "event_type"])["ts"].max()
        merged = got.set_index(["user_id", "event_type"])["last_ts"]
        assert (merged.sort_index().to_numpy().astype("datetime64[us]")
                == gmax.sort_index().to_numpy().astype("datetime64[us]")).all()


class TestDocSplitLeakfree:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        """Group-consistent split counts == pandas reference, under
        forced-tiny blocks so text groups straddle blocks."""
        from stac_to_geocore_ray.queries import doc_split_leakfree
        from stac_to_geocore_ray.queries.docs import SPLIT_TEST_THRESH
        got = doc_split_leakfree(SF).to_pandas() \
            .sort_values(["lang", "split"]).reset_index(drop=True)

        d = pd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
        rep = d.groupby("text")["doc_id"].transform("min") \
            .to_numpy().astype(np.uint64)
        test = (rep * np.uint64(2654435761)) % np.uint64(1 << 32) \
            < np.uint64(SPLIT_TEST_THRESH)
        d["split"] = np.where(test, "test", "train")
        ref = d.groupby(["lang", "split"]).agg(
            n_docs=("doc_id", "size"), n_texts=("text", "nunique")) \
            .reset_index().sort_values(["lang", "split"]) \
            .reset_index(drop=True)
        assert got.lang.tolist() == ref.lang.tolist()
        assert got.split.tolist() == ref.split.tolist()
        assert got.n_docs.tolist() == ref.n_docs.tolist()
        assert got.n_texts.tolist() == ref.n_texts.tolist()

    def test_no_leakage_and_conservation(self, ray_session):
        """Identical texts never straddle splits (checked via the
        reference assignment being a pure function of the text group),
        and doc counts conserve the corpus."""
        from stac_to_geocore_ray.queries import doc_split_leakfree
        got = doc_split_leakfree(SF).to_pandas()
        d = pd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"])
        assert got.n_docs.sum() == len(d)
        assert got.n_texts.sum() == d.groupby("text").ngroups \
            + 0  # each text counted once per lang it appears in
        assert set(got.split) <= {"train", "test"}


class TestDqValidate:
    def test_matches_pandas_reference(self, ray_session):
        """Every check count == a pandas reference over the raw
        parquet; zero-violation checks stay in the report."""
        from stac_to_geocore_ray.queries import dq_validate
        got = dq_validate(SF).to_pandas().set_index("check_name")

        cust = pd.read_parquet(f"{SF}/customer.parquet")
        orders = pd.read_parquet(f"{SF}/orders.parquet")
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_shipdate"])
        ev = pd.read_parquet(f"{SF}/events.parquet", columns=["props"])
        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["text", "n_chars"])
        assert got.loc["customer_negative_acctbal", "n_violations"] \
            == (cust.c_acctbal < 0).sum()
        assert got.loc["orders_orphan_custkey", "n_violations"] \
            == (~orders.o_custkey.isin(cust.c_custkey)).sum()
        assert got.loc["orders_future_date", "n_violations"] \
            == (orders.o_orderdate > pd.Timestamp("1998-12-31")).sum()
        orphan_keys = set(li.l_orderkey.unique()) \
            - set(orders.o_orderkey.unique())
        assert got.loc["lineitem_orphan_orderkey", "n_violations"] \
            == len(orphan_keys)
        m = li.merge(orders[["o_orderkey", "o_orderdate"]],
                     left_on="l_orderkey", right_on="o_orderkey")
        assert got.loc["lineitem_ship_before_order", "n_violations"] \
            == (m.l_shipdate < m.o_orderdate).sum()
        assert got.loc["events_null_props", "n_violations"] \
            == ev.props.isna().sum()
        assert got.loc["docs_nchars_mismatch", "n_violations"] \
            == (docs.text.str.len() != docs.n_chars).sum()

    def test_detects_planted_violations(self, ray_session, tmp_path):
        """Plant one violation of each single-table class in a tiny
        copy of the tables; every planted defect must be counted."""
        import shutil
        from stac_to_geocore_ray.queries import dq_validate
        for t in ["customer", "orders", "lineitem", "events",
                  "documents", "region", "nation", "supplier", "part",
                  "embeddings"]:
            src = f"{SF}/{t}.parquet"
            if t == "customer":
                df = pd.read_parquet(src)
                df.loc[df.index[0], "c_acctbal"] = -1.0
                df.to_parquet(tmp_path / f"{t}.parquet")
            elif t == "orders":
                df = pd.read_parquet(src)
                # orphan custkey + future date on two distinct rows
                df.loc[df.index[0], "o_custkey"] = 10 ** 12
                df.loc[df.index[1], "o_orderdate"] = \
                    pd.Timestamp("2099-01-01")
                df.to_parquet(tmp_path / f"{t}.parquet")
            elif t == "events":
                df = pd.read_parquet(src)
                df["props"] = df["props"].astype(object)
                df.loc[df.index[0], "props"] = None
                df.to_parquet(tmp_path / f"{t}.parquet")
            elif t == "documents":
                df = pd.read_parquet(src)
                df.loc[df.index[0], "n_chars"] = \
                    int(df.loc[df.index[0], "n_chars"]) + 1
                df.to_parquet(tmp_path / f"{t}.parquet")
            else:
                shutil.copy(src, tmp_path / f"{t}.parquet")
        got = dq_validate(str(tmp_path)).to_pandas() \
            .set_index("check_name")
        assert got.loc["customer_negative_acctbal", "n_violations"] >= 1
        assert got.loc["orders_orphan_custkey", "n_violations"] >= 1
        assert got.loc["orders_future_date", "n_violations"] >= 1
        assert got.loc["events_null_props", "n_violations"] == 1
        assert got.loc["docs_nchars_mismatch", "n_violations"] == 1


class TestPhashHammingSearch:
    def test_matches_bruteforce(self, ray_session):
        """Search output == a brute-force XOR-popcount scan, including
        the dist-0 self rows; every planted exact/1-bit dup of a query
        image must surface."""
        from stac_to_geocore_ray.queries import phash_hamming_search
        from stac_to_geocore_ray.queries.media import (
            PHS_RADIUS, _phs_query_ids)
        from stac_to_geocore_ray.queries._common import _fx
        got = phash_hamming_search(SF).to_pandas() \
            .sort_values(["query_id", "image_id"]).reset_index(drop=True)

        im = pd.read_parquet(_fx(SF)["images"],
                             columns=["image_id", "phash"])
        h = im.phash.to_numpy().astype(np.int64).view(np.uint64)
        qids = [q for q in _phs_query_ids()
                if q in set(im.image_id)]
        rows = []
        qmap = im.set_index("image_id").phash
        for q in qids:
            qh = np.uint64(np.int64(qmap[q]).astype(np.uint64))
            d = np.array([bin(int(x ^ qh)).count("1") for x in h])
            for i in np.flatnonzero(d <= PHS_RADIUS):
                rows.append((q, im.image_id.iloc[i], int(d[i])))
        ref = pd.DataFrame(rows, columns=["query_id", "image_id",
                                          "dist"]) \
            .sort_values(["query_id", "image_id"]).reset_index(drop=True)
        assert got.query_id.tolist() == ref.query_id.tolist()
        assert got.image_id.tolist() == ref.image_id.tolist()
        assert got.dist.tolist() == ref.dist.tolist()
        # self rows present at dist 0
        selfs = got[(got.query_id == got.image_id)]
        assert set(selfs.query_id) == set(qids)
        assert (selfs.dist == 0).all()


class TestSkylineParts:
    def test_matches_bruteforce(self, ray_session, tiny_blocks):
        """Two-level skyline == O(n^2) dominance scan, under forced-
        tiny blocks so the local/global decomposition is exercised."""
        from stac_to_geocore_ray.queries import skyline_parts
        got = skyline_parts(SF).to_pandas() \
            .sort_values("p_partkey").reset_index(drop=True)
        df = pd.read_parquet(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_retailprice",
                                      "p_size"])
        pr = df.p_retailprice.to_numpy()
        sz = df.p_size.to_numpy()
        dominated = np.zeros(len(df), dtype=bool)
        for i in range(len(df)):
            dom = (pr <= pr[i]) & (sz >= sz[i]) \
                & ((pr < pr[i]) | (sz > sz[i]))
            dominated[i] = dom.any()
        ref = df.loc[~dominated].sort_values("p_partkey") \
            .reset_index(drop=True)
        assert got.p_partkey.tolist() == ref.p_partkey.tolist()
        assert got.p_size.tolist() == ref.p_size.tolist()
        assert np.allclose(got.p_retailprice, ref.p_retailprice)

    def test_ties_survive_together(self, ray_session):
        """Synthetic frame: equal (price, size) points both survive;
        same price with smaller size is dominated."""
        import pyarrow as pa
        from stac_to_geocore_ray.queries.tpch import skyline_parts as _  # noqa
        # exercise the kernel directly
        import stac_to_geocore_ray.queries.tpch as t
        batch = pa.table({
            "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "p_retailprice": pa.array([10.0, 10.0, 10.0, 5.0, 20.0]),
            "p_size": pa.array([7, 7, 3, 2, 9], pa.int32())})
        # local kernel is nested; drive via the public query on a tmp
        # parquet instead
        import tempfile, os
        import pyarrow.parquet as pq
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(batch, os.path.join(d, "part.parquet"))
            out = t.skyline_parts(d).to_pandas() \
                .sort_values("p_partkey")
        # dominance: 4 (5.0, 2)? dominated by nothing cheaper with
        # bigger size -> (5.0,2) survives; (10,7) twins survive;
        # (10,3) dominated by (10,7); (20,9) survives
        assert out.p_partkey.tolist() == [1, 2, 4, 5]


class TestEventsAnomalyZscore:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        """Integer-inequality outlier counts == a float pandas z-score
        reference (boundary cases absent at this scale), under forced-
        tiny blocks so stats partials fold across blocks."""
        from stac_to_geocore_ray.queries import events_anomaly_zscore
        got = events_anomaly_zscore(SF).to_pandas() \
            .set_index("event_type").n_outliers
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "event_type", "value"])
        ev["x"] = _cents(ev.value.to_numpy())
        g = ev.groupby("user_id")["x"]
        mu = g.transform("mean")
        sd = g.transform(lambda v: v.std(ddof=0))
        out = (ev.x - mu).abs() > 3 * sd
        ref = ev.loc[out].groupby("event_type").size()
        for et in set(ref.index) | set(got.index):
            assert got.get(et, 0) == ref.get(et, 0), et

    def test_exact_boundary_recheck(self, ray_session, tmp_path):
        """A planted user whose extreme event sits EXACTLY on the 3-sd
        boundary must NOT be flagged (strict >): n=10, nine zeros and
        one value v gives (n*x - sx)^2 == 9*(n*sxx - sx^2) exactly."""
        import shutil
        import pyarrow.parquet as pq
        from stac_to_geocore_ray.queries import events_anomaly_zscore
        # nine 0-cent events + one at v cents: x=v, sx=v, sxx=v^2
        # lhs=(10v-v)^2=81v^2, rhs=9(10v^2-v^2)=81v^2 -> equality
        v = 100
        df = pd.DataFrame({
            "event_id": np.arange(10),
            "ts": pd.date_range("2024-01-01", periods=10, freq="h"),
            "user_id": np.full(10, 7),
            "event_type": ["edge"] * 10,
            "value": [0.0] * 9 + [v / 100.0],
            "props": ["{}"] * 10})
        df.to_parquet(tmp_path / "events.parquet")
        got = events_anomaly_zscore(str(tmp_path)).to_pandas()
        assert got.n_outliers.sum() == 0


class TestMarketBasketPairs:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        """Pair supports == a pandas merge reference under forced-tiny
        blocks (baskets straddle blocks, partial dedup must re-fold)."""
        from stac_to_geocore_ray.queries import market_basket_pairs
        from stac_to_geocore_ray.queries.tpch import BASKET_MINSUP
        got = market_basket_pairs(SF).to_pandas() \
            .sort_values(["pa", "pb"]).reset_index(drop=True)
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"]) \
            .drop_duplicates()
        m = li.merge(li, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        ref = m.groupby(["l_partkey_x", "l_partkey_y"]).size() \
            .reset_index(name="support")
        ref = ref[ref.support >= BASKET_MINSUP] \
            .sort_values(["l_partkey_x", "l_partkey_y"]) \
            .reset_index(drop=True)
        assert got.pa.tolist() == ref.l_partkey_x.tolist()
        assert got.pb.tolist() == ref.l_partkey_y.tolist()
        assert got.support.tolist() == ref.support.tolist()


class TestEventsDenseHourly:
    def test_matches_pandas_and_conserves(self, ray_session, tiny_blocks):
        """Dense grid == pandas resample reference; zero-filled cells
        present; total count conserves the corpus."""
        from stac_to_geocore_ray.queries import events_dense_hourly
        got = events_dense_hourly(SF).to_pandas() \
            .sort_values(["event_type", "hour"]).reset_index(drop=True)
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "ts"])
        ev["hour"] = ev.ts.dt.floor("h")
        hours = pd.date_range(ev.hour.min(), ev.hour.max(), freq="h")
        types = sorted(ev.event_type.unique())
        assert len(got) == len(hours) * len(types)
        assert got.n.sum() == len(ev)
        c = ev.groupby(["event_type", "hour"]).size()
        for _, r in got[got.n > 0].iterrows():
            assert c.loc[(r.event_type, r.hour)] == r.n
        # every type covers the full span with no gaps
        for t in types:
            sub = got[got.event_type == t]
            assert len(sub) == len(hours)
            assert (sub.sort_values("hour").hour.to_numpy()
                    == hours.to_numpy().astype("datetime64[us]")).all()


class TestEventsMedianGap:
    def test_matches_pandas_reference(self, ray_session):
        """Interpolated per-user median gap vs a straight pandas
        groupby-sort reference (the oracle gate pins DuckDB median)."""
        from stac_to_geocore_ray.queries import events_median_gap
        got = events_median_gap(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "user_id", "ts"]) \
            .sort_values(["user_id", "ts", "event_id"])
        ts = ev.ts.to_numpy().astype("datetime64[us]").astype("int64")
        uid = ev.user_id.to_numpy()
        gap = pd.DataFrame({"user_id": uid[1:][uid[1:] == uid[:-1]],
                            "g": (ts[1:] - ts[:-1])[uid[1:] == uid[:-1]]})
        ref = gap.groupby("user_id")["g"].median().reset_index(
            name="median_gap_us")
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert np.array_equal(got.median_gap_us.to_numpy(),
                              ref.median_gap_us.to_numpy())

    def test_single_event_users_emit_no_row(self, ray_session):
        from stac_to_geocore_ray.queries import events_median_gap
        got = events_median_gap(SF).to_pandas()
        ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
        multi = ev.user_id.value_counts()
        assert set(got.user_id) == set(multi[multi >= 2].index)


class TestGraphTriangles:
    @staticmethod
    def _ref(sf):
        """Brute-force per-node triangle counts on the co-purchase graph."""
        li = pd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"]) \
            .drop_duplicates()
        m = li.merge(li, on="l_orderkey")
        e = m[m.l_partkey_x < m.l_partkey_y] \
            .drop_duplicates(["l_partkey_x", "l_partkey_y"])
        eset = set(zip(e.l_partkey_x, e.l_partkey_y))
        from collections import Counter, defaultdict
        adj = defaultdict(set)
        for a, b in eset:
            adj[a].add(b)
            adj[b].add(a)
        cnt = Counter()
        for a, b in eset:
            for c in adj[a] & adj[b]:
                if c > b:                      # a < b < c exactly once
                    cnt[a] += 1
                    cnt[b] += 1
                    cnt[c] += 1
        return cnt

    def test_broadcast_matches_bruteforce(self, ray_session):
        from stac_to_geocore_ray.queries import graph_triangles
        got = graph_triangles(SF).to_pandas()
        ref = self._ref(SF)
        assert dict(zip(got.node, got.t)) == dict(ref)

    def test_fallback_parity(self, ray_session, monkeypatch):
        """The shuffle-cogroup confirm (no broadcast) is bit-identical
        to the broadcast confirm."""
        import os
        from stac_to_geocore_ray.queries import graph_triangles
        a = graph_triangles(SF).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        monkeypatch.setenv("GRAFT_TRI_FORCE_FALLBACK", "1")
        b = graph_triangles(SF).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert a.equals(b)


class TestGraphPagerank:
    def test_matches_numpy_power_iteration(self, ray_session):
        from stac_to_geocore_ray.queries import graph_pagerank
        from stac_to_geocore_ray.queries.tpch import PR_DAMP, PR_ITERS
        got = graph_pagerank(SF).to_pandas() \
            .sort_values("node").reset_index(drop=True)

        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"]) \
            .drop_duplicates()
        m = li.merge(li, on="l_orderkey")
        e = m[m.l_partkey_x < m.l_partkey_y] \
            .drop_duplicates(["l_partkey_x", "l_partkey_y"])
        nodes = np.unique(np.r_[e.l_partkey_x.to_numpy(),
                                e.l_partkey_y.to_numpy()])
        a = np.searchsorted(nodes, e.l_partkey_x.to_numpy())
        b = np.searchsorted(nodes, e.l_partkey_y.to_numpy())
        n = len(nodes)
        deg = np.bincount(np.r_[a, b], minlength=n).astype(float)
        r = np.full(n, 1.0 / n)
        for _ in range(PR_ITERS):
            rd = r / deg
            acc = np.zeros(n)
            np.add.at(acc, a, rd[b])
            np.add.at(acc, b, rd[a])
            r = (1 - PR_DAMP) / n + PR_DAMP * acc
        ref = np.floor(r * 1e6 + 0.5) / 1e6
        assert got.node.to_numpy().tolist() == nodes.tolist()
        assert np.allclose(got.pagerank.to_numpy(), ref, rtol=0, atol=0)

    def test_mass_conserved(self, ray_session):
        from stac_to_geocore_ray.queries import graph_pagerank
        got = graph_pagerank(SF).to_pandas()
        assert abs(got.pagerank.sum() - 1.0) < 1e-3


class TestGraphBfsHops:
    def test_matches_bruteforce_bfs(self, ray_session):
        """Hop distances from the min node == a collections.deque BFS
        over the same co-purchase edge set, bounded at BFS_MAX_HOPS."""
        from stac_to_geocore_ray.queries import graph_bfs_hops
        from stac_to_geocore_ray.queries.tpch import BFS_MAX_HOPS
        got = graph_bfs_hops(SF).to_pandas() \
            .sort_values("node").reset_index(drop=True)

        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"]) \
            .drop_duplicates()
        m = li.merge(li, on="l_orderkey")
        e = m[m.l_partkey_x < m.l_partkey_y] \
            .drop_duplicates(["l_partkey_x", "l_partkey_y"])
        from collections import defaultdict, deque
        adj = defaultdict(set)
        for a, b in zip(e.l_partkey_x, e.l_partkey_y):
            adj[a].add(b)
            adj[b].add(a)
        src = int(e.l_partkey_x.min())
        ref = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if ref[u] >= BFS_MAX_HOPS:
                continue
            for v in adj[u]:
                if v not in ref:
                    ref[v] = ref[u] + 1
                    q.append(v)
        assert dict(zip(got.node, got.dist)) == ref

    def test_depth_bound_on_path_graph(self, ray_session, tmp_path):
        """A 10-node path graph reaches exactly BFS_MAX_HOPS nodes past
        the source; the tail beyond the bound is absent (the contract
        that also caps the oracle's recursive CTE)."""
        from stac_to_geocore_ray.queries import graph_bfs_hops
        from stac_to_geocore_ray.queries.tpch import BFS_MAX_HOPS
        # order i holds parts {i, i+1}: edges 0-1, 1-2, ..., 8-9
        df = pd.DataFrame({
            "l_orderkey": np.repeat(np.arange(9), 2),
            "l_partkey": np.r_[[[i, i + 1] for i in range(9)]].ravel()})
        df.to_parquet(tmp_path / "lineitem.parquet")
        got = graph_bfs_hops(str(tmp_path)).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert got.node.tolist() == list(range(BFS_MAX_HOPS + 1))
        assert got.dist.tolist() == list(range(BFS_MAX_HOPS + 1))


class TestDocBm25:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        """Top-k == a straight pandas implementation of the exact
        rational BM25 (k1=6/5, b=3/4, integer-scaled idf), under
        forced-tiny blocks so per-batch top-k contraction must re-fold."""
        from stac_to_geocore_ray.queries import doc_bm25
        from stac_to_geocore_ray.queries.docs import BM25_TERMS, BM25_TOPK
        got = doc_bm25(SF).to_pandas()

        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        toks = docs.text.str.lower().str.split()
        dl = toks.str.len().fillna(0).astype(int)
        n = len(docs)
        T = int(dl.sum())
        ex = toks.explode().dropna()
        long = pd.DataFrame({"row": ex.index, "token": ex.to_numpy()})
        long = long[long.token.isin(BM25_TERMS)]
        df_map = long.drop_duplicates().token.value_counts().to_dict()
        tf = long.groupby(["row", "token"]).size().reset_index(name="tf")
        score = {}
        for r, t, f in zip(tf.row, tf.token, tf.tf):
            idf = (n << 10) // df_map[t]
            s = (idf * f * 22 * T) // (10 * f * T + 3 * T
                                       + 9 * int(dl[r]) * n)
            d = int(docs.doc_id.iloc[r])
            score[d] = score.get(d, 0) + s
        ref = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
        ref = ref[:BM25_TOPK]
        assert list(zip(got.doc_id, got.score)) == ref
        assert got["rank"].tolist() == list(range(1, len(ref) + 1))

    def test_null_and_empty_text_rows_are_safe(self, ray_session,
                                               tmp_path):
        """Null / empty / no-hit texts neither crash nor shift the
        row-alignment of scored docs."""
        from stac_to_geocore_ray.queries import doc_bm25
        df = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [None, "", "quiet words only",
                     "join stream join filter"],
            "lang": ["en"] * 4, "source": ["s"] * 4,
            "n_chars": [0, 0, 16, 23]})
        df.to_parquet(tmp_path / "documents.parquet")
        got = doc_bm25(str(tmp_path)).to_pandas()
        assert got.doc_id.tolist() == [4]
        assert (got.score > 0).all()


class TestEventsTwap:
    def test_matches_pandas_reference(self, ray_session):
        """Per-user time-weighted average value vs a straight pandas
        lead-weighted reference (the oracle gate pins DuckDB lead())."""
        from stac_to_geocore_ray.queries import events_twap
        got = events_twap(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)

        ev = pd.read_parquet(
            f"{SF}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"]) \
            .sort_values(["user_id", "ts", "event_id"])
        ts = ev.ts.to_numpy().astype("datetime64[us]").astype("int64")
        uid = ev.user_id.to_numpy()
        cents = np.floor(ev.value.to_numpy() * 100 + 0.5)
        same = uid[1:] == uid[:-1]
        w = (ts[1:] - ts[:-1])[same].astype(np.float64)
        d = pd.DataFrame({"user_id": uid[:-1][same],
                          "wv": cents[:-1][same] * w, "w": w})
        s = d.groupby("user_id").sum()
        s = s[s.w > 0]
        ref = np.floor(s.wv.to_numpy() / s.w.to_numpy() * 1e6 + 0.5) / 1e6
        assert got.user_id.tolist() == s.index.tolist()
        assert np.array_equal(got.twap_r.to_numpy(), ref)

    def test_zero_weight_users_emit_no_row(self, ray_session):
        """Single-event users have no lead pair and must emit no row."""
        from stac_to_geocore_ray.queries import events_twap
        got = events_twap(SF).to_pandas()
        ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
        multi = ev.user_id.value_counts()
        assert set(got.user_id) <= set(multi[multi >= 2].index)
        assert len(got) > 0


class TestEventsTypeUnpivot:
    def test_round_trip_equals_long_groupby(self, ray_session):
        """pivot -> melt must equal the direct long-form GROUP BY
        (zero cells dropped, out-of-domain types excluded)."""
        from stac_to_geocore_ray.queries import PIVOT_TYPES, \
            events_type_unpivot
        got = events_type_unpivot(SF).to_pandas() \
            .sort_values(["user_id", "event_type"]).reset_index(drop=True)
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "event_type", "value"])
        ev = ev[ev.event_type.isin(PIVOT_TYPES)].copy()
        ev["cents"] = np.floor(ev.value.to_numpy() * 100 + 0.5) \
            .astype("int64")
        ref = ev.groupby(["user_id", "event_type"]).agg(
            n=("cents", "size"), cents=("cents", "sum")).reset_index() \
            .sort_values(["user_id", "event_type"]).reset_index(drop=True)
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.n.tolist() == ref.n.tolist()
        assert got.cents.tolist() == ref.cents.tolist()


class TestEventsRollingSum:
    def test_matches_pandas_rolling(self, ray_session):
        """Bounded-frame rolling sum vs pandas groupby.rolling."""
        from stac_to_geocore_ray.queries import events_rolling_sum
        from stac_to_geocore_ray.queries.events import ROLL_K
        got = events_rolling_sum(SF).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        ev = pd.read_parquet(
            f"{SF}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"]) \
            .sort_values(["user_id", "ts", "event_id"])
        ev["cents"] = np.floor(ev.value.to_numpy() * 100 + 0.5) \
            .astype("int64")
        ref = ev.groupby("user_id", sort=False)["cents"] \
            .rolling(ROLL_K + 1, min_periods=1).sum() \
            .reset_index(level=0, drop=True).astype("int64")
        ev["roll_cents"] = ref
        ev = ev.sort_values("event_id").reset_index(drop=True)
        assert got.event_id.tolist() == ev.event_id.tolist()
        assert got.roll_cents.tolist() == ev.roll_cents.tolist()


class TestEmbeddingDimStats:
    def test_matches_numpy_reference(self, ray_session):
        from stac_to_geocore_ray.queries import embedding_dim_stats
        got = embedding_dim_stats(SF).to_pandas()
        emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                              columns=["embedding"])
        m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        def r6(x):
            return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
        assert got.dim.tolist() == list(range(1, m.shape[1] + 1))
        assert (got.n.to_numpy() == m.shape[0]).all()
        assert np.allclose(got.mean_r.to_numpy(), r6(m.mean(axis=0)),
                           atol=2e-6)
        assert np.allclose(got.meansq_r.to_numpy(),
                           r6((m * m).mean(axis=0)), atol=2e-6)


class TestEventsTrajectory:
    """Per-user trajectory summary vs a per-user scalar replay, with
    tiny blocks so boundary users exercise the keyed fold."""

    def _ref(self):
        from stac_to_geocore_ray.stages.knn import haversine_km
        ev = pd.read_parquet(
            SF + "/events.parquet",
            columns=["event_id", "user_id", "ts"]) \
            .sort_values(["user_id", "ts", "event_id"])
        rows = []
        for uid, g in ev.groupby("user_id"):
            eid = g.event_id.to_numpy().astype(np.int64)
            if len(eid) < 2:
                continue
            lon = (eid * 2654435761) % 3600000 / 10000.0 - 180.0
            lat = (eid * 40503) % 1800000 / 10000.0 - 90.0
            legs = [int(np.floor(float(haversine_km(
                lat[i], lon[i], lat[i + 1], lon[i + 1])) * 1e4 + 0.5))
                for i in range(len(eid) - 1)]
            track = sum(legs)
            if track <= 0:
                continue
            disp = int(np.floor(float(haversine_km(
                lat[0], lon[0], lat[-1], lon[-1])) * 1e4 + 0.5))
            rows.append((uid, len(legs), track, disp,
                         np.floor(disp / track * 1e6 + 0.5) / 1e6))
        return pd.DataFrame(rows, columns=[
            "user_id", "n_legs", "track_dmm", "disp_dmm", "straight_r"]) \
            .sort_values("user_id").reset_index(drop=True)

    def test_matches_scalar_replay(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_trajectory
        got = events_trajectory(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        ref = self._ref()
        assert len(got) == len(ref)
        for c in ("user_id", "n_legs", "track_dmm", "disp_dmm"):
            assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c
        assert np.array_equal(got.straight_r.to_numpy(),
                              ref.straight_r.to_numpy())

    def test_straightness_bounds(self, ray_session):
        """Geodesic triangle inequality: net displacement never exceeds
        the track (up to the 0.1-m per-leg rounding grain)."""
        from stac_to_geocore_ray.queries import events_trajectory
        df = events_trajectory(SF).to_pandas()
        slack = df.n_legs.to_numpy() + 1     # one rounding ulp per leg
        assert (df.disp_dmm.to_numpy()
                <= df.track_dmm.to_numpy() + slack).all()
        assert (df.n_legs > 0).all() and (df.track_dmm > 0).all()


class TestEventsIntervalUnion:
    """Gaps-and-islands interval union vs a per-user scalar sweep."""

    def _ref(self):
        ev = pd.read_parquet(
            SF + "/events.parquet",
            columns=["event_id", "user_id", "ts", "value"])
        ev["s"] = ev.ts.to_numpy().astype("datetime64[us]").astype("int64")
        ev["e"] = ev.s + np.floor(
            ev.value.to_numpy() * 100 + 0.5).astype("int64") * 1_000_000
        rows = []
        for uid, g in ev.sort_values(["s", "event_id"]).groupby("user_id"):
            islands, cur_s, cur_e = [], None, None
            for s, e in zip(g.s, g.e):
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        islands.append(cur_e - cur_s)
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            islands.append(cur_e - cur_s)
            rows.append((uid, len(islands), sum(islands)))
        return pd.DataFrame(rows, columns=[
            "user_id", "n_islands", "covered_us"]) \
            .sort_values("user_id").reset_index(drop=True)

    def test_matches_scalar_sweep(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_interval_union
        got = events_interval_union(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        ref = self._ref()
        assert len(got) == len(ref)
        for c in ("user_id", "n_islands", "covered_us"):
            assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c

    def test_bounds(self, ray_session):
        """Union never exceeds the raw duration sum; islands never
        exceed the event count."""
        from stac_to_geocore_ray.queries import events_interval_union
        got = events_interval_union(SF).to_pandas()
        ev = pd.read_parquet(SF + "/events.parquet",
                             columns=["user_id", "value"])
        ev["dur"] = np.floor(ev.value.to_numpy() * 100 + 0.5) \
            .astype("int64") * 1_000_000
        raw = ev.groupby("user_id").agg(
            n=("dur", "size"), total=("dur", "sum"))
        j = got.set_index("user_id").join(raw)
        assert (j.covered_us <= j.total).all()
        assert (j.n_islands <= j.n).all()
        assert (j.covered_us > 0).all()


class TestEventsMaxConcurrent:
    def _ref(self):
        ev = pd.read_parquet(SF + "/events.parquet",
                             columns=["ts", "value"])
        s = ev.ts.to_numpy().astype("datetime64[us]").astype("int64")
        e = s + np.floor(ev.value.to_numpy() * 100 + 0.5) \
            .astype("int64") * 1_000_000
        t = np.concatenate([s, e])
        dkey = np.concatenate([np.zeros(len(s), np.int8),
                               np.ones(len(e), np.int8)])
        order = np.lexsort((dkey, t))
        run = np.cumsum(np.where(dkey[order] == 0, 1, -1))
        i = int(np.argmax(run))
        return int(run[i]), int(t[order][i])

    def test_matches_scalar_sweep(self, ray_session, tiny_blocks):
        """The distributed prefix scan (per-block summaries + driver
        carry) equals a single-array sweep — tiny blocks force many
        carry segments."""
        from stac_to_geocore_ray.queries import events_max_concurrent
        got = events_max_concurrent(SF).to_pandas()
        max_open, at_t = self._ref()
        assert len(got) == 1
        assert int(got.max_open.iloc[0]) == max_open
        assert int(got.at_t_us.iloc[0]) == at_t


class TestDocBigrams:
    def test_matches_scalar_count(self, ray_session, tiny_blocks):
        from collections import Counter

        from stac_to_geocore_ray.queries import doc_bigrams
        got = doc_bigrams(SF).to_pandas()
        docs = pd.read_parquet(SF + "/documents.parquet",
                               columns=["text"])
        c = Counter()
        for t in docs.text:
            toks = t.lower().split()
            c.update(zip(toks, toks[1:]))
        ref = sorted(((-n, w1, w2) for (w1, w2), n in c.items()))[:50]
        assert [(-n, w1, w2) for w1, w2, n in
                got[["w1", "w2", "n"]].itertuples(index=False)] == ref


class TestEventsModeType:
    def test_matches_pandas_mode(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_mode_type
        got = events_mode_type(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        ev = pd.read_parquet(SF + "/events.parquet",
                             columns=["user_id", "event_type"])
        c = ev.groupby(["user_id", "event_type"]).size() \
            .reset_index(name="n") \
            .sort_values(["user_id", "n", "event_type"],
                         ascending=[True, False, True])
        ref = c.groupby("user_id", sort=True).first().reset_index()
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert got.mode_type.tolist() == ref.event_type.tolist()
        assert got.n_mode.tolist() == ref.n.tolist()


class TestEventsAttribution:
    def test_matches_scalar_lookback(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_attribution
        from stac_to_geocore_ray.queries.events import ATTRIB_WINDOW_US
        got = events_attribution(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        ev = pd.read_parquet(
            SF + "/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"]) \
            .sort_values(["user_id", "ts", "event_id"])
        rows = []
        for uid, g in ev.groupby("user_id"):
            t = g.ts.to_numpy().astype("datetime64[us]").astype("int64")
            ty = g.event_type.to_numpy()
            nb = na = 0
            for i in range(len(g)):
                if ty[i] != "purchase":
                    continue
                nb += 1
                clicks = [t[j] for j in range(i) if ty[j] == "click"]
                if clicks and t[i] - max(clicks) <= ATTRIB_WINDOW_US:
                    na += 1
            if nb:
                rows.append((uid, nb, na))
        ref = pd.DataFrame(rows, columns=[
            "user_id", "n_purchases", "n_attributed"])
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert got.n_purchases.tolist() == ref.n_purchases.tolist()
        assert got.n_attributed.tolist() == ref.n_attributed.tolist()


class TestEventsOuterJoinDays:
    def test_matches_pandas_outer(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_outer_join_days
        got = events_outer_join_days(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        ev = pd.read_parquet(SF + "/events.parquet",
                             columns=["user_id", "ts", "event_type"])
        ev["day"] = ev.ts.to_numpy().astype("datetime64[us]") \
            .astype("int64") // 86_400_000_000
        c = ev[ev.event_type == "click"].groupby(
            ["user_id", "day"]).size().rename("nc")
        b = ev[ev.event_type == "purchase"].groupby(
            ["user_id", "day"]).size().rename("nb")
        j = pd.concat([c, b], axis=1)          # outer on the MultiIndex
        ref = pd.DataFrame({
            "uid": j.index.get_level_values(0),
            "co": (j.nc.notna() & j.nb.isna()).astype("int64"),
            "bo": (j.nc.isna() & j.nb.notna()).astype("int64"),
            "bb": (j.nc.notna() & j.nb.notna()).astype("int64")}) \
            .reset_index(drop=True) \
            .groupby("uid", as_index=False).sum() \
            .rename(columns={"uid": "user_id"})
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert got.d_click_only.tolist() == ref.co.tolist()
        assert got.d_buy_only.tolist() == ref.bo.tolist()
        assert got.d_both.tolist() == ref.bb.tolist()
        # both dangling sides genuinely occur in the fixture
        assert got.d_click_only.sum() > 0 and got.d_buy_only.sum() > 0


class TestEmbeddingPQ:
    def test_codes_are_nearest_by_construction(self, ray_session):
        """Every assigned code is the argmin distance to its subspace
        codebook (re-derive the trained codebooks by replaying the
        rounds through the golden spec is the oracle's job; here we
        check the assignment invariant + code range)."""
        from stac_to_geocore_ray.queries import embedding_pq
        from stac_to_geocore_ray.queries.embeddings import PQ_K, PQ_M
        got = embedding_pq(SF).to_pandas()
        assert len(got) == len(got.vec_id.unique())
        for m in range(PQ_M):
            c = got[f"c{m}"]
            assert c.between(0, PQ_K - 1).all()
        # compression actually uses the codebook: more than one code
        # per subspace on real data
        assert sum(got[f"c{m}"].nunique() > 1 for m in range(PQ_M)) >= 3


class TestEventsTypeTransitions:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_type_transitions
        got = events_type_transitions(SF).to_pandas() \
            .sort_values(["prev_type", "event_type"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "user_id", "ts",
                                      "event_type"])
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        prev = ev.groupby("user_id")["event_type"].shift(1)
        ref = pd.DataFrame({"prev_type": prev,
                            "event_type": ev["event_type"]}) \
            .dropna().groupby(["prev_type", "event_type"],
                              as_index=False).size() \
            .rename(columns={"size": "n_trans"})
        tot = ref.groupby("prev_type")["n_trans"].transform("sum")
        p = ref["n_trans"].to_numpy() / tot.to_numpy()
        ref["p_r"] = np.sign(p) * np.floor(np.abs(p) * 1e6 + 0.5) / 1e6
        ref = ref.sort_values(["prev_type", "event_type"]) \
            .reset_index(drop=True)

        assert got.prev_type.tolist() == ref.prev_type.tolist()
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.n_trans.tolist() == ref.n_trans.tolist()
        assert got.p_r.tolist() == ref.p_r.tolist()
        # probabilities row-normalize exactly
        s = got.groupby("prev_type")["p_r"].sum()
        assert ((s - 1.0).abs() < 1e-4).all()
        # pairs never cross users: total transitions = n - n_users
        n = len(ev)
        nu = ev.user_id.nunique()
        assert got.n_trans.sum() == n - nu


class TestEmbeddingPCA:
    def test_exact_vs_single_pass_reference(self, ray_session, tiny_blocks):
        """Independent single-pass int64 moment computation (no fold,
        one einsum) -> same exact covariance -> same eigh -> projections
        must match the engine's distributed two-pass result EXACTLY
        (tiny blocks force a real multi-block fold)."""
        from stac_to_geocore_ray.queries import embedding_pca
        from stac_to_geocore_ray.queries.embeddings import PCA_SCALE
        got = embedding_pca(SF).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)

        emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        m = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
        xi = (np.sign(m) * np.floor(np.abs(m) * PCA_SCALE + 0.5)) \
            .astype(np.int64)
        n, d = xi.shape
        S = xi.sum(axis=0)
        G = np.einsum("ni,nj->ij", xi, xi)
        C = (float(n) * G - np.outer(S, S).astype(np.float64)) \
            / (float(n) * float(n) * float(PCA_SCALE) ** 2)
        w, v = np.linalg.eigh(C)
        comps = []
        for k in (1, 2):
            vec = v[:, -k].copy()
            top = int(np.argmax(np.abs(vec)))
            if vec[top] < 0:
                vec = -vec
            comps.append((np.sign(vec) * np.floor(
                np.abs(vec) * PCA_SCALE + 0.5)).astype(np.int64))
        V = np.stack(comps, axis=1)
        proj = xi @ V
        ref = pd.DataFrame({"vec_id": emb.vec_id.to_numpy(),
                            "p1": proj[:, 0], "p2": proj[:, 1]}) \
            .sort_values("vec_id").reset_index(drop=True)
        assert got.vec_id.tolist() == ref.vec_id.tolist()
        assert got.p1.tolist() == ref.p1.tolist()
        assert got.p2.tolist() == ref.p2.tolist()
        # PCA invariants: top component dominates, projections decorrelated
        p1 = got.p1.to_numpy(dtype=np.float64)
        p2 = got.p2.to_numpy(dtype=np.float64)
        assert p1.var() >= p2.var() > 0
        r = np.corrcoef(p1, p2)[0, 1]
        assert abs(r) < 0.02


class TestDocLMScore:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import doc_lm_score
        got = doc_lm_score(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        toks = {int(r.doc_id): str(r.text).lower().split()
                for r in docs.itertuples() if r.text is not None}
        from collections import Counter
        cnt = Counter()
        vocab = set()
        for t in toks.values():
            vocab.update(t)
            cnt.update(zip(t[:-1], t[1:]))
        ctx = Counter()
        for (w1, _), c in cnt.items():
            ctx[w1] += c
        V = len(vocab)
        rows = []
        for did, t in sorted(toks.items()):
            if len(t) < 2:
                continue
            m = len(t) - 1
            hsum = -sum(np.log2((cnt[(a, b)] + 1.0) / (ctx[a] + V))
                        for a, b in zip(t[:-1], t[1:]))
            h = hsum / m
            rows.append((did, m,
                         np.sign(h) * np.floor(abs(h) * 1e4 + 0.5) / 1e4))
        ref = pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "h_r"])
        assert got.doc_id.tolist() == ref.doc_id.tolist()
        assert got.n_bigrams.tolist() == ref.n_bigrams.tolist()
        assert np.allclose(got.h_r, ref.h_r, rtol=0, atol=1e-4 + 1e-9)
        # LM sanity: every doc's bits/bigram is positive and below
        # the add-one uniform ceiling log2(V + max ctx)
        assert (got.h_r > 0).all()
        assert (got.h_r < np.log2(V + max(ctx.values()))).all()


class TestDocWeightedSample:
    def test_matches_reference_and_weighting_bias(self, ray_session,
                                                  tiny_blocks):
        from stac_to_geocore_ray.queries import doc_weighted_sample
        from stac_to_geocore_ray.queries.docs import WSAMPLE_K
        got = doc_weighted_sample(SF).to_pandas()

        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        w = docs.text.fillna("").str.lower().str.split().str.len() \
            .to_numpy(dtype=np.int64)
        ids = docs.doc_id.to_numpy(dtype=np.int64)
        keep = w >= 1
        ids, w = ids[keep], w[keep]
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        key = -np.log((h.astype(np.float64) + 1.0)
                      / float((1 << 32) + 1)) / w
        order = np.lexsort((ids, key))[:WSAMPLE_K]
        assert got.doc_id.tolist() == ids[order].tolist()
        assert got.w.tolist() == w[order].tolist()
        assert got["rank"].tolist() == list(range(1, len(order) + 1))
        # E-S property: the weighted sample is biased toward heavy
        # docs — sample mean weight beats the corpus mean
        assert got.w.mean() > w.mean()


class TestEventsKSDrift:
    def test_matches_scipy_style_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_ks_drift
        from stac_to_geocore_ray.queries.events import KS_TYPE_A, KS_TYPE_B
        got = events_ks_drift(SF).to_pandas()
        assert len(got) == 1

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "value"])
        ca = np.sort(_cents(ev.loc[ev.event_type == KS_TYPE_A, "value"]))
        cb = np.sort(_cents(ev.loc[ev.event_type == KS_TYPE_B, "value"]))
        n1, n2 = len(ca), len(cb)
        # reference: evaluate both ECDFs at every observed point
        xs = np.unique(np.r_[ca, cb])
        fa = np.searchsorted(ca, xs, side="right")
        fb = np.searchsorted(cb, xs, side="right")
        dnum = np.abs(fa * n2 - fb * n1)
        k = int(np.argmax(dnum))
        assert got.n1.iloc[0] == n1 and got.n2.iloc[0] == n2
        assert got.d_num.iloc[0] == dnum[k]
        assert got.at_cents.iloc[0] == xs[k]
        d = dnum[k] / (n1 * n2)
        assert abs(got.d_r.iloc[0] - np.floor(d * 1e6 + 0.5) / 1e6) < 1e-12
        # D statistic is a genuine probability distance
        assert 0 <= got.d_r.iloc[0] <= 1


class TestEventsChangepoint:
    def test_matches_pandas_reference_and_planted_shift(self, ray_session,
                                                        tiny_blocks):
        from stac_to_geocore_ray.queries import events_changepoint
        got = events_changepoint(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "event_type", "value"])
        ev["hour"] = ev.ts.dt.floor("h")
        ev["cents"] = _cents(ev.value.to_numpy())
        rows = []
        for et, g in ev.groupby("event_type", sort=True):
            hh = g.groupby("hour", sort=True)["cents"].sum()
            s = hh.to_numpy(dtype=np.int64).cumsum()
            n = len(s)
            k = np.arange(1, n + 1, dtype=np.int64)
            dev = np.abs(s * n - k * s[-1])
            i = int(np.argmax(dev))
            rows.append((et, n, hh.index[i], int(dev[i])))
        ref = pd.DataFrame(rows, columns=["event_type", "n_hours",
                                          "split_hour", "dev_num"])
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.n_hours.tolist() == ref.n_hours.tolist()
        assert got.split_hour.tolist() == ref.split_hour.tolist()
        assert got.dev_num.tolist() == ref.dev_num.tolist()
        # a synthetic step change is located exactly
        hours = pd.date_range("2026-01-01", periods=100, freq="h")
        vals = np.r_[np.full(60, 10.0), np.full(40, 20.0)]
        df = pd.DataFrame({"ts": hours, "event_type": "x", "value": vals})
        s = _cents(vals).cumsum()
        k = np.arange(1, 101)
        i = int(np.argmax(np.abs(s * 100 - k * s[-1])))
        assert i == 59          # deviation peaks at the last pre-shift hour


class TestEventsHourlyQuantiles:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_hourly_quantiles
        got = events_hourly_quantiles(SF).to_pandas() \
            .sort_values("hour").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "value"])
        ev["hour"] = ev.ts.dt.floor("h")
        ev["cents"] = _cents(ev.value.to_numpy())
        rows = []
        for hr, g in ev.groupby("hour", sort=True):
            c = np.sort(g.cents.to_numpy())
            n = len(c)
            rows.append((hr, n,
                         int(c[int(np.ceil(0.5 * n)) - 1]),
                         int(c[int(np.ceil(0.95 * n)) - 1])))
        ref = pd.DataFrame(rows, columns=["hour", "n",
                                          "p50_cents", "p95_cents"])
        assert got.hour.tolist() == ref.hour.tolist()
        assert got.n.tolist() == ref.n.tolist()
        assert got.p50_cents.tolist() == ref.p50_cents.tolist()
        assert got.p95_cents.tolist() == ref.p95_cents.tolist()
        assert (got.p95_cents >= got.p50_cents).all()


class TestDocContainment:
    def test_pigeonhole_recall_and_reference(self, ray_session,
                                             tiny_blocks):
        """Brute-force scalar reference over every ordered doc pair;
        the prefix-filtered engine must find the identical set — the
        pigeonhole anchor bound (rarest floor(n/10)+1 shingles) is an
        EXACT recall guarantee, not a heuristic."""
        from stac_to_geocore_ray.queries import doc_containment
        from stac_to_geocore_ray.queries.docs import CONT_THRESHOLD
        from stac_to_geocore_ray.stages.dedup import _shingle_hashes
        got = doc_containment(SF).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)

        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        sets = {int(r.doc_id):
                np.unique(_shingle_hashes(
                    (r.text or "")).view(np.int64))
                for r in docs.itertuples()}
        rows = []
        ids = sorted(sets)
        for a in ids:
            for b in ids:
                sa, sb = sets[a], sets[b]
                if a == b or len(sa) >= len(sb):
                    continue
                ni = len(np.intersect1d(sa, sb, assume_unique=True))
                c = ni / max(1, len(sa))
                if c >= CONT_THRESHOLD:
                    rows.append((a, b,
                                 np.floor(c * 1e4 + 0.5) / 1e4))
        ref = pd.DataFrame(rows, columns=["a", "b", "cont_r"]) \
            .sort_values(["a", "b"]).reset_index(drop=True)
        assert len(ref) > 0                    # fixture has real signal
        assert got.a.tolist() == ref.a.tolist()
        assert got.b.tolist() == ref.b.tolist()
        assert got.cont_r.tolist() == ref.cont_r.tolist()


class TestEventsODMatrix:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_od_matrix
        from stac_to_geocore_ray.queries.events import OD_CELL_U
        got = events_od_matrix(SF).to_pandas() \
            .sort_values(["o_cell", "d_cell"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "event_id"])
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        ev["day"] = ev.ts.dt.floor("D")
        eid = ev.event_id.to_numpy().astype(np.int64)
        x = (eid * 2654435761) % 3600000 * 100
        y = (eid * 40503) % 1800000 * 100
        ev["cell"] = (x // OD_CELL_U) * 18 + (y // OD_CELL_U)
        g = ev.groupby(["user_id", "day"])["cell"]
        ref = pd.DataFrame({"o_cell": g.first(), "d_cell": g.last()}) \
            .groupby(["o_cell", "d_cell"]).size().reset_index(
            name="n_trips") \
            .sort_values(["o_cell", "d_cell"]).reset_index(drop=True)
        assert got.o_cell.tolist() == ref.o_cell.tolist()
        assert got.d_cell.tolist() == ref.d_cell.tolist()
        assert got.n_trips.tolist() == ref.n_trips.tolist()
        # total trips = number of distinct user-days
        assert got.n_trips.sum() == len(g.first())


class TestRevenueGini:
    def test_matches_reference_and_bounds(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import revenue_gini
        got = revenue_gini(SF).to_pandas()
        assert len(got) == 1

        o = pd.read_parquet(f"{SF}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])
        o["cents"] = _cents(o.o_totalprice.to_numpy())
        rev = o.groupby("o_custkey")["cents"].sum() \
            .reset_index().sort_values(["cents", "o_custkey"])
        x = rev.cents.to_numpy(dtype=np.int64)
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.int64)
        num = int(((2 * i - n - 1) * x).sum())
        den = int(n) * int(x.sum())
        assert got.n_customers.iloc[0] == n
        assert got.gini_num.iloc[0] == num
        assert got.gini_den.iloc[0] == den
        g = got.gini_r.iloc[0]
        assert 0 <= g < 1
        # equal-revenue and single-whale sanity on the closed form
        xe = np.full(10, 7, dtype=np.int64)
        ie = np.arange(1, 11)
        assert ((2 * ie - 11) * xe).sum() == 0          # perfect equality
        xw = np.r_[np.zeros(9, dtype=np.int64), 100]
        assert ((2 * ie - 11) * xw).sum() / (10 * 100) == 0.9


class TestEventsTypeEntropy:
    def test_matches_reference_and_bounds(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_type_entropy
        got = events_type_entropy(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "user_id"])
        rows = []
        for et, g in ev.groupby("event_type", sort=True):
            c = g.groupby("user_id").size().to_numpy(dtype=np.float64)
            n = c.sum()
            h = np.log2(n) - (c * np.log2(c)).sum() / n
            rows.append((et, int(n), np.floor(h * 1e6 + 0.5) / 1e6))
        ref = pd.DataFrame(rows, columns=["event_type", "n_events",
                                          "entropy_r"])
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.n_events.tolist() == ref.n_events.tolist()
        assert np.allclose(got.entropy_r, ref.entropy_r,
                           rtol=0, atol=2e-6)
        # 0 <= H <= log2(distinct users of the type)
        for et, g in ev.groupby("event_type", sort=True):
            hmax = np.log2(g.user_id.nunique())
            h = float(got.loc[got.event_type == et, "entropy_r"].iloc[0])
            assert -1e-9 <= h <= hmax + 1e-9


class TestEventsSCD2:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_scd2
        got = events_scd2(SF).to_pandas() \
            .sort_values(["user_id", "rn"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "event_id",
                                      "event_type"])
        ev = ev.sort_values(["user_id", "ts", "event_id"]) \
            .reset_index(drop=True)
        rows = []
        for uid, g in ev.groupby("user_id"):
            run_id = (g.event_type != g.event_type.shift()).cumsum()
            runs = g.groupby(run_id).agg(
                event_type=("event_type", "first"),
                valid_from=("ts", "first"),
                run_rows=("ts", "size")).reset_index(drop=True)
            runs["user_id"] = uid
            runs["rn"] = np.arange(1, len(runs) + 1)
            runs["valid_to"] = runs.valid_from.shift(-1)
            rows.append(runs)
        ref = pd.concat(rows, ignore_index=True) \
            .sort_values(["user_id", "rn"]).reset_index(drop=True)
        assert got.user_id.tolist() == ref.user_id.tolist()
        assert got.rn.tolist() == ref.rn.tolist()
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.valid_from.tolist() == ref.valid_from.tolist()
        assert got.run_rows.tolist() == ref.run_rows.tolist()
        gv = pd.to_datetime(got.valid_to)
        rv = pd.to_datetime(ref.valid_to)
        assert gv.isna().tolist() == rv.isna().tolist()
        assert gv.dropna().tolist() == rv.dropna().tolist()
        # every user's last run (and only that one) is open-ended
        assert int(gv.isna().sum()) == got.user_id.nunique()


class TestEventsWindowJoin:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_window_join
        from stac_to_geocore_ray.queries.events import WINDOW_JOIN_US
        got = events_window_join(SF).to_pandas() \
            .sort_values(["a_id", "b_id"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "event_id",
                                      "event_type"])
        a = ev[ev.event_type == "signup"]
        b = ev[ev.event_type == "purchase"]
        m = a.merge(b, on="user_id", suffixes=("_a", "_b"))
        gap = (m.ts_b.astype("int64") - m.ts_a.astype("int64"))
        m = m[(gap >= 0) & (gap < WINDOW_JOIN_US)]
        ref = pd.DataFrame({
            "a_id": m.event_id_a.to_numpy(),
            "b_id": m.event_id_b.to_numpy(),
            "gap_us": (m.ts_b.astype("int64")
                       - m.ts_a.astype("int64")).to_numpy()}) \
            .sort_values(["a_id", "b_id"]).reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.a_id.tolist() == ref.a_id.tolist()
        assert got.b_id.tolist() == ref.b_id.tolist()
        assert got.gap_us.tolist() == ref.gap_us.tolist()


class TestEventsGapFill:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_gap_fill
        got = events_gap_fill(SF).to_pandas() \
            .sort_values(["event_type", "hour"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "event_type", "value"])
        ev["cents"] = _cents(ev.value.to_numpy())
        ev["hi"] = ev.ts.astype("datetime64[us]").astype("int64") \
            // 3_600_000_000
        rows = []
        for et, g in ev.groupby("event_type"):
            s = g.groupby("hi")["cents"].sum()
            for h in range(int(s.index.min()), int(s.index.max()) + 1):
                if h in s.index:
                    rows.append((et, h, int(s[h]), 1, False))
                else:
                    ph = max(i for i in s.index if i < h)
                    nh = min(i for i in s.index if i > h)
                    num = int(s[ph]) * (nh - h) + int(s[nh]) * (h - ph)
                    rows.append((et, h, num, nh - ph, True))
        ref = pd.DataFrame(rows, columns=["event_type", "hi", "fill_num",
                                          "fill_den", "filled"])
        ref["hour"] = (ref.hi * 3_600_000_000).astype("datetime64[us]")
        ref = ref.sort_values(["event_type", "hour"]) \
            .reset_index(drop=True)
        assert len(got) == len(ref)
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.hour.tolist() == ref.hour.tolist()
        assert got.fill_num.tolist() == ref.fill_num.tolist()
        assert got.fill_den.tolist() == ref.fill_den.tolist()
        assert got.filled.tolist() == ref.filled.tolist()
        assert got.filled.any()          # fixture has interior gaps
        # observed rows are exact sums with denominator 1
        assert (got.loc[~got.filled, "fill_den"] == 1).all()


class TestEventsNtile:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_ntile
        from stac_to_geocore_ray.queries.events import NTILE_K
        got = events_ntile(SF).to_pandas() \
            .sort_values("bucket").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "value"])
        ev["cents"] = _cents(ev.value.to_numpy())
        ev = ev.sort_values(["cents", "event_id"]).reset_index(drop=True)
        n = len(ev)
        big, nbig = n // NTILE_K + 1, n % NTILE_K
        r0 = np.arange(n)
        cut = nbig * big
        b = np.where(r0 < cut, r0 // big,
                     nbig + (r0 - cut) // max(1, n // NTILE_K)) + 1
        ev["bucket"] = b
        ref = ev.groupby("bucket", as_index=False).agg(
            n_rows=("cents", "size"), lo_cents=("cents", "min"),
            hi_cents=("cents", "max"))
        assert got.bucket.tolist() == ref.bucket.tolist()
        assert got.n_rows.tolist() == ref.n_rows.tolist()
        assert got.lo_cents.tolist() == ref.lo_cents.tolist()
        assert got.hi_cents.tolist() == ref.hi_cents.tolist()
        # equi-depth: bucket sizes differ by at most one, larger first
        sizes = got.n_rows.to_numpy()
        assert sizes.max() - sizes.min() <= 1
        assert (np.diff(sizes) <= 0).all() or sizes.max() == sizes.min()
        assert sizes.sum() == n


class TestEventsTypeOverlap:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_type_overlap
        got = events_type_overlap(SF).to_pandas() \
            .sort_values(["type_a", "type_b"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "event_type"])
        sets = {t: set(g.user_id) for t, g in ev.groupby("event_type")}
        rows = []
        ts = sorted(sets)
        for i, a in enumerate(ts):
            for b in ts[i + 1:]:
                inter = len(sets[a] & sets[b])
                if inter:
                    rows.append((a, b, len(sets[a]), len(sets[b]),
                                 inter, len(sets[a] | sets[b])))
        ref = pd.DataFrame(rows, columns=["type_a", "type_b", "n_a",
                                          "n_b", "n_inter", "n_union"])
        for c in ref.columns:
            assert got[c].tolist() == ref[c].tolist(), c
        # set identity: |A ∪ B| = |A| + |B| - |A ∩ B| and bounds
        assert (got.n_inter <= got[["n_a", "n_b"]].min(axis=1)).all()
        assert (got.n_union >= got[["n_a", "n_b"]].max(axis=1)).all()


class TestEmbeddingKnnGraph:
    def test_matches_bruteforce_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import embedding_knn_graph
        from stac_to_geocore_ray.queries.embeddings import (
            KNN_GRAPH_K, KNN_GRAPH_SCALE, KNN_NODE_MOD, _half_away_int)
        got = embedding_knn_graph(SF).to_pandas() \
            .sort_values(["src", "rank"]).reset_index(drop=True)

        emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        ids = emb.vec_id.to_numpy().astype(np.int64)
        mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        q = _half_away_int(mat, KNN_GRAPH_SCALE)
        rows = []
        for i in np.flatnonzero(ids % KNN_NODE_MOD == 0):
            dots = q @ q[i]
            cand = sorted(
                ((int(-dots[j]), int(ids[j])) for j in range(len(ids))
                 if ids[j] != ids[i]))[:KNN_GRAPH_K]
            for rk, (nd, vid) in enumerate(cand, 1):
                rows.append((int(ids[i]), vid, -nd, rk))
        ref = pd.DataFrame(rows, columns=["src", "dst", "dot_q", "rank"]) \
            .sort_values(["src", "rank"]).reset_index(drop=True)
        assert len(got) == len(ref)
        for c in ref.columns:
            assert got[c].tolist() == ref[c].tolist(), c
        # every node emits exactly k ranked neighbours, none itself
        assert (got.groupby("src").size() == KNN_GRAPH_K).all()
        assert (got.src != got.dst).all()


class TestEventsMAD:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_mad
        got = events_mad(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "value"])
        ev["cents"] = _cents(ev.value.to_numpy())

        def disc(a, q):                      # quantile_disc on a multiset
            a = np.sort(np.asarray(a, dtype=np.int64))
            return int(a[min(max(int(np.ceil(q * len(a))) - 1, 0),
                             len(a) - 1)])

        rows = []
        for et, g in ev.groupby("event_type", sort=True):
            c = g.cents.to_numpy(dtype=np.int64)
            med = disc(c, 0.5)
            rows.append((et, len(c), med, disc(np.abs(c - med), 0.5)))
        ref = pd.DataFrame(rows, columns=["event_type", "n",
                                          "med_cents", "mad_cents"])
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.n.tolist() == ref.n.tolist()
        assert got.med_cents.tolist() == ref.med_cents.tolist()
        assert got.mad_cents.tolist() == ref.mad_cents.tolist()
        # robust dispersion is positive on the synthetic value mix
        assert (got.mad_cents > 0).all()

    def test_even_odd_and_ties(self, ray_session):
        # even-count multiset: quantile_disc(0.5) takes the LOWER middle
        from stac_to_geocore_ray.queries.events import EVENTS_MAD_SQL  # noqa: F401
        vals = np.array([1, 3, 5, 7], dtype=np.int64)
        c = np.sort(vals)
        r = int(np.ceil(0.5 * len(c))) - 1
        assert c[r] == 3                      # lower middle
        dev = np.sort(np.abs(vals - 3))       # [0, 2, 2, 4]
        assert dev[int(np.ceil(0.5 * 4)) - 1] == 2


class TestEventsTypeCorr:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_type_corr
        got = events_type_corr(SF).to_pandas() \
            .sort_values(["type_a", "type_b"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "event_type", "value"])
        ev["hour"] = ev.ts.dt.floor("h")
        ev["cents"] = _cents(ev.value.to_numpy())
        h = ev.groupby(["event_type", "hour"])["cents"].sum()
        spine = pd.date_range(ev.hour.min(), ev.hour.max(), freq="h")
        types = sorted(ev.event_type.unique())
        mat = pd.DataFrame(0, index=types, columns=spine, dtype="int64")
        for (t, hr), c in h.items():
            mat.loc[t, hr] = c
        rows = []
        for i, a in enumerate(types):
            for b in types[i + 1:]:
                x = mat.loc[a].to_numpy(dtype=np.float64)
                y = mat.loc[b].to_numpy(dtype=np.float64)
                r = np.corrcoef(x, y)[0, 1]
                rows.append((a, b, len(spine), r))
        ref = pd.DataFrame(rows, columns=["type_a", "type_b",
                                          "n_hours", "r"])
        assert got.type_a.tolist() == ref.type_a.tolist()
        assert got.type_b.tolist() == ref.type_b.tolist()
        assert got.n_hours.tolist() == ref.n_hours.tolist()
        # engine r (exact-int statistics) vs numpy corrcoef: same
        # quantity, different float paths — agree to ~1e-9
        assert np.allclose(got.r_r.to_numpy(), ref.r.to_numpy(),
                           rtol=0, atol=1e-6)
        assert (got.r_r.abs() <= 1.0).all()

    def test_planted_correlation_signs(self, ray_session):
        # perfectly correlated / anti-correlated synthetic series
        x = [1, 2, 3, 4, 5]
        y_pos = [2, 4, 6, 8, 10]
        y_neg = [10, 8, 6, 4, 2]
        n = 5
        for y, want in ((y_pos, 1.0), (y_neg, -1.0)):
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx = sum(a * a for a in x)
            syy = sum(b * b for b in y)
            num = n * sxy - sx * sy
            den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
            assert abs(num / den - want) < 1e-12


class TestEventsACF:
    def test_matches_numpy_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_acf
        from stac_to_geocore_ray.queries.events import ACF_LAGS
        got = events_acf(SF).to_pandas() \
            .sort_values(["event_type", "lag"]).reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "event_type", "value"])
        ev["hour"] = ev.ts.dt.floor("h")
        ev["cents"] = _cents(ev.value.to_numpy())
        spine = pd.date_range(ev.hour.min(), ev.hour.max(), freq="h")
        rows = []
        for et in sorted(ev.event_type.unique()):
            g = ev[ev.event_type == et].groupby("hour")["cents"].sum()
            s = g.reindex(spine, fill_value=0).to_numpy(dtype=np.float64)
            for lag in ACF_LAGS:
                if lag >= len(s):
                    continue
                x, y = s[:-lag], s[lag:]
                r = np.corrcoef(x, y)[0, 1]
                rows.append((et, lag, len(x), r))
        ref = pd.DataFrame(rows, columns=["event_type", "lag",
                                          "n_pairs", "r"])
        assert got.event_type.tolist() == ref.event_type.tolist()
        assert got.lag.tolist() == ref.lag.tolist()
        assert got.n_pairs.tolist() == ref.n_pairs.tolist()
        assert np.allclose(got.r_r.to_numpy(), ref.r.to_numpy(),
                           rtol=0, atol=1e-6)

    def test_planted_periodicity(self, ray_session):
        # a pure period-24 series has ACF(24) = 1, ACF(12) < 1
        s = np.tile(np.arange(24, dtype=np.float64), 10)
        x, y = s[:-24], s[24:]
        assert abs(np.corrcoef(x, y)[0, 1] - 1.0) < 1e-12
        x, y = s[:-12], s[12:]
        assert np.corrcoef(x, y)[0, 1] < 1.0


class TestGraphLinkPredict:
    def test_matches_networkx_style_reference(self, ray_session,
                                              tiny_blocks):
        from stac_to_geocore_ray.queries import graph_link_predict
        from stac_to_geocore_ray.queries.tpch import LP_K
        got = graph_link_predict(SF).to_pandas() \
            .sort_values(["pa", "pb"]).reset_index(drop=True)
        assert len(got) == LP_K * (LP_K - 1) // 2

        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"]) \
            .drop_duplicates()
        m = li.merge(li, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        edges = set(map(tuple, m[["l_partkey_x", "l_partkey_y"]]
                        .drop_duplicates().to_numpy()))
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        deg = {n: len(s) for n, s in adj.items()}
        top = sorted(deg, key=lambda n: (-deg[n], n))[:LP_K]
        rows = []
        for i, u in enumerate(sorted(top)):
            for v in sorted(top)[i + 1:]:
                common = adj[u] & adj[v]
                aa = sum(int(np.floor(1e9 / np.log(deg[w]) + 0.5))
                         for w in common)
                rows.append((u, v, deg[u], deg[v], len(common), aa,
                             deg[u] + deg[v] - len(common),
                             int((min(u, v), max(u, v)) in edges)))
        ref = pd.DataFrame(rows, columns=got.columns.tolist()) \
            .sort_values(["pa", "pb"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64"), ref.astype("int64"))
        # the hub pairs share neighbors: some pair must overlap
        assert got.cn.max() > 0
        # AA is monotone with CN when all centers have equal degree;
        # in general cn=0 must force aa_fp=0
        assert (got.loc[got.cn == 0, "aa_fp"] == 0).all()


class TestDocPMICollocations:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from collections import Counter

        from stac_to_geocore_ray.queries import doc_pmi_collocations
        from stac_to_geocore_ray.queries.docs import PMI_K, PMI_MIN_SUP
        got = doc_pmi_collocations(SF).to_pandas()
        assert len(got) <= PMI_K

        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["text"])
        uni, bi = Counter(), Counter()
        for t in docs.text.dropna():
            toks = t.lower().split()
            uni.update(toks)
            bi.update(zip(toks[:-1], toks[1:]))
        n_uni = sum(uni.values())
        n_bi = sum(bi.values())
        rows = []
        for (w1, w2), c in bi.items():
            if c < PMI_MIN_SUP:
                continue
            val = np.log(((float(c) * n_uni) * n_uni)
                         / ((float(n_bi) * uni[w1]) * uni[w2]))
            rows.append((w1, w2, c,
                         int(np.floor(val * 1e6 + 0.5))))
        ref = pd.DataFrame(rows, columns=["w1", "w2", "n", "pmi_fp"]) \
            .sort_values(["pmi_fp", "w1", "w2"],
                         ascending=[False, True, True]).head(PMI_K) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"n": "int64", "pmi_fp": "int64"}), ref.astype(
                {"n": "int64", "pmi_fp": "int64"}))
        # PMI separates collocations from stopword pairs: the top
        # PMI pair must NOT be the top raw-frequency pair unless the
        # corpus is degenerate; at minimum every reported pair meets
        # the support floor
        assert (got.n >= PMI_MIN_SUP).all()


class TestDocInvertedIndex:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import doc_inverted_index
        from stac_to_geocore_ray.queries.docs import IDX_POSTINGS_CAP
        got = doc_inverted_index(SF).to_pandas() \
            .sort_values("term").reset_index(drop=True)

        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        inv = {}
        for did, t in zip(docs.doc_id, docs.text):
            if not isinstance(t, str):
                continue
            for w in set(t.lower().split()):
                inv.setdefault(w, []).append(int(did))
        rows = [(w, len(ids),
                 ",".join(map(str, sorted(ids)[:IDX_POSTINGS_CAP])))
                for w, ids in inv.items()]
        ref = pd.DataFrame(rows, columns=["term", "df", "postings"]) \
            .sort_values("term").reset_index(drop=True)
        assert got.term.tolist() == ref.term.tolist()
        assert got["df"].tolist() == ref["df"].tolist()
        assert got.postings.tolist() == ref.postings.tolist()
        # caps bind: no posting string exceeds the cap
        assert got.postings.str.split(",").str.len() \
            .le(IDX_POSTINGS_CAP).all()


class TestGraphKcore:
    def test_hindex_fixpoint_equals_exact_peel(self, ray_session,
                                               tiny_blocks):
        from stac_to_geocore_ray.goldens import golden_graph_kcore
        from stac_to_geocore_ray.queries import graph_kcore
        got = graph_kcore(SF).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        ref = golden_graph_kcore(SF).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        # coreness is bounded by degree and by the max possible core
        assert (got.coreness >= 1).all()

    def test_hindex_on_planted_graph(self):
        # star + triangle: center of star has coreness 1, triangle 2
        # (h-index iteration replayed by hand)
        import heapq
        edges = [(0, 1), (0, 2), (0, 3), (4, 5), (5, 6), (4, 6)]
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        deg = {n: len(s) for n, s in adj.items()}
        heap = [(d, n) for n, d in deg.items()]
        heapq.heapify(heap)
        core, removed, kmax = {}, set(), 0
        while heap:
            d, n = heapq.heappop(heap)
            if n in removed or d != deg[n]:
                continue
            kmax = max(kmax, deg[n])
            core[n] = kmax
            removed.add(n)
            for nb in adj[n]:
                if nb not in removed:
                    deg[nb] -= 1
                    heapq.heappush(heap, (deg[nb], nb))
        assert core == {1: 1, 2: 1, 3: 1, 0: 1, 4: 2, 5: 2, 6: 2}


class TestEventsChisq:
    def test_matches_scipy_style_reference(self, ray_session,
                                           tiny_blocks):
        from stac_to_geocore_ray.queries import events_chisq_independence
        got = events_chisq_independence(SF).to_pandas()
        assert len(got) == 1

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "event_type"])
        tab = pd.crosstab(ev.event_type, ev.ts.dt.hour)
        O = tab.to_numpy(dtype=np.float64)
        R = O.sum(axis=1, keepdims=True)
        C = O.sum(axis=0, keepdims=True)
        N = O.sum()
        E = R * C / N
        chi2 = ((O - E) ** 2 / E).sum()
        assert got.n.iloc[0] == int(N)
        assert got.dof.iloc[0] == (tab.shape[0] - 1) * (tab.shape[1] - 1)
        # fixed-point sum vs float reference: each of the <=120 cells
        # contributes at most 5e-7 of rounding
        assert abs(got.chi2_fp.iloc[0] / 1e6 - chi2) < 1e-4 + 120 * 5e-7

    def test_independent_table_is_near_zero(self):
        # perfectly proportional table -> chi2 exactly 0
        O = np.outer([10, 20, 30], [1, 2, 3, 4])
        R = O.sum(axis=1, keepdims=True)
        C = O.sum(axis=0, keepdims=True)
        N = O.sum()
        d = O * N - R * C
        assert (d == 0).all()


class TestCustomerERClusters:
    def test_matches_union_find_reference(self, ray_session,
                                          tiny_blocks):
        from stac_to_geocore_ray.queries import (customer_er_clusters,
                                                 customer_fuzzy_pairs)
        got = customer_er_clusters(SF).to_pandas() \
            .sort_values("c_custkey").reset_index(drop=True)
        pairs = customer_fuzzy_pairs(SF).to_pandas()

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs.a_custkey, pairs.b_custkey):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        ref = sorted((k, find(k)) for k in parent)
        assert got.c_custkey.tolist() == [k for k, _ in ref]
        assert got.cluster.tolist() == [v for _, v in ref]
        # every cluster label is a member of its own cluster
        labels = set(got.cluster)
        assert labels <= set(got.c_custkey)


class TestEventsNearestJoin:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_nearest_join
        got = events_nearest_join(SF).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet") \
            .sort_values(["user_id", "ts", "event_id"]) \
            .reset_index(drop=True)
        ev["cents"] = _cents(ev.value.to_numpy())
        rows = []
        for uid, g in ev.groupby("user_id"):
            g = g.reset_index(drop=True)
            purch = g[g.event_type == "purchase"]
            for i, r in g[g.event_type == "click"].iterrows():
                prevs = purch[purch.index < i]
                nexts = purch[purch.index > i]
                pts = prevs.iloc[-1] if len(prevs) else None
                nts = nexts.iloc[0] if len(nexts) else None
                if pts is not None and (nts is None or
                        (r.ts - pts.ts) <= (nts.ts - r.ts)):
                    rows.append((r.event_id, uid, r.ts, pts.ts,
                                 float(pts.cents), "prev",
                                 float((r.ts - pts.ts).value // 1000)))
                elif nts is not None:
                    rows.append((r.event_id, uid, r.ts, nts.ts,
                                 float(nts.cents), "next",
                                 float((nts.ts - r.ts).value // 1000)))
                else:
                    rows.append((r.event_id, uid, r.ts, pd.NaT,
                                 np.nan, "none", np.nan))
        ref = pd.DataFrame(rows, columns=got.columns.tolist()) \
            .sort_values("event_id").reset_index(drop=True)
        assert got.event_id.tolist() == ref.event_id.tolist()
        assert got.side.tolist() == ref.side.tolist()
        assert got.nearest_ts.tolist() == ref.nearest_ts.tolist()
        assert np.allclose(got.nearest_cents, ref.nearest_cents,
                           equal_nan=True)
        assert np.allclose(got.delta_us, ref.delta_us, equal_nan=True)
        # ties break to 'prev' and deltas are non-negative
        ok = got.delta_us.dropna()
        assert (ok >= 0).all()


class TestEmbeddingOutliers:
    def test_matches_numpy_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import embedding_outliers
        from stac_to_geocore_ray.queries.embeddings import (
            KNN_GRAPH_SCALE, KNN_NODE_MOD, OUT_K, OUT_TOP)
        got = embedding_outliers(SF).to_pandas()

        emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        ids = emb.vec_id.to_numpy(dtype=np.int64)
        m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        qm = np.sign(m) * np.floor(np.abs(m) * KNN_GRAPH_SCALE + 0.5)
        nodes = ids % KNN_NODE_MOD == 0
        rows = []
        for i in np.nonzero(nodes)[0]:
            d2 = ((qm - qm[i]) ** 2).sum(axis=1)
            d2[i] = np.inf
            kth = np.partition(d2, OUT_K - 1)[OUT_K - 1]
            rows.append((int(ids[i]), int(kth)))
        ref = pd.DataFrame(rows, columns=["vec_id", "d2_k"]) \
            .sort_values(["d2_k", "vec_id"],
                         ascending=[False, True]).head(OUT_TOP) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        # outlier scores descend and are positive
        assert (np.diff(got.d2_k.to_numpy()) <= 0).all()
        assert (got.d2_k > 0).all()


class TestEventsSAX:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_sax
        from stac_to_geocore_ray.queries.events import SAX_SYMS, SAX_W
        got = events_sax(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "event_type", "value"])
        ev["hour"] = ev.ts.dt.floor("h")
        ev["cents"] = _cents(ev.value.to_numpy())
        spine = pd.date_range(ev.hour.min(), ev.hour.max(), freq="h")
        H = len(spine)
        wlen = H // SAX_W
        types = sorted(ev.event_type.unique())
        paa = {}
        for et in types:
            s = ev[ev.event_type == et].groupby("hour")["cents"].sum() \
                .reindex(spine, fill_value=0).to_numpy(np.int64)
            paa[et] = s[:SAX_W * wlen].reshape(SAX_W, wlen).sum(axis=1)
        allv = np.sort(np.concatenate(list(paa.values())))

        def disc(q):
            n = len(allv)
            return int(allv[min(max(int(np.ceil(q * n)) - 1, 0), n - 1)])

        q1, q2, q3 = disc(0.25), disc(0.5), disc(0.75)
        for _, row in got.iterrows():
            v = paa[row.event_type]
            want = "".join(
                SAX_SYMS[0 if x <= q1 else 1 if x <= q2
                         else 2 if x <= q3 else 3] for x in v)
            assert row.sax == want
            assert row.n_windows == SAX_W
            assert row.win_hours == wlen
        # equi-depth: pooled symbol distribution is roughly balanced
        pooled = "".join(got.sax)
        counts = [pooled.count(c) for c in SAX_SYMS]
        assert min(counts) > 0


class TestCustomerERDistributedParity:
    def test_fallback_matches_union_find(self, ray_session):
        # the 30x probe found the a/b contract bug: exercise the
        # distributed path explicitly on the small fixture and demand
        # identical labels to the driver union-find
        import pyarrow as pa

        from stac_to_geocore_ray.queries import customer_fuzzy_pairs
        from stac_to_geocore_ray.stages.dedup import (
            distributed_components, union_find_components)
        pairs = customer_fuzzy_pairs(SF).materialize()
        edges = pairs.map_batches(
            lambda b: pa.table({"a": b["a_custkey"],
                                "b": b["b_custkey"]}),
            batch_format="pyarrow")
        got = distributed_components(edges).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        df = pairs.to_pandas()
        ref = union_find_components(df.a_custkey.tolist(),
                                    df.b_custkey.tolist())
        items = sorted(ref.items())
        assert got.node.tolist() == [k for k, _ in items]
        assert got.label.tolist() == [v for _, v in items]

    def test_wrong_columns_fail_loud(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray.data as rd

        from stac_to_geocore_ray.stages.dedup import \
            distributed_components
        bad = rd.from_arrow(pa.table({"x": [1, 2], "y": [2, 3]}))
        with pytest.raises(Exception, match="a/b"):
            distributed_components(bad).to_pandas()


class TestEmbeddingKnnGraphIVF:
    def test_recall_floor_vs_exact_graph(self, ray_session,
                                         tiny_blocks):
        from stac_to_geocore_ray.queries import (embedding_knn_graph,
                                                 embedding_knn_graph_ivf)
        ivf = embedding_knn_graph_ivf(SF).to_pandas()
        exact = embedding_knn_graph(SF).to_pandas()
        assert len(ivf) > 0
        recalls = []
        for src, g in ivf.groupby("src"):
            ex = set(exact.loc[exact.src == src, "dst"])
            assert ex, "IVF node missing from the exact graph"
            recalls.append(len(set(g.dst) & ex) / len(ex))
        # approximate by construction; the probe=4-of-sqrt(n) regime
        # must keep most true MIPS neighbours
        assert np.mean(recalls) >= 0.6
        # structural invariants: k rows max per src, ranks contiguous,
        # no self edges, dot_q non-increasing within src
        for src, g in ivf.groupby("src"):
            g = g.sort_values("rank")
            assert g["rank"].tolist() == list(range(1, len(g) + 1))
            assert (g.dst != src).all()
            assert (np.diff(g.dot_q.to_numpy()) <= 0).all()


class TestDocCompressRatio:
    def test_matches_scalar_reference_and_flags_repetition(
            self, ray_session, tiny_blocks):
        import zlib

        from stac_to_geocore_ray.queries import doc_compress_ratio
        from stac_to_geocore_ray.queries.docs import CR_REP_FP
        got = doc_compress_ratio(SF).to_pandas() \
            .sort_values("lang").reset_index(drop=True)
        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["lang", "text"])
        acc = {}
        for lang, text in zip(docs.lang, docs.text):
            if not isinstance(text, str) or not text:
                continue
            raw = text.encode("utf-8")
            num = len(zlib.compress(raw, 6)) * 1_000_000
            fp = (2 * num + len(raw)) // (2 * len(raw))
            r = acc.setdefault(lang, [0, 0, 0])
            r[0] += 1
            r[1] += fp
            r[2] += 1 if fp < CR_REP_FP else 0
        ref = pd.DataFrame(
            [(k, *v) for k, v in sorted(acc.items())],
            columns=got.columns.tolist())
        pd.testing.assert_frame_equal(
            got, ref.astype({c: "int64" for c in ref.columns[1:]}))
        # a pathologically repetitive synthetic doc trips the flag
        rep = ("spam " * 500).encode()
        num = len(zlib.compress(rep, 6)) * 1_000_000
        assert (2 * num + len(rep)) // (2 * len(rep)) < CR_REP_FP


class TestEventsForecastBacktest:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_forecast_backtest
        got = events_forecast_backtest(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)

        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["ts", "event_type", "value"])
        ev["hour"] = ev.ts.dt.floor("h")
        ev["cents"] = _cents(ev.value.to_numpy())
        spine = pd.date_range(ev.hour.min(), ev.hour.max(), freq="h")
        rows = []
        for et in sorted(ev.event_type.unique()):
            s = ev[ev.event_type == et].groupby("hour")["cents"].sum() \
                .reindex(spine, fill_value=0).to_numpy(np.int64)
            e1 = np.abs(np.diff(s))
            e24 = np.abs(s[24:] - s[:-24])
            rows.append((et, len(e1), int(e1.sum()),
                         len(e24), int(e24.sum())))
        ref = pd.DataFrame(rows, columns=got.columns.tolist()) \
            .astype({c: "int64" for c in got.columns[1:]})
        pd.testing.assert_frame_equal(got, ref)

    def test_seasonal_series_prefers_snaive(self):
        # planted period-24 series: seasonal-naive error is exactly 0
        s = np.tile(np.arange(24, dtype=np.int64) * 100, 10)
        assert np.abs(s[24:] - s[:-24]).sum() == 0
        assert np.abs(np.diff(s)).sum() > 0


class TestCustomerRFM:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import customer_rfm
        got = customer_rfm(SF).to_pandas().reset_index(drop=True)

        o = pd.read_parquet(f"{SF}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_totalprice"])
        o["cents"] = _cents(o.o_totalprice.to_numpy())
        c = o.groupby("o_custkey").agg(
            last_date=("o_orderdate", "max"),
            n_orders=("o_orderdate", "size"),
            cents=("cents", "sum")).reset_index()
        anchor = c.last_date.max()
        c["r_days"] = ((anchor - c.last_date).dt.total_seconds()
                       // 86400).astype("int64")

        def disc(a, q):
            s = np.sort(np.asarray(a))
            return int(s[min(max(int(np.ceil(q * len(s))) - 1, 0),
                             len(s) - 1)])

        def code(a, qs, asc):
            a = np.asarray(a)
            c4 = np.where(a <= qs[0], 1, np.where(a <= qs[1], 2,
                          np.where(a <= qs[2], 3, 4)))
            return c4 if asc else 5 - c4

        rq = [disc(c.r_days, x) for x in (0.25, 0.5, 0.75)]
        fq = [disc(c.n_orders, x) for x in (0.25, 0.5, 0.75)]
        mq = [disc(c.cents, x) for x in (0.25, 0.5, 0.75)]
        rfm = (code(c.r_days, rq, False) * 100
               + code(c.n_orders, fq, True) * 10
               + code(c.cents, mq, True))
        ref = pd.DataFrame({
            "c_custkey": c.o_custkey.astype("int64"),
            "r_days": c.r_days.astype("int64"),
            "n_orders": c.n_orders.astype("int64"),
            "cents": c.cents.astype("int64"),
            "rfm": rfm.astype("int64")}) \
            .sort_values("c_custkey").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        # codes span the quartile range and best-best-best exists
        assert got.rfm.between(111, 444).all()


class TestBasketRules:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import basket_rules
        from stac_to_geocore_ray.queries.tpch import (BASKET_MINSUP,
                                                      RULE_MIN_CONF_FP)
        got = basket_rules(SF).to_pandas() \
            .sort_values(["antecedent", "consequent"]) \
            .reset_index(drop=True)

        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_partkey"]) \
            .drop_duplicates()
        m = li.merge(li, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        pc_ = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
        supp = li.groupby("l_partkey").size().to_dict()
        N = li.l_orderkey.nunique()
        rows = []
        for (a, b), nab in pc_.items():
            if nab < BASKET_MINSUP:
                continue
            for ante, cons in ((a, b), (b, a)):
                na, nc = supp[ante], supp[cons]
                conf = (2 * nab * 1_000_000 + na) // (2 * na)
                lift = ((2 * nab * N * 1_000_000 + na * nc)
                        // (2 * na * nc))
                if conf >= RULE_MIN_CONF_FP:
                    rows.append((ante, cons, nab, na, conf, lift))
        ref = pd.DataFrame(rows, columns=got.columns.tolist()) \
            .sort_values(["antecedent", "consequent"]) \
            .reset_index(drop=True) \
            .astype({c: "int64" for c in got.columns})
        pd.testing.assert_frame_equal(got, ref)
        # lift > 1e6 means positively associated; the strongest rule
        # must clear independence
        assert got.lift_fp.max() > 1_000_000


class TestEventsProfile:
    def test_matches_pandas_reference(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import events_profile
        got = events_profile(SF).to_pandas().set_index("column")

        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev["value_cents"] = _cents(ev.value.to_numpy())
        for col in ("event_id", "user_id", "value_cents"):
            r = got.loc[col]
            assert r.n == len(ev)
            assert r.n_null == int(ev[col].isna().sum())
            assert r.n_distinct == ev[col].nunique()
            assert r.min_v == float(ev[col].min())
            assert r.max_v == float(ev[col].max())
        r = got.loc["event_type"]
        assert r.n_distinct == ev.event_type.nunique()
        assert np.isnan(r.min_v) and np.isnan(r.max_v)
        # event_id is the table key: distinct == rows
        assert got.loc["event_id"].n_distinct == len(ev)
