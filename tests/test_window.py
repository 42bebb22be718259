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


@pytest.fixture()
def tiny_blocks():
    import ray.data
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024     # ~hundreds of rows/block
    yield
    ctx.target_max_block_size = old


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
