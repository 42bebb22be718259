"""Property-based tests (hypothesis): random bboxes, dedup idempotence,
cell containment, codec roundtrips (SURVEY.md §5.2 #4, #6)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stac_to_geocore_ray.codecs import fakeimg as fi
from stac_to_geocore_ray.geo import bbox, hexgrid, s2
from stac_to_geocore_ray.stages.geocore import _dedup_keep_last

lat_st = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False,
                   allow_infinity=False, width=64)
lng_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False,
                   allow_infinity=False, width=64)


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lng=lng_st)
def test_s2_hierarchy_containment(lat, lng):
    leaf = s2.latlng_to_cell(np.array([lat]), np.array([lng]))
    for lvl in (3, 9, 20):
        assert s2.parent(leaf, lvl)[0] == s2.latlng_to_cell(
            np.array([lat]), np.array([lng]), lvl)[0]


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lng=lng_st, res=st.integers(min_value=0, max_value=12))
def test_hex_roundtrip_any_res(lat, lng, res):
    c = hexgrid.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    x, y = hexgrid.cell_to_xy(c)
    assert hexgrid.latlng_to_cell(y, x, res)[0] == c[0]
    # the probe point is at hex distance <= 1 from its own cell's
    # center cell (cube rounding can't be off by more than a neighbor)
    c2 = hexgrid.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    assert hexgrid.grid_distance(c, c2)[0] == 0


@settings(max_examples=200, deadline=None)
@given(w=lng_st, s=lat_st, dw=st.floats(0, 2, allow_nan=False),
       dh=st.floats(0, 2, allow_nan=False))
def test_ring_closed_and_wkt_parses(w, s, dw, dh):
    e, n = w + dw, s + dh
    rings = bbox.rings(np.array([w]), np.array([s]), np.array([e]), np.array([n]))
    assert (rings[0, 0] == rings[0, 4]).all()
    [wkt] = bbox.wkt_polygons(np.array([w]), np.array([s]),
                              np.array([e]), np.array([n]))
    assert wkt.startswith("POLYGON((") and wkt.endswith("))")
    pts = wkt[len("POLYGON(("):-2].split(", ")
    assert len(pts) == 5 and pts[0] == pts[4]
    # degenerate bboxes flagged, never crash
    assert bbox.degenerate(np.array([w]), np.array([s]),
                           np.array([e]), np.array([n]))[0] == ((w == e) or (s == n))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=12))
def test_keep_last_dedup_idempotent(keys):
    opts = [{"url": k, "name_en": k, "name_fr": k, "desc_en": k, "desc_fr": k}
            for k in keys]
    once = _dedup_keep_last(opts)
    twice = _dedup_keep_last(once)
    assert once == twice                       # idempotent
    assert len({o["url"] for o in once}) == len(once)   # no dups survive
    # keeps the LAST occurrence order
    seen = {}
    for i, k in enumerate(keys):
        seen[k] = i
    order = [keys[i] for i in sorted(seen.values())]
    assert [o["url"] for o in once] == order


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**63 - 1),
       w=st.integers(min_value=33, max_value=150),
       h=st.integers(min_value=33, max_value=150))
def test_codec_roundtrip_properties(seed, w, h):
    arr = fi.synth_pixels(seed, w, h)
    assert np.array_equal(fi.decode(fi.encode(arr, "png")), arr)
    lossy = fi.decode(fi.encode(arr, "jpeg"))
    assert fi.psnr(arr, lossy) >= 40.0


@settings(max_examples=50, deadline=None)
@given(a=st.integers(min_value=-2**62, max_value=2**62),
       flips=st.sets(st.integers(min_value=0, max_value=63), max_size=3))
def test_phash_banding_pigeonhole(a, flips):
    """<= 3 flipped bits across a 64-bit hash must leave >= 1 of the 4
    16-bit bands identical (the guarantee phash_near_dedup relies on)."""
    b = a
    for f in flips:
        b ^= 1 << f
    shared = 0
    for band in range(4):
        mask = 0xFFFF << (band * 16)
        if (a & mask) == (b & mask):
            shared += 1
    assert shared >= 4 - len(flips)


def _chunk_ref(toks, C=64, S=56):
    n = len(toks)
    if n == 0:
        return []
    nc = 1 if n <= C else -(-(n - C) // S) + 1
    return [(k * S, min(C, n - k * S)) for k in range(nc)]


@settings(max_examples=100, deadline=None)
@given(n=st.integers(min_value=0, max_value=400))
def test_chunking_covers_every_token_with_overlap(n):
    """doc_chunk layout invariants: chunks tile [0, n) with stride-56
    starts, every chunk <= 64 tokens, consecutive chunks overlap by
    exactly 8 (except a short last chunk), and every token index is
    covered >= 1 time."""
    spans = _chunk_ref(list(range(n)))
    if n == 0:
        assert spans == []
        return
    covered = set()
    for st_, ln in spans:
        assert 1 <= ln <= 64
        covered.update(range(st_, st_ + ln))
    assert covered == set(range(n))
    for (s1, l1), (s2, _) in zip(spans, spans[1:]):
        assert s2 - s1 == 56                     # fixed stride
        assert s1 + l1 - s2 in (8, l1 - 56)      # 8-token overlap (full chunks)


@settings(max_examples=100, deadline=None)
@given(sizes=st.lists(st.integers(min_value=0, max_value=700),
                      min_size=1, max_size=60))
def test_greedy_pack_invariants(sizes):
    """doc_pack recurrence: bins fill <= 512 tokens unless a single
    oversized doc occupies the bin alone; bin ids are contiguous from
    0; packing is order-deterministic."""
    bins, b, bt = [], 0, 0
    for i, x in enumerate(sizes):
        if i > 0 and bt + x > 512:
            b, bt = b + 1, 0
        bt += x
        bins.append(b)
    assert bins[0] == 0
    assert all(y - x in (0, 1) for x, y in zip(bins, bins[1:]))
    from collections import defaultdict
    tot = defaultdict(int)
    cnt = defaultdict(int)
    for x, bi in zip(sizes, bins):
        tot[bi] += x
        cnt[bi] += 1
    for bi, t in tot.items():
        assert t <= 512 or cnt[bi] == 1          # overflow only when alone


# round-4 batch-vectorized hash paths must be BIT-IDENTICAL to their
# per-doc scalar definitions on arbitrary inputs (the goldens replay
# the scalar form; any divergence is a silent value-hash flip that
# depends on block boundaries — see the trailing-empty-doc simhash
# regression)
text_st = st.text(
    alphabet=st.characters(codec="utf-8",
                           categories=("L", "N", "P", "Z", "S")),
    max_size=200)


@settings(max_examples=100, deadline=None)
@given(texts=st.lists(text_st, min_size=1, max_size=12))
def test_minhash_batch_bit_identical_to_per_doc(texts):
    from stac_to_geocore_ray.stages.dedup import MinHasher
    mh = MinHasher(num_perm=32, n_bands=8)
    batch = mh.signatures_batch(texts)
    per = np.stack([mh.signature(t) for t in texts])
    assert (batch == per).all()


@settings(max_examples=100, deadline=None)
@given(texts=st.lists(text_st, min_size=1, max_size=12))
def test_simhash_batch_bit_identical_to_per_doc(texts):
    import pyarrow as pa
    from stac_to_geocore_ray.stages.dedup import SimHasher
    sh = SimHasher()
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    assert sh(t)["simhash"].to_pylist() == [sh.simhash(x) for x in texts]


# ---------------------------------------------- round-4 shared kernels

@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_sorted_combine_block_fold_equals_global_groupby(data):
    """Property: for ANY key/value multiset and ANY contiguous block
    split, sorted_combine's per-block combine + boundary fold equals a
    global pandas groupby.  This pins the pure-python core (combine +
    fold semantics) without a Ray session."""
    import numpy as np
    import pandas as pd
    n = data.draw(st.integers(min_value=0, max_value=400))
    keys = data.draw(st.lists(st.integers(0, 30), min_size=n, max_size=n))
    vals = data.draw(st.lists(st.integers(-50, 50), min_size=n, max_size=n))
    df = pd.DataFrame({"k": pd.Series(keys, dtype="int64"),
                       "v": pd.Series(vals, dtype="int64"),
                       "m": pd.Series(vals, dtype="int64")}) \
        .sort_values("k", kind="mergesort").reset_index(drop=True)
    # arbitrary contiguous block split of the sorted frame
    n_cuts = data.draw(st.integers(min_value=0, max_value=6))
    cuts = sorted(data.draw(st.lists(
        st.integers(0, max(n, 1)), min_size=n_cuts, max_size=n_cuts)))
    bounds = [0] + cuts + [n]

    aggs = {"v": "sum", "m": "min"}
    partials = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        block = df.iloc[lo:hi]
        if len(block) == 0:
            continue
        g = block.groupby("k", sort=False, as_index=False).agg(aggs)
        boundary = np.zeros(len(g), dtype=bool)
        boundary[0] = True
        boundary[-1] = True
        g["_b"] = boundary
        partials.append(g)
    if not partials:
        return
    mixed = pd.concat(partials, ignore_index=True)
    finals = mixed.loc[~mixed["_b"], ["k", "v", "m"]]
    folded = mixed.loc[mixed["_b"], ["k", "v", "m"]] \
        .groupby("k", sort=False, as_index=False).agg(aggs)
    got = pd.concat([finals, folded], ignore_index=True) \
        .sort_values("k").reset_index(drop=True)
    ref = df.groupby("k", as_index=False).agg(aggs) \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_window_kernel_segments_never_leak_across_keys(data):
    """Property: the segmented window kernel's lag/cumsum columns are
    exactly the concatenation of independent per-key computations, for
    ANY sorted key/value stream (incl. single-key and all-unique)."""
    import numpy as np
    import pandas as pd
    n = data.draw(st.integers(min_value=1, max_value=300))
    keys = sorted(data.draw(st.lists(st.integers(0, 15),
                                     min_size=n, max_size=n)))
    cents = np.asarray(data.draw(st.lists(st.integers(-99, 99),
                                          min_size=n, max_size=n)),
                       dtype=np.int64)
    uid = np.asarray(keys, dtype=np.int64)
    idx = np.arange(n)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    seg_start = idx[new_user][np.cumsum(new_user) - 1]
    rn = idx - seg_start + 1
    prev = np.empty(n, dtype="float64")
    prev[0] = np.nan
    prev[1:] = cents[:-1]
    prev[new_user] = np.nan
    total = np.cumsum(cents)
    cum = total - (total - cents)[seg_start]

    s = pd.Series(cents)
    g = s.groupby(pd.Series(uid))
    ref_rn = g.cumcount().to_numpy() + 1
    ref_prev = g.shift(1).to_numpy()
    ref_cum = g.cumsum().to_numpy()
    assert (rn == ref_rn).all()
    assert np.allclose(prev, ref_prev, equal_nan=True)
    assert (cum == ref_cum).all()
