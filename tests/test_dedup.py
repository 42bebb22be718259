"""Dedup operator unit tests (no Ray: pure batch-level semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from stac_to_geocore_ray.stages import dedup


def test_text_hash_stable_and_distinct():
    t = pa.table({"text": ["a", "b", "a"]})
    out = dedup.add_text_hash(t)
    h = out["content_hash"].to_pylist()
    assert h[0] == h[2] and h[0] != h[1]


def test_phash_band_rows_pigeonhole():
    # two hashes at Hamming distance 2 must share >= 2 of 4 bands
    a = 0b1010_1111
    b = a ^ 0b11                             # 2 flipped bits, same low band? no:
    t = pa.table({"image_id": ["a", "b"], "phash": pa.array([a, b], pa.int64())})
    rows = dedup.phash_band_rows(t).to_pandas()
    shared = rows.groupby(["band_id", "band_val"])["image_id"].nunique()
    assert (shared == 2).sum() >= 2


def test_hamming_pairs_in_group():
    g = pd.DataFrame({"image_id": ["x", "y", "z"],
                      "phash": [0b111, 0b110, 0b000]})
    pairs = dedup.hamming_pairs_in_group(g, max_dist=1)
    assert set(zip(pairs.a, pairs.b)) == {("x", "y")}


def test_minhash_similar_texts_share_bands():
    mh = dedup.MinHasher()
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = t1 + "and then naps"
    t3 = "completely different content about spacecraft telemetry " * 5
    s1, s2, s3 = mh.signature(t1), mh.signature(t2), mh.signature(t3)
    sim12 = (s1 == s2).mean()
    sim13 = (s1 == s3).mean()
    assert sim12 > 0.5 > sim13
    assert mh.jaccard(t1, t2) > 0.7
    assert mh.jaccard(t1, t3) < 0.1


def test_minhash_band_rows_shape():
    mh = dedup.MinHasher(num_perm=64, n_bands=16)
    t = pa.table({"doc_id": [1, 2], "text": ["hello world", "hello world"]})
    out = mh(t).to_pandas()
    assert len(out) == 32                    # 16 bands x 2 docs
    merged = out.groupby(["band_id", "band_hash"])["doc_id"].nunique()
    assert (merged == 2).all()               # identical texts share all bands


def test_simhash_properties():
    sh = dedup.SimHasher()
    a = sh.simhash("the quick brown fox jumps over the lazy dog")
    b = sh.simhash("the quick brown fox jumps over the lazy cat")
    c = sh.simhash("entirely unrelated words appear in this sentence")
    from stac_to_geocore_ray.codecs.fakeimg import hamming64
    dab = hamming64(np.array([a]), np.array([b]))[0]
    dac = hamming64(np.array([a]), np.array([c]))[0]
    assert dab < dac
    assert sh.simhash("") == 0


def test_simhash_batch_matches_per_doc_with_empty_docs():
    # regression: a TRAILING token-less doc used to steal the previous
    # doc's last token via the clipped reduceat offset, silently
    # corrupting its neighbour's simhash (block-boundary-dependent)
    sh = dedup.SimHasher()
    cases = [["hello world foo bar", ""],
             ["", "a b", ""],
             ["", "", ""],
             ["one", "", "two three", " .,;"],
             ["tail text then empties", "", ""]]
    for texts in cases:
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        assert sh(t)["simhash"].to_pylist() == \
            [sh.simhash(x) for x in texts], texts


def test_embedding_lsh_buckets_similar_vectors():
    lsh = dedup.EmbeddingLSH(dim=8)
    base = np.random.RandomState(0).normal(size=8)
    t = pa.table({"vec_id": [1, 2, 3],
                  "embedding": [base.tolist(),
                                (base * 1.001).tolist(),
                                (-base).tolist()]})
    out = lsh(t).to_pandas()
    assert out.lsh_bucket[0] == out.lsh_bucket[1]
    assert out.lsh_bucket[0] != out.lsh_bucket[2]


def test_cosine_pairs_in_group():
    base = np.random.RandomState(1).normal(size=8)
    g = pd.DataFrame({"vec_id": [1, 2, 3],
                      "embedding": [base.tolist(), (base * 2).tolist(),
                                    np.random.RandomState(2).normal(size=8).tolist()]})
    pairs = dedup.cosine_pairs_in_group(g, threshold=0.99)
    assert set(zip(pairs.a, pairs.b)) == {(1, 2)}


def test_union_find_components():
    comp = dedup.union_find_components([2, 3, 9], [1, 2, 8])
    assert comp[3] == comp[2] == comp[1] == 1
    assert comp[9] == comp[8] == 8


def test_label_propagation_matches_union_find(ray_session):
    import ray.data as rd
    edges = [{"a": f"n{i+1}", "b": f"n{i}"} for i in range(6)]   # a chain
    edges.append({"a": "z2", "b": "z1"})
    ds = rd.from_items(edges)
    labels = dedup.label_propagation_components(ds).to_pandas()
    got = dict(zip(labels.node, labels.label))
    uf = dedup.union_find_components([e["a"] for e in edges],
                                     [e["b"] for e in edges])
    assert got == uf
    assert got["n5"] == "n0" and got["z2"] == "z1"


def test_label_propagation_pandas_object_blocks(ray_session):
    """Edge sets produced by pandas map_groups stages carry a
    PandasBlockSchema with object-dtype string columns; node-type
    introspection must still resolve (sf1.0 phash_dedup_clusters
    failure mode)."""
    import ray.data as rd
    edges = [("s%02d" % i, "s%02d" % (i + 1)) for i in range(8)]
    src = rd.from_items([{"a": a, "b": b} for a, b in edges],
                        override_num_blocks=3)
    ds = src.map_batches(lambda df: df, batch_format="pandas")
    assert "object" in repr(ds.materialize().schema())   # the trigger
    labels = dedup.label_propagation_components(ds, num_partitions=3) \
        .to_pandas()
    got = dict(zip(labels.node, labels.label))
    uf = dedup.union_find_components([a for a, _ in edges],
                                     [b for _, b in edges])
    assert got == uf


def test_broadcast_components_match_union_find(ray_session):
    """The broadcast-labels path (r4 item #2): identical labels to the
    join path and union-find on a mixed chain + pairs + hub graph,
    including int node ids and multi-block edge sets."""
    import ray.data as rd
    edges = [("c%02d" % i, "c%02d" % (i + 1)) for i in range(12)]
    edges += [("p%02d" % i, "q%02d" % i) for i in range(5)]
    edges += [("hub", "x%02d" % i) for i in range(7)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges],
                       override_num_blocks=5)
    got = dedup.label_propagation_broadcast(ds).to_pandas()
    got = dict(zip(got.node, got.label))
    uf = dedup.union_find_components([a for a, _ in edges],
                                     [b for _, b in edges])
    assert got == uf
    joined = dedup.label_propagation_components(
        rd.from_items([{"a": a, "b": b} for a, b in edges],
                      override_num_blocks=5), num_partitions=3).to_pandas()
    assert dict(zip(joined.node, joined.label)) == uf
    # int ids through the auto dispatcher
    ie = rd.from_items([{"a": i + 1, "b": i} for i in range(9)],
                       override_num_blocks=3)
    gi = dedup.distributed_components(ie).to_pandas()
    assert set(gi.label) == {0} and len(gi) == 10


def test_broadcast_components_random_graphs(ray_session):
    """Randomized parity: broadcast CC == union-find on Erdos-Renyi-ish
    graphs of varying density, including isolated self-edges and int
    ids (seeded; 5 draws)."""
    import numpy as np
    import ray.data as rd
    for seed in range(5):
        rng = np.random.default_rng(seed)
        n_nodes = int(rng.integers(5, 60))
        n_edges = int(rng.integers(1, 3 * n_nodes))
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        ds = rd.from_items([{"a": int(x), "b": int(y)}
                            for x, y in zip(a, b)],
                           override_num_blocks=3)
        got = dedup.label_propagation_broadcast(ds).to_pandas()
        got = dict(zip(got.node, got.label))
        uf = dedup.union_find_components(a.tolist(), b.tolist())
        assert got == uf, f"seed {seed}"


def test_broadcast_components_checkpoint_resume(ray_session, tmp_path):
    """Crash inside the broadcast loop; resume continues from the round
    checkpoint and converges to identical labels; a finished sink
    short-circuits; a foreign edge set is refused."""
    import pandas as pd
    import pytest
    import ray.data as rd
    from stac_to_geocore_ray.state.manifest import ManifestSink

    def edges():
        a = [f"n{i:03d}" for i in range(40)]
        b = [f"n{i + 1:03d}" for i in range(40)]
        return rd.from_items([{"a": x, "b": y} for x, y in zip(a, b)],
                             override_num_blocks=4)

    ref = dedup.label_propagation_broadcast(edges()).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    sink = ManifestSink(str(tmp_path / "ck"))
    with pytest.raises(RuntimeError, match="injected"):
        dedup.label_propagation_broadcast(edges(), checkpoint=sink,
                                          fail_after_rounds=1)
    before = sink.completed()
    assert "lp-r0000" in before and "lp-final" not in before
    got = dedup.label_propagation_broadcast(edges(), checkpoint=sink) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
    after = sink.completed()
    assert "lp-final" in after
    assert after["lp-r0000"] == before["lp-r0000"]   # skipped, not redone
    again = dedup.label_propagation_broadcast(edges(), checkpoint=sink) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(again, ref)
    with pytest.raises(ValueError, match="DIFFERENT edge set"):
        dedup.label_propagation_broadcast(
            rd.from_items([{"a": "p", "b": "q"}]), checkpoint=sink)


def test_broadcast_resumes_from_join_path_checkpoint(ray_session, tmp_path):
    """min-label states form a monotone lattice: a round checkpoint
    written by the JOIN path resumes correctly under the BROADCAST
    path (and converges to the same labels)."""
    import pandas as pd
    import pytest
    import ray.data as rd
    from stac_to_geocore_ray.state.manifest import ManifestSink

    def edges():
        a = [f"m{i:03d}" for i in range(30)]
        b = [f"m{i + 1:03d}" for i in range(30)]
        return rd.from_items([{"a": x, "b": y} for x, y in zip(a, b)],
                             override_num_blocks=3)

    ref = dedup.label_propagation_broadcast(edges()).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    sink = ManifestSink(str(tmp_path / "ck"))
    with pytest.raises(RuntimeError, match="injected"):
        dedup.label_propagation_components(edges(), checkpoint=sink,
                                           fail_after_rounds=1)
    got = dedup.label_propagation_broadcast(edges(), checkpoint=sink) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_label_propagation_multiblock_no_driver_collect(ray_session):
    """Multi-block edge set through the fully-distributed path (joins +
    pointer jumping); labels match union-find and the convergence
    guard does not fire."""
    import ray.data as rd
    edges = [("c%02d" % i, "c%02d" % (i + 1)) for i in range(12)]   # chain
    edges += [("p%02d" % i, "q%02d" % i) for i in range(5)]         # pairs
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges],
                       override_num_blocks=5)
    labels = dedup.label_propagation_components(ds, num_partitions=3) \
        .to_pandas()
    got = dict(zip(labels.node, labels.label))
    uf = dedup.union_find_components([a for a, _ in edges],
                                     [b for _, b in edges])
    assert got == uf
    assert got["c12"] == "c00"


def test_hamming_pairs_lowest_band_dedup():
    """With real band grouping, dedup_band makes the union over all
    (band, value) groups exactly the distinct near-dup pair set: no
    duplicates, nothing missed vs the O(n^2) brute force."""
    rng = np.random.RandomState(11)
    base = rng.randint(-2**62, 2**62, size=30).astype(np.int64)
    hashes = list(base)
    for i in range(0, 30, 5):                # plant near-dups (d<=2)
        hashes.append(np.int64(base[i] ^ (1 << (i % 60))))
    ids = [f"im{k:03d}" for k in range(len(hashes))]
    df = pd.DataFrame({"image_id": ids, "phash": np.array(hashes)})

    tbl = pa.table({"image_id": ids, "phash": np.array(hashes)})
    bands = dedup.phash_band_rows(tbl).to_pandas()
    emitted = []
    for (bid, _), sub in bands.groupby(["band_id", "band_val"], sort=False):
        out = dedup.hamming_pairs_in_group(sub, max_dist=2,
                                           dedup_band=int(bid))
        emitted.extend(zip(out.a, out.b))
    # brute force ground truth
    hs = df.phash.to_numpy()
    want = set()
    from stac_to_geocore_ray.codecs.fakeimg import hamming64
    for i in range(len(df)):
        d = hamming64(np.repeat(hs[i], len(df)), hs)
        for j in np.flatnonzero(d <= 2):
            if j > i:
                lo, hi = sorted((ids[i], ids[j]))
                want.add((lo, hi))
    assert len(emitted) == len(set(emitted)), "duplicate pair emitted"
    assert set(emitted) == want


def test_large_group_banded_path_matches_dense():
    """The sub-band refinement for >threshold groups emits exactly the
    dense sweep's pair set."""
    rng = np.random.RandomState(23)
    width = 16
    shared_band3 = np.uint64(0xABCD) << np.uint64(48)
    low = rng.randint(0, 2**48, size=400).astype(np.uint64)
    hs = (shared_band3 | low).view(np.int64)
    hs = list(hs)
    for i in range(0, 60, 3):                # planted near-dups
        hs.append(np.int64(np.uint64(hs[i]).view(np.int64) ^ (1 << (i % 40))))
    ids = [f"x{k:04d}" for k in range(len(hs))]
    g = pd.DataFrame({"image_id": ids, "phash": np.array(hs, dtype=np.int64)})
    for band in range(4):
        dense = dedup.hamming_pairs_in_group(
            g, max_dist=2, dedup_band=band, large_group_threshold=10**9)
        banded = dedup.hamming_pairs_in_group(
            g, max_dist=2, dedup_band=band, large_group_threshold=10)
        ds_ = set(zip(dense.a, dense.b, dense.dist))
        bs_ = set(zip(banded.a, banded.b, banded.dist))
        assert ds_ == bs_, band
        assert len(banded) == len(bs_)


def test_label_propagation_random_graphs_match_union_find(ray_session):
    """Randomized graphs (mixed component shapes, multi-block edge
    sets) through the distributed path equal driver union-find."""
    import ray.data as rd
    rng = np.random.RandomState(31)
    for trial in range(3):
        edges = []
        # random components: stars, chains, triangles, singleton pairs
        base = 0
        for c in range(rng.randint(3, 7)):
            size = rng.randint(2, 8)
            nodes = [f"t{trial}n{base + i:03d}" for i in range(size)]
            base += size
            shape = rng.randint(3)
            if shape == 0:                    # chain
                edges += list(zip(nodes[:-1], nodes[1:]))
            elif shape == 1:                  # star
                edges += [(nodes[0], x) for x in nodes[1:]]
            else:                             # random tree + extra edge
                for i in range(1, size):
                    edges.append((nodes[rng.randint(i)], nodes[i]))
                if size > 2:
                    edges.append((nodes[0], nodes[-1]))
        rng.shuffle(edges)
        ds = rd.from_items([{"a": a, "b": b} for a, b in edges],
                           override_num_blocks=rng.randint(2, 6))
        got = dedup.label_propagation_components(ds, num_partitions=3) \
            .to_pandas()
        uf = dedup.union_find_components([a for a, _ in edges],
                                         [b for _, b in edges])
        assert dict(zip(got.node, got.label)) == uf, trial


class TestChunkPack:
    """doc_chunk / doc_pack edge semantics (oracle covers the fixture
    path; these pin empty and oversized docs)."""

    def test_chunk_edges(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import pyarrow as pa
        from stac_to_geocore_ray import queries as q
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["", "   ", "w " * 64, "w " * 65],
            "lang": ["en"] * 4})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = q.doc_chunk(str(tmp_path)).to_pandas() \
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        # empty / whitespace-only docs emit NO chunks
        assert set(df.doc_id) == {2, 3}
        # exactly-64 tokens: one chunk
        assert len(df[df.doc_id == 2]) == 1
        # 65 tokens: two chunks, second starts at stride 56 with 9 toks
        d3 = df[df.doc_id == 3]
        assert d3.start_tok.tolist() == [0, 56]
        assert d3.n_tok.tolist() == [64, 9]
        assert d3.chunk_text.iloc[1] == " ".join(["w"] * 9)

    def test_pack_oversized_doc_gets_own_bin(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import pyarrow as pa
        from stac_to_geocore_ray import queries as q
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["w " * 300, "w " * 600, "w " * 300, "w " * 200],
            "lang": ["en"] * 4})
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        df = q.doc_pack(str(tmp_path)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # 300 | 600 (oversized, alone) | 300+200
        assert df.bin_id.tolist() == [0, 1, 2, 2]
        assert df.n_tok.tolist() == [300, 600, 300, 200]


def test_lsh_rep_contraction_matches_bruteforce(ray_session, tmp_path):
    """minhash_neardup / ngram_jaccard_dedup after the distinct-content
    contraction: identical-doc clusters expand to the same pair listing
    a brute-force all-pairs jaccard produces (values exact), and the
    ngram empty-gram exclusion (empty_empty='skip') is preserved for
    clusters of <3-word docs."""
    import math

    import pyarrow.parquet as pq
    from stac_to_geocore_ray import queries as q
    from stac_to_geocore_ray.stages.dedup import MinHasher

    long_a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    long_b = long_a.replace("omicron", "omega")     # ~0.95 char jaccard
    docs = []
    docs += [(10 + i, long_a) for i in range(6)]    # identical cluster X
    docs += [(20 + i, long_b) for i in range(4)]    # identical cluster Y
    docs += [(30 + i, f"unrelated text number {i} with words "
              f"{'x' * (i + 3)} {'y' * (i + 5)} {'z' * (i + 7)}")
             for i in range(6)]                     # singletons
    docs += [(50 + i, "a b") for i in range(3)]     # <3 words: no ngrams
    docs += [(60, ""), (61, "")]                    # empty texts
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs]})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    mh = MinHasher()

    def ngrams(text):
        toks = (text or "").lower().split()
        return {" ".join(toks[i:i + 3]) for i in range(max(0, len(toks) - 2))}

    def brute(feature, skip_empty_empty):
        exp = set()
        for i, (a, ta) in enumerate(docs):
            for b, tb in docs[i + 1:]:
                s1, s2 = feature(ta), feature(tb)
                if not s1 and not s2:
                    if skip_empty_empty:
                        continue
                    j = 1.0
                else:
                    j = len(s1 & s2) / max(1, len(s1 | s2))
                if j >= 0.5:
                    exp.add((min(a, b), max(a, b),
                             math.floor(j * 1e4 + 0.5) / 1e4))
        return exp

    def got(ds):
        out = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
        if isinstance(out, pa.Table):
            out = out.to_pandas()
        return {(int(r.a), int(r.b), float(r.jaccard))
                for r in out.itertuples()}

    def char_shingles(t):
        from stac_to_geocore_ray.stages.dedup import _shingle_hashes
        return set(_shingle_hashes(t, 5).tolist())

    assert got(q.minhash_neardup(str(tmp_path))) == \
        brute(char_shingles, skip_empty_empty=False)
    assert got(q.ngram_jaccard_dedup(str(tmp_path))) == \
        brute(ngrams, skip_empty_empty=True)


def test_hamming_pairs_reps_only_matches_member_level():
    """reps_only emission + member expansion reproduces the member-level
    pair listing exactly (including a hot identical-hash cluster)."""
    rng = np.random.RandomState(5)
    hashes = list(rng.randint(-2**62, 2**62, size=60).astype(np.int64))
    hashes += [hashes[0]] * 7                # hot identical cluster
    hashes += [np.int64(hashes[3] ^ (1 << 17))]   # near pair
    ids = np.arange(len(hashes), dtype=np.int64)
    rng.shuffle(ids)                         # ids not aligned with hashes
    g = pd.DataFrame({"doc_id": ids, "simhash": np.array(hashes)})

    member = dedup.hamming_pairs_in_group(
        g, id_col="doc_id", hash_col="simhash", max_dist=3, dedup_band=0)
    want = set(zip(member.a, member.b, member.dist))

    reps = dedup.hamming_pairs_in_group(
        g, id_col="doc_id", hash_col="simhash", max_dist=3, dedup_band=0,
        reps_only=True)
    # expand inline: each rep row's member cross product, exactly once
    mem = {h: np.sort(ids[np.asarray(hashes) == h]) for h in set(hashes)}
    got = set()
    for a, b, d, ha, hb in zip(reps.a, reps.b, reps.dist,
                               reps.a_h, reps.b_h):
        if a == b:
            ms = mem[ha]
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    assert (ms[i], ms[j], d) not in got
                    got.add((ms[i], ms[j], d))
        else:
            for x in mem[ha]:
                for y in mem[hb]:
                    lo, hi = (x, y) if x <= y else (y, x)
                    assert (lo, hi, d) not in got
                    got.add((lo, hi, d))
    assert got == want
    # rep ids are the min member id of their hash cluster
    for a, ha in zip(reps.a, reps.a_h):
        assert a == mem[ha][0]


def test_expand_member_pairs_range_work_items(ray_session):
    """Hot rows split into (lo, hi) ranges; union of all work items'
    output is the exact pair set, each pair exactly once."""
    from stac_to_geocore_ray.queries import _expand_member_pairs

    mem = {10: np.arange(100, 110, dtype=np.int64),        # 10 members
           20: np.arange(200, 204, dtype=np.int64),        # 4 members
           30: np.arange(300, 305, dtype=np.int64)}        # 5 members
    vt = pa.table({"a": pa.array([100, 200], pa.int64()),
                   "b": pa.array([100, 300], pa.int64()),
                   "dist": pa.array([0, 2], pa.int64()),
                   "a_h": pa.array([10, 20], pa.int64()),
                   "b_h": pa.array([10, 30], pa.int64())})
    # chunk_pairs=7 forces the 45-pair self cluster into ~7 ranges and
    # the 20-pair cross product into several a-side ranges
    out = _expand_member_pairs(vt, mem, pa.int64(),
                               key_a="a_h", key_b="b_h",
                               val_name="dist", val_arrow_type=pa.int64(),
                               chunk_pairs=7).to_pandas()
    got = set(zip(out.a, out.b, out.dist))
    assert len(out) == len(got) == 45 + 20
    want = {(a, b, 0) for i, a in enumerate(range(100, 110))
            for b in list(range(100, 110))[i + 1:]}
    want |= {(a, b, 2) for a in range(200, 204) for b in range(300, 305)}
    assert got == want


def test_cosine_pairs_by_lookup_equals_in_group():
    """The narrow-row broadcast-lookup confirm (lesson 22) must emit
    exactly the pairs and cosines of the payload-carrying kernel,
    including across chunk boundaries (chunk=3 on an 11-row group)."""
    from stac_to_geocore_ray.stages.ann import _normalize
    rng = np.random.RandomState(7)
    n, dim = 11, 16
    mat = rng.normal(size=(n, dim))
    mat[4] = mat[1] * 1.7                    # planted exact-direction dup
    mat[9] = mat[2] + 0.02 * mat[2].sum() * rng.normal(size=dim) * 0.01
    ids = np.arange(100, 100 + n, dtype=np.int64)
    g = pd.DataFrame({"vec_id": ids,
                      "embedding": [row.tolist() for row in mat]})
    ref = dedup.cosine_pairs_in_group(g, threshold=0.5) \
        .sort_values(["a", "b"]).reset_index(drop=True)

    lut = (ids, _normalize(mat.astype(np.float64)))
    narrow = pd.DataFrame({"vec_id": rng.permutation(ids)})
    got = dedup.cosine_pairs_by_lookup(narrow, lut, threshold=0.5,
                                       chunk=3) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert got.a.tolist() == ref.a.tolist()
    assert got.b.tolist() == ref.b.tolist()
    assert np.allclose(got.cos.to_numpy(), ref.cos.to_numpy(), atol=0)


def test_cosine_pairs_by_lookup_trivial_groups():
    from stac_to_geocore_ray.stages.ann import _normalize
    ids = np.array([5], dtype=np.int64)
    lut = (ids, _normalize(np.ones((1, 4))))
    out = dedup.cosine_pairs_by_lookup(
        pd.DataFrame({"vec_id": ids}), lut, threshold=0.9)
    assert len(out) == 0


def test_doc_dup_ngram_spans_matches_reference(ray_session, tmp_path):
    """doc_dup_ngram_spans vs a straight-line Python 8-gram reference:
    shared-boilerplate windows are counted per doc, grams repeated only
    WITHIN one doc are excluded, and the forced join fallback
    (broadcast_max=0) is pair-identical to the broadcast path."""
    import pyarrow.parquet as pq
    from stac_to_geocore_ray.queries import docs as qd

    k = qd.DUPGRAM_K
    boiler = "terms of service apply to all content on this site"  # 10 toks
    docs = [
        (1, f"alpha page one unique words here {boiler}"),
        (2, f"{boiler} beta page totally different body text"),
        (3, "no shared windows in this document at all nine ten eleven"),
        (4, " ".join(["self"] * 20)),          # intra-doc repeats only
        (5, f"{boiler} {boiler}"),             # doc repeats a shared gram
        (6, "short doc"),                      # < k tokens: no windows
        (7, None),                             # null text
    ]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs]})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    def grams(text):
        toks = (text or "").lower().split()
        return [" ".join(toks[i:i + k])
                for i in range(max(0, len(toks) - k + 1))]

    from collections import Counter
    per_doc = {d: Counter(grams(t)) for d, t in docs}
    docs_per_gram = Counter()
    for cnt in per_doc.values():
        docs_per_gram.update(set(cnt))
    shared = {g for g, n in docs_per_gram.items() if n >= 2}
    exp = {d: sum(n for g, n in cnt.items() if g in shared)
           for d, cnt in per_doc.items()}
    exp = {d: n for d, n in exp.items() if n > 0}
    assert exp, "fixture must plant shared grams"
    assert 4 not in exp          # intra-doc-only repeats excluded

    got = qd.doc_dup_ngram_spans(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert dict(zip(got.doc_id, got.n_dup_windows)) == exp

    forced = qd.doc_dup_ngram_spans(str(tmp_path), broadcast_max=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert forced.equals(got)


def test_doc_repetition_matches_reference(ray_session, tmp_path):
    """doc_repetition vs a straight-line Counter reference: total /
    distinct / top 2-gram counts per doc, <2-token and null docs
    excluded, doc boundaries never produce cross-doc grams."""
    import pyarrow.parquet as pq
    from collections import Counter
    from stac_to_geocore_ray.queries import docs as qd

    docs = [
        (1, "a b a b a b"),                  # heavy repeat: top=3 of 5
        (2, "one two three four five"),      # all distinct
        (3, "x"),                            # 1 token: excluded
        (4, ""),                             # empty: excluded
        (5, None),                           # null: excluded
        (6, "  A  a\ta  "),                  # case fold + odd whitespace
        (7, "w " * 300),                     # long uniform doc
    ]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs]})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    exp = {}
    for d, t in docs:
        toks = (t or "").lower().split()
        grams = Counter(zip(toks, toks[1:]))
        if grams:
            exp[d] = (sum(grams.values()), len(grams), max(grams.values()))

    got = qd.doc_repetition(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert {r.doc_id: (r.n_2grams, r.n_distinct_2grams, r.top_2gram_n)
            for r in got.itertuples()} == exp


def test_doc_contamination_matches_reference(ray_session, tmp_path):
    """doc_contamination vs a straight-line set reference: distinct
    shared texts per source pair, intra-source duplicates ignored,
    lexicographic (a < b) pair orientation, multi-copy texts counted
    once, three-way shared text counted in all three pairs."""
    import pyarrow.parquet as pq
    from itertools import combinations
    from stac_to_geocore_ray.queries import docs as qd

    rows = [
        ("eval", "the quick brown fox"),
        ("web", "the quick brown fox"),        # eval<->web
        ("web", "the quick brown fox"),        # duplicate copy: counts once
        ("books", "the quick brown fox"),      # three-way
        ("web", "only in web"),
        ("books", "only in books"),
        ("eval", "shared two"), ("web", "shared two"),
        ("web", "intra only"), ("web", "intra only"),
        ("books", None), ("web", ""),          # null == '' by contract
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                    "text": [t for _, t in rows],
                    "source": pa.array([s for s, _ in rows], pa.string())})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    by_src: dict = {}
    for s, t in rows:
        by_src.setdefault(s, set()).add(t or "")
    exp = {}
    for a, b in combinations(sorted(by_src), 2):
        n = len(by_src[a] & by_src[b])
        if n:
            exp[(a, b)] = n
    assert exp[("books", "web")] == 2          # fox + null==''

    got = qd.doc_contamination(str(tmp_path)).to_pandas()
    assert {(r.source_a, r.source_b): r.n_shared_texts
            for r in got.itertuples()} == exp


def test_minhash_dedup_clusters_matches_bruteforce(ray_session, tmp_path):
    """Cluster labels from the REDUCED edge set (rep pairs + identical-
    content stars) equal a brute-force union-find over ALL exact
    >= 0.5-Jaccard member pairs — connectivity equivalence of the
    contraction, including hot identical-doc clusters and the
    empty-text (jaccard 1) cluster."""
    import pyarrow.parquet as pq
    from stac_to_geocore_ray import queries as q
    from stac_to_geocore_ray.stages.dedup import (_shingle_hashes,
                                                  union_find_components)

    long_a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    long_b = long_a.replace("omicron", "omega")
    docs = []
    docs += [(10 + i, long_a) for i in range(6)]    # identical cluster X
    docs += [(20 + i, long_b) for i in range(4)]    # identical cluster Y
    docs += [(30 + i, f"unrelated text number {i} with words "
              f"{'x' * (i + 3)} {'y' * (i + 5)} {'z' * (i + 7)}")
             for i in range(6)]                     # singletons
    docs += [(60, ""), (61, "")]                    # empty-text cluster
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs]})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    def shingles(t):
        return set(_shingle_hashes(t, 5).tolist())

    ea, eb = [], []
    for i, (a, ta) in enumerate(docs):
        for b, tb in docs[i + 1:]:
            s1, s2 = shingles(ta), shingles(tb)
            j = 1.0 if not s1 and not s2 \
                else len(s1 & s2) / max(1, len(s1 | s2))
            if j >= 0.5:
                ea.append(a)
                eb.append(b)
    exp = union_find_components(ea, eb)

    out = q.minhash_dedup_clusters(str(tmp_path))
    got = (out.to_pandas() if hasattr(out, "to_pandas") else out)
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    assert {int(r.doc_id): int(r.cluster) for r in got.itertuples()} == exp
    # X and Y are near each other -> ONE component labeled min(all)
    assert exp[23] == 10 and exp[15] == 10


def _lev_ref(a: str, b: str) -> int:
    """Textbook O(len^2) DP Levenshtein — scalar oracle for lev1_dist."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


class TestLev1Dist:
    def test_matches_dp_reference_exhaustive(self):
        """All pairs over a small alphabet-3 string universe (lengths
        0..4): lev1_dist must agree with the DP wherever the DP says
        <=1, and say -1 wherever the DP says >1."""
        import itertools
        univ = [""]
        for L in range(1, 5):
            univ += ["".join(t) for t in itertools.product("abc", repeat=L)]
        pairs = [(x, y) for x in univ for y in univ]
        sa = np.array([p[0] for p in pairs], dtype=object)
        sb = np.array([p[1] for p in pairs], dtype=object)
        got = dedup.lev1_dist(sa, sb)
        ref = np.array([_lev_ref(x, y) for x, y in pairs])
        assert np.array_equal(got[ref <= 1], ref[ref <= 1])
        assert (got[ref > 1] == -1).all()

    def test_long_mixed_width_pairs(self):
        sa = np.array(["Customer#000000120", "Customer#000000120",
                       "Customer#00000012", "Customer#000000120"],
                      dtype=object)
        sb = np.array(["Customer#000000125", "Customer#0000001200",
                       "Customer#000000120", "Xustomer#000000125"],
                      dtype=object)
        assert dedup.lev1_dist(sa, sb).tolist() == [1, 1, 1, -1]


class TestCustomerFuzzyPairs:
    def test_indel_and_substitution_pairs(self, ray_session, tmp_path):
        """End-to-end FastSS on a corpus with substitutions, an
        insertion, a deletion, an exact duplicate name and a far-away
        name — the indel legs the fixed-width customer corpus never
        exercises."""
        import pyarrow.parquet as pq
        from stac_to_geocore_ray.queries import customer_fuzzy_pairs
        names = {1: "alpha", 2: "alpho",      # substitution -> dist 1
                 3: "alph",                   # deletion of 1 -> dist 1
                 4: "alphas",                 # insertion on 1 -> dist 1
                 5: "alpha",                  # duplicate of 1 -> dist 0
                 6: "omega"}                  # no neighbors
        t = pa.table({"c_custkey": pa.array(list(names), pa.int64()),
                      "c_name": pa.array(list(names.values()), pa.string()),
                      "c_nationkey": pa.array([0] * 6, pa.int32()),
                      "c_acctbal": pa.array([0.0] * 6, pa.float64()),
                      "c_mktsegment": pa.array(["X"] * 6, pa.string())})
        pq.write_table(t, tmp_path / "customer.parquet")
        got = customer_fuzzy_pairs(str(tmp_path)).to_pandas() \
            .sort_values(["a_custkey", "b_custkey"]).reset_index(drop=True)
        # brute-force oracle over the corpus
        keys = sorted(names)
        want = {(a, b, _lev_ref(names[a], names[b]))
                for i, a in enumerate(keys) for b in keys[i + 1:]
                if _lev_ref(names[a], names[b]) <= 1}
        assert set(map(tuple, got.to_numpy())) == want


def test_broadcast_components_long_path_halving(ray_session):
    """Regression for the round-5 root-hooking fix: a LONG PATH with
    shuffled node ids (the near-percolation DBSCAN topology) must
    converge Boruvka-style — endpoint-only messaging merged fragments
    one boundary hop per round and blew the 64-round cap on exactly
    this shape at sf0.1 (diameter-bound), while root hooking keeps
    rounds O(log n)."""
    import numpy as np
    import ray.data as rd
    rng = np.random.default_rng(7)
    ids = rng.permutation(5000).astype(int)
    edges = [{"a": int(ids[i]), "b": int(ids[i + 1])}
             for i in range(len(ids) - 1)]
    ds = rd.from_items(edges, override_num_blocks=8)
    got = dedup.label_propagation_broadcast(ds, max_rounds=24).to_pandas()
    assert set(got.label) == {0} and len(got) == 5000
