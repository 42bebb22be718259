"""Lineage manifest + resume semantics (SURVEY.md §5.2 #5-#6)."""

import os

import pyarrow as pa
import pytest

from stac_to_geocore_ray.state.manifest import (ManifestSink, partition_id,
                                                table_checksum)


@pytest.fixture
def sink(tmp_path):
    return ManifestSink(str(tmp_path / "out"))


def _tbl(n=5):
    return pa.table({"a": list(range(n)), "b": [f"s{i}" for i in range(n)]})


def test_partition_id_stable():
    assert partition_id("/x/part-00001.parquet") == partition_id("/x/part-00001.parquet")
    assert partition_id("/x/a.parquet") != partition_id("/y/a.parquet")


def test_write_is_idempotent(sink):
    m1 = sink.write_partition("p1", _tbl())
    m2 = sink.write_partition("p1", _tbl(99))    # different data: skipped
    assert m1["checksum"] == m2["checksum"]
    assert m2["rows"] == 5


def test_plan_is_anti_join(sink):
    frags = ["/in/f0.parquet", "/in/f1.parquet", "/in/f2.parquet"]
    todo = sink.plan(frags)
    assert len(todo) == 3
    sink.write_partition(todo[0][1], _tbl(), inputs=[todo[0][0]])
    assert len(sink.plan(frags)) == 2


def test_orphan_cleanup(sink):
    sink.write_partition("ok", _tbl())
    orphan = os.path.join(sink.out_dir, "part-crashed.parquet")
    with open(orphan, "wb") as f:
        f.write(b"partial garbage")
    assert sink.clean_orphans() == 1
    assert not os.path.exists(orphan)
    assert sink.is_done("ok")


def test_checksum_sensitive_to_content():
    assert table_checksum(_tbl(5)) != table_checksum(_tbl(6))
    assert table_checksum(_tbl(5)) == table_checksum(_tbl(5))


def test_killed_run_resumes_byte_identical(ray_session, tmp_path):
    """Kill after k partitions -> rerun -> identical manifest set."""
    import glob
    from stac_to_geocore_ray.pipelines.geocore_harvest import run_harvest
    out1 = str(tmp_path / "run1")
    out2 = str(tmp_path / "run2")
    sf = "/root/testdata/sf0.001"
    r_part = run_harvest(sf, out1, fail_after=0)      # nothing but small sides
    r_resumed = run_harvest(sf, out1)                 # finish the rest
    r_clean = run_harvest(sf, out2)                   # fresh complete run
    assert r_resumed["completed"] == r_clean["completed"]
    c1 = ManifestSink(out1).completed()
    c2 = ManifestSink(out2).completed()
    assert set(c1) == set(c2)
    for pid in c1:
        assert c1[pid]["checksum"] == c2[pid]["checksum"]
        assert c1[pid]["rows"] == c2[pid]["rows"]


def test_flagship_write_resume_byte_identical(ray_session, tmp_path):
    """Kill the TILE write after 0 partitions, resume, compare to clean."""
    from stac_to_geocore_ray.pipelines.flagship import run_flagship_to_parquet
    from stac_to_geocore_ray.state.manifest import ManifestSink
    sf = "/root/testdata/sf0.001"
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    run_flagship_to_parquet(sf, out1, fail_after=0)
    r1 = run_flagship_to_parquet(sf, out1)
    r2 = run_flagship_to_parquet(sf, out2)
    assert r1["rows"] == r2["rows"] > 0
    c1, c2 = ManifestSink(out1).completed(), ManifestSink(out2).completed()
    assert {p: m["checksum"] for p, m in c1.items()} == \
        {p: m["checksum"] for p, m in c2.items()}


def test_flagship_output_readback(ray_session, tmp_path):
    """Written partitions read back to exactly the pipeline's tiles."""
    import glob
    import pyarrow.parquet as pq
    from stac_to_geocore_ray.pipelines.flagship import (run_flagship_to_parquet,
                                                        tile_pipeline)
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "rb")
    res = run_flagship_to_parquet(sf, out)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    total = sum(pq.read_metadata(f).num_rows for f in files)
    live = tile_pipeline(sf, with_phash=False, concurrency=2).count()
    assert total == res["rows"] == live


class TestObjectStoreProtocol:
    """The sink on a NON-local pyarrow filesystem: write-then-marker,
    no rename anywhere (S3 has none).  A SubTreeFileSystem stands in
    for the object store — same pyarrow.fs API surface, and the test
    poisons ``os.replace`` to prove the code path never needs it."""

    @pytest.fixture
    def ofs_sink(self, tmp_path, monkeypatch):
        from pyarrow import fs as pafs
        root = tmp_path / "bucket"
        root.mkdir()
        fs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())

        def _no_rename(*a, **k):
            raise AssertionError(
                "os.replace called on the object-store sink path")
        monkeypatch.setattr(os, "replace", _no_rename)
        sink = ManifestSink("harvest/out", filesystem=fs)
        assert not sink.local
        return sink, root

    def test_write_read_idempotent_no_rename(self, ofs_sink):
        sink, root = ofs_sink
        m1 = sink.write_partition("p1", _tbl(), inputs=["frag0"])
        assert sink.is_done("p1")
        m2 = sink.write_partition("p1", _tbl(99))   # skipped: manifest wins
        assert m2["checksum"] == m1["checksum"] and m2["rows"] == 5
        got = sink.completed()
        assert set(got) == {"p1"} and got["p1"]["inputs"] == ["frag0"]
        # the data object is a readable parquet under the final name
        import pyarrow.parquet as pq
        t = pq.read_table(root / "harvest" / "out" / "part-p1.parquet")
        assert t.num_rows == 5

    def test_plan_and_orphan_cleanup(self, ofs_sink):
        sink, root = ofs_sink
        frags = ["in/f0.parquet", "in/f1.parquet"]
        todo = sink.plan(frags)
        assert len(todo) == 2
        sink.write_partition(todo[0][1], _tbl(), inputs=[todo[0][0]])
        assert len(sink.plan(frags)) == 1
        # crashed PUT: data object exists, marker absent -> orphan
        (root / "harvest" / "out" / "part-crashed.parquet").write_bytes(b"xx")
        assert sink.clean_orphans() == 1
        assert sink.is_done(todo[0][1])

    def test_resume_after_kill_matches_local(self, tmp_path, monkeypatch):
        """Partial object-store run resumed -> same manifests as a
        local-disk run of the same partitions."""
        from pyarrow import fs as pafs
        root = tmp_path / "bucket"
        root.mkdir()
        fs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
        parts = [(f"frag{i}", _tbl(i + 3)) for i in range(4)]

        s1 = ManifestSink("out", filesystem=fs)
        monkeypatch.setattr(os, "replace", lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("rename on object store")))
        for frag, t in parts[:2]:                       # "crash" after 2
            s1.write_partition(partition_id(frag), t, inputs=[frag])
        s2 = ManifestSink("out", filesystem=fs)         # resume
        todo = s2.plan([f for f, _ in parts])
        assert [f for f, _ in todo] == ["frag2", "frag3"]
        for frag, t in parts[2:]:
            s2.write_partition(partition_id(frag), t, inputs=[frag])
        monkeypatch.undo()

        local = ManifestSink(str(tmp_path / "local"))
        for frag, t in parts:
            local.write_partition(partition_id(frag), t, inputs=[frag])
        a, b = s2.completed(), local.completed()
        assert set(a) == set(b)
        for pid in a:
            assert a[pid]["checksum"] == b[pid]["checksum"]
            assert a[pid]["rows"] == b[pid]["rows"]


class TestQuarantine:
    """Poison-record policy: a corrupt binary row must not fail its
    partition — it lands in _quarantine/<pid>.parquet + the manifest
    count (the reference silently skips failed records,
    s3_operations.py:110-112; here every drop is accounted)."""

    def _image_batch(self, n=4, corrupt=2):
        import numpy as np
        from stac_to_geocore_ray.codecs import fakeimg as fi
        rng = np.random.RandomState(7)
        rows = {"image_id": [], "bytes": [], "bbox": []}
        for i in range(n):
            arr = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
            buf = fi.encode(arr, "png")
            if i == corrupt:
                buf = buf[:20] + b"\xff garbage \x00" + buf[28:]
            rows["image_id"].append(f"img-{i:03d}")
            rows["bytes"].append(buf)
            rows["bbox"].append([-64.0 + i, 44.0, -63.0 + i, 45.0])
        return pa.table(rows)

    def test_tiler_quarantines_corrupt_row(self):
        from stac_to_geocore_ray.stages.tiler import Tiler
        batch = self._image_batch()
        tiles = Tiler(with_phash=True, on_error="quarantine")(batch)
        # raise-mode fails the whole partition on the same input
        with pytest.raises(Exception):
            Tiler(with_phash=False)(batch)
        t = Tiler(with_phash=False, on_error="quarantine")
        tiles = t(batch)
        q = t.take_quarantine()
        assert q.num_rows == 1
        assert q["image_id"].to_pylist() == ["img-002"]
        assert "img-002" not in set(tiles["image_id"].to_pylist())
        assert len(set(tiles["image_id"].to_pylist())) == 3
        assert t.take_quarantine().num_rows == 0        # cleared

    def test_partition_completes_with_quarantine_manifest(self, tmp_path):
        import pyarrow.parquet as pq
        from stac_to_geocore_ray.stages.tiler import Tiler
        sink = ManifestSink(str(tmp_path / "out"))
        t = Tiler(with_phash=False, on_error="quarantine")
        tiles = t(self._image_batch())
        m = sink.write_partition("shard0", tiles,
                                 inputs=["frag0"],
                                 quarantined=t.take_quarantine())
        assert m["quarantined"] == 1 and m["rows"] == tiles.num_rows > 0
        assert sink.is_done("shard0")
        q = pq.read_table(str(tmp_path / "out" / "_quarantine" /
                              "shard0.parquet"))
        assert q["image_id"].to_pylist() == ["img-002"]
        assert "ValueError" in q["error"].to_pylist()[0] or \
            q["error"].to_pylist()[0]

    def test_framesampler_dead_letter_row(self):
        import numpy as np
        from stac_to_geocore_ray.stages import multimodal as mm
        frames = [np.full((32, 32, 3), 9, dtype=np.uint8)] * 4
        good = mm.encode_video(frames)
        batch = pa.table({"video_id": ["v0", "v1", "v2"],
                          "bytes": [good, b"NOTAVIDEO", good]})
        with pytest.raises(ValueError):
            mm.FrameSampler(stride=2)(batch)
        out = mm.FrameSampler(stride=2, on_error="dead-letter")(batch)
        df = out.to_pandas()
        bad = df[df.decode_error.notna()]
        assert bad.video_id.tolist() == ["v1"]
        assert bad.frame_index.isna().all()
        ok = df[df.decode_error.isna()]
        assert set(ok.video_id) == {"v0", "v2"} and len(ok) == 4
        assert ok.frame_phash.notna().all()

    def test_framesampler_midstream_corruption_drops_partial_frames(self):
        """A video corrupt AFTER its first frames must still emit
        exactly ONE dead-letter row and NO partial frame rows."""
        import numpy as np
        from stac_to_geocore_ray.stages import multimodal as mm
        frames = [np.full((32, 32, 3), k * 20, dtype=np.uint8)
                  for k in range(4)]
        good = mm.encode_video(frames)
        corrupt = bytearray(mm.encode_video(frames))
        corrupt[60:70] = b"\xff" * 10        # clobber a later frame body
        batch = mm.pa.table({"video_id": ["v0", "vbad"],
                             "bytes": [good, bytes(corrupt)]})
        out = mm.FrameSampler(stride=1, on_error="dead-letter")(batch) \
            .to_pandas()
        bad = out[out.decode_error.notna()]
        assert bad.video_id.tolist() == ["vbad"] and len(bad) == 1
        ok = out[out.decode_error.isna()]
        assert set(ok.video_id) == {"v0"} and len(ok) == 4

    def test_audiofeatures_dead_letter_row(self):
        from stac_to_geocore_ray.stages import multimodal as mm
        good = mm.encode_audio(mm.synth_clip(3, 16_000, 0.1))
        batch = pa.table({"clip_id": ["a", "b"],
                          "bytes": [good, b"\x00\x01bad"]})
        with pytest.raises(Exception):
            mm.AudioFeatures()(batch)
        out = mm.AudioFeatures(on_error="dead-letter")(batch).to_pandas()
        assert out[out.decode_error.notna()].clip_id.tolist() == ["b"]
        assert out[out.decode_error.isna()].rms.notna().all()


def test_nonresume_rebuilds_from_scratch(ray_session, tmp_path):
    """resume=False must actually rebuild: a second run with different
    parameters into the same out_dir replaces the old outputs instead
    of silently skipping at the manifest check."""
    import pyarrow.parquet as pq
    from stac_to_geocore_ray.pipelines.flagship import run_flagship_to_parquet
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "o")
    run_flagship_to_parquet(sf, out, with_phash=False)
    import glob
    f0 = sorted(glob.glob(f"{out}/part-*.parquet"))[0]
    assert "tile_phash" not in pq.read_schema(f0).names
    r2 = run_flagship_to_parquet(sf, out, with_phash=True, resume=False)
    assert r2["rows"] > 0
    assert "tile_phash" in pq.read_schema(f0).names   # actually rebuilt


def test_reset_spares_unrelated_files(sink):
    """reset() deletes only sink-owned names (ADVICE r3): pointing
    out_dir at a directory with unrelated files must not destroy them."""
    sink.write_partition("p1", _tbl(), quarantined=_tbl(2))
    bystander = os.path.join(sink.out_dir, "README.txt")
    with open(bystander, "w") as f:
        f.write("not yours")
    n = sink.reset()
    assert n >= 2                       # shard + quarantine + manifest
    assert os.path.exists(bystander)
    assert not sink.is_done("p1")
    assert not os.path.exists(os.path.join(sink.out_dir, "part-p1.parquet"))


def test_orphans_include_tmp_and_stale_quarantine(sink):
    """Crash debris beyond bare shards (ADVICE r3): stale .tmp files
    from interrupted local renames and quarantine parquets whose
    partition never reached its manifest are swept too."""
    sink.write_partition("ok", _tbl())
    tmp = os.path.join(sink.out_dir, "part-crashed.parquet.tmp")
    with open(tmp, "wb") as f:
        f.write(b"half a shard")
    qdir = os.path.join(sink.out_dir, "_quarantine")
    os.makedirs(qdir, exist_ok=True)
    import pyarrow.parquet as pq
    stale_q = os.path.join(qdir, "crashed.parquet")
    pq.write_table(_tbl(1), stale_q)
    assert sink.clean_orphans() == 2
    assert not os.path.exists(tmp)
    assert not os.path.exists(stale_q)
    assert sink.is_done("ok")


def test_clean_rerun_supersedes_stale_quarantine(sink):
    """A partition that quarantined rows on a crashed attempt but
    produces zero quarantined rows on the re-run must not leave the
    stale dead-letter parquet behind."""
    qdir = os.path.join(sink.out_dir, "_quarantine")
    os.makedirs(qdir, exist_ok=True)
    import pyarrow.parquet as pq
    stale_q = os.path.join(qdir, "p9.parquet")
    pq.write_table(_tbl(3), stale_q)           # debris from crashed attempt
    m = sink.write_partition("p9", _tbl())     # clean re-run, no quarantine
    assert m["quarantined"] == 0
    assert not os.path.exists(stale_q)


def test_harvest_nonresume_replaces_stale_outputs(ray_session, tmp_path):
    """run_harvest(resume=False) into a used out_dir must rebuild, not
    silently retain stale data at the is_done() check (ADVICE r3)."""
    import glob
    import json
    from stac_to_geocore_ray.pipelines.geocore_harvest import run_harvest
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "h")
    run_harvest(sf, out)
    # plant a stale shard+manifest pair that a fresh run can't produce
    stale = os.path.join(out, "part-stale-deadbeef.parquet")
    import pyarrow.parquet as pq
    pq.write_table(_tbl(), stale)
    with open(os.path.join(out, "_manifest", "stale-deadbeef.json"), "w") as f:
        json.dump({"partition_id": "stale-deadbeef", "path": stale,
                   "inputs": [], "rows": 5, "quarantined": 0,
                   "checksum": "x", "wall_sec": 0}, f)
    r = run_harvest(sf, out, resume=False)
    assert r["completed"] == r["partitions_total"]
    assert not os.path.exists(stale)
    assert sorted(glob.glob(f"{out}/_manifest/*.json"))


from pyarrow.fs import FileSystemHandler as _FSH


class _KillableHandler(_FSH):
    """pyarrow FileSystemHandler delegating to a SubTree fs, with a
    switch that raises on the NEXT marker PUT — injecting a crash in
    the write-then-marker window (data object visible, manifest
    absent)."""

    def __init__(self, delegate):
        self.fs = delegate
        self.kill_marker_puts = False

    def get_type_name(self):
        return "killable"

    def normalize_path(self, path):
        return self.fs.normalize_path(path)

    def get_file_info(self, paths):
        return self.fs.get_file_info(paths)

    def get_file_info_selector(self, selector):
        return self.fs.get_file_info(selector)

    def create_dir(self, path, recursive):
        self.fs.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self.fs.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self.fs.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        self.fs.delete_dir_contents("/", accept_root_dir=True)

    def delete_file(self, path):
        self.fs.delete_file(path)

    def move(self, src, dest):
        self.fs.move(src, dest)

    def copy_file(self, src, dest):
        self.fs.copy_file(src, dest)

    def open_input_stream(self, path):
        return self.fs.open_input_stream(path)

    def open_input_file(self, path):
        return self.fs.open_input_file(path)

    def open_output_stream(self, path, metadata):
        if self.kill_marker_puts and "_manifest/" in path:
            raise OSError("injected crash between data PUT and marker PUT")
        return self.fs.open_output_stream(path)

    def open_append_stream(self, path, metadata):
        return self.fs.open_append_stream(path)


def test_object_store_crash_window_resume_byte_identical(tmp_path):
    """Fault injection for the write-then-marker protocol (r3 verdict
    #7): a crash AFTER the data PUT but BEFORE the marker PUT leaves an
    orphan data object; clean_orphans + resume must converge to output
    byte-identical to an uninterrupted run."""
    from pyarrow import fs as pafs

    def make_fs(sub):
        root = tmp_path / sub
        root.mkdir()
        h = _KillableHandler(
            pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem()))
        return pafs.PyFileSystem(h), h, root

    parts = [(f"frag{i}", _tbl(i + 3)) for i in range(4)]

    # interrupted run: crash in the commit window of partition 2
    fs1, h1, root1 = make_fs("bucket1")
    s1 = ManifestSink("out", filesystem=fs1)
    assert not s1.local
    for frag, t in parts[:2]:
        s1.write_partition(partition_id(frag), t, inputs=[frag])
    h1.kill_marker_puts = True
    with pytest.raises(OSError, match="injected crash"):
        s1.write_partition(partition_id("frag2"), parts[2][1],
                           inputs=["frag2"])
    h1.kill_marker_puts = False
    # crash window state: data object visible, marker absent
    data_path = root1 / "out" / f"part-{partition_id('frag2')}.parquet"
    assert data_path.exists()
    assert not s1.is_done(partition_id("frag2"))

    # resume: new sink sweeps the orphan, re-plans, re-writes
    s2 = ManifestSink("out", filesystem=fs1)
    assert s2.clean_orphans() == 1
    assert not data_path.exists()
    todo = s2.plan([f for f, _ in parts])
    assert [f for f, _ in todo] == ["frag2", "frag3"]
    for frag, t in parts[2:]:
        s2.write_partition(partition_id(frag), t, inputs=[frag])

    # uninterrupted reference run
    fs2, _, root2 = make_fs("bucket2")
    ref = ManifestSink("out", filesystem=fs2)
    for frag, t in parts:
        ref.write_partition(partition_id(frag), t, inputs=[frag])

    a, b = s2.completed(), ref.completed()
    assert set(a) == set(b)
    for pid in a:
        assert a[pid]["checksum"] == b[pid]["checksum"]
        assert a[pid]["rows"] == b[pid]["rows"]
        da = (root1 / "out" / f"part-{pid}.parquet").read_bytes()
        db = (root2 / "out" / f"part-{pid}.parquet").read_bytes()
        assert da == db          # byte-identical data objects


class TestDedupRunsResume:
    """Kill-after-k resume for the long-running dedup legs (r4 #1)."""

    SF = "/root/testdata/sf0.001"

    def _checksums(self, out):
        return {p: m["checksum"] for p, m in ManifestSink(out).completed().items()}

    def test_minhash_run_resumes_byte_identical(self, ray_session, tmp_path):
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_minhash_to_parquet
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        # crash after the verified+members checkpoints, before any
        # pair range
        run_minhash_to_parquet(self.SF, out1, fail_after=0, n_ranges=4)
        done = set(ManifestSink(out1).completed())
        assert done == {"verified-0000", "members-0000"}
        # resume must NOT redo the LSH front half: poison it
        import stac_to_geocore_ray.queries.docs as docs_mod
        orig = docs_mod.minhash_verified_table
        docs_mod.minhash_verified_table = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("front half re-ran on resume"))
        try:
            r1 = run_minhash_to_parquet(self.SF, out1, n_ranges=4)
        finally:
            docs_mod.minhash_verified_table = orig
        r2 = run_minhash_to_parquet(self.SF, out2, n_ranges=4)
        assert r1["pair_rows"] == r2["pair_rows"] > 0
        assert self._checksums(out1) == self._checksums(out2)

    def test_minhash_partial_ranges_resume(self, ray_session, tmp_path):
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_minhash_to_parquet
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        run_minhash_to_parquet(self.SF, out1, fail_after=2, n_ranges=4)
        before = ManifestSink(out1).completed()
        assert sum(p.startswith("pairs-") for p in before) == 2
        run_minhash_to_parquet(self.SF, out1, n_ranges=4)
        after = ManifestSink(out1).completed()
        # completed ranges were skipped, not rewritten
        for pid in before:
            assert after[pid] == before[pid]
        run_minhash_to_parquet(self.SF, out2, n_ranges=4)
        assert self._checksums(out1) == self._checksums(out2)

    def test_minhash_rejects_changed_range_layout(self, ray_session,
                                                  tmp_path):
        """Resuming with a different n_ranges would union two partition
        layouts (double-counted pairs) — it must refuse instead."""
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_minhash_to_parquet
        out = str(tmp_path / "a")
        run_minhash_to_parquet(self.SF, out, fail_after=2, n_ranges=4)
        with pytest.raises(ValueError, match="different range layout"):
            run_minhash_to_parquet(self.SF, out, n_ranges=8)
        # the original layout still resumes fine
        run_minhash_to_parquet(self.SF, out, n_ranges=4)

    def test_minhash_matches_query_output(self, ray_session, tmp_path):
        """The checkpointed runner's pair union == the registered
        query's pairs (same content, partitioned + sorted)."""
        import glob

        import pandas as pd
        import pyarrow.parquet as pq
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_minhash_to_parquet
        from stac_to_geocore_ray.queries import minhash_neardup
        out = str(tmp_path / "a")
        run_minhash_to_parquet(self.SF, out, n_ranges=4)
        files = sorted(glob.glob(f"{out}/part-pairs-*.parquet"))
        got = pa.concat_tables([pq.read_table(f) for f in files]) \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        want = minhash_neardup(self.SF)
        want = (want.to_pandas() if hasattr(want, "to_pandas") else want)
        if not isinstance(want, pd.DataFrame):
            want = want.to_pandas()
        want = want.sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_phash_clusters_resume_skips_edges(self, ray_session, tmp_path):
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_phash_clusters_to_parquet
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        with pytest.raises(RuntimeError, match="injected"):
            run_phash_clusters_to_parquet(self.SF, out1,
                                          fail_before_final=True)
        assert set(ManifestSink(out1).completed()) == {"edges-0000"}
        # resume must NOT recompute the edge set
        import stac_to_geocore_ray.queries.media as media_mod
        orig = media_mod._phash_near_dedup_impl
        media_mod._phash_near_dedup_impl = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("edge set re-ran on resume"))
        try:
            # the runner imports the name at call time from the module
            from stac_to_geocore_ray.pipelines import dedup_runs
            r1 = run_phash_clusters_to_parquet(self.SF, out1)
        finally:
            media_mod._phash_near_dedup_impl = orig
        r2 = run_phash_clusters_to_parquet(self.SF, out2)
        assert r1["clusters_rows"] == r2["clusters_rows"]
        assert self._checksums(out1) == self._checksums(out2)
        # a third call short-circuits on the final manifest
        r3 = run_phash_clusters_to_parquet(self.SF, out1)
        assert r3["resumed_final"]

    def test_label_propagation_round_checkpoint_resume(self, ray_session,
                                                       tmp_path):
        """Crash inside the propagation loop; resume continues from the
        newest round checkpoint and converges to identical labels."""
        import ray.data as rd
        from stac_to_geocore_ray.stages.dedup import \
            label_propagation_components

        def chain_edges():
            # a 40-node chain (needs >1 halved round) + a triangle
            a = [f"n{i:03d}" for i in range(40)] + ["t0", "t0", "t1"]
            b = [f"n{i + 1:03d}" for i in range(40)] + ["t1", "t2", "t2"]
            return rd.from_items(
                [{"a": x, "b": y} for x, y in zip(a, b)],
                override_num_blocks=4)

        ref = label_propagation_components(chain_edges()).to_pandas() \
            .sort_values("node").reset_index(drop=True)

        sink = ManifestSink(str(tmp_path / "ck"))
        with pytest.raises(RuntimeError, match="injected"):
            label_propagation_components(chain_edges(), checkpoint=sink,
                                         fail_after_rounds=1)
        done_before = sink.completed()
        assert "lp-r0000" in done_before and "lp-final" not in done_before

        got = label_propagation_components(chain_edges(), checkpoint=sink) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(got, ref)
        done_after = sink.completed()
        assert "lp-final" in done_after
        # round 0 was not rewritten on resume
        assert done_after["lp-r0000"] == done_before["lp-r0000"]
        # a finished sink returns the final table without iterating
        again = label_propagation_components(chain_edges(), checkpoint=sink) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(again, ref)

    def test_label_propagation_rejects_foreign_checkpoint(self, ray_session,
                                                          tmp_path):
        import ray.data as rd
        from stac_to_geocore_ray.stages.dedup import \
            label_propagation_components
        sink = ManifestSink(str(tmp_path / "ck"))
        e1 = rd.from_items([{"a": "x", "b": "y"}, {"a": "y", "b": "z"}])
        label_propagation_components(e1, checkpoint=sink)
        e2 = rd.from_items([{"a": "p", "b": "q"}])
        with pytest.raises(ValueError, match="DIFFERENT edge set"):
            label_propagation_components(e2, checkpoint=sink)


class TestKmeansRunResume:
    """Kill-after-k resume for the iterative leg (round-grain
    checkpoints: a crash at round k of 5 loses one pass)."""

    SF = "/root/testdata/sf0.001"

    def _checksums(self, out):
        return {p: m["checksum"]
                for p, m in ManifestSink(out).completed().items()}

    def test_round_checkpoint_resume_byte_identical(self, ray_session,
                                                    tmp_path):
        from stac_to_geocore_ray.pipelines.kmeans_run import \
            run_kmeans_to_parquet
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        with pytest.raises(RuntimeError, match="injected failure"):
            run_kmeans_to_parquet(self.SF, out1, fail_after_rounds=2)
        done = set(ManifestSink(out1).completed())
        assert done == {"seeds-0000", "round-0000", "round-0001"}
        # the resume must not recompute the seeds or completed rounds:
        # poison the seed stage
        import stac_to_geocore_ray.queries.embeddings as emb_mod
        orig = emb_mod._kmeans_seed
        emb_mod._kmeans_seed = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("seed stage re-ran on resume"))
        try:
            r1 = run_kmeans_to_parquet(self.SF, out1)
        finally:
            emb_mod._kmeans_seed = orig
        assert r1["seeds_resumed"] and r1["rounds_run"] == 3
        r2 = run_kmeans_to_parquet(self.SF, out2)
        assert r2["rounds_run"] == 5 and not r2["seeds_resumed"]
        assert r1["rows"] == r2["rows"] > 0
        assert self._checksums(out1) == self._checksums(out2)

    def test_matches_query_output(self, ray_session, tmp_path):
        import glob

        import pyarrow.parquet as pq
        from stac_to_geocore_ray.pipelines.kmeans_run import \
            run_kmeans_to_parquet
        from stac_to_geocore_ray.queries import kmeans_embeddings
        out = str(tmp_path / "a")
        run_kmeans_to_parquet(self.SF, out, n_parts=3)
        files = sorted(glob.glob(f"{out}/part-labels-*.parquet"))
        got = pa.concat_tables([pq.read_table(f) for f in files]) \
            .to_pandas().reset_index(drop=True)
        want = kmeans_embeddings(self.SF).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert got.vec_id.tolist() == want.vec_id.tolist()
        assert got.cluster.tolist() == want.cluster.tolist()

    def test_rejects_foreign_checkpoint_and_layout(self, ray_session,
                                                   tmp_path):
        import json as _json

        from stac_to_geocore_ray.pipelines.kmeans_run import \
            run_kmeans_to_parquet
        out = str(tmp_path / "a")
        with pytest.raises(RuntimeError, match="injected failure"):
            run_kmeans_to_parquet(self.SF, out, fail_after_rounds=1)
        # corrupt the chain: round-0000 now claims different inputs
        mpath = f"{out}/_manifest/round-0000.json"
        m = _json.load(open(mpath))
        m["inputs"] = ["deadbeef"]
        _json.dump(m, open(mpath, "w"))
        with pytest.raises(RuntimeError, match="foreign checkpoint"):
            run_kmeans_to_parquet(self.SF, out)
        # and a different labels layout on resume is refused
        out2 = str(tmp_path / "b")
        run_kmeans_to_parquet(self.SF, out2, n_parts=2)
        with pytest.raises(ValueError, match="different range layout"):
            run_kmeans_to_parquet(self.SF, out2, n_parts=4)


class TestPrepRunResume:
    """Kill-after-k resume for the training-shard prep writer."""

    SF = "/root/testdata/sf0.001"

    def _checksums(self, out):
        return {p: m["checksum"] for p, m in ManifestSink(out).completed().items()}

    def test_prep_resumes_byte_identical(self, ray_session, tmp_path):
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_prep_to_parquet
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        r = run_prep_to_parquet(self.SF, out1, fail_after=2, n_ranges=4)
        assert r["stopped_after"] == 2
        before = ManifestSink(out1).completed()
        assert sum(p.startswith("shard-") for p in before) == 2
        r1 = run_prep_to_parquet(self.SF, out1, n_ranges=4)
        after = ManifestSink(out1).completed()
        for pid in before:       # completed shards skipped, not rewritten
            assert after[pid] == before[pid]
        r2 = run_prep_to_parquet(self.SF, out2, n_ranges=4)
        assert r1["shard_rows"] == r2["shard_rows"] > 0
        assert self._checksums(out1) == self._checksums(out2)

    def test_prep_rejects_changed_range_layout(self, ray_session,
                                               tmp_path):
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_prep_to_parquet
        out = str(tmp_path / "a")
        run_prep_to_parquet(self.SF, out, fail_after=1, n_ranges=4)
        import pytest
        with pytest.raises(ValueError, match="different range layout"):
            run_prep_to_parquet(self.SF, out, n_ranges=8)
        run_prep_to_parquet(self.SF, out, n_ranges=4)

    def test_prep_shards_union_equals_query(self, ray_session, tmp_path):
        """Shard union == the registered query's output (same rows,
        hash-partitioned + sorted)."""
        import glob

        import pyarrow.parquet as pq
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_prep_to_parquet
        from stac_to_geocore_ray.queries import doc_prep_pipeline
        out = str(tmp_path / "a")
        run_prep_to_parquet(self.SF, out, n_ranges=4)
        files = sorted(glob.glob(f"{out}/part-shard-*.parquet"))
        got = pa.concat_tables([pq.read_table(f) for f in files]) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        ref = doc_prep_pipeline(self.SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.doc_id.tolist() == ref.doc_id.tolist()
        assert got.redacted.tolist() == ref.redacted.tolist()


class TestDupgramRunResume:
    """Kill-after-k resume for the substring-level dedup writer."""

    SF = "/root/testdata/sf0.001"

    def _checksums(self, out):
        return {p: m["checksum"]
                for p, m in ManifestSink(out).completed().items()}

    def test_dupgram_resumes_byte_identical(self, ray_session, tmp_path):
        from stac_to_geocore_ray.pipelines import dedup_runs
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        r = dedup_runs.run_dupgram_to_parquet(self.SF, out1, fail_after=2,
                                              n_ranges=4)
        assert r["stopped_after"] == 2
        before = ManifestSink(out1).completed()
        assert "shared-0000" in before
        assert sum(p.startswith("spans-") for p in before) == 2
        # the expensive front half must be SKIPPED on resume: poison it
        import stac_to_geocore_ray.stages.util as util
        real_sc = util.sorted_combine

        def poisoned(*a, **kw):
            raise AssertionError("stage-1 recomputed on resume")
        util.sorted_combine = poisoned
        try:
            r1 = dedup_runs.run_dupgram_to_parquet(self.SF, out1,
                                                   n_ranges=4)
        finally:
            util.sorted_combine = real_sc
        after = ManifestSink(out1).completed()
        for pid in before:        # completed partitions skipped, not rewritten
            assert after[pid] == before[pid]
        r2 = dedup_runs.run_dupgram_to_parquet(self.SF, out2, n_ranges=4)
        assert r1["span_rows"] == r2["span_rows"]
        assert r1["shared_grams"] == r2["shared_grams"] > 0
        assert self._checksums(out1) == self._checksums(out2)

    def test_dupgram_rejects_changed_range_layout(self, ray_session,
                                                  tmp_path):
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_dupgram_to_parquet
        out = str(tmp_path / "a")
        run_dupgram_to_parquet(self.SF, out, fail_after=1, n_ranges=4)
        import pytest
        with pytest.raises(ValueError, match="different range layout"):
            run_dupgram_to_parquet(self.SF, out, n_ranges=8)
        run_dupgram_to_parquet(self.SF, out, n_ranges=4)

    def test_dupgram_shards_union_equals_query(self, ray_session,
                                               tmp_path):
        """Span-shard union == the registered query's output."""
        import glob

        import pyarrow.parquet as pq
        from stac_to_geocore_ray.pipelines.dedup_runs import \
            run_dupgram_to_parquet
        from stac_to_geocore_ray.queries import doc_dup_ngram_spans
        out = str(tmp_path / "a")
        run_dupgram_to_parquet(self.SF, out, n_ranges=4)
        files = sorted(glob.glob(f"{out}/part-spans-*.parquet"))
        got = pa.concat_tables([pq.read_table(f) for f in files]) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        ref = doc_dup_ngram_spans(self.SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.doc_id.tolist() == ref.doc_id.tolist()
        assert got.n_dup_windows.tolist() == ref.n_dup_windows.tolist()


class TestIvmViewResume:
    """Incremental view maintenance: base + late deltas must equal the
    full recompute, and the checkpointed chain must kill/resume to
    byte-identical views (pipelines/ivm.py)."""

    SF = "/root/testdata/sf0.001"

    def _checksums(self, out):
        return {p: m["checksum"] for p, m in ManifestSink(out).completed().items()}

    def test_ivm_equals_full_recompute(self, ray_session):
        from stac_to_geocore_ray.pipelines.ivm import events_hourly_view_ivm
        from stac_to_geocore_ray.queries.events import events_hourly
        got = events_hourly_view_ivm(self.SF, n_deltas=3).to_pandas()
        ref = events_hourly(self.SF).to_pandas() \
            .sort_values(["event_type", "hour"]).reset_index(drop=True)
        ref = ref[list(got.columns)]
        assert got.n_events.tolist() == ref.n_events.tolist()
        assert got.sum_cents.tolist() == ref.sum_cents.tolist()
        assert got.event_type.tolist() == ref.event_type.tolist()

    def test_ivm_kill_resume_byte_identical(self, ray_session, tmp_path):
        from stac_to_geocore_ray.pipelines.ivm import run_hourly_view_ivm
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        r = run_hourly_view_ivm(self.SF, out1, fail_after=2, n_deltas=3)
        assert r["stopped_after"] == 2
        done = set(ManifestSink(out1).completed())
        assert done == {"base", "delta-0000"}
        # resume must NOT recompute the base view: poison the base slice
        import stac_to_geocore_ray.pipelines.ivm as ivm_mod
        orig = ivm_mod._keep_base
        ivm_mod._keep_base = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("base view re-ran on resume"))
        try:
            r1 = run_hourly_view_ivm(self.SF, out1, n_deltas=3)
        finally:
            ivm_mod._keep_base = orig
        r2 = run_hourly_view_ivm(self.SF, out2, n_deltas=3)
        assert r1["applied"] == r2["applied"] == 4
        assert r1["view_rows"] == r2["view_rows"] > 0
        assert self._checksums(out1) == self._checksums(out2)

    def test_ivm_rejects_changed_delta_layout(self, ray_session, tmp_path):
        """Resuming under a different n_deltas would re-slice the late
        rows (cells double-applied or missed) — it must refuse."""
        from stac_to_geocore_ray.pipelines.ivm import run_hourly_view_ivm
        out = str(tmp_path / "a")
        run_hourly_view_ivm(self.SF, out, fail_after=2, n_deltas=3)
        with pytest.raises(ValueError, match="different slicing"):
            run_hourly_view_ivm(self.SF, out, n_deltas=5)
        run_hourly_view_ivm(self.SF, out, n_deltas=3)

    def test_ivm_final_view_equals_query(self, ray_session, tmp_path):
        """The last checkpointed view == the registered query output."""
        from stac_to_geocore_ray.pipelines.ivm import run_hourly_view_ivm
        from stac_to_geocore_ray.queries import events_hourly_ivm
        from stac_to_geocore_ray.sources import lance_io
        out = str(tmp_path / "a")
        run_hourly_view_ivm(self.SF, out, n_deltas=2)
        final = lance_io.read_shard(
            f"{out}/part-delta-0001{lance_io.shard_ext()}").to_pandas()
        ref = events_hourly_ivm(self.SF).to_pandas()
        assert final.n_events.tolist() == ref.n_events.tolist()
        assert final.sum_cents.tolist() == ref.sum_cents.tolist()


class TestJoinViewIvm:
    """Join-view IVM (Δ(fact ⋈ dims) = Δfact ⋈ dims for static dims):
    the maintained per-nation revenue view must equal the recompute."""

    SF = "/root/testdata/sf0.001"

    def test_join_ivm_equals_full_recompute(self, ray_session):
        import numpy as np
        import pandas as pd
        from stac_to_geocore_ray.pipelines.ivm import nation_revenue_view_ivm
        got = nation_revenue_view_ivm(self.SF, n_deltas=3).to_pandas()
        o = pd.read_parquet(f"{self.SF}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])
        c = pd.read_parquet(f"{self.SF}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])
        n = pd.read_parquet(f"{self.SF}/nation.parquet")
        j = o.merge(c, left_on="o_custkey", right_on="c_custkey") \
             .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        j["cents"] = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5) \
            .astype("int64")
        ref = j.groupby("n_name").agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum")) \
            .reset_index().sort_values("n_name")
        assert got.nation.tolist() == ref.n_name.tolist()
        assert got.n_orders.tolist() == ref.n_orders.tolist()
        assert got.sum_cents.tolist() == ref.sum_cents.tolist()

    def test_missing_dim_key_fails_loud(self, ray_session, tmp_path):
        """A fact row whose custkey is absent from the dim snapshot
        must raise, not aggregate under a wrong nation."""
        import shutil

        import pandas as pd
        import pytest
        from stac_to_geocore_ray.pipelines.ivm import _keep_base_on, \
            _nation_rev_partials
        sf = str(tmp_path / "sf")
        shutil.copytree(self.SF, sf)
        c = pd.read_parquet(f"{sf}/customer.parquet")
        c.iloc[1:].to_parquet(f"{sf}/customer.parquet", index=False)
        with pytest.raises(Exception, match="dim snapshot stale"):
            _nation_rev_partials(sf, _keep_base_on("o_orderkey"))


class TestKcoreRunResume:
    """Kill-after-k resume for the k-core h-index leg (est-vector
    checkpoints every N changed rounds; 124 rounds at the 30x probe
    is the restart-from-zero cost this protocol removes)."""

    SF = "/root/testdata/sf0.001"

    def _checksums(self, out):
        return {p: m["checksum"]
                for p, m in ManifestSink(out).completed().items()}

    def test_kill_after_k_resume_byte_identical(self, ray_session,
                                                tmp_path):
        from stac_to_geocore_ray.pipelines.graph_runs import \
            run_kcore_to_parquet
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        # sf0.001 converges in 10 rounds; checkpoint every 2, die at 5
        with pytest.raises(RuntimeError, match="injected failure"):
            run_kcore_to_parquet(self.SF, out1, checkpoint_every=2,
                                 fail_after_rounds=5)
        done = set(ManifestSink(out1).completed())
        assert "est-r0002" in done and "est-r0004" in done
        assert "coreness-0000" not in done
        r1 = run_kcore_to_parquet(self.SF, out1, checkpoint_every=2)
        # resumed from round 4: at most rounds 5..10 re-run
        assert r1["resumed_from"] == 4
        assert r1["rounds_this_run"] <= 6
        r2 = run_kcore_to_parquet(self.SF, out2, checkpoint_every=2)
        assert r2["resumed_from"] is None
        assert r1["rows"] == r2["rows"] > 0
        a = self._checksums(out1)["coreness-0000"]
        b = self._checksums(out2)["coreness-0000"]
        assert a == b
        # a third invocation is a no-op on the final marker
        r3 = run_kcore_to_parquet(self.SF, out1)
        assert r3["resumed_final"] and r3["rounds_this_run"] == 0

    def test_matches_query_output(self, ray_session, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from stac_to_geocore_ray.pipelines.graph_runs import \
            run_kcore_to_parquet
        from stac_to_geocore_ray.queries import graph_kcore
        out = str(tmp_path / "a")
        run_kcore_to_parquet(self.SF, out)
        f = glob.glob(f"{out}/part-coreness-0000.parquet")[0]
        got = pq.read_table(f).to_pandas()
        want = graph_kcore(self.SF).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert got.node.tolist() == want.node.tolist()
        assert got.coreness.tolist() == want.coreness.tolist()

    def test_rejects_foreign_checkpoint(self, ray_session, tmp_path):
        import json as _json

        from stac_to_geocore_ray.pipelines.graph_runs import \
            run_kcore_to_parquet
        out = str(tmp_path / "a")
        with pytest.raises(RuntimeError, match="injected failure"):
            run_kcore_to_parquet(self.SF, out, checkpoint_every=2,
                                 fail_after_rounds=5)
        mpath = f"{out}/_manifest/est-r0002.json"
        m = _json.load(open(mpath))
        m["inputs"] = ["kcore:999:1:2"]
        _json.dump(m, open(mpath, "w"))
        with pytest.raises(ValueError, match="DIFFERENT edge set"):
            run_kcore_to_parquet(self.SF, out)
