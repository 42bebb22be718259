"""Video frame-sampling + audio feature stage tests."""

import numpy as np
import pyarrow as pa
import pytest

from stac_to_geocore_ray.codecs import fakeimg as fi
from stac_to_geocore_ray.stages import multimodal as mm


def _video(n_frames=6, seed=1):
    frames = [fi.synth_pixels(seed + i, 64, 48) for i in range(n_frames)]
    return frames, mm.encode_video(frames)


def test_video_roundtrip():
    frames, buf = _video()
    decoded = list(mm.decode_video(buf))
    assert len(decoded) == 6
    for (i, arr), orig in zip(decoded, frames):
        assert np.array_equal(arr, orig)


def test_frame_sampler_stride():
    _, buf = _video(n_frames=7)
    batch = pa.table({"video_id": ["v1"], "bytes": pa.array([buf], pa.binary())})
    out = mm.FrameSampler(stride=2)(batch).to_pandas()
    assert out.frame_index.tolist() == [0, 2, 4, 6]
    assert (out.w == 64).all() and (out.h == 48).all()
    assert out.frame_phash.nunique() >= 1


def test_frame_sampler_ray(ray_session):
    import ray.data as rd
    vids = []
    for v in range(4):
        _, buf = _video(n_frames=4, seed=v * 100)
        vids.append({"video_id": f"v{v}", "bytes": buf})
    ds = rd.from_items(vids)
    out = ds.map_batches(mm.FrameSampler, batch_format="pyarrow",
                         concurrency=(1, 2)).to_pandas()
    assert len(out) == 8                      # 4 videos x frames 0,2
    assert out.video_id.nunique() == 4


def test_audio_roundtrip_and_features():
    pcm = mm.synth_clip(7, rate=8000, seconds=0.5)
    buf = mm.encode_audio(pcm, rate=8000)
    rate, back = mm.decode_audio(buf)
    assert rate == 8000 and np.array_equal(back, pcm)
    stage = mm.AudioFeatures()
    out = stage(pa.table({"clip_id": ["c0"],
                          "bytes": pa.array([buf], pa.binary())})).to_pylist()[0]
    assert out["duration_sec"] == pytest.approx(0.5)
    assert 0.1 < out["rms"] < 0.7              # sine mixture, bounded energy
    assert 0.0 < out["zero_cross_rate"] < 0.5
    assert len(out["embedding"]) == 8
    # tonal clips concentrate energy in low bands
    emb = np.array(out["embedding"])
    assert emb[:4].sum() > emb[4:].sum()


def test_audio_features_distinct_and_deterministic():
    clips = {f"c{k}": mm.encode_audio(mm.synth_clip(k), 16_000)
             for k in (1, 2)}
    t = pa.table({"clip_id": list(clips), "bytes": pa.array(
        list(clips.values()), pa.binary())})
    a = mm.AudioFeatures()(t).to_pandas()
    b = mm.AudioFeatures()(t).to_pandas()
    assert a.equals(b)                         # deterministic
    e1, e2 = (np.array(x) for x in a.embedding)
    assert not np.allclose(e1, e2)             # different tones differ


def test_audio_real_decoder_probe():
    with pytest.raises(NotImplementedError):
        mm.decode_audio_any(b"RIFFnotreally")


def test_audio_stage_in_ray_pipeline(ray_session):
    import ray.data as rd
    rows = [{"clip_id": f"c{k}",
             "bytes": mm.encode_audio(mm.synth_clip(k, 8000, 0.25), 8000)}
            for k in range(6)]
    ds = rd.from_items(rows)
    out = ds.map_batches(mm.AudioFeatures, batch_format="pyarrow",
                         concurrency=(1, 2)).to_pandas()
    assert len(out) == 6
    assert out.clip_id.nunique() == 6


class TestVideoSceneCuts:
    def test_planted_scene_structure(self, ray_session, tiny_blocks):
        """The construction plants exactly SCENE_COUNT scenes of
        SCENE_LEN frames: every video must report n_cuts ==
        SCENE_COUNT-1 at exactly the scene starts (jitter inside a
        scene must never trip the Hamming threshold)."""
        from stac_to_geocore_ray.queries import video_scene_cuts
        from stac_to_geocore_ray.queries.media import (
            SCENE_COUNT, SCENE_LEN, SCENE_N_VIDEOS)
        got = video_scene_cuts("/root/testdata/sf0.001").to_pandas() \
            .sort_values("video_id").reset_index(drop=True)
        assert len(got) == SCENE_N_VIDEOS
        assert (got.n_frames == SCENE_COUNT * SCENE_LEN).all()
        assert (got.n_cuts == SCENE_COUNT - 1).all()
        expect_sum = sum(s * SCENE_LEN for s in range(1, SCENE_COUNT))
        assert (got.cut_idx_sum == expect_sum).all()


class TestAudioSegmenter:
    def test_planted_structure(self, ray_session):
        import ray.data as rd

        from stac_to_geocore_ray.queries.media import (
            AUD_FRAME, AUD_MIN_GAP, AUD_MIN_LEN, AUD_THR,
            _activity_clips)
        from stac_to_geocore_ray.stages.multimodal import AudioSegmenter
        seg = AudioSegmenter(frame=AUD_FRAME, thr=AUD_THR,
                             min_gap=AUD_MIN_GAP, min_len=AUD_MIN_LEN)
        clips = _activity_clips("/root/testdata/sf0.001")
        import pyarrow as pa
        out = seg(pa.table({
            "clip_id": [c["clip_id"] for c in clips],
            "bytes": [c["bytes"] for c in clips]})).to_pandas()
        # every clip with >= 1 planted burst yields >= 1 segment
        assert out.clip_id.nunique() == len(clips)
        # the k%4==1 clips plant a 2-frame gap that must MERGE: their
        # first segment spans both bursts (longer than any single
        # planted burst of <= 9 frames + the 2-frame bridged gap)
        merged = out[out.clip_id == "act-0001"]
        assert merged.iloc[0].n_frames >= 10
        # droppable 1-frame blips never appear
        assert (out.n_frames >= AUD_MIN_LEN).all()
        # segment energy dominated by tone frames: mean frame energy
        # of every segment clears the threshold
        assert (out.energy_sum / out.n_frames >= AUD_THR * 0.5).all()

    def test_segment_invariants(self, ray_session):
        from stac_to_geocore_ray.queries import audio_segments
        out = audio_segments("/root/testdata/sf0.001").to_pandas()
        g = out.sort_values(["clip_id", "seg"]).groupby("clip_id")
        # segs index contiguously from 0 and never overlap
        for cid, grp in g:
            assert grp.seg.tolist() == list(range(len(grp)))
            assert (grp.start_frame.to_numpy()[1:]
                    >= grp.end_frame.to_numpy()[:-1]).all()
        assert (out.end_frame - out.start_frame == out.n_frames).all()


class TestImageQuality:
    def test_matches_numpy_reference_and_discriminates(self,
                                                       ray_session):
        from stac_to_geocore_ray.queries import image_quality
        got = image_quality("/root/testdata/sf0.001").to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        assert len(got) > 0
        # invariants: exact integer stats, all non-negative, contrast
        # numerator bounded by n^2 * 255^2
        assert (got.sharp_num >= 0).all()
        assert (got.contrast_num >= 0).all()
        assert (got.contrast_num
                <= got.n_pix.astype(object) ** 2 * 255 ** 2).all()
        assert (got.n_pix == got.w * got.h).all()
        # a flat synthetic image has zero sharpness and contrast; a
        # checkerboard maximizes both (engine formulas replayed)
        import numpy as np
        flat = np.full((8, 8), 7, dtype=np.int64)
        lap = (flat[:-2, 1:-1] + flat[2:, 1:-1] + flat[1:-1, :-2]
               + flat[1:-1, 2:] - 4 * flat[1:-1, 1:-1])
        assert int((lap * lap).sum()) == 0
        cb = (np.indices((8, 8)).sum(axis=0) % 2) * 255
        lap = (cb[:-2, 1:-1] + cb[2:, 1:-1] + cb[1:-1, :-2]
               + cb[1:-1, 2:] - 4 * cb[1:-1, 1:-1])
        assert int((lap * lap).sum()) > 0
        n = 64
        sx = int(cb.sum())
        sxx = int((cb * cb).sum())
        assert n * sxx - sx * sx > 0
