"""Video frame-sampling + audio stub plumbing tests."""

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


def test_audio_stub_contract():
    stub = mm.AudioFeatureStub()
    assert "embedding" in stub.OUTPUT_SCHEMA.names
    with pytest.raises(NotImplementedError):
        stub(pa.table({"clip_id": ["c"], "bytes": pa.array([b""], pa.binary())}))
