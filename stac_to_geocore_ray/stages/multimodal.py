"""Multimodal binary-column stages: video frame sampling, audio features.

Per the build instructions, image/audio/video ride as opaque ``binary``
columns with typed metadata; the decode step is STUBBED (no media libs
in this container) while the Ray-side plumbing — schema, batch
signatures, actor-pool shape, output layout — is real and tested.

GVID container (deterministic stand-in for a video): a tiny header
(magic, n_frames) followed by ``n_frames`` length-prefixed GIMG frames.
``FrameSampler`` decodes every k-th frame — the canonical
frame-sampling stage of a video training-data pipeline — emitting one
row per sampled frame with per-frame stats (a flat-map, pixels never
cross the stage boundary).

``AudioFeatureStub`` documents the plug point for a real audio
pipeline (librosa/torchaudio): it validates the plumbing and raises
NotImplementedError at the decode call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import fakeimg as fi

_VMAGIC = b"GVID"


def encode_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    """Frames (uint8 HxWxC arrays) -> GVID bytes."""
    parts = [_VMAGIC, len(frames).to_bytes(4, "little")]
    for arr in frames:
        buf = fi.encode(arr, fmt)
        parts.append(len(buf).to_bytes(4, "little"))
        parts.append(buf)
    return b"".join(parts)


def decode_video(buf: bytes):
    """GVID bytes -> iterator of (frame_index, uint8 array)."""
    if buf[:4] != _VMAGIC:
        raise ValueError("not a GVID buffer")
    n = int.from_bytes(buf[4:8], "little")
    off = 8
    for i in range(n):
        ln = int.from_bytes(buf[off:off + 4], "little")
        off += 4
        yield i, fi.decode(buf[off:off + ln])
        off += ln


class FrameSampler:
    """map_batches callable: (video_id, bytes) rows -> sampled-frame rows.

    Emits (video_id, frame_index, w, h, mean_intensity, frame_phash)
    for every ``stride``-th frame.  Actor-pool stage: the pHash DCT
    table builds once per actor.  batch sizing rule: decoded frames
    are transient per row; only per-frame stats leave the stage.
    """

    def __init__(self, stride: int = 2, with_phash: bool = True):
        self.stride = stride
        self.with_phash = with_phash
        fi._dct_matrix()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["video_id"].to_pylist()
        bufs = batch["bytes"].to_pylist()
        out = {"video_id": [], "frame_index": [], "w": [], "h": [],
               "mean_intensity": []}
        if self.with_phash:
            out["frame_phash"] = []
        for vid, buf in zip(ids, bufs):
            for idx, arr in decode_video(buf):
                if idx % self.stride:
                    continue
                out["video_id"].append(vid)
                out["frame_index"].append(idx)
                out["w"].append(arr.shape[1])
                out["h"].append(arr.shape[0])
                out["mean_intensity"].append(float(arr.mean()))
                if self.with_phash:
                    out["frame_phash"].append(fi.phash(arr))
        tbl = {
            "video_id": pa.array(out["video_id"], pa.string()),
            "frame_index": pa.array(out["frame_index"], pa.int32()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "mean_intensity": pa.array(out["mean_intensity"], pa.float64()),
        }
        if self.with_phash:
            tbl["frame_phash"] = pa.array(out["frame_phash"], pa.int64())
        return pa.table(tbl)


class AudioFeatureStub:
    """Actor-pool stage signature for audio feature extraction.

    A real deployment loads the decoder/model in ``__init__``
    (librosa / torchaudio / an ONNX embedding model) and emits one
    feature row per clip in ``__call__``.  This container has no audio
    libs, so the decode call raises NotImplementedError — the schema
    contract and batch plumbing are still exercised by tests.
    """

    OUTPUT_SCHEMA = pa.schema([
        ("clip_id", pa.string()),
        ("duration_sec", pa.float64()),
        ("rms", pa.float64()),
        ("embedding", pa.list_(pa.float32())),
    ])

    def __init__(self):
        self.decoder = None                  # e.g. librosa loaded here

    def decode(self, buf: bytes) -> np.ndarray:
        raise NotImplementedError(
            "audio decode requires librosa/torchaudio, absent in this env; "
            "plug a real decoder here — downstream plumbing is format-agnostic")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # real implementation: decode each clip, compute features
        self.decode(b"")
        raise AssertionError("unreachable")
