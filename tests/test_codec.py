"""GIMG codec + pHash invariants (BASELINE.json input_hint checks)."""

import numpy as np
import pytest

from stac_to_geocore_ray.codecs import fakeimg as fi


def test_lossless_roundtrip_allclose():
    arr = fi.synth_pixels(987654321, 96, 64)
    dec = fi.decode(fi.encode(arr, "png"))
    assert np.array_equal(arr, dec)          # exact, stronger than allclose


def test_lossy_psnr_floor():
    arr = fi.synth_pixels(123456, 128, 96)
    dec = fi.decode(fi.encode(arr, "jpeg"))
    assert fi.psnr(arr, dec) >= 40.0         # north-star PSNR gate
    assert np.max(np.abs(arr.astype(int) - dec.astype(int))) <= 1


def test_determinism_across_calls():
    a = fi.encode(fi.synth_pixels(42, 64, 64), "png")
    b = fi.encode(fi.synth_pixels(42, 64, 64), "png")
    assert a == b


def test_phash_stability_and_sensitivity():
    arr = fi.synth_pixels(777, 128, 128)
    h1 = fi.phash(arr)
    assert h1 == fi.phash(arr.copy())
    # a structurally different image (hash-distant seed) must differ;
    # adjacent seeds share gradients and may legitimately collide
    other = fi.synth_pixels(0x9E3779B97F4A7C15, 128, 128)
    assert fi.phash(other) != h1


def test_hamming64():
    a = np.array([0, 0b1011, -1], dtype=np.int64)
    b = np.array([0, 0b1000, 0], dtype=np.int64)
    assert fi.hamming64(a, b).tolist() == [0, 2, 64]


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        fi.decode_real_jpeg_png(b"\x89PNG")


def test_block_mean_non_divisible_sizes():
    arr = fi.synth_pixels(5, 100, 70)        # 100x70 not divisible by 32
    h = fi.phash(arr)
    assert isinstance(h, int)
