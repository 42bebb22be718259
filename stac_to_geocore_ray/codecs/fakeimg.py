"""GIMG: a deterministic stand-in image codec, plus real pHash math.

This container has no PIL/cv2, so real PNG/JPEG decode is STUBBED per
the build instructions: the Ray-side plumbing (binary column, schema,
batch sizing, actor signatures) is real and tested, while the byte
format is our own deterministic codec with the same *invariants* the
north star checks (BASELINE.json input_hint):

- fmt="png"  -> GIMG lossless (zlib over raw uint8) -> decoded pixels
  are exactly allclose to the originals;
- fmt="jpeg" -> GIMG lossy (1-bit right-shift quantization + zlib) ->
  decode error is at most 1/channel, PSNR ~= 51 dB >= 40 dB.

``decode_real_jpeg_png`` raises NotImplementedError and documents
where a PIL/turbojpeg decoder would plug in on a real cluster.

The perceptual hash is the standard pHash construction (block-mean
resize to 32x32 grayscale, orthonormal 2-D DCT-II, top-left 8x8
coefficients thresholded at their median excluding DC), implemented
with numpy matmuls.
"""

from __future__ import annotations

import zlib

import numpy as np

_MAGIC = b"GIMG"
_HDR = len(_MAGIC) + 1 + 1 + 4 + 4 + 1  # magic, ver, mode, w, h, c


def encode(arr: np.ndarray, fmt: str) -> bytes:
    """uint8 HxWxC array -> GIMG bytes. fmt: 'png' (lossless) | 'jpeg' (lossy)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    if fmt == "png":
        mode, payload = 0, arr.tobytes()
    elif fmt == "jpeg":
        mode, payload = 1, (arr >> 1).tobytes()
    else:
        raise ValueError(f"unsupported fmt {fmt!r}")
    head = _MAGIC + bytes([1, mode]) + w.to_bytes(4, "little") + \
        h.to_bytes(4, "little") + bytes([c])
    return head + zlib.compress(payload, 1)


def decode(buf: bytes) -> np.ndarray:
    """GIMG bytes -> uint8 (H, W, C) array."""
    if buf[:4] != _MAGIC:
        raise ValueError("not a GIMG buffer")
    mode = buf[5]
    w = int.from_bytes(buf[6:10], "little")
    h = int.from_bytes(buf[10:14], "little")
    c = buf[14]
    raw = np.frombuffer(zlib.decompress(buf[_HDR:]), dtype=np.uint8)
    arr = raw.reshape(h, w, c)
    if mode == 1:
        arr = (arr.astype(np.uint8) << 1)
    return arr


try:                                         # import probe: real decoder
    from PIL import Image as _PIL_Image
    HAVE_PIL = True
except ImportError:                          # this container ships no PIL
    _PIL_Image = None
    HAVE_PIL = False


def decode_real_jpeg_png(buf: bytes) -> np.ndarray:
    """Real PNG/JPEG decode via PIL when importable (selected by import
    probe); raises NotImplementedError otherwise.

    On a production cluster PIL/simplejpeg decode the binary column
    inside the decoder actor pool; everything downstream (tiling,
    pHash, dedup) is format-agnostic over the returned uint8 array.
    """
    if _PIL_Image is None:
        raise NotImplementedError("PIL/cv2 are not available in this container")
    import io
    return np.asarray(_PIL_Image.open(io.BytesIO(buf)).convert("RGB"))


def decode_any(buf: bytes) -> np.ndarray:
    """Format dispatch: GIMG magic -> stand-in codec; anything else ->
    the real decoder path (PIL when present).  The Tiler/DecodeVerifier
    call this, so pointing the pipeline at a real JPEG/PNG table needs
    no code change beyond having PIL installed."""
    if buf[:4] == _MAGIC:
        return decode(buf)
    return decode_real_jpeg_png(buf)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB gradient image keyed by a 64-bit seed.

    A smooth per-channel linear gradient: no wall clock, no global RNG
    (FIXTURES.md §1); identical across processes and platforms.
    """
    s = np.uint64(seed)
    a = np.array([int(s >> np.uint64(k)) & 0xFF for k in (0, 8, 16)], dtype=np.float64)
    b = np.array([int(s >> np.uint64(k)) & 0xFF for k in (24, 32, 40)], dtype=np.float64)
    o = np.array([int(s >> np.uint64(k)) & 0xFF for k in (48, 56, 4)], dtype=np.float64)
    a = a.astype(np.float32); b = b.astype(np.float32); o = o.astype(np.float32)
    x = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :, None]
    y = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None, None]
    val = o[None, None, :] + a[None, None, :] * x * (255.0 - o)[None, None, :] / 255.0 \
        + b[None, None, :] * y * (255.0 - o)[None, None, :] / 255.0
    # seed-dependent sinusoidal texture so DCT spectra (and pHashes)
    # differ across images instead of collapsing onto the gradient's
    fx = 1 + (int(s >> np.uint64(12)) & 7)
    fy = 1 + (int(s >> np.uint64(36)) & 7)
    val = val + np.float32(40.0) * np.sin(
        np.float32(2.0 * np.pi) * (np.float32(fx) * x + np.float32(fy) * y))
    return np.clip(val, 0, 255).astype(np.uint8)


def _block_mean_32(gray: np.ndarray) -> np.ndarray:
    """Block-mean downsample of an (H, W) float array to 32x32."""
    h, w = gray.shape
    ri = (np.arange(33) * h) // 32
    ci = (np.arange(33) * w) // 32
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = gray.cumsum(0).cumsum(1)
    s = csum[ri[1:, None], ci[None, 1:]] - csum[ri[:-1, None], ci[None, 1:]] \
        - csum[ri[1:, None], ci[None, :-1]] + csum[ri[:-1, None], ci[None, :-1]]
    area = (ri[1:, None] - ri[:-1, None]) * (ci[None, 1:] - ci[None, :-1])
    return s / area


def resize_block_mean(arr: np.ndarray, t: int) -> np.ndarray:
    """uint8 (H, W[, C]) -> (t, t[, C]) block-mean thumbnail.

    The generalized form of `_block_mean_32` (integral image +
    4-corner differences, per channel), with FLOOR quantization back
    to uint8 — truncation, not round-half, so a scalar replay golden
    needs no rounding-mode care.  Requires H >= t and W >= t."""
    a = arr.astype(np.float64)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w, c = a.shape
    if h < t or w < t:
        raise ValueError(f"image {h}x{w} smaller than thumbnail {t}")
    ri = (np.arange(t + 1) * h) // t
    ci = (np.arange(t + 1) * w) // t
    csum = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    csum[1:, 1:] = a.cumsum(0).cumsum(1)
    s = (csum[ri[1:, None], ci[None, 1:]]
         - csum[ri[:-1, None], ci[None, 1:]]
         - csum[ri[1:, None], ci[None, :-1]]
         + csum[ri[:-1, None], ci[None, :-1]])
    area = ((ri[1:, None] - ri[:-1, None])
            * (ci[None, 1:] - ci[None, :-1]))[:, :, None]
    out = np.floor(s / area).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def _block_mean_32_batch(tiles: np.ndarray) -> np.ndarray:
    """Block-mean downsample of an (N, H, W) float stack to (N, 32, 32).

    Same integral-image arithmetic as `_block_mean_32` (cumsum along
    rows then cols, 4-corner differences), batched over the leading
    axis so the per-tile results are bit-identical to the scalar path.
    """
    n, h, w = tiles.shape
    csum = np.zeros((n, h + 1, w + 1), dtype=np.float64)
    csum[:, 1:, 1:] = tiles.cumsum(axis=1).cumsum(axis=2)
    if h % 32 == 0 and w % 32 == 0:
        # uniform blocks: strided views instead of fancy-index gather
        # (same corner elements, bit-identical result, ~3x faster)
        sh, sw = h // 32, w // 32
        s = (csum[:, sh::sh, sw::sw] - csum[:, :h:sh, sw::sw]
             - csum[:, sh::sh, :w:sw] + csum[:, :h:sh, :w:sw])
        return s / float(sh * sw)
    ri = (np.arange(33) * h) // 32
    ci = (np.arange(33) * w) // 32
    s = (csum[:, ri[1:, None], ci[None, 1:]]
         - csum[:, ri[:-1, None], ci[None, 1:]]
         - csum[:, ri[1:, None], ci[None, :-1]]
         + csum[:, ri[:-1, None], ci[None, :-1]])
    area = (ri[1:, None] - ri[:-1, None]) * (ci[None, 1:] - ci[None, :-1])
    with np.errstate(invalid="ignore", divide="ignore"):
        return s / area                       # <32px tiles: 0-area blocks -> NaN
                                              # (deterministic, matches scalar path)


def phash_batch(tiles: np.ndarray) -> np.ndarray:
    """(N, H, W) grayscale stack -> (N,) int64 pHashes.

    The batched form of `phash` for equal-shape tiles: one batched
    32x32 DCT matmul chain instead of N scalar calls.  Callers pass
    grayscale (channel-mean) tiles; `phash` computes the same mean
    internally for (H, W, C) input.
    """
    tiles = np.asarray(tiles, dtype=np.float64)
    small = _block_mean_32_batch(tiles)
    d = _dct_matrix()
    coeffs = np.matmul(np.matmul(d, small), d.T)
    block = coeffs[:, :8, :8].reshape(len(small), 64)
    med = np.median(block[:, 1:], axis=1)
    bits = (block > med[:, None]).astype(np.uint8)
    packed = np.packbits(bits, axis=1)            # (N, 8) big-endian bytes
    return packed.view(">u8").ravel().astype(np.uint64).view(np.int64)


def phash(arr: np.ndarray) -> int:
    """64-bit pHash of a uint8 (H, W[, C]) image, as signed int64."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.mean(axis=2) if a.ndim == 3 else a
    small = _block_mean_32(gray)
    d = _dct_matrix()
    coeffs = d @ small @ d.T
    block = coeffs[:8, :8].ravel()
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint8)
    packed = np.packbits(bits)               # big-endian bit order
    return int(np.frombuffer(packed.tobytes(), dtype=">u8")[0].astype(np.int64))


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays.

    SWAR popcount (no table gathers — ~4x faster than the round-1
    byte-lookup on multi-million-pair sweeps)."""
    x = (np.asarray(a).astype(np.int64).view(np.uint64)
         ^ np.asarray(b).astype(np.int64).view(np.uint64))
    x = x - ((x >> np.uint64(1)) & _M1)
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)
