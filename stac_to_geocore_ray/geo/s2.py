"""Vectorized S2 cell-ID encoding, from the published S2 geometry algorithm.

Implements the standard S2 cell id scheme (faces of a cube projected
onto the sphere, quadratic uv<->st reprojection, Hilbert-curve bit
interleaving with the public lookup-table construction) in pure numpy
so whole Arrow columns encode at once inside ``map_batches``.  The
environment has no s2 library, so this follows the algorithm as
documented by the s2geometry project (s2cell_id.h) and its pure-Python
transliterations; correctness is checked by property tests
(invertibility, hierarchy containment, level extraction) in
tests/test_s2.py.

Cell ids are returned as ``uint64`` (3 face bits, 60 Hilbert position
bits, one trailing marker bit), bit-compatible with canonical S2.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2
# Hilbert sub-cell orderings per orientation (public S2 constants).
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)

_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(level, i + (r[idx] >> 1), j + (r[idx] & 1), orig,
                     pos + idx, orient ^ _POS_TO_ORIENT[idx])


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def latlng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray):
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, (x, y, z))
    face = np.where(major < 0, face + 3, face)
    # u,v per face (s2geometry valid_face_xyz_to_uv table); np.choose
    # evaluates every branch, so silence the inactive-lane divisions.
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, (y / x, -x / y, -x / z, z / x, z / y, -y / z))
        v = np.choose(face, (z / x, z / y, -y / z, y / x, -x / y, -x / z))
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # S2's quadratic projection; np.where evaluates both branches, so
    # silence the sqrt-of-negative in the unselected lane.
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf (level-30) cell ids from face + Hilbert ij, fully vectorized."""
    face_u = face.astype(np.uint64)
    i_u = i.astype(np.uint64)
    j_u = j.astype(np.uint64)
    n = face_u << np.uint64(60)
    bits = face_u & np.uint64(_SWAP)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * _LOOKUP_BITS)
        bits = bits + (((i_u >> kk) & mask) << np.uint64(_LOOKUP_BITS + 2))
        bits = bits + (((j_u >> kk) & mask) << np.uint64(2))
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return n * np.uint64(2) + np.uint64(1)


def latlng_to_cell(lat_deg, lng_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """lat/lng degrees (arrays) -> S2 cell id uint64 at ``level``."""
    x, y, z = latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = from_face_ij(face, i, j)
    return parent(leaf, level) if level < MAX_LEVEL else leaf


def lsb(cell: np.ndarray) -> np.ndarray:
    c = cell.astype(np.uint64)
    return c & (~c + np.uint64(1))


def level(cell: np.ndarray) -> np.ndarray:
    """Level of each cell id (30 = leaf)."""
    low = lsb(cell)
    # trailing-zero count via float64 exponent trick (exact for 2^k)
    tz = (np.frexp(low.astype(np.float64))[1] - 1).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def parent(cell: np.ndarray, lvl: int) -> np.ndarray:
    """Ancestor of each (finer) cell at level ``lvl``."""
    c = np.asarray(cell, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - lvl))
    neg = (~(new_lsb - np.uint64(1)))
    return (c & neg) | new_lsb


def to_face_ij(cell: np.ndarray):
    """Inverse of from_face_ij for LEAF cells (vectorized)."""
    c = np.asarray(cell, dtype=np.uint64)
    face = (c >> np.uint64(61)).astype(np.uint64)
    bits = face & np.uint64(_SWAP)
    i = np.zeros(c.shape, dtype=np.uint64)
    j = np.zeros(c.shape, dtype=np.uint64)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * _LOOKUP_BITS) if k == 7 else _LOOKUP_BITS
        chunk_mask = np.uint64((1 << (2 * nbits)) - 1)
        bits = bits + (((c >> np.uint64(k * 2 * _LOOKUP_BITS + 1)) & chunk_mask)
                       << np.uint64(2))
        bits = _LOOKUP_IJ[bits]
        i |= (bits >> np.uint64(_LOOKUP_BITS + 2)) << np.uint64(k * _LOOKUP_BITS)
        j |= ((bits >> np.uint64(2)) & np.uint64((1 << _LOOKUP_BITS) - 1)) \
            << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64)


def cell_to_latlng(cell: np.ndarray):
    """Approximate center lat/lng of leaf cells (used by tests / kNN seeds)."""
    face, i, j = to_face_ij(cell)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u, v = _st_to_uv(s), _st_to_uv(t)
    one = np.ones_like(u)
    x = np.choose(face, (one, -u, -u, -one, v, v))
    y = np.choose(face, (u, one, -v, -v, -one, u))
    z = np.choose(face, (v, v, one, -u, -u, -one))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def bbox_covering(w, s, e, n, lvl: int, grid: int | None = None,
                  edge_samples: int = 64) -> np.ndarray:
    """Interval-based covering of a lon/lat bbox by level-``lvl`` cells.

    Round-2 replacement of the sampled-lattice approximation: per cube
    face, the bbox's (u, v) extrema are located on its BOUNDARY (the
    face projection is a diffeomorphism on its domain), so densely
    evaluating the four edges bounds the face's uv region; the bound
    is padded by one cell to absorb edge-sampling error, converted to
    an ij rectangle at cell granularity, and every cell in the
    rectangle is enumerated.  The union over faces is a guaranteed
    SUPERSET of the bbox (property-tested: every random interior
    point's cell is in the covering) and is near-minimal for small
    boxes.  Assumes bbox extent < 90 degrees (true for footprint
    boxes); ``grid`` is accepted for back-compat and ignored.
    """
    if np.ndim(w) == 0 and w > e:             # antimeridian-crossing box:
        return np.unique(np.concatenate([     # union of the two parts
            bbox_covering(w, s, 180.0, n, lvl, edge_samples=edge_samples),
            bbox_covering(-180.0, s, e, n, lvl, edge_samples=edge_samples)]))
    step_ij = 1 << (MAX_LEVEL - lvl)          # leaf-ij per level-lvl cell

    # boundary sampling (4 edges)
    t = np.linspace(0.0, 1.0, edge_samples)
    lons = np.concatenate([w + (e - w) * t, np.full_like(t, e),
                           w + (e - w) * t, np.full_like(t, w)])
    lats = np.concatenate([np.full_like(t, s), s + (n - s) * t,
                           np.full_like(t, n), s + (n - s) * t])
    x, y, z = latlng_to_xyz(lats, lons)
    face, u, v = xyz_to_face_uv(x, y, z)

    # edge-sampling error bound: between samples the uv extremum can
    # exceed the sampled max by |d(st)/d(deg)| * half-spacing; with
    # |du/ddeg| <= 2*pi/180 and |dst/du| <= 0.5 that is
    # ~1.8e-2 * spacing_deg in st, mapped to leaf-ij units (+16 slack)
    extent = float(max(np.max(e - w), np.max(n - s), 1e-9))
    pad_ij = int(1.8e-2 * (extent / max(1, edge_samples - 1))
                 * (1 << MAX_LEVEL)) + 16

    out = []
    for f in np.unique(face):
        m = face == f
        si = _uv_to_st(u[m])
        ti = _uv_to_st(v[m])
        i_lo = (int(_st_to_ij(si.min())) - pad_ij) // step_ij
        i_hi = (int(_st_to_ij(si.max())) + pad_ij) // step_ij
        j_lo = (int(_st_to_ij(ti.min())) - pad_ij) // step_ij
        j_hi = (int(_st_to_ij(ti.max())) + pad_ij) // step_ij
        n_cells = 1 << lvl                     # cells per axis at lvl
        i_lo, i_hi = max(0, i_lo), min(n_cells - 1, i_hi)
        j_lo, j_hi = max(0, j_lo), min(n_cells - 1, j_hi)
        ii, jj = np.meshgrid(np.arange(i_lo, i_hi + 1),
                             np.arange(j_lo, j_hi + 1))
        ic = ii.ravel() * step_ij + step_ij // 2   # cell-center leaf ij
        jc = jj.ravel() * step_ij + step_ij // 2
        ff = np.full(ic.shape, int(f), dtype=np.int64)
        out.append(parent(from_face_ij(ff, ic, jc), lvl))
    return np.unique(np.concatenate(out))
