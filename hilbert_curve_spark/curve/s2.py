"""Real S2 cell ids, pure-numpy vectorized — no external s2 library.

Implements the public S2 geometry cell-id scheme (s2geometry.io "S2 Cell
Hierarchy"; the same construction as the open-source ``s2geometry`` C++
``s2cell_id.cc`` / ``s2coords.h`` — cube-face projection, quadratic ST
transform, and the face-local Hilbert curve driven by 4-level lookup
tables) re-derived here as vectorized numpy kernels.  Nothing is imported
from any s2 package; when one is present the tests cross-check against it,
otherwise structural property tests (round-trip, hierarchy containment,
curve locality) pin the behavior.

Reference parity note: the reference repo's own curve is the plain
Skilling Hilbert transform (``HilbertCurve.java:187-216``); S2 is the
north-star's discrete-global-grid requirement (BASELINE.json north_star:
"encoded to H3/S2 cells and Hilbert indices").  The S2 curve differs from
the plain curve by per-cell swap/invert orientation state — hence the
dedicated lookup tables instead of reusing ``curve/hilbert.py``.

Determinism contract: ``cell_from_xyz`` uses only IEEE-754 exact-rounded
operations (compare, divide, sqrt, floor, integer bit-ops) so Spark (JVM)
and DuckDB (C++) produce bit-identical cell ids from identical double
inputs — this is what makes the driver's value-hash oracle check possible.
``cell_from_latlng`` adds the trig step (sin/cos can differ by ulps across
libms) and is therefore pinned by property tests, not the SQL oracle.

Cell ids are carried as *signed* int64 with two's-complement wraparound
(faces 4-5 set the sign bit), the same convention as the Java S2 library's
``long`` ids — Spark has no unsigned type.  Ids are bucket/join keys in
this engine; unsigned ordering is never required.
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2
MAX_LEVEL = 30

# Hilbert sub-cell traversal order (ij of the k-th visited sub-cell) and
# orientation deltas, for the four orientations of a parent cell — the
# public constants of the S2 space-filling curve.
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical
    (0, 2, 3, 1),  # swap
    (3, 2, 0, 1),  # invert
    (3, 1, 0, 2),  # swap + invert
)
_POS_TO_ORIENT = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)


def _build_lookups() -> tuple[np.ndarray, np.ndarray]:
    """4-level (8-bit ij <-> 8-bit curve pos) tables; index = (key << 2) | orient."""
    lookup_pos = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)

    def init(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orient]
        for sub in range(4):
            init(
                level,
                i + (r[sub] >> 1),
                j + (r[sub] & 1),
                orig,
                pos + sub,
                orient ^ _POS_TO_ORIENT[sub],
            )

    for o in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        init(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookups()


# ---------------------------------------------------------------- projection

# (u_sign, u_num, u_den, v_sign, v_num, v_den) per face — the public
# ValidFaceXyzToUv table.
_FACE_UV_TABLE = (
    (+1, "y", "x", +1, "z", "x"),  # face 0 (+x)
    (-1, "x", "y", +1, "z", "y"),  # face 1 (+y)
    (-1, "x", "z", -1, "y", "z"),  # face 2 (+z)
    (+1, "z", "x", +1, "y", "x"),  # face 3 (-x)
    (+1, "z", "y", -1, "x", "y"),  # face 4 (-y)
    (-1, "y", "z", -1, "x", "z"),  # face 5 (-z)
)


def face_from_xyz(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Cube face 0..5: largest-|component| axis, +3 when that component < 0."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    comp = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    val = np.where(comp == 0, x, np.where(comp == 1, y, z))
    return np.where(val < 0, comp + 3, comp).astype(np.int64)


def uv_from_xyz(
    face: np.ndarray, x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Cube-face (u, v) ratios; input need NOT be normalized."""
    comp = {"x": x, "y": y, "z": z}
    u = np.empty(len(face), dtype=np.float64)
    v = np.empty(len(face), dtype=np.float64)
    for f, (us, un, ud, vs, vn, vd) in enumerate(_FACE_UV_TABLE):
        m = face == f
        if m.any():
            u[m] = us * comp[un][m] / comp[ud][m]
            v[m] = vs * comp[vn][m] / comp[vd][m]
    return u, v


def st_from_uv(u: np.ndarray) -> np.ndarray:
    """Quadratic UV->ST transform (area-uniformizing, the S2 default).

    Written as ``sqrt(1 + 3*|u|)`` so both np.where branches stay in
    domain; bit-identical to the two-branch form (negation is exact)."""
    r = np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0, 0.5 * r, 1.0 - 0.5 * r)


def uv_from_st(s: np.ndarray) -> np.ndarray:
    """Inverse quadratic transform."""
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def ij_from_st(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(s * (1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1
    ).astype(np.int64)


# ------------------------------------------------------------------ encoding


def cell_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf (level-30) cell id from face + leaf-resolution ij, vectorized.

    8 table steps of 4 curve levels each; the per-step orientation state
    (swap/invert bits) rides along in ``bits``."""
    n = face.astype(np.int64) << 60
    bits = (face & SWAP_MASK).astype(np.int64)
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        idx = (
            (((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2))
            + (((j >> (k * LOOKUP_BITS)) & mask) << 2)
            + bits
        )
        val = LOOKUP_POS[idx]
        n |= (val >> 2) << (k * 2 * LOOKUP_BITS)
        bits = val & (SWAP_MASK | INVERT_MASK)
    return n * 2 + 1


def parent_id(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell id at ``level`` (pure id arithmetic)."""
    lsb = np.int64(1) << (2 * (MAX_LEVEL - level))
    return (ids & (-lsb)) | lsb


def cell_from_xyz(
    x: np.ndarray, y: np.ndarray, z: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    """S2 cell id from (possibly unnormalized) direction vectors.

    The IEEE-exact path: compare/divide/sqrt/floor only — bit-reproducible
    across engines for identical double inputs."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    face = face_from_xyz(x, y, z)
    u, v = uv_from_xyz(face, x, y, z)
    i = ij_from_st(st_from_uv(u))
    j = ij_from_st(st_from_uv(v))
    leaf = cell_from_face_ij(face, i, j)
    return leaf if level >= MAX_LEVEL else parent_id(leaf, level)


def cell_from_latlng(
    lat_deg: np.ndarray, lng_deg: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    """S2 cell id from lat/lng degrees (adds trig; property-tested path)."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cp = np.cos(phi)
    return cell_from_xyz(cp * np.cos(theta), cp * np.sin(theta), np.sin(phi), level)


# ------------------------------------------------------------------ decoding


def level_of(ids: np.ndarray) -> np.ndarray:
    """Cell level from the position of the lowest set bit."""
    lsb = ids & (-ids)
    shift = np.zeros_like(ids)
    v = lsb.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.int64(1) << s)
        shift = np.where(big, shift + s, shift)
        v = np.where(big, v >> s, v)
    return MAX_LEVEL - (shift >> 1)


def face_ij_from_cell(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(face, i, j) at leaf resolution for the cell's curve position."""
    uids = ids.astype(np.uint64)
    face = (uids >> np.uint64(61)).astype(np.int64)
    pos = (uids & np.uint64((1 << 61) - 1)).astype(np.int64) >> 1
    i = np.zeros_like(face)
    j = np.zeros_like(face)
    bits = (face & SWAP_MASK).astype(np.int64)
    chunk_mask = (1 << (2 * LOOKUP_BITS)) - 1
    ij_mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        chunk = (pos >> (k * 2 * LOOKUP_BITS)) & chunk_mask
        val = LOOKUP_IJ[(chunk << 2) + bits]
        ij = val >> 2
        i = (i << LOOKUP_BITS) | (ij >> LOOKUP_BITS)
        j = (j << LOOKUP_BITS) | (ij & ij_mask)
        bits = val & (SWAP_MASK | INVERT_MASK)
    return face, i, j


_FACE_XYZ = (
    # face -> (x, y, z) as functions of (u, v); public FaceUvToXyz table
    lambda u, v: (np.ones_like(u), u, v),
    lambda u, v: (-u, np.ones_like(u), v),
    lambda u, v: (-u, -v, np.ones_like(u)),
    lambda u, v: (-np.ones_like(u), -v, -u),
    lambda u, v: (v, -np.ones_like(u), -u),
    lambda u, v: (v, u, -np.ones_like(u)),
)


def xyz_from_cell(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unnormalized center direction of each cell (any level)."""
    lvl = level_of(ids)
    face, i, j = face_ij_from_cell(ids)
    size_shift = MAX_LEVEL - lvl  # cells span 2^(30-level) leaf ij units
    corner_i = (i >> size_shift) << size_shift
    corner_j = (j >> size_shift) << size_shift
    half = (np.int64(1) << size_shift).astype(np.float64) / 2.0
    s = (corner_i.astype(np.float64) + half) / float(1 << MAX_LEVEL)
    t = (corner_j.astype(np.float64) + half) / float(1 << MAX_LEVEL)
    u = uv_from_st(s)
    v = uv_from_st(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, fn in enumerate(_FACE_XYZ):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = fn(u[m], v[m])
    return x, y, z


def latlng_from_cell(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Center (lat, lng) degrees of each cell."""
    x, y, z = xyz_from_cell(ids)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng
