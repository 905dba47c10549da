"""S2 cell-id kernel tests: structural properties, DuckDB cross-check,
and (when an s2 library happens to be installed) external cross-check.

The kernel is a from-scratch numpy implementation of the public S2 scheme
(curve/s2.py); no golden values are copied from any library — correctness
is pinned by invariants of the spec plus the bit-identical dual rendering
in SQL (curve/s2_sql.py).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from hilbert_curve_spark.curve import s2
from hilbert_curve_spark.curve.s2_sql import s2_sql_cte

RNG = np.random.default_rng(20260817)


def _random_latlng(n):
    return RNG.uniform(-89.9, 89.9, n), RNG.uniform(-180.0, 180.0, n)


def test_leaf_structure():
    lat, lng = _random_latlng(5000)
    ids = s2.cell_from_latlng(lat, lng)
    assert (ids & 1).all()  # leaf ids end in ...1
    faces = (ids.astype(np.uint64) >> np.uint64(61)).astype(int)
    assert faces.min() >= 0 and faces.max() <= 5
    assert (s2.level_of(ids) == s2.MAX_LEVEL).all()


def test_face_centers():
    x = np.array([1.0, 0, 0, -1, 0, 0])
    y = np.array([0, 1.0, 0, 0, -1, 0])
    z = np.array([0, 0, 1.0, 0, 0, -1])
    ids = s2.cell_from_xyz(x, y, z, 0)
    faces = (ids.astype(np.uint64) >> np.uint64(61)).astype(int)
    assert list(faces) == [0, 1, 2, 3, 4, 5]
    # level-0 cell id == face<<61 | 1<<60 (the documented token form)
    expect = (np.arange(6, dtype=np.uint64) << np.uint64(61)) | np.uint64(1 << 60)
    assert (ids.astype(np.uint64) == expect).all()


def test_roundtrip_center():
    """Decoded leaf-cell center must be within a leaf diagonal (~1e-8 deg)."""
    lat, lng = _random_latlng(20000)
    ids = s2.cell_from_latlng(lat, lng)
    la2, ln2 = s2.latlng_from_cell(ids)
    dlng = np.abs((ln2 - lng + 180) % 360 - 180) * np.cos(np.radians(lat))
    assert np.abs(la2 - lat).max() < 1e-6
    assert dlng.max() < 1e-6


def test_hierarchy_consistency():
    """parent(leaf, L) == direct encode at L; parent level correct."""
    lat, lng = _random_latlng(10000)
    leaf = s2.cell_from_latlng(lat, lng)
    for lvl in (0, 3, 8, 15, 25):
        p = s2.parent_id(leaf, lvl)
        assert (p == s2.cell_from_latlng(lat, lng, lvl)).all()
        assert (s2.level_of(p) == lvl).all()


def test_face_ij_roundtrip():
    f = RNG.integers(0, 6, 5000)
    i = RNG.integers(0, 1 << 30, 5000)
    j = RNG.integers(0, 1 << 30, 5000)
    ids = s2.cell_from_face_ij(f, i, j)
    f2, i2, j2 = s2.face_ij_from_cell(ids)
    assert (f2 == f).all() and (i2 == i).all() and (j2 == j).all()


def test_curve_continuity():
    """Consecutive curve positions on one face are edge-adjacent cells —
    THE Hilbert property; any orientation-table mistake breaks it."""
    base_i = RNG.integers(1, (1 << 30) - 2, 200)
    base_j = RNG.integers(1, (1 << 30) - 2, 200)
    f = np.zeros(200, dtype=np.int64)
    ids = s2.cell_from_face_ij(f, base_i, base_j)
    pos = (ids.astype(np.uint64) & np.uint64((1 << 61) - 1)) >> np.uint64(1)
    nxt = ((pos + np.uint64(1)) << np.uint64(1)) | np.uint64(1)
    nxt = nxt.astype(np.int64)  # stay on face 0: pos+1 < 2^60 whp
    on_face = (nxt.astype(np.uint64) >> np.uint64(61)) == 0
    f2, i2, j2 = s2.face_ij_from_cell(nxt[on_face])
    di = np.abs(i2 - base_i[on_face])
    dj = np.abs(j2 - base_j[on_face])
    assert ((di + dj) == 1).all()  # one lattice step, never diagonal


def test_st_uv_inverse():
    u = RNG.uniform(-1, 1, 10000)
    s = s2.st_from_uv(u)
    assert np.abs(s2.uv_from_st(s) - u).max() < 1e-14
    assert (s >= 0).all() and (s <= 1).all()


def test_duckdb_bit_identical():
    """The DuckDB SQL rendering produces the same int64 ids bit-for-bit."""
    n = 4000
    vx = np.floor(RNG.uniform(-8, 8, n) * 4) / 4 + 0.5
    vy = np.floor(RNG.uniform(-8, 8, n) * 4) / 4 + 0.5
    vz = np.floor(RNG.uniform(-8, 8, n) * 4) / 4 + 0.5
    df = pd.DataFrame({"key": np.arange(n), "vx": vx, "vy": vy, "vz": vz})
    con = duckdb.connect()
    con.register("pts_df", df)
    for lvl in (30, 12, 4):
        expect = s2.cell_from_xyz(vx, vy, vz, lvl)
        sql = (
            s2_sql_cte("SELECT key, vx, vy, vz FROM pts_df", lvl)
            + " SELECT s2_cell FROM s2v ORDER BY key"
        )
        got = con.execute(sql).df()["s2_cell"].to_numpy()
        assert (got == expect).all(), f"level {lvl}"


def test_external_library_crosscheck():
    """Bit-exact vs a real s2 library when one is installed (absent in this
    container — the dual numpy/SQL rendering plus the structural invariants
    above are the in-container evidence)."""
    s2sphere = pytest.importorskip("s2sphere")
    lat, lng = _random_latlng(500)
    ours = s2.cell_from_latlng(lat, lng, 13)
    for k in range(500):
        ll = s2sphere.LatLng.from_degrees(float(lat[k]), float(lng[k]))
        ext = s2sphere.CellId.from_lat_lng(ll).parent(13).id()
        assert np.int64(np.uint64(ext).astype(np.int64)) == ours[k]
