"""Wave-50: convex layers (`operators/spatial_join.py::convex_layers`),
Voronoi zones around density peaks (`operators/rollup.py::voronoi_zones`),
and the exact-integer radial decay OLS
(`operators/rollup.py::density_decay_fit`) — brute-force parity and
structural invariants.  Oracle parity runs in ``test_entry_parity``."""

import math

import pytest

from hilbert_curve_spark.operators.rollup import density_decay_fit, voronoi_zones
from hilbert_curve_spark.operators.spatial_join import convex_layers


def _geo(spark, pts):
    rows = [(f"d{i:04d}", x, y) for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows, "doc_id string, x long, y long")


def _lcg_points(n, seed=7, edge=512):
    pts, s = [], seed
    for _ in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        x = (s >> 8) % edge
        s = (s * 1103515245 + 12345) % (1 << 31)
        pts.append((x, (s >> 8) % edge))
    return pts


def _brute_boundary(pts):
    out = set()
    for i, p in enumerate(pts):
        for q in pts:
            if (q[0], q[1]) == (p[0], p[1]):
                continue
            if all(
                (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0]) >= 0
                for r in pts
            ):
                out.add(i)
                break
    return out


def _brute_layers(pts, n_layers):
    remaining = list(range(len(pts)))
    layers = {}
    for li in range(1, n_layers + 1):
        if not remaining:
            break
        sub = [pts[i] for i in remaining]
        b = _brute_boundary(sub)
        peeled = [remaining[j] for j in sorted(b)]
        for i in peeled:
            layers[i] = li
        remaining = [i for i in remaining if i not in set(peeled)]
    return layers


@pytest.mark.parametrize("seed", [5, 23])
def test_convex_layers_match_brute_force(spark, seed):
    pts = _lcg_points(50, seed=seed)
    got = {
        int(r["doc_id"][1:]): r["layer"]
        for r in convex_layers(_geo(spark, pts), 3, sample_mod=1, shift=11).collect()
    }
    assert got == _brute_layers(pts, 3)


def test_convex_layers_are_nested(spark):
    """Layer K+1 points lie inside the hull of layer K (outlyingness
    decreases inward), and no point appears twice."""
    pts = _lcg_points(120, seed=8)
    rows = convex_layers(_geo(spark, pts), 3, sample_mod=1, shift=11).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by_layer = {}
    for r in rows:
        by_layer.setdefault(r["layer"], []).append((r["x"], r["y"]))
    for li in (2, 3):
        outer = by_layer[li - 1]
        for p in by_layer.get(li, []):
            # a deeper point is STRICTLY inside the previous layer's hull:
            # appending it to the outer set must not make it a boundary
            # point of the union
            union = outer + [p]
            assert len(union) - 1 not in _brute_boundary(union)


def test_voronoi_zones_cover_all_occupied_cells(spark):
    pts = [(100 + i % 30, 100 + i // 30) for i in range(300)]
    pts += [(3000 + i % 30, 3000 + i // 30) for i in range(300)]
    rows = voronoi_zones(_geo(spark, pts), min_peak=5, shift=6).collect()
    # two far-apart dense blobs: every occupied cell assigned, masses conserved
    assert sum(r["n_docs"] for r in rows) == 600
    assert len(rows) >= 2


def test_voronoi_tie_breaks_to_smaller_peak(spark):
    """A cell equidistant from two peaks goes to the smaller peak key."""
    a = [(96, 96)] * 10            # peak cell (1,1), center (96,96)
    b = [(96, 480)] * 10           # peak cell (1,7), center (96,480)
    mid = [(96, 288)] * 2          # cell (1,4): dist2 equal to both peaks
    rows = {r["peak"]: r for r in voronoi_zones(_geo(spark, a + b + mid), 5, 6).collect()}
    ka, kb = 1 * 64 + 1, 1 * 64 + 7
    assert set(rows) == {ka, kb}
    assert rows[ka]["n_docs"] == 12  # tie cell joined the smaller key
    assert rows[kb]["n_docs"] == 10


def test_density_decay_fit_matches_numpy_ols(spark, sf_dir):
    from hilbert_curve_spark.config import DEFAULT
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4), DEFAULT)
    rows = {r["cluster"]: r for r in density_decay_fit(geo).collect()}
    pts = geo.select("x", "y").collect()
    e = DEFAULT.edge
    centers = [(e // 4, e // 4), (3 * e // 4, 3 * e // 4), (e // 2, e // 2)]
    nb = 24
    counts = {c: [0] * nb for c in range(3)}
    for r in pts:
        d2s = [(r["x"] - cx) ** 2 + (r["y"] - cy) ** 2 for cx, cy in centers]
        c = min(range(3), key=lambda i: (d2s[i], i))
        counts[c][min(d2s[c] >> 16, nb - 1)] += 1
    for c in range(3):
        ys = counts[c]
        n = nb
        sx = sum(range(nb))
        sy = sum(ys)
        sxy = sum(i * y for i, y in enumerate(ys))
        sxx = sum(i * i for i in range(nb))
        slope = math.floor(1e6 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
        icept = math.floor(1e6 * (sy * sxx - sx * sxy) / (n * sxx - sx * sx))
        assert rows[c]["slope_scaled"] == slope
        assert rows[c]["icept_scaled"] == icept
        assert rows[c]["slope_scaled"] < 0  # density decays with radius
