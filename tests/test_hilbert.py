"""Hilbert kernel unit tests — golden vectors produced by executing the
reference Java kernel (`hilbert/HilbertComponent/HilbertCurve.java`)."""

import numpy as np
import pytest

from hilbert_curve_spark.curve.hilbert import decode2d, encode2d, encode_nd, decode_nd

# printed by the compiled reference kernel (PrefixClusterTest-style dump)
GOLD = {
    3: {(5, 6): 39, (2, 4): 30, (1, 3): 12, (4, 0): 58, (0, 0): 0,
        (7, 7): 42, (3, 5): 28, (6, 2): 50},
    8: {(200, 13): 61587, (255, 255): 43690, (0, 255): 21845, (137, 42): 58925},
    16: {(65535, 0): 4294967295, (12345, 54321): 1555040834, (40000, 1): 3958378497},
}


@pytest.mark.parametrize("order", sorted(GOLD))
def test_encode_golden(order):
    pts = GOLD[order]
    xs = np.array([p[0] for p in pts], dtype=np.int64)
    ys = np.array([p[1] for p in pts], dtype=np.int64)
    got = encode2d(xs, ys, order)
    assert got.tolist() == list(pts.values())


def test_decode_golden():
    x, y = decode2d(np.array([12345]), 8)
    assert (x[0], y[0]) == (62, 123)
    x, y = decode2d(np.array([999999999]), 16)
    assert (x[0], y[0]) == (3919, 23504)


@pytest.mark.parametrize("order", [3, 8, 12, 16, 20])
def test_round_trip(order):
    rng = np.random.default_rng(42)
    n = 1 << order
    xs = rng.integers(0, n, 5000)
    ys = rng.integers(0, n, 5000)
    h = encode2d(xs, ys, order)
    rx, ry = decode2d(h, order)
    assert (rx == xs).all() and (ry == ys).all()
    assert h.min() >= 0 and h.max() < (1 << (2 * order))


@pytest.mark.parametrize("order", [2, 3, 5, 7])
def test_curve_adjacency(order):
    """Consecutive curve positions are lattice neighbours (Hilbert property)."""
    n = 1 << order
    h = np.arange(n * n, dtype=np.int64)
    px, py = decode2d(h, order)
    d = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (d == 1).all()
    # bijectivity
    assert len(np.unique(px * n + py)) == n * n


def test_nd_round_trip():
    rng = np.random.default_rng(7)
    order, dims = 5, 3
    coords = [rng.integers(0, 1 << order, 1000) for _ in range(dims)]
    h = encode_nd(coords, order)
    back = decode_nd(h, order, dims)
    for a, b in zip(coords, back):
        assert (a == b).all()
