"""Arbitrary-precision n-D Hilbert path: cross-check vs the vectorized
int64 kernel where both apply, round-trip + curve-adjacency where only the
wide path can go (order > 31 / higher dims — reference
``HilbertCurve.java:79-109`` BigInteger domain)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hilbert_curve_spark.curve.hilbert import decode_nd, encode_nd
from hilbert_curve_spark.curve.hilbert_wide import (
    decode_index_wide,
    encode_point_wide,
    hex_to_index,
    hilbert_wide_decode_udf,
    hilbert_wide_udf,
    index_to_hex,
)


@pytest.mark.parametrize("dims,order", [(2, 3), (2, 8), (3, 5), (4, 4)])
def test_wide_matches_vectorized_kernel(dims, order):
    rng = np.random.default_rng(7)
    pts = rng.integers(0, 1 << order, size=(200, dims), dtype=np.int64)
    vec = encode_nd([pts[:, j] for j in range(dims)], order)
    for row, h in zip(pts, vec):
        assert encode_point_wide(row.tolist(), order) == int(h)


@pytest.mark.parametrize("dims,order", [(2, 40), (3, 30), (5, 17)])
def test_wide_roundtrip_beyond_int64(dims, order):
    assert dims * order > 63  # genuinely outside the int64 kernel's domain
    rng = np.random.default_rng(11)
    for _ in range(50):
        pt = [int(v) for v in rng.integers(0, 1 << min(order, 62), size=dims)]
        h = encode_point_wide(pt, order)
        assert decode_index_wide(h, order, dims) == pt
        assert hex_to_index(index_to_hex(h, order, dims)) == h


def test_wide_curve_adjacency():
    """Consecutive indices are lattice neighbours (the Hilbert property) —
    holds at any width if the transform is correct."""
    dims, order = 3, 30
    start = encode_point_wide([123456789, 987654321, 55555555], order)
    prev = decode_index_wide(start, order, dims)
    for h in range(start + 1, start + 20):
        cur = decode_index_wide(h, order, dims)
        dist = sum(abs(a - b) for a, b in zip(prev, cur))
        assert dist == 1
        prev = cur


def test_wide_hex_sorts_numerically():
    dims, order = 2, 40
    hs = [encode_point_wide([i * 997, i * 131071 % (1 << order)], order) for i in range(100)]
    hexes = [index_to_hex(h, order, dims) for h in hs]
    assert sorted(hexes) == [x for _, x in sorted(zip(hs, hexes))]


def test_wide_udf_roundtrip(spark):
    dims, order = 3, 30
    rows = [([int(i * 1013904223 % (1 << order)),
              int(i * 2654435761 % (1 << order)),
              int(i * 97 % (1 << order))],) for i in range(64)]
    df = spark.createDataFrame(rows, "coords array<bigint>")
    out = (
        df.withColumn("hx", hilbert_wide_udf(order, dims)(F.col("coords")))
        .withColumn("back", hilbert_wide_decode_udf(order, dims)(F.col("hx")))
        .collect()
    )
    for r in out:
        assert r["back"] == r["coords"]
        assert len(r["hx"]) == (order * dims + 3) // 4
