"""Mercator + quantize vs Java-executed reference goldens (bit-compare on
projection doubles, exact compare on quantized lattice coords)."""

import math
from pathlib import Path

from hilbert_curve_spark.operators.project import mercator, quantize

GOLDEN = Path(__file__).parent / "golden" / "reference_golden.txt"


def _lines(prefix):
    return [
        line.split()[1:]
        for line in GOLDEN.read_text().splitlines()
        if line.startswith(prefix + " ")
    ]


def test_mercator_matches_java(spark):
    cases = [(float(a), float(b), float(c), float(d)) for a, b, c, d in _lines("MERC")]
    df = spark.createDataFrame(
        [(lat, lon) for lat, lon, _, _ in cases], "lat double, lon double"
    )
    rows = {(r["lat"], r["lon"]): (r["mx"], r["my"]) for r in mercator(df).collect()}
    for lat, lon, ex, ey in cases:
        gx, gy = rows[(lat, lon)]
        # JVM-side Math on both sides -> bit-identical expected; allow 1 ulp
        assert math.isclose(gx, ex, rel_tol=1e-15, abs_tol=1e-9), (lat, lon, gx, ex)
        assert math.isclose(gy, ey, rel_tol=1e-15, abs_tol=1e-9), (lat, lon, gy, ey)


def test_quantize_matches_java(spark):
    # the Java golden quantized the first four points as the "dataset"
    pts = [(float(a), float(b)) for a, b, _, _ in _lines("MERC")][:4]
    expected = {
        (float(a), float(b)): (int(c), int(d)) for a, b, c, d in _lines("QUANT")
    }
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = quantize(mercator(df), order=19)
    got = {(r["lat"], r["lon"]): (r["x"], r["y"]) for r in out.collect()}
    assert got == expected
    # lattice bounds
    for x, y in got.values():
        assert 0 <= x < (1 << 19) and 0 <= y < (1 << 19)
