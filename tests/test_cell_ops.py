"""cell_change (two-horizon change map) and cell_sample (spatially
stratified sampling) — brute-force parity + invariants
(`operators/rollup.py`)."""

from pyspark.sql import functions as F

from hilbert_curve_spark.config import DEFAULT
from hilbert_curve_spark.operators.rollup import cell_change, cell_sample

SHIFT = 4
EDGE_CELLS = DEFAULT.edge >> SHIFT


def _geo(spark, pts):
    rows = [(f"d{i:04d}", x, y) for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows, "doc_id string, x long, y long")


def _lcg_points(n, seed=3, edge=512):
    pts, s = [], seed
    for _ in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        x = s % edge
        s = (s * 1103515245 + 12345) % (1 << 31)
        pts.append((x, s % edge))
    return pts


def _log(spark, n):
    # v1: all added; v2: every 3rd deleted; v3: every 6th re-added
    rows = [(f"d{i:04d}", 1, "add") for i in range(n)]
    rows += [(f"d{i:04d}", 2, "del") for i in range(0, n, 3)]
    rows += [(f"d{i:04d}", 3, "add") for i in range(0, n, 6)]
    return spark.createDataFrame(rows, "doc_id string, version int, op string")


def test_cell_change_matches_brute_force(spark):
    pts = _lcg_points(300)
    got = {
        (r.cell, r.n_before, r.n_after, r.delta)
        for r in cell_change(
            _geo(spark, pts), _log(spark, len(pts)), 2, 3, SHIFT
        ).collect()
    }
    want = {}
    for i, (x, y) in enumerate(pts):
        in_b = not (i % 3 == 0)
        in_a = in_b or (i % 6 == 0)
        cell = (x >> SHIFT) * EDGE_CELLS + (y >> SHIFT)
        b, a = want.get(cell, (0, 0))
        want[cell] = (b + in_b, a + in_a)
    assert got == {(c, b, a, a - b) for c, (b, a) in want.items()}


def test_cell_change_same_horizon_is_zero_delta(spark):
    pts = _lcg_points(200)
    out = cell_change(_geo(spark, pts), _log(spark, len(pts)), 3, 3, SHIFT)
    rows = out.collect()
    assert rows and all(r.delta == 0 and r.n_before == r.n_after for r in rows)


def test_cell_sample_invariants(spark):
    pts = _lcg_points(400, edge=128)  # dense cells so the cap binds
    geo = _geo(spark, pts)
    k = 3
    a = cell_sample(geo, k, SHIFT).collect()
    b = cell_sample(geo, k, SHIFT).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    per_cell = {}
    for r in a:
        per_cell[r.cell] = per_cell.get(r.cell, 0) + 1
    assert max(per_cell.values()) <= k
    # cells with <= k docs keep all of them
    occ = {}
    for x, y in pts:
        c = (x >> SHIFT) * EDGE_CELLS + (y >> SHIFT)
        occ[c] = occ.get(c, 0) + 1
    for c, n in occ.items():
        assert per_cell.get(c, 0) == min(n, k)


def test_cell_sample_plan_no_python(spark):
    pts = _lcg_points(50)
    plan = (
        cell_sample(_geo(spark, pts), 2, SHIFT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
