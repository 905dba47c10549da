"""Wave-52: curve locality report (`operators/zorder.py`) and incremental
raster maintenance (`operators/updates.py::raster_ivm`) — brute-force
parity and the IVM identity.  Oracle parity runs in ``test_entry_parity``."""

import pytest
from pyspark.sql import functions as F

from hilbert_curve_spark import workload as W
from hilbert_curve_spark.curve.hilbert import encode2d
from hilbert_curve_spark.curve.morton import encode2d_z
from hilbert_curve_spark.operators.updates import (
    build_update_stream,
    merge_on_read,
    raster_ivm,
)
from hilbert_curve_spark.operators.zorder import curve_locality_report


def _brute_runs(idxs):
    idxs = sorted(idxs)
    return 1 + sum(1 for a, b in zip(idxs, idxs[1:]) if b != a + 1)


@pytest.mark.parametrize("curve_fn,name", [(encode2d, "hilbert"), (encode2d_z, "z")])
def test_locality_report_matches_numpy_curves(spark, curve_fn, name):
    box = dict(box_id="b", x_lo=900, x_hi=1226, y_lo=800, y_hi=1126)
    df = curve_locality_report(spark, [box], cell_shift=4)
    got = {r["curve"]: (r["n_cells"], r["n_runs"]) for r in df.collect()}
    cells = [
        (cx, cy)
        for cx in range(900 >> 4, (1226 >> 4) + 1)
        for cy in range(800 >> 4, (1126 >> 4) + 1)
    ]
    idxs = [int(curve_fn([cx], [cy], 8)[0]) for cx, cy in cells]
    assert got[name] == (len(cells), _brute_runs(idxs))


def test_hilbert_fragments_less_than_z_on_every_box(spark):
    boxes = [
        dict(box_id="r1", **W.R1),
        dict(box_id="r2", **W.R2),
        dict(box_id="r3", **W.R3),
    ]
    rows = curve_locality_report(spark, boxes).collect()
    by = {(r["box_id"], r["curve"]): r for r in rows}
    for b in ("r1", "r2", "r3"):
        assert by[(b, "hilbert")]["n_cells"] == by[(b, "z")]["n_cells"]
        assert by[(b, "hilbert")]["n_runs"] < by[(b, "z")]["n_runs"]


def test_raster_ivm_identity_and_recompute(spark, sf_dir):
    """n_live must equal BOTH the incremental identity and an independent
    live-set histogram recompute."""
    from hilbert_curve_spark.operators.updates import _sid_expr
    from hilbert_curve_spark.sources import derive

    out = raster_ivm(spark, sf_dir, shift=6).collect()
    for r in out:
        assert r["n_live"] == r["n_base"] + r["n_gained"] - r["n_lost"]
        assert 0 <= r["n_gained"] and 0 <= r["n_lost"] <= r["n_base"]
    log = build_update_stream(spark, sf_dir)
    live = merge_on_read(log)
    sid = _sid_expr()
    cells = live.select(
        F.expr(
            f"(({derive.x_sql(sid)}) >> 6) * 64 + (({derive.y_sql(sid)}) >> 6)"
        ).alias("cell")
    ).groupBy("cell").count()
    recompute = {r["cell"]: r["count"] for r in cells.collect()}
    got = {r["cell"]: r["n_live"] for r in out if r["n_live"] > 0}
    assert got == recompute


def test_raster_ivm_base_version_extremes(spark, sf_dir):
    """base at the head => no transitions; base before v2 deletions =>
    deletions all appear as losses."""
    head = raster_ivm(spark, sf_dir, base_version=3).collect()
    assert all(r["n_gained"] == 0 and r["n_lost"] == 0 for r in head)
    early = raster_ivm(spark, sf_dir, base_version=1).collect()
    assert sum(r["n_lost"] for r in early) > 0
    # v3 re-adds half the v2 deletions: gains stay zero at base_version 1
    # only if no doc flips 0->1, which DOES happen (sid % 14) -> expect > 0
    assert sum(r["n_gained"] for r in early) == 0  # re-adds flip docs deleted AFTER base: lb=1 so not gains
