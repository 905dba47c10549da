"""Native-codegen Hilbert (curve/hilbert_native.py) vs the numpy kernel.

The numpy kernel is itself pinned to the reference Java goldens
(tests/test_hilbert.py), so equality here chains to the reference.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hilbert_curve_spark.curve.hilbert import decode2d, encode2d
from hilbert_curve_spark.curve.hilbert_native import (
    with_decode_native,
    with_hilbert_native,
)


def _mk_points(spark, xs, ys):
    return spark.createDataFrame(
        pd.DataFrame({"x": np.asarray(xs, np.int64), "y": np.asarray(ys, np.int64)})
    )


def test_native_encode_exhaustive_order3(spark):
    edge = 8
    xs, ys = np.meshgrid(np.arange(edge), np.arange(edge))
    xs, ys = xs.ravel(), ys.ravel()
    want = encode2d(xs, ys, 3)
    got = (
        with_hilbert_native(_mk_points(spark, xs, ys), order=3)
        .orderBy("x", "y")
        .toPandas()
    )
    ref = pd.DataFrame({"x": xs, "y": ys, "h": want}).sort_values(["x", "y"])
    assert got["hilbert"].to_numpy().tolist() == ref["h"].to_numpy().tolist()


def test_native_encode_random_order12_and_31(spark):
    # compare per-(x, y) pairing, not sorted multisets: a permutation bug at
    # high orders would survive a multiset compare (ADVICE r2)
    rng = np.random.default_rng(7)
    for order in (12, 31):
        edge = 1 << order
        xs = rng.integers(0, edge, 500, dtype=np.int64)
        ys = rng.integers(0, edge, 500, dtype=np.int64)
        want = {
            (int(x), int(y)): int(h)
            for x, y, h in zip(xs, ys, encode2d(xs, ys, order))
        }
        got = with_hilbert_native(_mk_points(spark, xs, ys), order=order)
        for r in got.collect():
            assert r.hilbert == want[(r.x, r.y)], f"order {order} mismatch at ({r.x},{r.y})"


def test_native_decode_roundtrip(spark):
    rng = np.random.default_rng(11)
    order = 12
    hs = rng.integers(0, 1 << (2 * order), 500, dtype=np.int64)
    want_x, want_y = decode2d(hs, order)
    df = spark.createDataFrame(pd.DataFrame({"hilbert": hs}))
    got = with_decode_native(df, order=order).orderBy("hilbert").toPandas()
    ref = (
        pd.DataFrame({"hilbert": hs, "x": want_x, "y": want_y})
        .drop_duplicates("hilbert")
        .sort_values("hilbert")
    )
    assert got[["x", "y"]].to_numpy().tolist() == ref[["x", "y"]].to_numpy().tolist()


def test_encode_documents_native_equals_arrow(spark, sf_dir):
    """The Arrow numpy-kernel encode (composable default) and the native
    unroll (bulk path) are independent implementations; doc_geo must agree
    row-for-row."""
    from hilbert_curve_spark.operators.encode import (
        encode_documents,
        encode_documents_native,
    )
    from hilbert_curve_spark.sources.interleave import build_documents

    docs = build_documents(spark, sf_dir, amp=2)
    a = encode_documents(docs).orderBy("doc_id").toPandas()
    b = encode_documents_native(docs).orderBy("doc_id").toPandas()
    assert a[["doc_id", "x", "y", "hilbert", "cell"]].equals(
        b[["doc_id", "x", "y", "hilbert", "cell"]]
    )


def test_native_encode_plan_is_pure_codegen(spark, tmp_path):
    # must be file-backed: a LocalRelation gets the whole unroll constant-
    # folded away at optimize time (itself proof the expression is pure)
    p = str(tmp_path / "pts.parquet")
    _mk_points(spark, [1, 2, 3], [4, 5, 6]).write.parquet(p)
    q = with_hilbert_native(spark.read.parquet(p), order=12)
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    # the unroll must not blow up into one giant collapsed expression —
    # planning this explain at order 12 in bounded time is itself the check;
    # every Project must be inside the single whole-stage-codegen span
    assert "codegen id : 1" in plan and "codegen id : 2" not in plan
