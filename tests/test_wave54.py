"""Wave-54: cross-dataset doc x event proximity join
(`operators/spatial_join.py::doc_event_join`) — brute-force parity and
blocking losslessness.  Oracle parity runs in ``test_entry_parity``."""

from pyspark.sql import functions as F

from hilbert_curve_spark.config import DEFAULT
from hilbert_curve_spark.operators.spatial_join import doc_event_join
from hilbert_curve_spark.sources import derive


def test_doc_event_join_matches_quadratic(spark, sf_dir):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir), DEFAULT)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_id"]: r["n_docs"]
        for r in doc_event_join(geo, events, radius=16, event_mod=16).collect()
    }
    ev = (
        events.filter(F.col("event_id") % 16 == 0)
        .select(
            "event_id",
            F.expr(derive.x_sql("event_id")).alias("ex"),
            F.expr(derive.y_sql("event_id")).alias("ey"),
        )
        .collect()
    )
    docs = geo.select("x", "y").collect()
    pts = [(r["x"], r["y"]) for r in docs]
    assert set(got) == {r["event_id"] for r in ev}
    n_zero = 0
    for r in ev:
        n = sum(
            1
            for x, y in pts
            if (x - r["ex"]) ** 2 + (y - r["ey"]) ** 2 <= 16 * 16
        )
        assert got[r["event_id"]] == n
        n_zero += n == 0
    # the fixture must exercise BOTH branches: events with and without
    # neighboring documents
    assert n_zero > 0 and n_zero < len(ev)


def test_doc_event_join_plan_is_blocked_equi_join(spark, sf_dir):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4), DEFAULT)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = doc_event_join(geo, events)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
