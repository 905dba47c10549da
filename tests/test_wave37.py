"""Wave-37: source-format fidelity — JSONL and ORC export/re-ingest
round-trips must be lossless."""


def _box_rows(spark, sf_dir):
    import __spark_entry__ as E
    from hilbert_curve_spark import workload as W
    from pyspark.sql import functions as F

    dg = E._doc_geo(spark, sf_dir)
    return {
        (r.doc_id, r.x, r.y)
        for r in dg.filter(
            (F.col("x") >= W.R1["x_lo"]) & (F.col("x") <= W.R1["x_hi"])
            & (F.col("y") >= W.R1["y_lo"]) & (F.col("y") <= W.R1["y_hi"])
        ).select("doc_id", "x", "y").collect()
    }


def test_jsonl_roundtrip(spark, sf_dir):
    import __spark_entry__ as E

    got = {tuple(r) for r in E._jsonl_roundtrip(spark, sf_dir).collect()}
    assert got == _box_rows(spark, sf_dir)
    assert got


def test_orc_roundtrip(spark, sf_dir):
    import __spark_entry__ as E

    got = {tuple(r) for r in E._orc_roundtrip(spark, sf_dir).collect()}
    assert got == _box_rows(spark, sf_dir)
    assert got
