"""Count-min-sketch heavy hitters: CMS guarantees and exactness regimes."""

from pyspark.sql import functions as F

from hilbert_curve_spark.operators import textops as T


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_cms_overestimates_never_under(spark, sf_dir):
    rows = T.heavy_hitters_cms(_docs(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["exact_n"], r
    absent = [r for r in rows if r["kw"] == "zzz-absent"]
    assert absent and absent[0]["exact_n"] == 0


def test_cms_wide_sketch_is_exact(spark, sf_dir):
    """With width >> vocabulary, no bucket collides and every estimate is
    exact — the sketch degrades gracefully to a plain histogram."""
    rows = T.heavy_hitters_cms(_docs(spark, sf_dir), width=1 << 16).collect()
    assert all(r["cms_est"] == r["exact_n"] for r in rows)


def test_cms_narrow_sketch_overestimates(spark, sf_dir):
    """A 4-bucket sketch over a ~40-word vocabulary MUST collide: at least
    one probe strictly overestimates, none underestimates."""
    rows = T.heavy_hitters_cms(_docs(spark, sf_dir), depth=2, width=4).collect()
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)
    assert any(r["cms_est"] > r["exact_n"] for r in rows)


def test_cms_exact_counts_match_plain_aggregation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    got = {
        r["kw"]: r["exact_n"]
        for r in T.heavy_hitters_cms(docs).collect()
    }
    plain = {
        r["kw"]: r["n"]
        for r in docs.select(F.explode(F.expr("split(text, ' ')")).alias("kw"))
        .groupBy("kw")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for kw, n in got.items():
        assert n == plain.get(kw, 0)


def test_cms_plan_no_python(spark, sf_dir):
    plan = (
        T.heavy_hitters_cms(_docs(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
