"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` returns (spark, sf_dir) -> DataFrame callables, one per
implemented operator from SURVEY.md §2; ``oracle_sql()`` returns the
equivalent DuckDB SQL over the same parquet tables.  The interleaved spatial
corpus is *derived* from the flat ``documents`` table with exact integer
arithmetic defined once in ``hilbert_curve_spark/sources/derive.py`` and
rendered both as Spark expressions and as oracle SQL — so both engines see
bit-identical (x, y, keyword) values without any external data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hilbert_curve_spark import workload as W
from hilbert_curve_spark.config import DEFAULT
from hilbert_curve_spark.operators import brq as brq_ops
from hilbert_curve_spark.operators import range_query as rq
from hilbert_curve_spark.operators.encode import encode_documents
from hilbert_curve_spark.sources import derive
from hilbert_curve_spark.sources.interleave import build_documents


def _doc_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return encode_documents(build_documents(spark, sf_dir), DEFAULT)


def _doc_geo_cte() -> str:
    """Oracle-side doc_geo (DuckDB recomputes the derived corpus)."""
    return f"WITH doc_geo AS ({derive.doc_geo_select_sql('documents')})"


def _grq_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = rq.grq_range_mode(_doc_geo(spark, sf_dir), **W.R1)
    return out.select(F.col("doc_id"), F.col("x"), F.col("y"))


def _grq_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    dg = _doc_geo(spark, sf_dir)
    idx = rq.prefix_index(dg, DEFAULT)
    return rq.grq_prefix_mode(idx, **W.R3, config=DEFAULT)


def _brq_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = brq_ops.brq(_doc_geo(spark, sf_dir), **W.R2, keywords=W.KW_ANY, mode="any")
    return out.select("doc_id", "x", "y")


def _brq_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = brq_ops.brq_posting_mode(
        _doc_geo(spark, sf_dir),
        brq_ops.keyword_index(_doc_geo(spark, sf_dir)),
        **W.R1,
        keywords=W.KW_ALL,
        mode="all",
    )
    return out.select("doc_id", "x", "y")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BRQ (rectangle AND any-of-keywords) on sf0.001."""
    return _brq_any(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "grq_range": _grq_range,
        "grq_prefix": _grq_prefix,
        "brq_any": _brq_any,
        "brq_all": _brq_all,
    }


def _kw_any_sql(kws: list[str]) -> str:
    lits = ", ".join(f"'{k}'" for k in kws)
    terms = " OR ".join(f"kw{j} IN ({lits})" for j in range(derive.KW_PER_DOC))
    return f"({terms})"


def _kw_all_sql(kws: list[str]) -> str:
    terms = " AND ".join(
        "('{k}' IN ({cols}))".format(k=k, cols=", ".join(f"kw{j}" for j in range(derive.KW_PER_DOC)))
        for k in kws
    )
    return f"({terms})"


def oracle_sql() -> dict[str, str]:
    cte = _doc_geo_cte()
    return {
        "grq_range": (
            f"{cte} SELECT doc_key AS doc_id, x, y FROM doc_geo WHERE {W.box_sql(W.R1)}"
        ),
        "grq_prefix": (
            f"{cte} SELECT DISTINCT doc_key AS doc_id FROM doc_geo WHERE {W.box_sql(W.R3)}"
        ),
        "brq_any": (
            f"{cte} SELECT doc_key AS doc_id, x, y FROM doc_geo "
            f"WHERE {W.box_sql(W.R2)} AND {_kw_any_sql(W.KW_ANY)}"
        ),
        "brq_all": (
            f"{cte} SELECT doc_key AS doc_id, x, y FROM doc_geo "
            f"WHERE {W.box_sql(W.R1)} AND {_kw_all_sql(W.KW_ALL)}"
        ),
    }
