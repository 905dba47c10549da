"""Equi-depth Hilbert range-partitioner planning.

The engine's storage layout sorts by the Hilbert index
(`sources/layout.py::write_sorted` — the Spark-side analogue of the
reference's curve-ordered prefix store, `Scheme/RSKQ/RSKQ_Biginteger.java`
PDB keying).  Writing that layout balanced at 100 TB needs RANGE BOUNDS:
``B`` hilbert split points such that each bucket holds ~``N/B`` docs.
Spark's own ``repartitionByRange`` samples non-deterministically
(reservoir per partition), so the planning step is re-expressed here as a
deterministic, oracle-checkable operator over the cell histogram:

    cells     = per-cell counts (ONE salted corpus scan — never a global
                sort of the data; the histogram is O(cells), not O(docs))
    cum(c)    = running total in cell order (cells are hilbert-prefix
                intervals, so cell order IS curve order)
    bound(k)  = first cell whose cumulative count reaches k*N/B

Bounds are exact at cell granularity — the same granularity the layout's
min/max pruning operates at — and the whole plan after the scan is
O(cells): one single-partition window over the histogram (thousands of
rows) plus a codegen explode, no joins.  The bucket-for-threshold search
is an explode+filter, NOT a broadcast range join: a B x cells nested-loop
join would be banned by the engine's no-BNLJ rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from .skew import salted_cell_counts


def partition_bounds(
    doc_geo: DataFrame, buckets: int, config: EngineConfig = DEFAULT
) -> DataFrame:
    """The ``buckets - 1`` interior split cells of an equi-depth hilbert
    range partitioning: ``(bucket, bound_cell, cum_docs)`` where
    ``bound_cell`` is the first cell (in curve order) whose running doc
    count reaches threshold ``max(1, (bucket * N) DIV buckets)`` and
    ``cum_docs`` that running count.

    Bucket ``k``'s data interval is ``(bound(k-1), bound(k)]`` in cell
    space; each holds ``N/B`` docs up to one cell's worth of slack (the
    histogram granularity).  Deterministic: integer thresholds, cumulative
    sums over the total cell order — no sampling, no RNG."""
    cells = salted_cell_counts(doc_geo, config)
    w = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = (
        cells.withColumn("cum", F.sum("n_docs").over(w))
        .withColumn("n_total", F.sum("n_docs").over(wt))
        .withColumn("prev", F.col("cum") - F.col("n_docs"))
    )
    return (
        cum.withColumn("bucket", F.explode(F.expr(f"sequence(1, {buckets - 1})")))
        .withColumn(
            "thr",
            F.expr(f"greatest((bucket * n_total) div {buckets}, 1)").cast("long"),
        )
        .filter((F.col("thr") > F.col("prev")) & (F.col("thr") <= F.col("cum")))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("cell").alias("bound_cell"),
            F.col("cum").cast("long").alias("cum_docs"),
        )
    )


def partition_bounds_oracle(buckets: int) -> str:
    """SELECT body over a CTE chain that defines ``doc_geo`` and the
    hilbert values ``hv(cx, cy, hilbert)`` (the caller composes
    ``tiles.hilbert_sql_cte`` exactly as the cell_stats oracle does):
    identical histogram, running sum, and threshold arithmetic."""
    # NB: named chist, not cells — tiles.hilbert_sql_cte already defines a
    # CTE called cells in the chain this body is appended to.
    return f"""chist AS (
  SELECT hv.hilbert >> {2 * DEFAULT.cell_shift} AS cell, COUNT(*) AS n
  FROM doc_geo d JOIN hv ON d.x = hv.cx AND d.y = hv.cy GROUP BY 1
), cum AS (
  SELECT cell,
         CAST(SUM(n) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS n_total,
         CAST(SUM(n) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS prev
  FROM chist
)
SELECT CAST(k.k AS INT) AS bucket, c.cell AS bound_cell, c.cum AS cum_docs
FROM cum c JOIN (SELECT unnest(range(1, {buckets})) AS k) k
  ON GREATEST((k.k * c.n_total) // {buckets}, 1) > c.prev
 AND GREATEST((k.k * c.n_total) // {buckets}, 1) <= c.cum"""


def skew_report(
    doc_geo: DataFrame, topk: int, config: EngineConfig = DEFAULT
) -> DataFrame:
    """Hot-cell skew diagnostics: the ``topk`` most populated cells with
    exact integer shares — ``(rank, cell, n_docs, share_ppm, cum_ppm)``.

    This is the planning read-out that DRIVES the engine's explicit skew
    handling (`operators/skew.py`): a cell whose ``share_ppm`` exceeds
    ~1/shuffle-partitions of the corpus is exactly the key a naive
    ``groupBy(cell)``/cell-join would serialize onto one reducer, so the
    salt factor and AQE skew thresholds are sized from this report.  The
    corpus's deliberate multi-gaussian hot spots
    (`SpatialDataProcessor/StaticData/DataSetAccess.java:149-162`) make the
    report non-trivial at every scale.

    Plan: ONE salted corpus scan (the shared histogram), then a
    single-partition window over the O(cells) histogram — thousands of
    rows regardless of corpus size, the same documented shape as
    ``partition_bounds``.  Shares are FLOOR-ppm (integer DIV), so the
    DuckDB oracle matches bit-for-bit; ties rank by cell id —
    deterministic total order."""
    cells = salted_cell_counts(doc_geo, config)
    w = Window.orderBy(F.desc("n_docs"), F.asc("cell"))
    ranked = (
        cells.withColumn("n_total", F.sum("n_docs").over(Window.partitionBy()))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum", F.sum("n_docs").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    return ranked.filter(F.col("rank") <= topk).select(
        F.col("rank").cast("int").alias("rank"),
        F.col("cell").cast("long").alias("cell"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.expr("CAST((n_docs * 1000000) DIV n_total AS BIGINT)").alias("share_ppm"),
        F.expr("CAST((cum * 1000000) DIV n_total AS BIGINT)").alias("cum_ppm"),
    )


def skew_report_oracle(topk: int) -> str:
    """SELECT body over the same hilbert CTE chain as
    :func:`partition_bounds_oracle` — identical histogram, ranking order,
    and FLOOR-ppm arithmetic."""
    return f"""chist AS (
  SELECT hv.hilbert >> {2 * DEFAULT.cell_shift} AS cell, COUNT(*) AS n
  FROM doc_geo d JOIN hv ON d.x = hv.cx AND d.y = hv.cy GROUP BY 1
), ranked AS (
  SELECT cell, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, cell) AS rank,
         CAST(SUM(n) OVER (ORDER BY n DESC, cell ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS n_total
  FROM chist
)
SELECT CAST(rank AS INT) AS rank, CAST(cell AS BIGINT) AS cell,
       CAST(n AS BIGINT) AS n_docs,
       CAST((n * 1000000) // n_total AS BIGINT) AS share_ppm,
       CAST((cum * 1000000) // n_total AS BIGINT) AS cum_ppm
FROM ranked WHERE rank <= {topk}"""
