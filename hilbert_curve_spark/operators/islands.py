"""Distributed gap-and-island range merge (reference S4's merge step,
`hilbert/HilbertApp/HilbertRangeSearchApp.java:66-82` and
`SmallHilbertCurve.java:195-221`, lifted from a sequential loop to window
functions — SURVEY §2.3 notes the reference carries this state in loops).

Given a (possibly huge) set of Hilbert values, produce the disjoint
ascending ranges of consecutive values::

    lag -> new-island flag -> running sum -> groupBy island -> min/max

This is the scale path for computing the exact cover of a *gigantic* region
(bigger than driver memory): enumerate cells distributed, encode, then
merge here.  One shuffle (orderBy/window on a single ordered key) — for
range-partitioned hilbert input the sort is partial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_islands(values: DataFrame, col: str = "hilbert") -> DataFrame:
    """values: one column of int64 (duplicates allowed) -> (lo, hi) ranges."""
    w = Window.orderBy(col)
    dedup = values.select(col).distinct()
    flagged = dedup.withColumn(
        "b",
        F.when(F.col(col) - F.lag(col).over(w) == 1, 0).otherwise(1),
    )
    islands = flagged.withColumn("island", F.sum("b").over(w))
    return (
        islands.groupBy("island")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .select("lo", "hi")
    )


def merge_islands_oracle(values_sql: str, col: str = "hilbert") -> str:
    """Oracle for merge_islands over ``values_sql`` (yields column {col})."""
    return f"""
WITH vals AS (SELECT DISTINCT {col} FROM ({values_sql})), flagged AS (
  SELECT {col},
         CASE WHEN {col} - LAG({col}) OVER (ORDER BY {col}) = 1 THEN 0 ELSE 1 END AS b
  FROM vals
), isl AS (
  SELECT {col}, SUM(b) OVER (ORDER BY {col} ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT MIN({col}) AS lo, MAX({col}) AS hi FROM isl GROUP BY island
"""
