"""Hilbert-sorted storage layout — the scale keystone.

Writing ``doc_geo`` range-partitioned and sorted by ``hilbert`` makes every
spatial predicate (range covers, tile covers, kNN bands) a *pruned scan*:
parquet row-group min/max statistics line up with the curve, so an
OR-of-BETWEEN cover touches only the row groups whose hilbert interval
intersects the query — the distributed analogue of the reference's
prefix-keyed hash map lookup (PDB ``get``), but with zero index maintenance
beyond the sort.  This is SURVEY §4's "BPC ⇒ partition pruning" mapping.

At 100 TB the same layout is an Iceberg table with
``sort_order = hilbert`` (or a z-order rewrite); ``write_sorted`` is the
parquet stand-in with identical pruning behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_sorted(
    doc_geo: DataFrame,
    path: str,
    partitions: int = 32,
    sort_col: str = "hilbert",
) -> None:
    """Range-partition + sort by the curve and write parquet.

    repartitionByRange gives globally disjoint per-file hilbert intervals
    (file-level pruning), sortWithinPartitions gives row-group-level
    min/max locality inside each file."""
    (
        doc_geo.repartitionByRange(partitions, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def read_sorted(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
