"""File-level manifest pruning — the Iceberg metadata-skipping analogue.

The stored Hilbert layout (`sources/layout.py`) already prunes through
parquet row-group statistics, but a real lakehouse engine skips *whole
files* before any footer is opened: Iceberg keeps per-data-file column
bounds in manifest files and plans scans against the metadata alone.  The
reference's counterpart is the prefix-keyed map lookup — `PDB.get` in
`Scheme/RSKQ/RSKQ_Biginteger.java` touches only the buckets a query's
prefix cover names.

This module materializes that plan step explicitly so it can be tested and
measured: ``write_with_manifest`` writes the curve-sorted table plus a
``_manifest`` parquet (per-file ``min/max`` of the sort column + row
count — the Iceberg ``lower_bounds/upper_bounds`` shape; the leading ``_``
keeps Spark's file index from reading it as data), and ``prune_files``
plans a cover against the manifest only, returning the file subset whose
curve interval intersects any cover range.

At 100 TB the manifest is ~1 row per data file (a few hundred thousand
rows for a petabyte table) — a driver-side broadcast-scale read, which is
exactly how Iceberg's planning works; the data scan then opens only the
selected files, so query cost tracks result size, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .layout import write_sorted


def write_with_manifest(
    doc_geo: DataFrame,
    path: str,
    partitions: int = 32,
    sort_col: str = "hilbert",
) -> None:
    """Write the curve-sorted table and its file-bounds manifest.

    The manifest is derived from the data actually written (read-back with
    ``input_file_name`` + one tiny aggregation), so its bounds are true
    file statistics, not assumptions about the writer."""
    write_sorted(doc_geo, path, partitions=partitions, sort_col=sort_col)
    spark = doc_geo.sparkSession
    (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(sort_col).alias("lower"),
            F.max(sort_col).alias("upper"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "/_manifest")
    )


def prune_files(
    spark: SparkSession, path: str, ranges: list[tuple[int, int]]
) -> tuple[list[str], int]:
    """Plan a cover against the manifest alone: returns the data files whose
    ``[lower, upper]`` interval intersects any cover range, plus the total
    file count.  Interval overlap, not containment — cover ranges and file
    bounds both being inclusive."""
    man = spark.read.parquet(path + "/_manifest")
    import functools
    import operator

    pred = functools.reduce(
        operator.or_,
        [(F.col("lower") <= hi) & (F.col("upper") >= lo) for lo, hi in ranges],
    )
    rows = man.select("file", "lower", "upper").filter(pred).collect()
    total = man.count()
    return sorted(r.file for r in rows), total


def read_pruned(
    spark: SparkSession, path: str, ranges: list[tuple[int, int]]
) -> DataFrame:
    """Scan only the manifest-selected files.  An empty selection returns an
    empty frame with the table's schema (the planned scan of a no-overlap
    query reads zero files — Iceberg's empty scan task list)."""
    files, _ = prune_files(spark, path, ranges)
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)


def write_with_keyword_manifest(
    doc_geo: DataFrame,
    path: str,
    partitions: int = 32,
    sort_col: str = "hilbert",
) -> None:
    """Write the curve-sorted table plus a manifest carrying BOTH pruning
    dimensions: per-file curve bounds (``lower/upper``, as
    :func:`write_with_manifest`) and the file's distinct keyword VALUE SET
    (``kw_set`` — the Iceberg per-column value-set / bloom-filter analogue;
    the reference's counterpart is the keyword-keyed bucket map ``KDB`` in
    `Scheme/RSKQ/RSKQ_Biginteger.java:618-873, reference` — only buckets a
    query keyword names are ever touched).

    The set is exact here (the fixture keyword universe is ~8k strings); at
    100 TB a hot keyword appears in every file, so the set stays small per
    file only for the rare keywords that benefit from pruning — which is
    exactly the Iceberg bloom-filter tradeoff this models.  The manifest is
    still ~1 row per data file: driver-broadcast planning scale."""
    write_sorted(doc_geo, path, partitions=partitions, sort_col=sort_col)
    spark = doc_geo.sparkSession
    (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(sort_col).alias("lower"),
            F.max(sort_col).alias("upper"),
            F.count(F.lit(1)).alias("n_rows"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("keywords")))
            ).alias("kw_set"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "/_kwmanifest")
    )


def prune_files_keyword(
    spark: SparkSession,
    path: str,
    keywords: list[str],
    ranges: list[tuple[int, int]] | None = None,
) -> tuple[list[str], int]:
    """Plan a keyword (+ optional curve-cover) query against the manifest
    alone: keep files whose value set intersects the query keywords AND —
    when a cover is given — whose curve interval overlaps a cover range.
    Lossless by construction: a skipped file provably contains no row that
    could satisfy the disjunctive keyword test, regardless of its
    coordinates."""
    man = spark.read.parquet(path + "/_kwmanifest")
    pred = F.arrays_overlap(
        F.col("kw_set"), F.array(*[F.lit(k) for k in keywords])
    )
    if ranges:
        import functools
        import operator

        pred = pred & functools.reduce(
            operator.or_,
            [(F.col("lower") <= hi) & (F.col("upper") >= lo) for lo, hi in ranges],
        )
    rows = man.select("file").filter(pred).collect()
    total = man.count()
    return sorted(r.file for r in rows), total


def read_keyword_pruned(
    spark: SparkSession,
    path: str,
    keywords: list[str],
    ranges: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Scan only the keyword-manifest-selected files (empty selection ->
    empty frame with the table's schema, as :func:`read_pruned`)."""
    files, _ = prune_files_keyword(spark, path, keywords, ranges)
    if not files:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)
