"""Deterministic sharded export — the training-data hand-off sink.

A pretraining pipeline ends by materializing the curated corpus as N
equal-weight shards in a deterministic pseudo-random order (so any prefix
of any shard is an unbiased sample and re-runs are byte-reproducible).
The reference stops at query results (its PDB/SDB maps live in process,
``RSKQ_Biginteger.java:214-260``); this is the missing last mile for the
100 TB pipeline the engine feeds.

Design:

* shard id = md5(doc_id) folded to 40 bits, mod n_shards — content-blind,
  md5-uniform (balanced within sampling noise), and engine-neutral, so a
  DuckDB oracle replays the exact assignment.
* one shuffle total: ``repartition(n, shard)`` hash-partitions rows by the
  shard column so each task writes exactly one shard; within a shard rows
  are sorted by the full doc hash (deterministic pseudo-random order —
  any prefix is an unbiased sample).
* the manifest (shard, n_docs, digest) makes the export verifiable
  end-to-end: the digest is SUM of 40-bit folds of md5(doc_id:md5(text)),
  order-independent and engine-neutral, so manifest(re-read shards) ==
  manifest(source) proves nothing was lost, duplicated, or corrupted.
  Overflow bound: 40-bit terms in an int64 sum fault only past ~2^22 docs
  per shard under ANSI mode; beyond that, apply the two-level bucketed
  fold used by ``operators/spans.py`` (same discipline, documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hilbert_curve_spark.operators.dedup import _hex_to_long_sql

_DIGEST_MOD = 1 << 40

_DOC_KEY = "CAST(doc_id AS VARCHAR(32))"


def _shard_sql(n_shards: int) -> str:
    """Engine-neutral shard assignment: 40-bit md5 fold of the doc id,
    mod n_shards (both operands non-negative, so ``%`` agrees across
    engines)."""
    return f"({_hex_to_long_sql(f'md5({_DOC_KEY})', 1, 10)} % {int(n_shards)})"


def _digest_term_sql() -> str:
    """Per-doc 40-bit content digest term: id and content bound together so
    a doc swapped between shards or a text mutation both change the fold."""
    return _hex_to_long_sql(f"md5({_DOC_KEY} || ':' || md5(text))", 1, 10)


def shard_assign(docs: DataFrame, n_shards: int = 64) -> DataFrame:
    """Add the deterministic ``shard`` column (BIGINT in [0, n_shards))."""
    return docs.withColumn(
        "shard", F.expr(f"CAST({_shard_sql(n_shards)} AS BIGINT)")
    )


def write_shards(docs: DataFrame, path: str, n_shards: int = 64) -> None:
    """Materialize the corpus as ``shard=K/`` parquet directories.

    ``repartition(n_shards, shard)`` is the single shuffle: every row of a
    shard lands in one task, so each directory holds one file and a
    consumer can stream shard K with zero read amplification (Spark/
    duckdb/pyarrow all prune ``shard=K`` paths).  Rows are pre-sorted by
    the full doc hash — deterministic order, so re-runs are reproducible
    and any prefix of a shard is an unbiased sample."""
    (
        shard_assign(docs, n_shards)
        .repartition(int(n_shards), "shard")
        .sortWithinPartitions(F.expr(f"md5({_DOC_KEY})"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def shard_manifest(docs: DataFrame, n_shards: int = 64) -> DataFrame:
    """(shard, n_docs, digest) — the export's verification artifact.

    Order-independent modular digest per shard; computing it on the source
    and again on the re-read shards proves the export exactly (the driver
    query checks the source-side manifest against the DuckDB oracle, the
    round-trip test checks source == re-read)."""
    return (
        shard_assign(docs, n_shards)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum(F.expr(_digest_term_sql())) % F.lit(_DIGEST_MOD))
            .cast("long")
            .alias("digest"),
        )
    )


def shard_manifest_oracle(n_shards: int = 64, table: str = "documents") -> str:
    """Exact replay of shard assignment + digest fold (DuckDB SUM is
    HUGEINT, so the mod result is cast back to BIGINT)."""
    return (
        f"SELECT CAST({_shard_sql(n_shards)} AS BIGINT) AS shard, "
        f"COUNT(*) AS n_docs, "
        f"CAST(SUM({_digest_term_sql()}) % {_DIGEST_MOD} AS BIGINT) AS digest "
        f"FROM {table} GROUP BY 1"
    )


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Read one shard by partition path — a pruned scan, not a filter over
    the whole export."""
    return spark.read.option("basePath", path).parquet(f"{path}/shard={int(shard)}")


def compaction_plan(
    docs: DataFrame, n_shards: int = 64, target_rows: int = 4000
) -> DataFrame:
    """Small-files compaction planning (the Iceberg `rewrite_data_files`
    bin-pack step, planned declaratively): consecutive shards (order = the
    storage order, shard id) pack into merge groups of about
    ``target_rows`` — ``(group_id, n_shards, total_rows, first_shard,
    last_shard)`` with ``group_id = rows-before-this-shard DIV target``
    (the streaming first-fit rule: a group closes as soon as the running
    total crosses the target; an oversized shard occupies its own group
    tail).  Deterministic pure-integer plan — two engines or two runs
    produce byte-identical merge groups, which is what makes a compaction
    plan auditable.

    Plan: the per-shard counts are ONE hash aggregation over the corpus
    (map-side combine, |shards| rows out); the cumulative window and the
    group aggregation run over |shards| rows only — at a petabyte table
    the planning cost is the manifest row count, exactly like
    `sources/manifest.py` scan planning."""
    counts = shard_assign(docs, int(n_shards)).groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    from pyspark.sql import Window

    w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, 0)
    grouped = counts.withColumn(
        "cum_before", (F.sum("n_docs").over(w) - F.col("n_docs")).cast("long")
    ).withColumn(
        "group_id", F.expr(f"CAST(cum_before DIV {int(target_rows)} AS BIGINT)")
    )
    return grouped.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shards"),
        F.sum("n_docs").cast("long").alias("total_rows"),
        F.min("shard").cast("long").alias("first_shard"),
        F.max("shard").cast("long").alias("last_shard"),
    )


def compaction_plan_oracle(
    n_shards: int = 64, target_rows: int = 4000, table: str = "documents"
) -> str:
    """Identical shard counts, running total, and first-fit grouping."""
    return f"""WITH counts AS (
  SELECT CAST({_shard_sql(n_shards)} AS BIGINT) AS shard,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM {table} GROUP BY 1
), grouped AS (
  SELECT shard, n_docs,
         CAST(SUM(n_docs) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING)
              - n_docs AS BIGINT) AS cum_before
  FROM counts
)
SELECT CAST(cum_before // {int(target_rows)} AS BIGINT) AS group_id,
       CAST(COUNT(*) AS BIGINT) AS n_shards,
       CAST(SUM(n_docs) AS BIGINT) AS total_rows,
       CAST(MIN(shard) AS BIGINT) AS first_shard,
       CAST(MAX(shard) AS BIGINT) AS last_shard
FROM grouped GROUP BY 1"""
