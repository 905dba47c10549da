"""Explicit hot-cell skew handling (north_rule requirement).

The corpus is deliberately multi-gaussian (~40% of docs around one center,
`SpatialDataProcessor/StaticData/DataSetAccess.java:149-162`), so the
spatial ``cell`` key is heavily skewed: a naive ``groupBy(cell)`` or a
shuffle join on ``cell`` puts the hot cells' docs on single reducers.

Two standard remedies, both implemented explicitly (AQE skew-join remains
on as backstop):

* **two-phase salted aggregation** — aggregate on ``(cell, salt)`` first
  (splits every hot key S ways), then re-aggregate on ``cell``.  Correct
  for any algebraic aggregate (sum/count/min/max).
* **salted replicate join** — for a shuffle join whose build side is small
  per key: the probe side gets ``salt = pmod(hash(<stable row cols>), S)``;
  the build side is replicated S ways with ``explode(sequence(0, S-1))``;
  the join key becomes ``(cell, salt)``.  Used when the dimension side is
  too big to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig


def salted_cell_counts(doc_geo: DataFrame, config: EngineConfig = DEFAULT) -> DataFrame:
    """(cell, n_docs) via two-phase salted aggregation."""
    s = config.salt_buckets
    partial = (
        doc_geo.withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(s)))
        .groupBy("cell", "salt")
        .agg(F.count("*").alias("pn"))
    )
    return partial.groupBy("cell").agg(F.sum("pn").alias("n_docs"))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    config: EngineConfig = DEFAULT,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Shuffle join on ``key`` with the probe side salted and the build side
    replicated ``salt_buckets`` ways.

    The probe salt is ``pmod(hash(<salt_cols>), S)`` — by default a hash of
    EVERY probe column, which is deterministic across retries/reruns (a
    task-retry must land each row in the same bucket or lineage-based
    recomputation changes physical placement).  Pass ``salt_cols`` to salt
    on a cheaper stable subset (e.g. a row id)."""
    s = config.salt_buckets
    cols = salt_cols if salt_cols is not None else probe.columns
    p = probe.withColumn("_salt", F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(s)))
    b = build.withColumn("_salt", F.explode(F.expr(f"sequence(0, {s - 1})")))
    out = p.join(b, [key, "_salt"], how)
    return out.drop("_salt")
