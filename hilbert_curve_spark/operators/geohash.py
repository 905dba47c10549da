"""Geohash prefix search — box queries answered through string-prefix cells.

The reference answers range queries by covering the box with Hilbert curve
ranges (`Scheme/RSKQ/RSKQ_Biginteger.java` search path); this operator is
the same over-approximate-then-refine contract expressed in the geohash
world: the box is covered by a literal list of fixed-length geohash
prefixes (each an axis-aligned rectangle — `curve/geohash.py`), the scan
filter is a codegen ``IN`` over the derived geohash column, and the exact
box residual removes the partial-cell overshoot.  Against a table that
STORES its geohash (the common key-value layout), the IN-list pushes to
the scan and prunes files exactly like the Hilbert stored layout does.

At 100 TB: the prefix list is computed on the driver from the box alone
(O(box/cell) literals, no data touched), the filter is a broadcast-free
codegen IN, and the residual is a row-local predicate — one scan, zero
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..curve.geohash import cover_box_prefixes, geohash_sql


def with_geohash(
    doc_geo: DataFrame, chars: int, config: EngineConfig = DEFAULT
) -> DataFrame:
    """Materialize the ``chars``-character geohash of (x, y) — pure codegen
    string/bit arithmetic, no Python."""
    return doc_geo.withColumn(
        "gh", F.expr(geohash_sql("x", "y", config.order, chars, "DIV"))
    )


def geohash_search(
    doc_geo: DataFrame,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    chars: int,
    config: EngineConfig = DEFAULT,
) -> DataFrame:
    """Docs inside the inclusive box via geohash-prefix cover + exact
    residual.  Result is curve-independent (same oracle as the plain box)."""
    prefixes = cover_box_prefixes(x_lo, x_hi, y_lo, y_hi, config.order, chars)
    gh = F.expr(geohash_sql("x", "y", config.order, chars, "DIV"))
    return doc_geo.filter(
        gh.isin(prefixes)
        & F.col("x").between(x_lo, x_hi)
        & F.col("y").between(y_lo, y_hi)
    )
