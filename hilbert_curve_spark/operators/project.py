"""Geodetic ETL: Mercator projection + extent scan + lattice quantization
(reference E4/E5,
`SpatialDataProcessor/BirminghanData/MercatorProjection.java:66-77` and
`HilbertCoordinateProcessor.java:21-67`), as native Column expressions.

Two-pass exactly like the reference: (1) extent aggregation (one tiny
all-reduce), (2) scale to the ``[0, 2**order - 1]`` lattice with the
reference's side-length/top-left-origin/truncate-toward-zero semantics
(Java ``(int)`` cast == Spark ``CAST AS INT`` for in-range doubles).

Validated against golden values produced by executing the reference
formulae in Java (tests/golden/reference_golden.txt MERC/QUANT lines).
Cross-engine float parity for log/tan is not assumed — this operator is
pytest-verified against the Java goldens rather than DuckDB (SURVEY §2.2
E4 note)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R_MAJOR = 6378137.0


def mercator(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Adds mx/my meter columns (lat clamped to +-89.5 like the reference)."""
    lat = F.greatest(F.lit(-89.5), F.least(F.lit(89.5), F.col(lat_col)))
    mx = F.lit(R_MAJOR) * F.radians(F.col(lon_col))
    my = F.lit(R_MAJOR) * F.log(F.tan(F.lit(0.7853981633974483) + F.radians(lat) / 2))
    return df.withColumn("mx", mx).withColumn("my", my)


def quantize(df: DataFrame, order: int = 19) -> DataFrame:
    """Extent scan + scale to the integer lattice (reference semantics:
    square side = max span, origin at top-left, y axis flipped, truncate)."""
    ext = df.agg(
        F.min("mx").alias("min_x"),
        F.max("mx").alias("max_x"),
        F.min("my").alias("min_y"),
        F.max("my").alias("max_y"),
    ).collect()[0]
    side = max(ext["max_x"] - ext["min_x"], ext["max_y"] - ext["min_y"])
    max_c = (1 << order) - 1
    sx = (((F.col("mx") - F.lit(ext["min_x"])) / F.lit(side)) * F.lit(max_c)).cast("int")
    sy = (((F.lit(ext["max_y"]) - F.col("my")) / F.lit(side)) * F.lit(max_c)).cast("int")
    return df.withColumn("x", sx.cast("long")).withColumn("y", sy.cast("long"))
