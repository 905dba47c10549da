"""File-format ingestion matching the reference's loaders (E1/E3).

* **DataRow CSV** — header + positional columns ``fileID,pointX,pointY,
  kw0..kw11`` (reference ``FixRangeCompareToConstructionOne.loadDataFromFile
  :148-173`` reads cols 0/1/2 and requires >= 15 columns; the prepared
  dataset form ``DataSetAccess.java:276-290`` additionally carries the
  Hilbert index at col 3 and keywords at cols 4..15).
* **OSM XML nodes** — ``<node id=.. lat=.. lon=.. version=..>`` elements
  with max-version dedupe (``OsmToCsvConverter.java:49-83``), emitted as
  ``(osm_id, latitude, longitude)`` like the reference's CSV output.

Both readers are plain ``spark.read`` + native Column expressions: the CSV
path gets an explicit positional schema (no inference pass — at 100 TB an
inference pass is a full extra read), and the OSM path is a *line-oriented*
distributed parse (``spark.read.text`` + ``regexp_extract``) rather than a
driver-side SAX loop — planet-dump OSM XML puts every node's attributes on
one line, so text-split parallelism applies and no task holds the document
tree.  Attribute order is irrelevant (per-attribute regex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

N_KEYWORDS = 12  # the prepared datasets carry exactly 12 keywords per row


def datarow_schema(with_hilbert: bool = False) -> StructType:
    """Positional schema of the reference CSV rows."""
    fields = [
        StructField("fileID", LongType()),
        StructField("pointX", LongType()),
        StructField("pointY", LongType()),
    ]
    if with_hilbert:
        fields.append(StructField("hilbert", LongType()))
    fields += [StructField(f"kw{i}", StringType()) for i in range(N_KEYWORDS)]
    return StructType(fields)


def read_datarow_csv(spark: SparkSession, path: str, with_hilbert: bool = False) -> DataFrame:
    """Reference-shaped CSV -> typed DataFrame (header skipped, positional
    columns, no inference)."""
    return spark.read.csv(path, schema=datarow_schema(with_hilbert), header=True)


def write_datarow_csv(doc_geo: DataFrame, path: str, partitions: int | None = None) -> None:
    """doc_geo -> reference DataRow CSV (fileID = numeric payload of the
    doc key; keywords padded to the fixed 12 columns)."""
    kws = [
        F.expr(f"coalesce(try_element_at(keywords, {i + 1}), 'k0')").alias(f"kw{i}")
        for i in range(N_KEYWORDS)
    ]
    out = doc_geo.select(
        F.expr("CAST(substring(doc_id, 4) AS BIGINT)").alias("fileID"),
        F.col("x").alias("pointX"),
        F.col("y").alias("pointY"),
        *kws,
    )
    if partitions:
        out = out.repartition(partitions)
    out.write.mode("overwrite").option("header", True).csv(path)


OSM_NODE_RE_ID = r'<node[^>]*\bid="([^"]+)"'
OSM_NODE_RE_LAT = r'<node[^>]*\blat="([^"]+)"'
OSM_NODE_RE_LON = r'<node[^>]*\blon="([^"]+)"'
OSM_NODE_RE_VER = r'<node[^>]*\bversion="([^"]+)"'


def read_osm_nodes(spark: SparkSession, path: str) -> DataFrame:
    """OSM XML -> (osm_id, latitude, longitude, version), one row per
    ``<node>`` element occurrence (pre-dedupe)."""
    lines = spark.read.text(path)
    nodes = lines.filter(F.col("value").contains("<node")).select(
        F.regexp_extract("value", OSM_NODE_RE_ID, 1).alias("osm_id"),
        F.regexp_extract("value", OSM_NODE_RE_LAT, 1).alias("latitude"),
        F.regexp_extract("value", OSM_NODE_RE_LON, 1).alias("longitude"),
        # nullif guards the no-match empty string: OSM XML may omit
        # version=, and ANSI mode faults on CAST('' AS INT) — a missing
        # version becomes NULL (sorts last in the max-version dedupe)
        F.nullif(
            F.regexp_extract("value", OSM_NODE_RE_VER, 1), F.lit("")
        ).cast("int").alias("version"),
    )
    return nodes.filter(F.col("osm_id") != "")


def osm_latest_nodes(nodes: DataFrame) -> DataFrame:
    """Max-version dedupe (``OsmToCsvConverter.java:57-59``: keep the node
    row with the highest version per id): (osm_id, latitude, longitude)."""
    # deterministic tie-break on equal versions (the reference keeps
    # first-seen, which is input-order-dependent; value ordering is the
    # distributed-safe equivalent)
    w = Window.partitionBy("osm_id").orderBy(
        F.col("version").desc(), "latitude", "longitude"
    )
    return (
        nodes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("osm_id", "latitude", "longitude")
    )


_GEO_EXPORT_SCHEMA = "doc_id STRING, x BIGINT, y BIGINT"


def write_geo_jsonl(doc_geo: DataFrame, path: str) -> None:
    """doc_geo -> JSON-lines export (doc_id, x, y) — the interchange shape
    downstream labeling / annotation tools consume."""
    doc_geo.select("doc_id", "x", "y").write.mode("overwrite").json(path)


def read_geo_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines -> typed DataFrame with an EXPLICIT schema — inference
    on 10^12 rows means a full extra pass and nondeterministic widening;
    a stated schema is both the fast and the correct path."""
    return spark.read.schema(_GEO_EXPORT_SCHEMA).json(path)


def write_geo_orc(doc_geo: DataFrame, path: str) -> None:
    """doc_geo -> ORC export (doc_id, x, y) — the columnar alternative for
    Hive-ecosystem consumers; Spark's native ORC writer, no extra
    packages."""
    doc_geo.select("doc_id", "x", "y").write.mode("overwrite").orc(path)


def read_geo_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(_GEO_EXPORT_SCHEMA).orc(path)
