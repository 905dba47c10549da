"""Runtime Bloom-filter join pruning — the index→fact fetch of a 100 TB
deployment made explicit and oracle-checkable.

The deployment shape this models: the interleaved *documents* table (the
100 TB fact — ``(doc_id, spans)``, NO coordinates) is probed for the full
payloads of the documents an index-side spatial query selected.  The
selected key set can be millions of strings — too big to ship as an IN
list — so the build side is folded into an ``m``-bit Bloom filter
(``k`` md5-derived bit positions per key) that is broadcast and applied as
a codegen pre-filter on the fact scan BEFORE the exact join.  This is
precisely what Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects for selective
joins; building it from first principles in engine-neutral arithmetic makes
the pruning *verifiable*: DuckDB replays the identical md5 fold → bit
position → word-mask arithmetic, so the surviving row set — true matches
AND false positives — must match bit-for-bit.

Reference parity: the reference fetches object payloads by identifier after
every search (`Scheme/RSKQ/RSKQ_Biginteger.java:120-161` keeps payloads in
per-id hash maps); at cluster scale that per-id fetch becomes this
bloom-pruned scan+join.

Arithmetic (all exact, both engines):

* position ``j`` of key ``d``: ``fold40(md5(d || ':' || j)) % m`` where
  ``fold40`` parses the first 10 hex chars to a 40-bit int
  (:func:`..operators.dedup._hex_to_long_sql`).  With ``m`` a power of two,
  ``2^40 % m == 0`` — the fold is *exactly* uniform over positions, not
  just approximately.
* the filter is stored as 32-bit words packed in BIGINTs (``word = pos DIV
  32``, ``bit = pos % 32``): masks stay below ``2^32``, so no sign-bit
  cases exist in either engine's shift semantics.

Scale notes (100 TB): the build side is ONE hash aggregation over the
selected keys (map-side combine; at most ``m/32`` word rows leave the map
stage, regardless of how many keys enter) folded into a single broadcast
row; the probe is a pure whole-stage-codegen projection+filter over the
fact scan — no shuffle touches the fact table until only
``|selected| + m-governed false positives`` rows survive, after which the
exact semi-join classifies them.  False-positive rate is the standard
``(1 - e^{-k n / m})^k``; size ``m`` to the build-side cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from .dedup import _hex_to_long_sql


def _pos_sql(key_sql: str, j_sql: str, m_bits: int) -> str:
    """Engine-neutral bit position: 40-bit md5 fold of ``key:j`` mod m."""
    md5 = f"md5({key_sql} || ':' || CAST({j_sql} AS STRING))"
    return f"({_hex_to_long_sql(md5, 1, 10)} % {int(m_bits)})"


def bloom_pruned_fetch(
    docs: DataFrame,
    doc_geo: DataFrame,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    m_bits: int = 4096,
    k_hashes: int = 3,
    config: EngineConfig = DEFAULT,
) -> DataFrame:
    """Fetch the interleaved payloads of the documents inside the query box,
    pruning the fact scan with a broadcast Bloom filter built from the
    index-side key set.  Output is one row per *bloom-surviving* document —
    ``(doc_id, n_spans, is_match)`` with ``is_match`` 1 for true members of
    the box set and 0 for Bloom false positives (deliberately included in
    the result: they are the filter's observable semantics, and the oracle
    reproduces them exactly).

    Plan: index scan → box filter → 3-way position explode → word-mask hash
    agg (≤ ``m/32`` rows) → single-row map broadcast; fact scan → codegen
    md5 bit tests (no shuffle) → broadcast left join against the exact key
    set for classification."""
    assert m_bits % 32 == 0 and (m_bits & (m_bits - 1)) == 0, "m must be a 2^k multiple of 32"
    keys = doc_geo.filter(
        (F.col("x") >= x_lo)
        & (F.col("x") <= x_hi)
        & (F.col("y") >= y_lo)
        & (F.col("y") <= y_hi)
    ).select(F.col("doc_id").alias("k_doc")).distinct()

    pairs = keys.select(
        "k_doc", F.explode(F.expr(f"sequence(0, {int(k_hashes) - 1})")).alias("j")
    ).select(F.expr(_pos_sql("k_doc", "j", m_bits)).alias("pos"))
    words = pairs.groupBy(F.expr("CAST(pos DIV 32 AS BIGINT)").alias("w")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)))").alias(
            "mask"
        )
    )
    bloom = words.groupBy().agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("mask")).alias("bloom")
    )

    probed = docs.select(
        "doc_id", F.size("spans").cast("long").alias("n_spans")
    ).crossJoin(F.broadcast(bloom))
    cond = F.lit(True)
    for j in range(int(k_hashes)):
        pos = _pos_sql("doc_id", str(j), m_bits)
        # word lookup via the broadcast map; missing word => 0 mask
        test = (
            f"((COALESCE(try_element_at(bloom, CAST({pos} DIV 32 AS BIGINT)), "
            f"CAST(0 AS BIGINT)) >> CAST({pos} % 32 AS INT)) % 2) = 1"
        )
        cond = cond & F.expr(test)
    survivors = probed.filter(cond).select("doc_id", "n_spans")

    out = survivors.join(
        F.broadcast(keys), survivors["doc_id"] == keys["k_doc"], "left"
    ).select(
        "doc_id",
        "n_spans",
        F.when(F.col("k_doc").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_match"),
    )
    return out


def bloom_pruned_fetch_oracle(
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    m_bits: int = 4096,
    k_hashes: int = 3,
    table: str = "documents",
) -> str:
    """DuckDB oracle fragment (appends to a chain that already defines
    ``doc_geo``): identical fold/position/word arithmetic; the probe side
    recomputes ``n_spans`` from the derivation (1 geo + KW_PER_DOC text +
    n_media media spans) so it never needs the array column."""
    from ..sources import derive

    m = int(m_bits)
    k = int(k_hashes)
    n_spans = f"(1 + {derive.KW_PER_DOC} + {derive.n_media_sql()})"
    build_pos = _pos_sql("doc_id", "j", m)
    probe_pos = _pos_sql("p.doc_id", "j.j", m)
    return f"""bf_keys AS (
  SELECT DISTINCT doc_key AS doc_id FROM doc_geo
  WHERE x >= {x_lo} AND x <= {x_hi} AND y >= {y_lo} AND y <= {y_hi}
), bf_j AS (SELECT unnest(range(0, {k})) AS j),
bf_words AS (
  SELECT pos // 32 AS w, BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS mask
  FROM (SELECT {build_pos} AS pos FROM bf_keys, bf_j)
  GROUP BY pos // 32
), bf_ids AS {derive.corpus_sql(table)},
bf_probe AS (
  SELECT {derive.doc_key_sql()} AS doc_id, CAST({n_spans} AS BIGINT) AS n_spans
  FROM bf_ids
), bf_tests AS (
  SELECT p.doc_id, p.n_spans,
         CASE WHEN (COALESCE(w.mask, 0) >> CAST(({probe_pos}) % 32 AS INT)) % 2 = 1
              THEN 1 ELSE 0 END AS ok
  FROM bf_probe p
  CROSS JOIN bf_j j
  LEFT JOIN bf_words w ON w.w = ({probe_pos}) // 32
), bf_pass AS (
  SELECT doc_id, MIN(n_spans) AS n_spans
  FROM bf_tests GROUP BY doc_id HAVING MIN(ok) = 1
)
SELECT p.doc_id, p.n_spans,
       CAST(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_match
FROM bf_pass p LEFT JOIN bf_keys r ON r.doc_id = p.doc_id"""
