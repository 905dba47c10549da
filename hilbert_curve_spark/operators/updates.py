"""Incremental updates with merge-on-read (reference S11/S12).

The reference appends versioned bi-bitmap deltas per key and folds them
last-writer-wins at search time
(`Scheme/RSKQ/RSKQ_Biginteger.ObjectUpdate:490-616`, fold
``bs = (bs AND NOT bsa) XOR (bsa AND bsb)`` at `:724` — i.e. the newest
(add|del) op per document wins).  The set-oriented isomorphism (SURVEY §1.1:
postings, not bitmaps — a 2^40-doc bitmap cannot exist) is an append-only
log ``(doc_id, version, op)`` with a window dedup at read::

    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) = 1
    ... keep rows whose op = 'add'

``version`` must be a total order per doc — a monotone batch id assigned on
the driver, never executor wall-clock (SURVEY §7.4 risk 6).  On Iceberg this
is snapshot-append + merge-on-read; compaction (the reference's
destructive chain-walk `:674-738`) is a periodic rewrite job, not a query
step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import derive

# Deterministic update workload derived from sid (FIXTURES.md F6):
#   batch 1: every doc added; batch 2: sid % 7 == 0 deleted;
#   batch 3: sid % 14 == 0 re-added.
_BATCHES = [
    (1, "add", "TRUE"),
    (2, "del", "sid % 7 = 0"),
    (3, "add", "sid % 14 = 0"),
]


def build_update_stream(
    spark: SparkSession, sf_dir: str, amp: int = derive.AMP
) -> DataFrame:
    """updates(doc_id:string, version:int, op:string) — derived workload
    over the amplified corpus (``amp`` must match the corpus amplification
    so the log's doc keys cover the corpus — the driver fixture uses
    ``derive.AMP``; the bench passes its own amplification)."""
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sids = flat.select(
        F.expr(f"explode(sequence(0, {amp - 1}))").alias("rep"), "doc_id"
    ).select(F.expr(derive.SID_SQL).alias("sid"))
    parts = []
    for version, op, pred in _BATCHES:
        parts.append(
            sids.filter(F.expr(pred)).select(
                F.expr(derive.doc_key_sql()).alias("doc_id"),
                F.lit(version).alias("version"),
                F.lit(op).alias("op"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def update_stream_sql(table: str = "documents") -> str:
    """Oracle-side identical update stream."""
    selects = [
        f"SELECT {derive.doc_key_sql()} AS doc_id, {v} AS version, '{op}' AS op "
        f"FROM {derive.corpus_sql(table)} WHERE {pred}"
        for v, op, pred in _BATCHES
    ]
    return " UNION ALL ".join(selects)


def merge_on_read(updates: DataFrame) -> DataFrame:
    """Live doc set after folding the delta log newest-first (S12).

    Window dedup shuffles once on doc_id; at scale the log is stored
    partitioned by a doc_id bucket so the window is shuffle-free
    (partitioning reuse), and AQE handles stragglers.
    """
    w = Window.partitionBy("doc_id").orderBy(F.col("version").desc())
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "add"))
        .select("doc_id")
    )


def merge_on_read_sql(stream_sql: str) -> str:
    return (
        f"SELECT doc_id FROM (SELECT doc_id, op, "
        f"ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn "
        f"FROM ({stream_sql})) WHERE rn = 1 AND op = 'add'"
    )


def compact_log(updates: DataFrame, upto_version: int) -> DataFrame:
    """Periodic log rewrite (the reference's destructive chain-walk
    compaction, `Scheme/RSKQ/RSKQ_Biginteger.java:674-738`, as a batch job —
    the Iceberg ``rewrite_data_files`` analogue named in SURVEY §2.4).

    Every delta with ``version <= upto_version`` folds last-writer-wins into
    a base snapshot: one ``(doc_id, upto_version, 'add')`` row per doc live
    at that version (deleted docs vanish — absence IS the tombstone, since a
    doc is live only via an 'add' that survives the fold).  Deltas newer
    than the horizon pass through untouched, and they still dominate the
    base in any later merge because their versions are strictly greater.

    Invariant (tested): ``merge_on_read(compact_log(log, v)) ==
    merge_on_read(log)`` for every v.  At scale this runs as its own job
    over the log table (one window shuffle on doc_id — same partitioning
    the log is stored bucketed by, so effectively shuffle-free), writing a
    new snapshot that replaces the folded files.
    """
    head = updates.filter(F.col("version") <= upto_version)
    tail = updates.filter(F.col("version") > upto_version)
    w = Window.partitionBy("doc_id").orderBy(F.col("version").desc())
    base = (
        head.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "add"))
        .select(
            "doc_id",
            F.lit(upto_version).cast("int").alias("version"),
            F.lit("add").alias("op"),
        )
    )
    return base.unionByName(tail)


def compact_log_sql(stream_sql: str, upto_version: int) -> str:
    """Oracle-side identical compaction: the compacted log itself (not just
    the live set) is row-for-row checkable."""
    return (
        f"SELECT doc_id, CAST({upto_version} AS INTEGER) AS version, 'add' AS op "
        f"FROM (SELECT doc_id, op, "
        f"ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn "
        f"FROM ({stream_sql}) WHERE version <= {upto_version}) "
        f"WHERE rn = 1 AND op = 'add' "
        f"UNION ALL SELECT doc_id, version, op FROM ({stream_sql}) "
        f"WHERE version > {upto_version}"
    )


# ---------------------------------------------------------------------------
# SRDSSE: single-keyword versioned add/delete + search
# ---------------------------------------------------------------------------
#
# The reference's SRDSSE scheme (`Scheme/SRDSSE/SRDSSE.java:81-139` update,
# `:146-238` search) keeps one versioned chain of bi-bitmap deltas PER
# KEYWORD (client counter state c0..c at `:92`, per-version fold at `:237`)
# and answers search(w) by folding w's chain newest-last so the latest
# (add|del) op per (keyword, doc) wins — the single-keyword restriction of
# the RSKQ ObjectUpdate fold this module already models (the RSKQ form at
# `RSKQ_Biginteger.java:724` is `bs = (bs AND NOT bsa) XOR (bsa AND bsb)`,
# i.e. untouched docs carry forward and touched docs take the newest op;
# SRDSSE.java:237 abbreviates the same fold for its per-batch masks).
# Set-oriented isomorphism: an append-only (keyword, doc_id, version, op)
# log + one window dedup at read, exactly like ``merge_on_read`` but keyed
# by (keyword, doc_id).
#
# Deterministic per-keyword workload (FIXTURES.md F6 style): batch 1 adds
# every doc containing the keyword, batch 2 deletes sid % 5 == 0, batch 3
# re-adds sid % 10 == 0.
_KW_BATCHES = [
    (1, "add", "TRUE"),
    (2, "del", "sid % 5 = 0"),
    (3, "add", "sid % 10 = 0"),
]

# doc_id is 'doc' || LPAD(sid, 10, '0') (derive.doc_key_sql) — the zero-pad
# makes the reverse parse exact in both engines.
_SID_FROM_KEY = "CAST(SUBSTR(doc_id, 4) AS BIGINT)"


def build_keyword_update_stream(
    doc_geo: DataFrame, keywords: list[str]
) -> DataFrame:
    """kw_updates(keyword, doc_id, version, op) — per-keyword versioned
    delta log over the encoded corpus (SRDSSE's EDB chains, one per
    keyword, `SRDSSE.java:135-138`).

    100 TB shape: one corpus scan per batch predicate (three narrow
    projections unioned — no shuffle at all to BUILD the log; on Iceberg
    each batch is simply an appended snapshot).  At rest the log is stored
    partitioned by a keyword bucket so a single-keyword search prunes to
    one partition's files."""
    parts = []
    for version, op, pred in _KW_BATCHES:
        base = doc_geo.withColumn("sid", F.expr(_SID_FROM_KEY)).filter(F.expr(pred))
        for kw in keywords:
            parts.append(
                base.filter(F.array_contains("keywords", kw)).select(
                    F.lit(kw).alias("keyword"),
                    "doc_id",
                    F.lit(version).alias("version"),
                    F.lit(op).alias("op"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def keyword_update_stream_sql(keywords: list[str], table: str = "documents") -> str:
    """Oracle-side identical per-keyword delta log (membership replayed from
    the derive snippets — ``'w' IN (kw0..kw3)``)."""
    kw_cols = ", ".join(derive.keyword_sql(j) for j in range(derive.KW_PER_DOC))
    selects = []
    for v, op, pred in _KW_BATCHES:
        for kw in keywords:
            selects.append(
                f"SELECT '{kw}' AS keyword, {derive.doc_key_sql()} AS doc_id, "
                f"{v} AS version, '{op}' AS op FROM {derive.corpus_sql(table)} "
                f"WHERE ({pred}) AND '{kw}' IN ({kw_cols})"
            )
    return " UNION ALL ".join(selects)


def srdsse_search(kw_updates: DataFrame, keywords: list[str]) -> DataFrame:
    """Batched SRDSSE search: the live (keyword, doc_id) set after folding
    each keyword's delta chain last-writer-wins (`SRDSSE.java:185-238` —
    the server walks the version chain c..c0; the fold keeps a doc iff its
    newest op is an add).

    One window shuffle on (keyword, doc_id); searching K keywords at once
    is the same single pass the reference performs K times.  The version
    order is total per (keyword, doc) — a monotone batch id assigned by
    the writer, mirroring the client counter c (`SRDSSE.java:138`)."""
    log = kw_updates.filter(F.col("keyword").isin(keywords))
    w = Window.partitionBy("keyword", "doc_id").orderBy(F.col("version").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "add"))
        .select("keyword", "doc_id")
    )


def srdsse_search_sql(stream_sql: str, keywords: list[str]) -> str:
    lits = ", ".join(f"'{k}'" for k in keywords)
    return (
        f"SELECT keyword, doc_id FROM (SELECT keyword, doc_id, op, "
        f"ROW_NUMBER() OVER (PARTITION BY keyword, doc_id ORDER BY version DESC) AS rn "
        f"FROM ({stream_sql}) WHERE keyword IN ({lits})) "
        f"WHERE rn = 1 AND op = 'add'"
    )


def merge_as_of(updates: DataFrame, version: int) -> DataFrame:
    """Time travel: the live doc set *as of* ``version`` — fold only the
    deltas at or below the horizon (the Iceberg snapshot-as-of read,
    reference semantics: the chain walk stopping at an older version).
    Same single window shuffle as :func:`merge_on_read`; the version
    filter pushes to the log scan (at scale the log is also partitioned by
    version batch, so old snapshots prune whole files)."""
    return merge_on_read(updates.filter(F.col("version") <= version))


def merge_as_of_sql(stream_sql: str, version: int) -> str:
    return merge_on_read_sql(f"SELECT * FROM ({stream_sql}) WHERE version <= {version}")


def snapshot_diff(updates: DataFrame, v_from: int, v_to: int) -> DataFrame:
    """Time-travel DIFF between two snapshot versions — ``(doc_id,
    status)`` with ``status in ('added', 'removed')`` for every doc whose
    liveness differs between the ``v_from`` and ``v_to`` horizons (the
    Iceberg changelog / snapshot-compare read; reference semantics: two
    chain walks at different stop versions, compared).

    Plan: ONE hash aggregation over the delta log — per doc the latest
    op at each horizon is a conditional MAX of the packed key
    ``version * 2 + (op = 'add')`` (versions are unique per doc, so the
    max picks the newest op and its parity says add/del), then a codegen
    status projection.  No window, no join, no second log scan — strictly
    cheaper than folding two :func:`merge_as_of` snapshots and
    full-outer-joining them, and map-side combinable at any log size."""
    packed = F.col("version") * 2 + (F.col("op") == "add").cast("int")
    agg = updates.groupBy("doc_id").agg(
        F.max(F.when(F.col("version") <= int(v_from), packed)).alias("pf"),
        F.max(F.when(F.col("version") <= int(v_to), packed)).alias("pt"),
    )
    from_live = F.coalesce(F.pmod(F.col("pf"), F.lit(2)) == 1, F.lit(False))
    to_live = F.coalesce(F.pmod(F.col("pt"), F.lit(2)) == 1, F.lit(False))
    return (
        agg.withColumn(
            "status",
            F.when(to_live & ~from_live, F.lit("added")).when(
                from_live & ~to_live, F.lit("removed")
            ),
        )
        .filter(F.col("status").isNotNull())
        .select("doc_id", "status")
    )


def snapshot_diff_sql(stream_sql: str, v_from: int, v_to: int) -> str:
    """Identical packed-max replay over the same derived log."""
    return f"""SELECT doc_id, status FROM (
  SELECT doc_id,
         CASE WHEN COALESCE(pt % 2 = 1, FALSE) AND NOT COALESCE(pf % 2 = 1, FALSE)
                THEN 'added'
              WHEN COALESCE(pf % 2 = 1, FALSE) AND NOT COALESCE(pt % 2 = 1, FALSE)
                THEN 'removed' END AS status
  FROM (
    SELECT doc_id,
           MAX(CASE WHEN version <= {int(v_from)}
                    THEN version * 2 + CASE WHEN op = 'add' THEN 1 ELSE 0 END END) AS pf,
           MAX(CASE WHEN version <= {int(v_to)}
                    THEN version * 2 + CASE WHEN op = 'add' THEN 1 ELSE 0 END END) AS pt
    FROM ({stream_sql}) GROUP BY doc_id
  )
) WHERE status IS NOT NULL"""


def changelog_keywords(diff: DataFrame, doc_geo: DataFrame) -> DataFrame:
    """CONTENT profile of a snapshot changelog: which keywords the docs
    added/removed between two versions carry — ``(status, keyword,
    n_docs)``, the "what changed *about the corpus*" companion of
    :func:`snapshot_diff` (Iceberg changelog joined back to the table —
    the audit query every data-governance pipeline runs on a diff).

    Plan: the diff side is tiny relative to the corpus (changed docs
    only), so the doc_id equi-join broadcasts it; keywords explode AFTER
    the join (only changed docs fan out) and per-doc duplicates are
    removed array-side (``array_distinct`` — no DISTINCT shuffle).  The
    final agg is map-side combined over |statuses| x |keywords| groups."""
    joined = doc_geo.select("doc_id", "keywords").join(
        F.broadcast(diff), "doc_id"
    )
    return (
        joined.select(
            "status", F.explode(F.array_distinct("keywords")).alias("keyword")
        )
        .groupBy("status", "keyword")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def changelog_keywords_sql(diff_sql: str, doc_geo_body: str) -> str:
    """Oracle: the diff SQL as a CTE, the derived corpus keyword slots
    unpivoted + per-doc deduped, joined and counted identically.
    ``doc_geo_body`` is a SELECT producing (doc_key, kw0..kw3) — the
    single-sourced ``derive.doc_geo_select_sql`` shape."""
    from ..sources import derive

    arms = " UNION ALL ".join(
        f"SELECT doc_key, kw{j} AS keyword FROM ck_geo"
        for j in range(derive.KW_PER_DOC)
    )
    return f"""WITH ck_diff AS ({diff_sql}), ck_geo AS ({doc_geo_body}),
ck_kws AS (SELECT DISTINCT doc_key, keyword FROM ({arms})),
ck_join AS (
  SELECT d.status, k.keyword FROM ck_diff d
  JOIN ck_kws k ON d.doc_id = k.doc_key
)
SELECT status, keyword, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ck_join GROUP BY 1, 2"""


def _sid_expr() -> str:
    """Engine-neutral sid parse from the doc key ('doc' || LPAD(id,10))."""
    return "(CAST(substring(doc_id, 4, 10) AS BIGINT))"


def raster_ivm(
    spark: SparkSession,
    sf_dir: str,
    amp: int = derive.AMP,
    base_version: int = 1,
    shift: int = 6,
) -> DataFrame:
    """Incremental maintenance of the density raster under the delta log —
    ``(cell, n_base, n_gained, n_lost, n_live)``: the per-cell live-doc
    count is maintained INCREMENTALLY as base + net state transitions,
    never recomputed from the full corpus.  Per document the LWW fold
    (same semantics as :func:`merge_on_read`) yields its live state at the
    ``base_version`` snapshot and at the head; a doc contributes
    ``gained`` when it flips 0→1 after the snapshot and ``lost`` on 1→0,
    and the maintained count is ``n_live = n_base + n_gained - n_lost``.

    The CROSS-CHECK is the point: the oracle computes ``n_live``
    independently (a direct LWW fold of the whole log per cell — the full
    recompute a view refresh would do), so the hash match PROVES the
    maintenance algebra, not just mirrored arithmetic.  This is the
    Iceberg/Delta incremental-materialized-view pattern (changelog →
    aggregate delta → merge) for the engine's raster views.

    Plan: ONE doc_id hash aggregation folds both states per doc
    (max-struct LWW — no window), a codegen cell derivation from the
    parsed doc ordinal, then ONE cell aggregation with map-side combine.
    Two bounded shuffles; with the log stored bucketed by doc_id the
    first is shuffle-free."""
    s = int(shift)
    edge_cells = 1 << (12 - s)
    log = build_update_stream(spark, sf_dir, amp)
    bv = int(base_version)
    folded = log.groupBy("doc_id").agg(
        F.max(
            F.when(
                F.col("version") <= bv,
                F.struct(F.col("version"), (F.col("op") == "add").alias("a")),
            )
        ).alias("bs"),
        F.max(F.struct(F.col("version"), (F.col("op") == "add").alias("a"))).alias(
            "es"
        ),
    )
    sid = _sid_expr()
    x = derive.x_sql(sid)
    y = derive.y_sql(sid)
    tagged = folded.select(
        F.expr(f"(({x}) >> {s}) * {edge_cells} + (({y}) >> {s})").alias("cell"),
        F.coalesce(F.col("bs.a"), F.lit(False)).alias("lb"),
        F.col("es.a").alias("le"),
    )
    return tagged.groupBy("cell").agg(
        F.sum(F.col("lb").cast("long")).alias("n_base"),
        F.sum((~F.col("lb") & F.col("le")).cast("long")).alias("n_gained"),
        F.sum((F.col("lb") & ~F.col("le")).cast("long")).alias("n_lost"),
        (
            F.sum(F.col("lb").cast("long"))
            + F.sum((~F.col("lb") & F.col("le")).cast("long"))
            - F.sum((F.col("lb") & ~F.col("le")).cast("long"))
        ).alias("n_live"),
    )


def raster_ivm_oracle(
    base_version: int = 1, shift: int = 6, table: str = "documents"
) -> str:
    """Independent verification: ``n_live`` comes from a DIRECT LWW fold
    of the head state per cell (the full recompute), while base/gained/
    lost replay the snapshot algebra — a hash match proves the incremental
    maintenance identity."""
    s = int(shift)
    edge_cells = 1 << (12 - s)
    sid = _sid_expr()
    x = derive.x_sql(sid)
    y = derive.y_sql(sid)
    bv = int(base_version)
    return f"""ivm_log AS ({update_stream_sql(table)}),
ivm_st AS (
  SELECT doc_id,
         COALESCE(arg_max(op, version) FILTER (version <= {bv}), 'del') = 'add' AS lb,
         arg_max(op, version) = 'add' AS le
  FROM ivm_log GROUP BY doc_id
), ivm_tag AS (
  SELECT (({x}) >> {s}) * {edge_cells} + (({y}) >> {s}) AS cell, lb, le
  FROM ivm_st
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(SUM(CASE WHEN lb THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
       CAST(SUM(CASE WHEN NOT lb AND le THEN 1 ELSE 0 END) AS BIGINT) AS n_gained,
       CAST(SUM(CASE WHEN lb AND NOT le THEN 1 ELSE 0 END) AS BIGINT) AS n_lost,
       CAST(SUM(CASE WHEN le THEN 1 ELSE 0 END) AS BIGINT) AS n_live
FROM ivm_tag GROUP BY cell"""
