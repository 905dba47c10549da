"""Span-sequence integrity + span-level analytics over the interleaved corpus.

The authoritative input shape (`BASELINE.json input_hint`) is
``documents(doc_id, spans: array<struct<kind,text,media_ref,offset>>)`` with a
per-row invariant: the ``(kind, text, media_ref, order)`` sequence must be
preserved through every shuffle.  ``tests/test_spans_invariant.py`` pins that
behaviorally; ``span_stats`` makes it *driver-visible*: it routes the
interleaved arrays through a real hash shuffle, ``posexplode``s them, and
folds every span's full content into per-kind aggregates that the DuckDB
oracle recomputes analytically (from :mod:`..sources.derive` snippets) without
ever building an array.  Any reorder (``n_order_breaks``), drop/duplicate
(``n_spans``/``n_docs``), or byte flip anywhere in the shuffle path
(``fingerprint`` — a sum of 40-bit md5 folds of each span's canonical string,
doc_id included) changes the result.

Reference parity: the reference carries its object payloads opaquely through
the index (`Scheme/RSKQ/RSKQ_Biginteger.java:120-161` stores/retrieves
serialized objects byte-identically); this operator is the Spark-shuffle
restatement of that round-trip guarantee.

100 TB design: one narrow projection + native ``posexplode`` (no Python),
then a TWO-LEVEL hash aggregation with map-side combine: level 1 groups by
``(kind, bucket)`` where the bucket is a 12-bit fold of ``md5(doc_id)``
(4096 buckets, so every metric including COUNT DISTINCT doc_id partitions
cleanly), level 2 folds the 4096 x |kinds| partials to 3 rows.  The
fingerprint is ``SUM(fold40) MOD 2^40`` computed modularly at both levels,
so no intermediate int64 sum can overflow until a single (kind, bucket)
group holds ~2^22 spans — ~2^34 spans (~16 G) per kind under the md5-uniform
bucketing, with more bucket bits as the documented dial beyond that.
(ADVICE r3: the previous single-level BIGINT sum faulted under ANSI mode at
~2^23 spans per kind — AMP=1024 scaling territory.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import derive
from .dedup import _hex_to_long_sql

#: canonical per-span string — identical text in Spark SQL and DuckDB
_CANON = "(doc_id || '|' || kind || '|' || text || '|' || media_ref || '|' || CAST(off AS STRING))"


def _fp_sql(md5_var: str) -> str:
    """40-bit fold of an md5 hex string (first 10 hex chars)."""
    return _hex_to_long_sql(md5_var, 1, 10)


_FP_MOD = 1 << 40        # fingerprint = SUM(fold40) MOD 2^40
_BUCKET_HEX = 3          # 12-bit doc bucket -> 4096 level-1 groups per kind


def _bucket_sql(doc_id_sql: str) -> str:
    """12-bit doc-keyed bucket: a hex fold of md5(doc_id), so every span of a
    doc lands in one bucket (COUNT DISTINCT doc_id partitions exactly) and
    buckets are md5-uniform (level-1 partial sums stay far below 2^62)."""
    return _hex_to_long_sql(f"md5({doc_id_sql})", 1, _BUCKET_HEX)


def span_stats(docs: DataFrame, partitions: int = 32) -> DataFrame:
    """Per-kind span aggregates AFTER a genuine array-carrying shuffle.

    Output (one row per kind, ordered): ``kind, n_spans, n_docs, sum_offset,
    sum_text_len, sum_ref_len, n_order_breaks, fingerprint``.

    ``n_order_breaks`` counts spans whose array position disagrees with the
    stored ``offset`` — 0 iff the sequence order survived the shuffle intact.
    ``fingerprint`` is the modular two-level fold described in the module
    docstring — overflow-safe at any corpus amplification (ADVICE r3).
    """
    shuffled = docs.repartition(partitions, "doc_id")
    flat = shuffled.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id",
        "pos",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("off"),
    )
    hashed = flat.withColumn("m", F.expr(f"md5({_CANON})")).withColumn(
        "bkt", F.expr(_bucket_sql("CAST(doc_id AS BINARY)"))
    )
    lvl1 = hashed.groupBy("kind", "bkt").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("off").cast("long").alias("sum_offset"),
        F.sum(F.length("text")).cast("long").alias("sum_text_len"),
        F.sum(F.length("media_ref")).cast("long").alias("sum_ref_len"),
        F.sum(F.when(F.col("pos") != F.col("off"), 1).otherwise(0))
        .cast("long")
        .alias("n_order_breaks"),
        F.sum(F.expr(_fp_sql("m"))).alias("fpp"),
    )
    return (
        lvl1.groupBy("kind")
        .agg(
            F.sum("n_spans").cast("long").alias("n_spans"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_offset").cast("long").alias("sum_offset"),
            F.sum("sum_text_len").cast("long").alias("sum_text_len"),
            F.sum("sum_ref_len").cast("long").alias("sum_ref_len"),
            F.sum("n_order_breaks").cast("long").alias("n_order_breaks"),
            (F.sum(F.col("fpp") % _FP_MOD) % _FP_MOD)
            .cast("long")
            .alias("fingerprint"),
        )
        .orderBy("kind")
    )


def span_stats_oracle(table: str = "documents", amp: int = derive.AMP) -> str:
    """DuckDB oracle: rebuild every span as a flat row (geo arm + one arm per
    keyword slot + a range-joined media arm — no arrays anywhere) and fold the
    identical canonical strings."""
    return (
        f"WITH {flat_spans_sql(table, amp)}, "
        f"hashed AS (SELECT *, md5({_CANON}) AS m, "
        f"{_bucket_sql('doc_id')} AS bkt FROM spans), "
        f"lvl1 AS (SELECT kind, bkt, COUNT(*) AS n_spans, "
        f"COUNT(DISTINCT doc_id) AS n_docs, "
        f"CAST(SUM(off) AS BIGINT) AS sum_offset, "
        f"CAST(SUM(length(text)) AS BIGINT) AS sum_text_len, "
        f"CAST(SUM(length(media_ref)) AS BIGINT) AS sum_ref_len, "
        f"CAST(SUM({_fp_sql('m')}) AS BIGINT) AS fpp "
        f"FROM hashed GROUP BY kind, bkt) "
        f"SELECT kind, CAST(SUM(n_spans) AS BIGINT) AS n_spans, "
        f"CAST(SUM(n_docs) AS BIGINT) AS n_docs, "
        f"CAST(SUM(sum_offset) AS BIGINT) AS sum_offset, "
        f"CAST(SUM(sum_text_len) AS BIGINT) AS sum_text_len, "
        f"CAST(SUM(sum_ref_len) AS BIGINT) AS sum_ref_len, "
        f"CAST(0 AS BIGINT) AS n_order_breaks, "
        f"CAST(SUM(fpp % {_FP_MOD}) % {_FP_MOD} AS BIGINT) AS fingerprint "
        f"FROM lvl1 GROUP BY kind ORDER BY kind"
    )


def flat_spans_sql(table: str = "documents", amp: int = derive.AMP) -> str:
    """WITH-body fragment defining ``ids`` (the amplified sid stream) and
    ``spans(doc_id, kind, text, media_ref, off)`` — every span of every
    derived document as a flat row, no arrays.  Single source of the
    oracle-side span reconstruction shared by ``span_stats_oracle`` and
    ``span_chunks_oracle`` so the derivation cannot desynchronize."""
    doc_id = derive.doc_key_sql()
    geo_text = (
        f"('x=' || CAST({derive.x_sql()} AS STRING) || ' y=' || "
        f"CAST({derive.y_sql()} AS STRING))"
    )
    arms = [
        f"SELECT {doc_id} AS doc_id, 'geo' AS kind, {geo_text} AS text, "
        f"'' AS media_ref, 0 AS off FROM ids"
    ]
    for j in range(derive.KW_PER_DOC):
        arms.append(
            f"SELECT {doc_id}, 'text', {derive.keyword_sql(j)}, '', {j + 1} FROM ids"
        )
    base = derive.KW_PER_DOC + 1
    arms.append(
        f"SELECT {doc_id}, 'media', '', "
        f"('m://' || {doc_id} || '/' || CAST(n AS STRING)), {base} + n "
        f"FROM ids, (SELECT unnest(range(0, {derive.MEDIA_MOD - 1})) AS n) g "
        f"WHERE n < {derive.n_media_sql()}"
    )
    union = " UNION ALL ".join(arms)
    return f"ids AS {derive.corpus_sql(table, amp)}, spans AS ({union})"


def span_chunks(
    docs: DataFrame,
    budget: int,
    media_cost: int = 16,
    partitions: int = 32,
) -> DataFrame:
    """Token-budget sharding of interleaved documents — THE chunking step of
    a multimodal training-data pipeline: each document's span sequence is
    split into consecutive chunks of ~``budget`` tokens without ever
    splitting a span, where a text/geo span costs ``length(text)`` proxy
    tokens and a media span costs the flat ``media_cost`` (the fixed
    image-token budget of a vision-language encoder).

    Chunk assignment is the deterministic closed form ``chunk_id =
    (tokens strictly before this span) DIV budget`` — exact integers, so a
    span always lands with its whole cost in one chunk and chunk ids are
    dense from 0 per document.  Output is chunk-level: ``(doc_id, chunk_id,
    n_spans, n_media, chunk_tokens, first_offset, last_offset)``.

    Plan: the arrays ride one hash shuffle on doc_id (the span_stats
    integrity path), a native explode, ONE per-document running-sum window
    (state bounded by a single document's spans regardless of corpus size),
    then a hash aggregation with map-side combine.  No Python anywhere.
    Reference parity: the reference ships payloads opaquely
    (`Scheme/RSKQ/RSKQ_Biginteger.java:120-161`); chunking is the
    training-pipeline op its interleaved payload shape exists to feed."""
    from pyspark.sql import Window

    shuffled = docs.repartition(partitions, "doc_id")
    flat = shuffled.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.offset").alias("off"),
    )
    cost = F.when(F.col("kind") == "media", F.lit(media_cost)).otherwise(
        F.length("text")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = (
        flat.withColumn("cost", cost)
        .withColumn("cum_before", F.coalesce(F.sum("cost").over(w), F.lit(0)))
        .withColumn("chunk_id", F.expr(f"CAST(cum_before DIV {budget} AS INT)"))
    )
    return chunked.groupBy("doc_id", "chunk_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0))
        .cast("long")
        .alias("n_media"),
        F.sum("cost").cast("long").alias("chunk_tokens"),
        F.min("off").cast("int").alias("first_offset"),
        F.max("off").cast("int").alias("last_offset"),
    )


def span_chunks_oracle(
    budget: int,
    media_cost: int = 16,
    table: str = "documents",
    amp: int = derive.AMP,
) -> str:
    """DuckDB oracle: identical cost/window/DIV arithmetic over the flat
    span reconstruction (:func:`flat_spans_sql`) — integer-exact, same
    empty-frame COALESCE for each document's first span."""
    return (
        f"WITH {flat_spans_sql(table, amp)}, "
        f"costed AS (SELECT doc_id, kind, off, "
        f"CASE WHEN kind = 'media' THEN {media_cost} ELSE length(text) END AS cost "
        f"FROM spans), "
        f"cum AS (SELECT doc_id, kind, off, cost, "
        f"COALESCE(SUM(cost) OVER (PARTITION BY doc_id ORDER BY off "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before "
        f"FROM costed) "
        f"SELECT doc_id, CAST(cum_before // {budget} AS INT) AS chunk_id, "
        f"CAST(COUNT(*) AS BIGINT) AS n_spans, "
        f"CAST(SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT) AS n_media, "
        f"CAST(SUM(cost) AS BIGINT) AS chunk_tokens, "
        f"CAST(MIN(off) AS INT) AS first_offset, "
        f"CAST(MAX(off) AS INT) AS last_offset "
        f"FROM cum GROUP BY doc_id, CAST(cum_before // {budget} AS INT)"
    )


def caption_pairs(docs: DataFrame, partitions: int = 32) -> DataFrame:
    """Caption alignment over the interleaved sequence: every ``media`` span
    paired with the nearest PRECEDING ``text`` span in its document's span
    order — ``(doc_id, media_ref, caption, media_offset, caption_offset)``.

    This is the multimodal-curation primitive over the input_hint shape
    (`BASELINE.json`): interleaved text+media training pipelines attach each
    image to its closest preceding caption text, which is exactly an AS-OF
    along the span sequence.  The reference round-trips its interleaved
    payloads opaquely (`Scheme/RSKQ/RSKQ_Biginteger.java:120-161`); this
    operator is the first one that READS the interleaving relationally.

    Plan: the arrays ride a real hash shuffle on doc_id (same integrity
    path ``span_stats`` checks), one native explode, then a per-doc window
    with ``last(..., ignorenulls) OVER (ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)`` — the running as-of pointer, no self-join.  The window
    partition is ONE document's spans (tiny, bounded by the doc format), so
    state never exceeds a document regardless of corpus size; with a
    doc-bucketed layout the shuffle disappears (partitioning reuse).
    Media spans with no preceding text (none in this corpus — offset 0 is
    always the geo span, texts precede media) would carry NULL captions."""
    from pyspark.sql import Window

    shuffled = docs.repartition(partitions, "doc_id")
    flat = shuffled.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("off"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    txt = F.when(F.col("kind") == "text", F.col("text"))
    toff = F.when(F.col("kind") == "text", F.col("off"))
    return (
        flat.withColumn("caption", F.last(txt, ignorenulls=True).over(w))
        .withColumn("caption_offset", F.last(toff, ignorenulls=True).over(w))
        .filter(F.col("kind") == "media")
        .select(
            "doc_id",
            "media_ref",
            "caption",
            F.col("off").alias("media_offset"),
            "caption_offset",
        )
    )


def caption_pairs_oracle(table: str = "documents", amp: int = derive.AMP) -> str:
    """DuckDB oracle: rebuilds the pairs analytically from the span
    derivation (`sources/interleave.spans_expr`) — media span ``n`` sits at
    offset ``KW_PER_DOC + 1 + n`` and its nearest preceding text span is
    always the last keyword (offset ``KW_PER_DOC``), because the derived
    layout is [geo, text x4, media x n_media].  The engine must discover
    that relationally through the shuffle + window; the oracle knows it in
    closed form — same division of labor as span_stats."""
    base = derive.KW_PER_DOC + 1
    media_ns = ", ".join(f"({n})" for n in range(derive.MEDIA_MOD - 1))
    return f"""WITH corpus AS (
  SELECT doc_id * 8192 + rep AS sid
  FROM {table}, (SELECT unnest(range(0, {amp})) AS rep)
)
SELECT {derive.doc_key_sql()} AS doc_id,
       ('m://' || {derive.doc_key_sql()} || '/' || m.n) AS media_ref,
       {derive.keyword_sql(derive.KW_PER_DOC - 1)} AS caption,
       CAST({base} + m.n AS INT) AS media_offset,
       CAST({derive.KW_PER_DOC} AS INT) AS caption_offset
FROM corpus, (VALUES {media_ns}) m(n)
WHERE m.n < {derive.n_media_sql()}"""


def span_chunks_inline(
    docs: DataFrame, budget: int, media_cost: int = 16
) -> DataFrame:
    """Zero-shuffle form of :func:`span_chunks`: the whole per-document
    chunk computation is per-ROW array algebra (sort, prefix-fold, group by
    chunk id) over the spans array — no repartition, no window, no
    aggregation, so the plan is a single narrow projection that runs
    unchanged over a Structured Streaming source (windows are unsupported
    in streaming; this form is how chunking streams).

    Output is bit-identical to :func:`span_chunks` (same oracle).  Cost is
    O(spans^2) per document (the prefix fold materializes an index array
    per chunk), which is the right trade only while spans-per-doc is
    bounded — the interleaved corpus shape (~7 spans) and any real
    VLM-training corpus qualify; a million-span document should take the
    shuffled window form instead.  At 10^12 docs this plan's wall time is
    scan bandwidth — there is literally nothing else in it."""
    sorted_spans = (
        "array_sort(transform(spans, s -> "
        "struct(s.offset AS off, s.kind AS kind, s.text AS text)))"
    )
    costs = (
        f"transform(srt, s -> CAST(CASE WHEN s.kind = 'media' "
        f"THEN {media_cost} ELSE length(s.text) END AS BIGINT))"
    )
    pre = (
        "aggregate(costs, array(CAST(0 AS BIGINT)), "
        "(acc, c) -> array_append(acc, element_at(acc, -1) + c))"
    )
    # 1-based span index i: cum_before = pre[i]; empty-guard because
    # sequence(1, 0) is DESCENDING in Spark, not empty
    cids = (
        f"CASE WHEN size(costs) = 0 THEN CAST(array() AS array<int>) "
        f"ELSE transform(sequence(1, size(costs)), "
        f"i -> CAST(element_at(pre, i) DIV {budget} AS INT)) END"
    )
    grps = (
        "transform(array_distinct(cids), "
        "cid -> filter(sequence(1, size(cids)), i -> element_at(cids, i) = cid))"
    )
    chunks = (
        "transform(grps, g -> struct("
        "element_at(cids, element_at(g, 1)) AS chunk_id, "
        "CAST(size(g) AS BIGINT) AS n_spans, "
        "CAST(size(filter(g, i -> element_at(srt, i).kind = 'media')) AS BIGINT)"
        " AS n_media, "
        "CAST(aggregate(g, CAST(0 AS BIGINT), (a, i) -> a + element_at(costs, i))"
        " AS BIGINT) AS chunk_tokens, "
        "CAST(element_at(srt, element_at(g, 1)).off AS INT) AS first_offset, "
        "CAST(element_at(srt, element_at(g, -1)).off AS INT) AS last_offset))"
    )
    return (
        docs.withColumn("srt", F.expr(sorted_spans))
        .withColumn("costs", F.expr(costs))
        .withColumn("pre", F.expr(pre))
        .withColumn("cids", F.expr(cids))
        .withColumn("grps", F.expr(grps))
        .select("doc_id", F.explode(F.expr(chunks)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.n_spans").alias("n_spans"),
            F.col("c.n_media").alias("n_media"),
            F.col("c.chunk_tokens").alias("chunk_tokens"),
            F.col("c.first_offset").alias("first_offset"),
            F.col("c.last_offset").alias("last_offset"),
        )
    )


def span_kind_transitions(docs: DataFrame, partitions: int | None = None) -> DataFrame:
    """Kind-BIGRAM census over the interleaved span sequences:
    ``(from_kind, to_kind, n_pairs)`` counting every consecutive span pair
    inside every document, AFTER a genuine array-carrying shuffle — the
    structural profile of the interleaving (geo->text, text->media, ...)
    and a second driver-visible order probe: any in-array reorder anywhere
    in the shuffle path changes the bigram counts, complementing
    ``span_stats``'s position/offset check with a sequence-shape check.

    Plan: the adjacent pairs come from ONE native array expression
    (``transform(sequence(...))`` zipping the array with its own tail — no
    posexplode of singles, no window, no self-join), then a single hash
    aggregation with map-side combine over at most ``|kinds|^2`` groups.

    ``partitions`` defaults to the session's ``spark.sql.shuffle.partitions``
    so the deliberate order-probe shuffle keeps cluster-scale parallelism
    (a literal here would serialize the probe at 1000 executors)."""
    if partitions is None:
        partitions = int(
            docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    shuffled = docs.repartition(partitions, "doc_id")
    pairs = F.expr(
        "transform(sequence(1, size(spans) - 1), "
        "i -> struct(spans[i - 1].kind AS from_kind, spans[i].kind AS to_kind))"
    )
    return (
        shuffled.filter(F.size("spans") > 1)
        .select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.from_kind").alias("from_kind"),
            F.col("p.to_kind").alias("to_kind"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def span_kind_transitions_oracle(
    table: str = "documents", amp: int = derive.AMP
) -> str:
    """Rebuilds the flat spans (single-sourced ``flat_spans_sql``) and joins
    each span to its successor on the contiguous offset — the arrays never
    exist oracle-side, so agreement proves the Spark arrays carry the exact
    derived sequence."""
    return (
        f"WITH {flat_spans_sql(table, amp)} "
        f"SELECT a.kind AS from_kind, b.kind AS to_kind, "
        f"CAST(COUNT(*) AS BIGINT) AS n_pairs "
        f"FROM spans a JOIN spans b "
        f"ON a.doc_id = b.doc_id AND b.off = a.off + 1 "
        f"GROUP BY 1, 2"
    )


def pack_mm(
    docs: DataFrame,
    budget: int,
    media_cost: int = 16,
    shards: int = 8,
) -> DataFrame:
    """Cross-document MULTIMODAL sequence packing — ``(shard, seq_id,
    n_docs, n_tokens, n_media, first_doc, last_doc)``: whole interleaved
    documents are laid into fixed ``budget``-token training sequences in
    deterministic ``doc_id`` order within ``shard = numeric(doc_id) %
    shards`` shards, where a document's cost is its span-sequence cost
    under the same model as :func:`span_chunks` (text/geo span ->
    ``length(text)`` proxy tokens, media span -> the flat ``media_cost``
    image-token budget).  ``span_chunks`` splits WITHIN a document;
    this packs ACROSS documents — together they are the two halves of the
    sequence-assembly step of a multimodal training pipeline.

    A document belongs to the sequence where its first token lands
    (``seq_id = cum_tokens_before DIV budget`` — the split-on-pack
    convention of ``textops.pack_sequences``).

    Physical plan: per-doc cost is pure ARRAY ALGEBRA (one ``aggregate``
    lambda over the spans column — no explode, no per-span rows ever
    exist), then ONE shard+doc_id shuffle feeds the per-shard cumulative
    window and a sequence-bounded agg.  Window state is bounded by one
    shard's stream regardless of corpus size; at 10^12 docs you raise
    ``shards`` until a shard fits a task, and shards are exactly the
    materializer's parallel unit.  Zero-padded doc keys make string order
    equal numeric order, so both engines sort identically.

    Reference parity: the reference carries payloads opaquely
    (`Scheme/RSKQ/RSKQ_Biginteger.java:120-161`); packing is the
    training-pipeline op its interleaved payload shape exists to feed."""
    from pyspark.sql import Window

    b = int(budget)
    s = int(shards)
    mc = int(media_cost)
    cost = F.expr(
        "aggregate(spans, CAST(0 AS BIGINT), (acc, sp) -> acc + "
        f"(CASE WHEN sp.kind = 'media' THEN {mc} ELSE length(sp.text) END))"
    )
    n_media = F.expr("size(filter(spans, sp -> sp.kind = 'media'))")
    base = docs.select(
        "doc_id",
        F.expr(f"CAST(substr(doc_id, 4) AS BIGINT) % {s}").alias("shard"),
        cost.alias("toks"),
        n_media.cast("long").alias("n_media"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = base.withColumn(
        "cum", F.coalesce(F.sum("toks").over(w), F.lit(0))
    ).withColumn("seq_id", F.expr(f"cum DIV {b}"))
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.sum("n_media").cast("long").alias("n_media"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def pack_mm_oracle(
    budget: int,
    media_cost: int = 16,
    shards: int = 8,
    table: str = "documents",
    amp: int = derive.AMP,
) -> str:
    """DuckDB oracle: identical cost model, shard rule, running sum, and
    DIV assignment over the flat span reconstruction."""
    b = int(budget)
    s = int(shards)
    mc = int(media_cost)
    return (
        f"WITH {flat_spans_sql(table, amp)}, "
        f"doc_cost AS (SELECT doc_id, "
        f"CAST(substr(doc_id, 4) AS BIGINT) % {s} AS shard, "
        f"CAST(SUM(CASE WHEN kind = 'media' THEN {mc} ELSE length(text) END) "
        f"AS BIGINT) AS toks, "
        f"CAST(SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_media FROM spans GROUP BY doc_id), "
        f"cum AS (SELECT doc_id, shard, toks, n_media, "
        f"COALESCE(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum "
        f"FROM doc_cost) "
        f"SELECT shard, CAST(cum // {b} AS BIGINT) AS seq_id, "
        f"CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM(toks) AS BIGINT) AS n_tokens, "
        f"CAST(SUM(n_media) AS BIGINT) AS n_media, "
        f"MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc "
        f"FROM cum GROUP BY shard, CAST(cum // {b} AS BIGINT)"
    )


def boilerplate_spans(
    docs: DataFrame,
    min_docs: int,
    k: int = 20,
    salt_buckets: int = 32,
) -> DataFrame:
    """Boilerplate detection over the interleaved corpus — ``(text,
    n_docs, n_occ, rk)``: the ``k`` ``text``-span payloads that occur in
    the most DISTINCT documents (at least ``min_docs``), ranked by
    ``(n_docs DESC, n_occ DESC, text)`` with a dense deterministic
    ``rk``.  This is the span-granularity form of the C4/CCNet
    boilerplate pass: payloads repeated across many documents are
    navigation chrome / license headers / templated fragments, and the
    survivors feed a removal filter.

    Physical plan — built for the fact that boilerplate keys are BY
    DEFINITION the hottest keys in the corpus: a two-level salted
    aggregation.  Level 1 groups by ``(text, salt)`` where ``salt`` is a
    fold of ``md5(doc_id)`` (each doc lands in exactly ONE salt bucket,
    so per-bucket COUNT DISTINCT doc_id partials ADD EXACTLY); level 2
    folds ``salt_buckets`` partials per payload.  No single reducer ever
    sees a hot payload's full document list.  The final top-k is a window
    over the payload-level frame (bounded by distinct payloads, not
    docs).  One narrow explode feeds level 1 — map-side combine applies
    at both levels.  The top-k itself is ``orderBy().limit()`` =
    TakeOrdered (distributed partial top-k, nothing globally sorted); the
    rank column is attached by a window over the k survivors only."""
    kk = int(k)
    flat = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "text")
    lvl1 = (
        flat.select(
            F.col("s.text").alias("text"),
            "doc_id",
            F.expr(f"CAST(conv(substr(md5(doc_id), 1, 3), 16, 10) AS BIGINT) % {int(salt_buckets)}").alias(
                "salt"
            ),
        )
        .groupBy("text", "salt")
        .agg(
            F.countDistinct("doc_id").alias("pn_docs"),
            F.count(F.lit(1)).alias("pn_occ"),
        )
    )
    lvl2 = lvl1.groupBy("text").agg(
        F.sum("pn_docs").cast("long").alias("n_docs"),
        F.sum("pn_occ").cast("long").alias("n_occ"),
    )
    from pyspark.sql import Window

    topk = (
        lvl2.filter(F.col("n_docs") >= int(min_docs))
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("text"))
        .limit(kk)
    )
    w = Window.orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("text"))
    return topk.withColumn("rk", F.row_number().over(w)).select(
        "text", "n_docs", "n_occ", F.col("rk").cast("int").alias("rk")
    )


def boilerplate_spans_oracle(
    min_docs: int,
    k: int = 20,
    table: str = "documents",
    amp: int = derive.AMP,
) -> str:
    """DuckDB oracle: single-level exact aggregation (the salted two-level
    form partitions COUNT DISTINCT exactly, so the plain form is the same
    function) + identical ranking and tie-break."""
    kk = int(k)
    return (
        f"WITH {flat_spans_sql(table, amp)}, "
        f"payloads AS (SELECT text, "
        f"CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        f"CAST(COUNT(*) AS BIGINT) AS n_occ "
        f"FROM spans WHERE kind = 'text' GROUP BY text), "
        f"ranked AS (SELECT text, n_docs, n_occ, "
        f"ROW_NUMBER() OVER (ORDER BY n_docs DESC, n_occ DESC, text) AS rk "
        f"FROM payloads WHERE n_docs >= {int(min_docs)}) "
        f"SELECT text, n_docs, n_occ, CAST(rk AS INT) AS rk "
        f"FROM ranked WHERE rk <= {kk}"
    )


def vocab_growth(docs: DataFrame, bucket_docs: int = 64) -> DataFrame:
    """Heaps-law vocabulary growth curve over the interleaved corpus —
    ``(bucket, new_terms, cum_terms)``: scanning documents in ingestion
    order (``bucket_docs`` flat documents per bucket), how many DISTINCT
    text-span payloads appear for the first time in each bucket, and the
    running vocabulary size.  A flattening curve means new data stops
    adding diversity — the saturation diagnostic a corpus refresh is
    judged by.

    Physical plan: first-occurrence is ``MIN(doc_id)`` per distinct
    payload (one map-side-combined agg over the exploded text spans —
    zero-padded doc keys make string MIN the numeric first occurrence),
    which collapses the corpus to a |vocabulary|-sized frame; everything
    after (bucket fold, per-bucket count, running sum) is
    vocabulary-sized, so the single-partition cumulative window is safe
    by construction.  One scan, one shuffle on the payload key
    (md5-uniform in practice: the zipf head is absorbed by the map-side
    MIN combine — a hot payload leaves each task as ONE row)."""
    from pyspark.sql import Window

    g = int(bucket_docs)
    step = 8192 * g  # sid = flat_doc_id * 8192 + rep (sources/derive)
    first = (
        docs.select(F.explode("spans").alias("s"), "doc_id")
        .filter(F.col("s.kind") == "text")
        .groupBy(F.col("s.text").alias("term"))
        .agg(F.min("doc_id").alias("fd"))
    )
    hist = (
        first.select(
            F.expr(f"CAST(substr(fd, 4) AS BIGINT) DIV {step}").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return hist.withColumn(
        "cum_terms", F.sum("new_terms").over(w).cast("long")
    )


def vocab_growth_oracle(
    bucket_docs: int = 64, table: str = "documents", amp: int = derive.AMP
) -> str:
    """Identical first-occurrence, bucket fold, and running sum over the
    flat span reconstruction."""
    g = int(bucket_docs)
    step = 8192 * g
    return (
        f"WITH {flat_spans_sql(table, amp)}, "
        f"vg_first AS (SELECT text AS term, MIN(doc_id) AS fd "
        f"FROM spans WHERE kind = 'text' GROUP BY text), "
        f"vg_hist AS (SELECT CAST(substr(fd, 4) AS BIGINT) // {step} "
        f"AS bucket, CAST(COUNT(*) AS BIGINT) AS new_terms "
        f"FROM vg_first GROUP BY 1) "
        f"SELECT bucket, new_terms, "
        f"CAST(SUM(new_terms) OVER (ORDER BY bucket "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        f"AS cum_terms FROM vg_hist"
    )


def doc_repetition(docs: DataFrame) -> DataFrame:
    """Intra-document repetition census over the interleaved corpus —
    ``(dup_band, n_docs, dup_spans, text_spans)``: documents banded by
    their duplicated-text-span percentage (``dup_band`` = ``pct DIV 10``,
    pct = exact integer ``100 * (n_text - n_distinct) DIV n_text``).  This
    is the span-granularity form of the Gopher/MassiveText *repetition*
    quality gate (fraction of duplicate lines within a document) — a
    document whose spans repeat internally is boilerplate-heavy or
    machine-looped, and the band census sizes a removal threshold before
    anything is dropped.

    Plan shape: the per-document statistic is PURE ARRAY ALGEBRA over the
    ``spans`` column — ``filter(kind='text') -> transform(.text) ->
    size vs size(array_distinct)`` inside whole-stage codegen, so the
    corpus scan emits only the (band, 1, dups, texts) quadruple per doc
    and the census is one map-side-combined hash aggregation over <= 11
    groups.  Zero joins, zero explodes, zero UDFs; at 10^12 docs this is
    the cheapest full-corpus statistic in the suite.

    Reference parity: no counterpart (the reference stores opaque point
    payloads); this is training-data curation over the input_hint span
    schema."""
    texts = "transform(filter(spans, s -> s.kind = 'text'), s -> s.text)"
    n_text = f"size({texts})"
    n_dist = f"size(array_distinct({texts}))"
    per_doc = docs.select(
        F.expr(
            f"CASE WHEN {n_text} = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE (100 * CAST({n_text} - {n_dist} AS BIGINT)) DIV {n_text} END"
        ).alias("dup_pct"),
        F.expr(f"CAST({n_text} - {n_dist} AS BIGINT)").alias("dups"),
        F.expr(f"CAST({n_text} AS BIGINT)").alias("texts"),
    )
    return (
        per_doc.withColumn("dup_band", F.expr("dup_pct DIV 10"))
        .groupBy("dup_band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dups").alias("dup_spans"),
            F.sum("texts").alias("text_spans"),
        )
    )


def doc_repetition_oracle(table: str = "documents", amp: int = derive.AMP) -> str:
    """DuckDB replay over the flat span rebuild: per-doc COUNT vs
    COUNT(DISTINCT) of text payloads, identical integer pct/band."""
    return (
        f"WITH {flat_spans_sql(table, amp)}, "
        f"rep_doc AS (SELECT doc_id, COUNT(*) AS n_text, "
        f"COUNT(DISTINCT text) AS n_dist "
        f"FROM spans WHERE kind = 'text' GROUP BY doc_id), "
        f"rep_band AS (SELECT "
        f"((100 * CAST(n_text - n_dist AS BIGINT)) // n_text) // 10 AS dup_band, "
        f"CAST(n_text - n_dist AS BIGINT) AS dups, "
        f"CAST(n_text AS BIGINT) AS texts FROM rep_doc) "
        f"SELECT dup_band, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM(dups) AS BIGINT) AS dup_spans, "
        f"CAST(SUM(texts) AS BIGINT) AS text_spans "
        f"FROM rep_band GROUP BY dup_band"
    )
