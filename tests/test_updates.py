"""Delta-log merge-on-read + compaction (reference S11/S12 and the
chain-walk compaction `Scheme/RSKQ/RSKQ_Biginteger.java:674-738`)."""

from pyspark.sql import functions as F

from hilbert_curve_spark.operators import updates as upd


def _live_set(df):
    return {r.doc_id for r in upd.merge_on_read(df).collect()}


def test_compaction_preserves_live_set_at_every_horizon(spark, sf_dir):
    log = upd.build_update_stream(spark, sf_dir).cache()
    want = _live_set(log)
    try:
        for v in (0, 1, 2, 3):
            got = _live_set(upd.compact_log(log, v))
            assert got == want, f"horizon {v}: live set changed"
    finally:
        log.unpersist()


def test_compaction_shrinks_log(spark, sf_dir):
    log = upd.build_update_stream(spark, sf_dir).cache()
    try:
        before = log.count()
        after = upd.compact_log(log, 2).count()
        # batch-2 deletes fold away entirely; their adds collapse with them
        assert after < before
    finally:
        log.unpersist()


def test_compacted_base_versions_at_horizon(spark, sf_dir):
    log = upd.build_update_stream(spark, sf_dir)
    compacted = upd.compact_log(log, 2)
    head = compacted.filter(F.col("version") <= 2)
    assert head.filter(F.col("op") != "add").count() == 0
    assert head.filter(F.col("version") != 2).count() == 0
    # tail untouched
    tail_before = log.filter(F.col("version") > 2)
    tail_after = compacted.filter(F.col("version") > 2)
    assert tail_before.exceptAll(tail_after).count() == 0
    assert tail_after.exceptAll(tail_before).count() == 0


def test_as_of_semantics(spark, sf_dir):
    log = upd.build_update_stream(spark, sf_dir)
    # as-of the newest version == plain merge-on-read
    latest = upd.merge_on_read(log)
    asof3 = upd.merge_as_of(log, 3)
    assert asof3.exceptAll(latest).count() == 0
    assert latest.exceptAll(asof3).count() == 0
    # as-of v1: everything is live (batch 1 adds all docs)
    n_docs = log.filter(F.col("version") == 1).count()
    assert upd.merge_as_of(log, 1).count() == n_docs
    # as-of v2: the batch-2 deletes are gone, re-adds not yet applied
    n_deleted = log.filter(F.col("version") == 2).select("doc_id").distinct().count()
    assert upd.merge_as_of(log, 2).count() == n_docs - n_deleted


def test_srdsse_live_set_semantics(spark, sf_dir):
    """SRDSSE fold (SRDSSE.java:185-238): a doc is live for keyword w iff its
    newest op is an add — with the F6-style batches that is membership AND
    (NOT deleted-in-2 OR re-added-in-3): NOT(sid%5=0) OR sid%10=0."""
    from hilbert_curve_spark.config import DEFAULT
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4)).cache()
    try:
        kw = "k8"
        log = upd.build_keyword_update_stream(geo, [kw])
        live = {r.doc_id for r in upd.srdsse_search(log, [kw]).collect()}
        member = geo.filter(F.array_contains("keywords", kw)).select("doc_id")
        sid = F.expr("CAST(SUBSTR(doc_id, 4) AS BIGINT)")
        want = {
            r.doc_id
            for r in member.filter((sid % 5 != 0) | (sid % 10 == 0)).collect()
        }
        assert live == want and live  # non-empty, exact
    finally:
        geo.unpersist()


def test_srdsse_search_prunes_to_requested_keywords(spark, sf_dir):
    from hilbert_curve_spark.config import DEFAULT
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    log = upd.build_keyword_update_stream(geo, ["k8", "k9"])
    out = upd.srdsse_search(log, ["k9"])
    kws = {r.keyword for r in out.select("keyword").distinct().collect()}
    assert kws == {"k9"}
