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
