"""Streaming event operators vs their batch twins: the batch operator is
the oracle for the streaming plan over the same data."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from hilbert_curve_spark.operators import events as ev_ops
from hilbert_curve_spark.streaming import event_streams as es


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events split into 3 files (3 micro-batches), time-ordered so the
    watermark advances monotonically like a live stream."""
    out = tmp_path_factory.mktemp("stream") / "events"
    df = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("ts")
    n = df.count()
    rows = df.collect()
    for i in range(3):
        chunk = rows[i * n // 3 : (i + 1) * n // 3]
        spark.createDataFrame(chunk, df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(out / f"batch{i}"))
    # flatten: move part files into one dir (file-stream sources list files)
    flat = tmp_path_factory.mktemp("stream") / "flat"
    flat.mkdir()
    k = 0
    now = time.time()
    for sub in sorted(out.glob("batch*")):
        for pf in sorted(sub.glob("part-*")):
            dst = flat / f"{k:02d}.parquet"
            shutil.copy(pf, dst)
            # distinct, increasing mtimes: the file source orders batches by
            # mtime, and equal stamps make pickup order unstable — a replay
            # that feeds old events after the watermark advanced exercises
            # the late-data guard rather than the happy path
            os.utime(dst, (now + k * 10, now + k * 10))
            k += 1
    return str(flat)


def test_tumbling_stream_matches_batch(spark, sf_dir, events_dir, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        es.tumbling_counts_stream(es.read_event_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("tumbling_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start_s"], r["event_type"]): (r["n_events"], r["sum_value_e6"])
        for r in spark.sql("SELECT * FROM tumbling_stream").collect()
    }
    batch = {
        (r["window_start_s"], r["event_type"]): (r["n_events"], r["sum_value_e6"])
        for r in ev_ops.tumbling_counts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
    }
    assert got == batch


def test_sessionize_stream_matches_batch_closed_sessions(
    spark, sf_dir, events_dir, tmp_path_factory
):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        es.sessionize_stream(es.read_event_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    }
    # batch oracle: every session EXCEPT each user's last (the stream can
    # only close a session once a later event or the final watermark passes
    # the gap; the per-user tail session may legitimately still be open)
    batch_df = ev_ops.sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"))
    batch_rows = batch_df.withColumn(
        "start_s", F.col("start_ts").cast("timestamp").cast("long")
    ).withColumn("end_s", F.col("end_ts").cast("timestamp").cast("long")).collect()
    last_per_user = {}
    for r in batch_rows:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["start_s"] > cur["start_s"]:
            last_per_user[r["user_id"]] = r
    expect_closed = {
        (r["user_id"], r["start_s"], r["end_s"], r["n_events"])
        for r in batch_rows
        if last_per_user[r["user_id"]] is not r
    }
    # every emitted session must be a true batch session...
    all_batch = {
        (r["user_id"], r["start_s"], r["end_s"], r["n_events"]) for r in batch_rows
    }
    assert got <= all_batch
    # ...and every non-tail session must have been emitted
    assert expect_closed <= got


def test_sliding_stream_matches_batch(spark, sf_dir, events_dir, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        es.sliding_counts_stream(
            es.read_event_stream(spark, events_dir), minutes=60, slide_minutes=15
        )
        .writeStream.format("memory")
        .queryName("sliding_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start_s"], r["event_type"]): (r["n_events"], r["sum_value_e6"])
        for r in spark.sql("SELECT * FROM sliding_stream").collect()
    }
    batch = {
        (r["window_start_s"], r["event_type"]): (r["n_events"], r["sum_value_e6"])
        for r in ev_ops.sliding_counts(
            spark.read.parquet(f"{sf_dir}/events.parquet"), 60, 15
        ).collect()
    }
    assert got == batch


def test_interval_join_stream_matches_batch(
    spark, sf_dir, events_dir, tmp_path_factory
):
    """Stream-stream interval join (two independent watermarked sources)
    equals the batch interval join row-for-row."""
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    joined = es.interval_join_stream(
        es.read_event_stream(spark, events_dir),
        es.read_event_stream(spark, events_dir),
        "click",
        "purchase",
        30,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ivjoin_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM ivjoin_stream").collect()
    )
    batch = sorted(
        tuple(r)
        for r in ev_ops.interval_join(
            spark.read.parquet(f"{sf_dir}/events.parquet"), "click", "purchase", 30
        ).collect()
    )
    assert len(batch) > 0
    assert got == batch


def test_dedup_stream_matches_batch_distinct(
    spark, sf_dir, events_dir, tmp_path_factory
):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        es.dedup_stream(es.read_event_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM dedup_stream").collect()}
    batch = {
        tuple(r)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    # append-mode dropDuplicates emits each key exactly once
    assert len(got) == spark.sql("SELECT count(*) FROM dedup_stream").collect()[0][0]
    assert got == batch


def test_dedup_stream_within_watermark_drops_replays(
    spark, events_dir, tmp_path_factory
):
    """dropDuplicatesWithinWatermark: the fixture's 3 micro-batches replay
    the same event_ids nowhere, so duplicate every file — temporally-close
    duplicates (same ts) must collapse to the batch-distinct set."""
    src = tmp_path_factory.mktemp("dupes")
    k = 0
    now = time.time()
    for f in sorted(os.listdir(events_dir)):
        for copy in range(2):
            dst = src / f"{k:02d}.parquet"
            shutil.copy(os.path.join(events_dir, f), dst)
            os.utime(dst, (now + k * 10, now + k * 10))
            k += 1
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    # the fixture spans 30 days in 3 chunks (~10 days each); the delay must
    # cover a chunk's span or early keys are evicted before their duplicate
    # file replays — 15 days keeps every adjacent duplicate inside the
    # horizon while still evicting day-0 state before the stream ends
    deduped = es.dedup_stream(
        es.read_event_stream(spark, str(src)),
        keys=("event_id",),
        within_watermark="15 days",
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"] for r in spark.sql("SELECT * FROM dedup_wm_stream").collect()}
    expect = {
        r["event_id"]
        for r in spark.read.parquet(str(src)).select("event_id").distinct().collect()
    }
    assert got == expect


def test_sliding_multiplicity_and_guard(spark, sf_dir):
    """Every event lands in exactly size/slide windows (total weight check),
    and a non-divisible slide is rejected in batch and stream forms."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    total = ev_ops.sliding_counts(ev, 60, 15).agg(F.sum("n_events")).collect()[0][0]
    assert total == 4 * n
    with pytest.raises(ValueError):
        ev_ops.sliding_counts(ev, 60, 25)
    with pytest.raises(ValueError):
        es.sliding_counts_stream(ev, 60, 25)


def test_stay_points_stream_matches_batch_closed_stays(
    spark, sf_dir, events_dir, tmp_path_factory
):
    from hilbert_curve_spark.operators import trajectory as T

    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        es.stay_points_stream(es.read_event_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("stays_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM stays_stream").collect()
    }
    batch_rows = T.stay_points(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).collect()
    all_batch = {tuple(r) for r in batch_rows}
    # every emitted stay must be a true batch stay...
    assert got <= all_batch
    # ...and every stay except possibly each user's LAST batch stay (whose
    # segment may still be open at end-of-stream) must have been emitted
    last_per_user = {}
    for r in batch_rows:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["stay_id"] > cur["stay_id"]:
            last_per_user[r["user_id"]] = r
    expect_closed = {
        tuple(r) for r in batch_rows if last_per_user[r["user_id"]] is not r
    }
    assert expect_closed <= got
    assert got, "stream emitted nothing"
