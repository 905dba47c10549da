"""Wave-25 operators: geofence dwell episodes, cohort retention,
snapshot time-travel diff."""

from hilbert_curve_spark import workload as W


def test_geofence_dwell_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.events import geofence_dwell
    from hilbert_curve_spark.operators.pip import inside_polygon_expr  # noqa: F401
    from hilbert_curve_spark.sources import derive
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (
        events.withColumn("ex", F.expr(derive.x_sql("event_id")))
        .withColumn("ey", F.expr(derive.y_sql("event_id")))
        .withColumn("ep", F.col("ts").cast("timestamp").cast("long"))
        .select("user_id", "ts", "event_id", "ex", "ey", "ep")
        .collect()
    )

    def _inside(p, x, y):
        vs = p["vertices"]
        inside = False
        for (x1, y1), (x2, y2) in zip(vs, vs[1:] + vs[:1]):
            if (y1 > y) != (y2 > y):
                # exact integer crossing test (same as pip.inside_polygon_expr)
                lhs = x * (y2 - y1)
                rhs = x1 * (y2 - y1) + (y - y1) * (x2 - x1)
                if (lhs < rhs) if y2 - y1 > 0 else (lhs > rhs):
                    inside = not inside
        return inside

    gap = W.DWELL_GAP_MIN * 60
    per_user = {}
    for r in pts:
        tag = next(
            (p["poly_id"] for p in W.POLYGONS if _inside(p, r.ex, r.ey)), None
        )
        if tag is not None:
            per_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.ep, tag))
    expect = set()
    for u, rows in per_user.items():
        rows.sort()
        episode, prev = 0, None
        runs = {}
        for _, _, ep, tag in rows:
            if prev is not None and (tag != prev[1] or ep - prev[0] > gap):
                episode += 1
            runs.setdefault(episode, []).append((ep, tag))
            prev = (ep, tag)
        for e, evs in runs.items():
            eps = [ep for ep, _ in evs]
            expect.add(
                (u, evs[0][1], e, len(evs), min(eps), max(eps), max(eps) - min(eps))
            )
    got = {
        (r.user_id, r.poly_id, r.episode, r.n_events, r.enter_s, r.exit_s, r.dwell_s)
        for r in geofence_dwell(events, W.POLYGONS, W.DWELL_GAP_MIN).collect()
    }
    assert got == expect
    # multi-event dwells and fence switches must both occur in the fixture
    assert any(n > 1 for *_, n, _, _, _ in got)
    assert len({(u, e) for u, _, e, *_ in got}) > len(
        {u for u, *_ in got}
    )  # some user has >1 episode


def test_user_retention_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.events import user_retention

    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    day_s = W.RETENTION_DAYS * 86400
    rows = events.select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("ep")
    ).collect()
    buckets = {(r.user_id, r.ep // day_s) for r in rows}
    first = {}
    for u, b in buckets:
        first[u] = min(first.get(u, b), b)
    from collections import Counter

    expect = Counter((first[u], b - first[u]) for u, b in buckets)
    got = {
        (r.cohort, r.age): r.n_users
        for r in user_retention(events, W.RETENTION_DAYS).collect()
    }
    assert got == dict(expect)
    # age-0 row per cohort == cohort size; later ages must exist
    assert any(age > 0 for _, age in got)


def test_snapshot_diff_directions(spark):
    from hilbert_curve_spark.operators.updates import snapshot_diff

    log = spark.createDataFrame(
        [
            ("a", 1, "add"),   # live from v1 on
            ("b", 1, "add"),
            ("b", 2, "del"),   # removed between 1 and 3
            ("c", 2, "add"),   # added between 1 and 3
            ("d", 2, "add"),
            ("d", 3, "del"),   # add+del inside the window -> no diff
            ("e", 3, "del"),   # del of a never-live doc -> no diff
        ],
        "doc_id string, version int, op string",
    )
    got = {(r.doc_id, r.status) for r in snapshot_diff(log, 1, 3).collect()}
    assert got == {("b", "removed"), ("c", "added")}
    # reversed horizons flip the diff
    rev = {(r.doc_id, r.status) for r in snapshot_diff(log, 3, 1).collect()}
    assert rev == {("b", "added"), ("c", "removed")}


def test_snapshot_diff_matches_two_fold_join(spark, sf_dir):
    from hilbert_curve_spark.operators.updates import (
        build_update_stream,
        merge_as_of,
        snapshot_diff,
    )

    log = build_update_stream(spark, sf_dir, amp=4)
    got = {
        (r.doc_id, r.status)
        for r in snapshot_diff(log, W.DIFF_FROM, W.DIFF_TO).collect()
    }
    live_from = {r.doc_id for r in merge_as_of(log, W.DIFF_FROM).collect()}
    live_to = {r.doc_id for r in merge_as_of(log, W.DIFF_TO).collect()}
    expect = {(d, "added") for d in live_to - live_from} | {
        (d, "removed") for d in live_from - live_to
    }
    assert got == expect
    assert expect  # the 3-batch log produces a non-empty diff at (1, 3)
