"""Wave-8 operators: token-budget span chunking, perceptual media dedup,
and the hot-cell skew report — brute-force parity against plain Python
reimplementations plus the engine's no-per-row-Python plan ban."""

import numpy as np
from pyspark.sql import functions as F

from hilbert_curve_spark.operators.encode import encode_documents
from hilbert_curve_spark.operators.media import media_dedup, CONTENT_FP_MOD
from hilbert_curve_spark.operators.partitioning import skew_report
from hilbert_curve_spark.operators.spans import span_chunks
from hilbert_curve_spark.sources.interleave import build_documents


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- chunking


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [
            (
                doc_id,
                [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for k, t, m, o in seq
                ],
            )
            for doc_id, seq in rows
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def _chunk_brute(rows, budget, media_cost):
    out = {}
    for doc_id, seq in rows:
        cum = 0
        for k, t, m, o in sorted(seq, key=lambda s: s[3]):
            cost = media_cost if k == "media" else len(t)
            cid = cum // budget
            key = (doc_id, cid)
            n, nm, tok, lo, hi = out.get(key, (0, 0, 0, o, o))
            out[key] = (n + 1, nm + (k == "media"), tok + cost, min(lo, o), max(hi, o))
            cum += cost
    return {
        k + v for k, v in ((k, tuple(int(x) for x in v)) for k, v in out.items())
    }


def test_span_chunks_brute_force(spark):
    rows = [
        ("a", [("geo", "x=12 y=7", "", 0), ("text", "hello", "", 1),
               ("media", "", "m://doc0000000001/0", 2),
               ("text", "worldwide", "", 3), ("media", "", "m://doc0000000001/1", 4)]),
        ("b", [("text", "t", "", 0)]),                     # single tiny span
        ("c", [("text", "exactly-ten!", "", 0),           # 12 chars = budget
               ("text", "next", "", 1)]),
        ("d", [("media", "", "m://doc0000000004/0", 0)]),  # media-only doc
    ]
    budget, media_cost = 12, 5
    got = {
        (r.doc_id, r.chunk_id, r.n_spans, r.n_media, r.chunk_tokens,
         r.first_offset, r.last_offset)
        for r in span_chunks(_mk_docs(spark, rows), budget, media_cost,
                             partitions=4).collect()
    }
    assert got == _chunk_brute(rows, budget, media_cost)


def test_span_chunks_invariants(spark, sf_dir):
    from hilbert_curve_spark import workload as W

    docs = build_documents(spark, sf_dir, amp=2)
    out = span_chunks(docs, W.CHUNK_BUDGET, W.MEDIA_TOKEN_COST).cache()
    try:
        # span conservation: every span lands in exactly one chunk
        n_spans = docs.select(F.explode("spans")).count()
        assert out.agg(F.sum("n_spans")).first()[0] == n_spans
        # chunk ids dense from 0 per document
        dense = out.groupBy("doc_id").agg(
            F.min("chunk_id").alias("lo"),
            F.max("chunk_id").alias("hi"),
            F.count("*").alias("n"),
        )
        assert dense.filter("lo != 0 OR n != hi + 1").count() == 0
        # token conservation + the tight size bound: a chunk holds spans whose
        # running prefix lies in one budget window, so its total is always
        # < budget + max single-span cost (boundary overshoot is the only slack)
        cost = F.expr(
            f"CASE WHEN s.kind = 'media' THEN {W.MEDIA_TOKEN_COST} "
            f"ELSE length(s.text) END"
        )
        flat = docs.select(F.explode("spans").alias("s")).select(cost.alias("c"))
        total, max_cost = flat.agg(F.sum("c"), F.max("c")).first()
        assert out.agg(F.sum("chunk_tokens")).first()[0] == total
        assert (
            out.filter(
                F.col("chunk_tokens") >= W.CHUNK_BUDGET + max_cost
            ).count()
            == 0
        )
    finally:
        out.unpersist()


def test_span_chunks_plan_no_python(spark, sf_dir):
    docs = build_documents(spark, sf_dir, amp=2)
    plan = _plan(span_chunks(docs, 24, 16))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- media dedup


def test_media_dedup_brute_force(spark, sf_dir):
    docs = build_documents(spark, sf_dir, amp=3)
    refs = [
        (r.doc_id, r.ref)
        for r in docs.select(
            "doc_id",
            F.explode(F.expr("filter(spans, s -> s.kind = 'media')")).alias("s"),
        ).select("doc_id", F.col("s.media_ref").alias("ref")).collect()
    ]
    # replay decode_stub: h is the exact content key the fingerprint quantizes
    keys = np.array([int(ref[7:17]) for _, ref in refs], dtype=np.int64)
    idx = np.array([int(ref[18:]) for _, ref in refs], dtype=np.int64)
    h = (((keys * 8 + idx) % 1_000_003) * 2654435761 + 1013904223) % 1_000_003
    groups = {}
    for (doc_id, ref), fp in zip(refs, (h % CONTENT_FP_MOD).tolist()):
        groups.setdefault(fp, []).append((doc_id, ref))
    expect = {
        (fp, len(g), len({d for d, _ in g}), *min(g))
        for fp, g in groups.items()
        if len(g) >= 2
    }
    got = {
        (r.content_fp, r.n_copies, r.n_docs, r.canonical_doc, r.canonical_ref)
        for r in media_dedup(docs).collect()
    }
    assert got == expect
    assert expect, "fixture produced no duplicate fingerprints — test is vacuous"


# ------------------------------------------------------------- skew report


def test_skew_report_brute_force(spark, sf_dir):
    geo = encode_documents(build_documents(spark, sf_dir, amp=2))
    counts = sorted(
        ((r["count"], r["cell"]) for r in geo.groupBy("cell").count().collect()),
        key=lambda t: (-t[0], t[1]),
    )
    total = sum(n for n, _ in counts)
    expect, cum = set(), 0
    for rank, (n, cell) in enumerate(counts[:7], start=1):
        cum += n
        expect.add((rank, cell, n, n * 1_000_000 // total, cum * 1_000_000 // total))
    got = {
        (r.rank, r.cell, r.n_docs, r.share_ppm, r.cum_ppm)
        for r in skew_report(geo, 7).collect()
    }
    assert got == expect


def test_skew_report_plan_no_python(spark, sf_dir):
    geo = encode_documents(build_documents(spark, sf_dir, amp=2))
    plan = _plan(skew_report(geo, 5))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_chunks_inline_brute_force(spark):
    from hilbert_curve_spark.operators.spans import span_chunks_inline

    rows = [
        ("a", [("geo", "x=12 y=7", "", 0), ("text", "hello", "", 1),
               ("media", "", "m://doc0000000001/0", 2),
               ("text", "worldwide", "", 3), ("media", "", "m://doc0000000001/1", 4)]),
        ("b", [("text", "t", "", 0)]),
        ("c", [("text", "exactly-ten!", "", 0), ("text", "next", "", 1)]),
        ("d", [("media", "", "m://doc0000000004/0", 0)]),
        ("e", [("text", "spans-out-of-order", "", 1), ("text", "first", "", 0)]),
    ]
    budget, media_cost = 12, 5
    got = {
        (r.doc_id, r.chunk_id, r.n_spans, r.n_media, r.chunk_tokens,
         r.first_offset, r.last_offset)
        for r in span_chunks_inline(_mk_docs(spark, rows), budget,
                                    media_cost).collect()
    }
    assert got == _chunk_brute(rows, budget, media_cost)


def test_span_chunks_inline_equals_window_form(spark, sf_dir):
    from hilbert_curve_spark import workload as W
    from hilbert_curve_spark.operators.spans import span_chunks_inline

    docs = build_documents(spark, sf_dir, amp=2)
    cols = ("doc_id", "chunk_id", "n_spans", "n_media", "chunk_tokens",
            "first_offset", "last_offset")
    a = {tuple(r[c] for c in cols)
         for r in span_chunks(docs, W.CHUNK_BUDGET, W.MEDIA_TOKEN_COST).collect()}
    b = {tuple(r[c] for c in cols)
         for r in span_chunks_inline(docs, W.CHUNK_BUDGET,
                                     W.MEDIA_TOKEN_COST).collect()}
    assert a == b


def test_span_chunks_inline_plan_no_shuffle_no_python(spark):
    from hilbert_curve_spark.operators.spans import span_chunks_inline

    docs = _mk_docs(spark, [("a", [("text", "abc", "", 0)])])
    plan = _plan(span_chunks_inline(docs, 12, 5))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
