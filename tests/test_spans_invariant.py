"""Per-row span-sequence invariant (BASELINE.json input_hint): the
``(kind, text, media_ref, order)`` sequence of every document survives every
pipeline stage and shuffle byte-identically.  The engine guarantees this
structurally — spans are never rebuilt, only carried or joined by doc_id
(SURVEY §1.2) — and this test pins it behaviorally."""

import pandas as pd
from pyspark.sql import functions as F

from hilbert_curve_spark.operators.encode import encode_documents
from hilbert_curve_spark.sources.interleave import build_documents


def _canon(df):
    rows = df.select("doc_id", "spans").collect()
    return {
        r["doc_id"]: tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        )
        for r in rows
    }


def test_span_sequence_survives_pipeline(spark, sf_dir):
    docs = build_documents(spark, sf_dir, amp=2)
    before = _canon(docs)
    assert before, "corpus empty"

    # full pipeline with shuffles: encode -> repartition on the skewed cell
    # key -> self-join derived facts back by doc_id
    enc = encode_documents(docs, keep_spans=True)
    shuffled = enc.repartition(8, "cell")
    facts = shuffled.select("doc_id", "hilbert")
    rejoined = shuffled.join(facts, "doc_id").select("doc_id", "spans")

    after = _canon(rejoined)
    assert after == before

    # structure checks: offsets are 0..n-1 in order; geo span first
    for seq in before.values():
        assert [s[3] for s in seq] == list(range(len(seq)))
        assert seq[0][0] == "geo"
        kinds = [s[0] for s in seq]
        assert kinds.count("geo") == 1


def test_media_spans_well_formed(spark, sf_dir):
    docs = build_documents(spark, sf_dir, amp=3)
    pdf = docs.limit(50).toPandas()
    for _, row in pdf.iterrows():
        for s in row["spans"]:
            if s["kind"] == "media":
                assert s["media_ref"].startswith("m://doc")
                assert s["text"] == ""
            else:
                assert s["media_ref"] == ""


def test_span_stats_aggregates(spark, sf_dir):
    """Driver-visible form of the invariant: per-kind aggregates after a real
    shuffle obey the construction exactly (offsets 0..n-1, geo first, 4 text
    spans, sid%3 media spans)."""
    from hilbert_curve_spark.operators.spans import span_stats

    docs = build_documents(spark, sf_dir, amp=4)
    n = docs.count()
    rows = {r.kind: r for r in span_stats(docs).collect()}
    assert set(rows) == {"geo", "text", "media"}
    for r in rows.values():
        assert r.n_order_breaks == 0
    assert rows["geo"].n_spans == n == rows["geo"].n_docs
    assert rows["geo"].sum_offset == 0
    assert rows["text"].n_spans == 4 * n and rows["text"].n_docs == n
    assert rows["text"].sum_offset == (1 + 2 + 3 + 4) * n
    # media: sid % 3 spans per doc at offsets 5 (and 6)
    n_media = rows["media"].n_spans
    assert rows["media"].sum_offset == 5 * n_media + (
        rows["media"].n_spans - rows["media"].n_docs
    ) * 1  # docs with 2 spans contribute offsets 5+6
    assert rows["media"].sum_text_len == 0
    assert rows["geo"].sum_ref_len == 0 == rows["text"].sum_ref_len


def test_caption_pairs_arbitrary_interleavings(spark):
    """Brute-force parity on hand-built interleavings, including media
    before any text (NULL caption) and multiple text/media alternations."""
    from hilbert_curve_spark.operators.spans import caption_pairs

    def doc(doc_id, seq):
        return (doc_id, [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for k, t, m, o in seq
        ])

    rows = [
        doc("a", [("media", "", "m0", 0), ("text", "t1", "", 1),
                  ("media", "", "m1", 2), ("text", "t2", "", 3),
                  ("media", "", "m2", 4)]),
        doc("b", [("text", "tb", "", 0), ("media", "", "mb", 1)]),
        doc("c", [("geo", "g", "", 0), ("media", "", "mc", 1)]),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        (r.doc_id, r.media_ref, r.caption, r.media_offset, r.caption_offset)
        for r in caption_pairs(docs, partitions=4).collect()
    }
    assert got == {
        ("a", "m0", None, 0, None),      # media first: no preceding text
        ("a", "m1", "t1", 2, 1),
        ("a", "m2", "t2", 4, 3),
        ("b", "mb", "tb", 1, 0),
        ("c", "mc", None, 1, None),      # geo span is not a caption
    }


def test_caption_pairs_matches_derived_layout(spark, sf_dir):
    """On the derived corpus every media span captions to the LAST text
    keyword — exactly what the analytic oracle assumes."""
    from hilbert_curve_spark.operators.spans import caption_pairs
    from hilbert_curve_spark.sources.interleave import build_documents

    docs = build_documents(spark, sf_dir, amp=2)
    out = caption_pairs(docs)
    bad = out.filter(
        F.col("caption").isNull() | (F.col("caption_offset") != 4)
    ).count()
    assert bad == 0
    # media count conservation: one output row per media span
    n_media = docs.select(
        F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media").count()
    assert out.count() == n_media
