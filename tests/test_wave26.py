"""Wave-26 operators: span kind-bigram census, OD directional asymmetry,
density percentile bands."""

from hilbert_curve_spark import workload as W


def test_span_kind_transitions_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.spans import span_kind_transitions
    from hilbert_curve_spark.sources.interleave import build_documents

    docs = build_documents(spark, sf_dir, amp=4)
    from collections import Counter

    expect = Counter()
    for r in docs.select("spans").collect():
        kinds = [s.kind for s in r.spans]
        for a, b in zip(kinds, kinds[1:]):
            expect[(a, b)] += 1
    got = {
        (r.from_kind, r.to_kind): r.n_pairs
        for r in span_kind_transitions(docs).collect()
    }
    assert got == dict(expect)
    # the interleaving must show the geo->text backbone and a media arc
    assert ("geo", "text") in got and ("text", "text") in got
    assert any(k == ("text", "media") or k == ("media", "media") for k in got)


def test_od_asymmetry_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.trajectory import od_asymmetry, od_flows

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    flows = {}
    for r in od_flows(events, 60, 8).collect():
        if r.o_cell != r.d_cell:
            key = (min(r.o_cell, r.d_cell), max(r.o_cell, r.d_cell))
            e = flows.setdefault(key, [0, 0])
            e[0 if r.o_cell < r.d_cell else 1] += r.n_flows
    expect = {
        (a, b, ab, ba, int(100 * abs(ab - ba) / (ab + ba)))
        for (a, b), (ab, ba) in flows.items()
    }
    got = {
        (r.cell_a, r.cell_b, r.flow_ab, r.flow_ba, r.asym_pct)
        for r in od_asymmetry(events, 60, 8).collect()
    }
    assert got == expect
    # balanced and one-way pairs must both exist for the index to mean much
    assert any(p == 100 for *_, p in got) and any(p < 100 for *_, p in got)


def test_cell_percentile_bands_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.operators.rollup import cell_percentile_bands
    from hilbert_curve_spark.sources.interleave import build_documents
    from hilbert_curve_spark.config import DEFAULT

    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    s = W.TOPKW_SHIFT
    m = DEFAULT.edge >> s
    counts = {}
    for r in geo.select("x", "y").collect():
        key = (r.x >> s) * m + (r.y >> s)
        counts[key] = counts.get(key, 0) + 1
    ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
    total = sum(counts.values())
    expect, cum = set(), 0
    for gcell, n in ranked:
        expect.add((gcell, n, cum + n, W.BANDS * cum // total))
        cum += n
    got = {
        (r.gcell, r.n_docs, r.cum_docs, r.band)
        for r in cell_percentile_bands(geo, W.BANDS, s).collect()
    }
    assert got == expect
    bands = {b for *_, b in got}
    assert 0 in bands and len(bands) >= 3  # a real gradient, not one blob
    assert max(bands) < W.BANDS


def test_cell_bands_subsume_core_area(spark, sf_dir):
    """band < 9 must equal core_area at mass_pct=90 (the generalization
    claim in the docstring)."""
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.operators.rollup import (
        cell_percentile_bands,
        core_area,
    )
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    s = W.TOPKW_SHIFT
    core = {r.gcell for r in core_area(geo, 90, s).collect()}
    banded = {
        r.gcell for r in cell_percentile_bands(geo, 10, s).collect() if r.band < 9
    }
    assert banded == core
