"""Wave-29: pyramid occupancy profile and KMV sketch mergeability."""

import hashlib

from hilbert_curve_spark import workload as W


def test_occupancy_profile_brute_force(spark, sf_dir):
    from hilbert_curve_spark.config import DEFAULT
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.operators.rollup import cell_pyramid, occupancy_profile
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    levels = W.PYRAMID_LEVELS
    pyr = {}
    for r in cell_pyramid(geo, levels).collect():
        pyr.setdefault(r.level, []).append(r.n_docs)
    expect = {
        (lvl, len(ns), sum(ns), max(ns)) for lvl, ns in pyr.items()
    }
    got = {
        (r.level, r.n_cells, r.total_docs, r.max_docs)
        for r in occupancy_profile(geo, levels).collect()
    }
    assert got == expect
    # conservation: total mass identical at every level
    totals = {t for _, _, t, _ in got}
    assert len(totals) == 1
    # occupancy must strictly collapse as cells coarsen (box counting)
    by_level = sorted((lvl, n) for lvl, n, _, _ in got)
    assert all(a[1] > b[1] for a, b in zip(by_level, by_level[1:]))
    assert len(got) == levels


def _fold40(s: str) -> int:
    return max(int(hashlib.md5(s.encode()).hexdigest()[:10], 16), 1)


def test_kmv_merge_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.operators.rollup import kmv_merge
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    shift, k = 8, 16
    grid = 4096 >> shift
    cells = {}
    for r in geo.select("x", "y", "keywords").collect():
        g = (r.x >> shift) * grid + (r.y >> shift)
        cells.setdefault(g, set()).update(r.keywords)
    m_space = 1 << 40

    def est(nd, kth):
        return nd if nd <= k else (k - 1) * m_space // kth

    # partial sketches: per cell the k smallest (h, kw) pairs
    partial_hashes = set()
    for kws in cells.values():
        ranked = sorted((( _fold40(kw), kw) for kw in kws))[:k]
        partial_hashes.update(h for h, _ in ranked)
    mh = sorted(partial_hashes)
    m_nd = len(mh)
    m_kth = mh[min(k, m_nd) - 1]
    all_kws = set().union(*cells.values())
    dh = sorted({_fold40(kw) for kw in all_kws})
    d_nd = len(dh)
    d_kth = dh[min(k, d_nd) - 1]
    expect = (
        k,
        m_nd,
        est(m_nd, m_kth),
        est(d_nd, d_kth),
        d_nd,
        int(est(m_nd, m_kth) == est(d_nd, d_kth)),
    )
    rows = kmv_merge(geo, shift, k).collect()
    assert len(rows) == 1
    r = rows[0]
    got = (
        r.k,
        r.n_partial_hashes,
        r.merged_estimate,
        r.direct_estimate,
        r.exact_distinct,
        r.merged_eq_direct,
    )
    assert got == expect
    # the theorem: merged == direct, on real data with many cells
    assert r.merged_eq_direct == 1 and len(cells) > k
    # and the sketch actually estimates (not the exact-count branch)
    assert r.exact_distinct > k
