"""Wave-21 operators: multi-source isochrone BFS raster, vector-tile
feature decimation (k-bounded pyramid rollup), and the cell skyline
(Pareto front over volume vs concentration)."""

import hashlib
from collections import deque

from hilbert_curve_spark import workload as W
from hilbert_curve_spark.config import DEFAULT


def test_cell_isochrone_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.operators.rollup import cell_isochrone
    from hilbert_curve_spark.sources.interleave import build_documents

    shift, max_hops = W.TOPKW_SHIFT, W.ISO_MAX_HOPS
    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    pts = [(r.x, r.y) for r in geo.select("x", "y").collect()]
    hist = {}
    for x, y in pts:
        c = (x >> shift, y >> shift)
        hist[c] = hist.get(c, 0) + 1
    sources = sorted(
        {(x >> shift, y >> shift) for _, x, y in W.POIS} & set(hist)
    )
    dist = {c: 0 for c in sources}
    q = deque(sources)
    while q:
        c = q.popleft()
        if dist[c] >= max_hops:
            continue
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            n = (c[0] + dx, c[1] + dy)
            if n in hist and n not in dist:
                dist[n] = dist[c] + 1
                q.append(n)
    expect = {(gx, gy, hist[(gx, gy)], d) for (gx, gy), d in dist.items()}
    got = {
        (r.gx, r.gy, r.n_docs, r.hops)
        for r in cell_isochrone(
            geo, [(x, y) for _, x, y in W.POIS], max_hops, shift
        ).collect()
    }
    assert got == expect
    # the BFS must actually propagate (multiple hop levels) AND be blocked
    # by unoccupied cells (some occupied cells unreached)
    assert len({d for *_, d in expect}) >= 4
    assert len(expect) < len(hist)


def _score60(doc_id: str) -> int:
    h = hashlib.md5(doc_id.encode()).hexdigest()
    return int(h[:15], 16)


def test_tile_topk_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.operators.rollup import tile_feature_topk
    from hilbert_curve_spark.sources.interleave import build_documents

    levels, k = 4, 3
    base_shift = 2 * DEFAULT.cell_shift
    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    rows = [(r.doc_id, r.hilbert) for r in geo.select("doc_id", "hilbert").collect()]
    expect = set()
    for z in range(levels):
        tiles = {}
        for doc_id, hv in rows:
            tiles.setdefault(hv >> (base_shift + 2 * z), []).append(doc_id)
        for tile, docs in tiles.items():
            ranked = sorted(docs, key=lambda d: (-_score60(d), d))[:k]
            for i, d in enumerate(ranked, 1):
                expect.add((z, tile, d, _score60(d), i))
    got = {
        (r.zoom, r.tile, r.doc_id, r.score, r.rank)
        for r in tile_feature_topk(geo, levels, k).collect()
    }
    assert got == expect
    # zoom-0 must have more tiles than the coarsest zoom (real decimation)
    n0 = len({t for z, t, *_ in expect if z == 0})
    nz = len({t for z, t, *_ in expect if z == levels - 1})
    assert n0 > nz >= 1


def test_cell_skyline_brute_force(spark, sf_dir):
    from hilbert_curve_spark.operators.brq import cell_keyword_gini, cell_skyline
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    cells = [
        (r.gcell, r.n_kw_slots, r.n_distinct_kw, r.hhi_ppm)
        for r in cell_keyword_gini(geo, W.TOPKW_SHIFT).collect()
    ]
    expect = set()
    for c in cells:
        dominated = any(
            o[1] >= c[1]
            and o[3] >= c[3]
            and (o[1] > c[1] or o[3] > c[3])
            for o in cells
        )
        if not dominated:
            expect.add(c)
    got = {
        (r.gcell, r.n_kw_slots, r.n_distinct_kw, r.hhi_ppm)
        for r in cell_skyline(geo, W.TOPKW_SHIFT).collect()
    }
    assert got == expect
    # the front must be a curve, not a single point (axes anti-correlate)
    assert len(expect) >= 3
