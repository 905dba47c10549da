"""Wave-19 operator: PIP join for polygons with holes / multi-polygons —
brute-force even-odd parity, hole exclusion, and detached-part inclusion
(the case an outer-ring-only cover prefilter would silently drop)."""

from hilbert_curve_spark import workload as W
from hilbert_curve_spark.operators.pip import pip_rings_join


def _inside_rings(rings, px, py):
    acc = False
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                dy = y2 - y1
                lhs, rhs = px * dy, x1 * dy + (py - y1) * (x2 - x1)
                if (lhs < rhs) if dy > 0 else (lhs > rhs):
                    acc = not acc
    return acc


def _geo(spark, sf_dir):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    return encode_documents(build_documents(spark, sf_dir, amp=4))


def test_pip_rings_brute_force(spark, sf_dir):
    geo = _geo(spark, sf_dir)
    docs = [(r.doc_id, r.x, r.y) for r in geo.select("doc_id", "x", "y").collect()]
    expect = {
        (p["poly_id"], d, x, y)
        for p in W.RING_POLYGONS
        for d, x, y in docs
        if _inside_rings(p["rings"], x, y)
    }
    got = {
        (r.poly_id, r.doc_id, r.x, r.y)
        for r in pip_rings_join(geo, W.RING_POLYGONS).collect()
    }
    assert got == expect
    assert expect


def test_pip_rings_hole_excludes_and_parts_include(spark, sf_dir):
    geo = _geo(spark, sf_dir)
    rows = pip_rings_join(geo, W.RING_POLYGONS).collect()
    donut = [(r.x, r.y) for r in rows if r.poly_id == "donut"]
    twin = [(r.x, r.y) for r in rows if r.poly_id == "twin"]
    hole = W.RING_POLYGONS[0]["rings"][1]
    hxs = [v[0] for v in hole]
    hys = [v[1] for v in hole]
    # nothing returned from strictly inside the hole
    assert not any(
        min(hxs) < x < max(hxs) and min(hys) < y < max(hys) for x, y in donut
    )
    assert donut  # but the annulus itself is populated (cluster-1 hot spot)
    # the detached triangle part contributes rows — the multi-polygon cover
    # union works (an outer-ring-only prefilter would return zero here)
    tri = W.RING_POLYGONS[1]["rings"][1]
    txs = [v[0] for v in tri]
    tys = [v[1] for v in tri]
    in_tri_bbox = [
        (x, y)
        for x, y in twin
        if min(txs) <= x <= max(txs) and min(tys) <= y <= max(tys)
    ]
    assert in_tri_bbox


def test_pip_rings_empty_input(spark, sf_dir):
    geo = _geo(spark, sf_dir)
    assert pip_rings_join(geo, []).count() == 0
