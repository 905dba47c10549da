"""Wave-53: least-cost peak-to-peak path extraction
(`operators/rollup.py::peak_paths`) — brute-force Dijkstra parity and path
invariants.  Oracle parity runs in ``test_entry_parity``."""

import heapq

import pytest

from hilbert_curve_spark.operators.rollup import peak_paths


def _geo(spark, pts):
    rows = [(f"d{i:04d}", x, y) for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows, "doc_id string, x long, y long")


def _blob(cx, cy, n, w=2):
    """n points in a (2w+1)^2 square around a cell center (shift-6 cells)."""
    out = []
    for i in range(n):
        out.append((cx * 64 + 10 + (i % (2 * w + 1)), cy * 64 + 10 + (i // (2 * w + 1))))
    return out


def _brute(pts, min_peak, budget):
    m = 64
    h = {}
    for x, y in pts:
        h[(x >> 6, y >> 6)] = h.get((x >> 6, y >> 6), 0) + 1
    w = {c: 1 + min(3, n // 8) for c, n in h.items()}
    peaks = [
        c
        for c, n in h.items()
        if n >= min_peak
        and not any(
            h.get((c[0] + dx, c[1] + dy), 0) > n
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
        )
    ]
    src = max(peaks, key=lambda c: (h[c], -(c[0] * m + c[1])))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, c = heapq.heappop(pq)
        if d > dist.get(c, 10**9):
            continue
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (c[0] + dx, c[1] + dy)
            if nb not in h:
                continue
            nd = d + w[nb]
            if nd <= budget and nd < dist.get(nb, 10**9):
                dist[nb] = nd
                heapq.heappush(pq, (nd, nb))
    paths = {}
    for t in peaks:
        if t == src or t not in dist:
            continue
        cur, seq = t, []
        while True:
            seq.append(cur)
            if dist[cur] == 0:
                break
            best = None
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nb = (cur[0] + dx, cur[1] + dy)
                if nb in dist and dist[nb] == dist[cur] - w[cur]:
                    k = nb[0] * m + nb[1]
                    if best is None or k < best[0]:
                        best = (k, nb)
            cur = best[1]
        paths[t[0] * m + t[1]] = (dist[t], [(c[0], c[1]) for c in seq])
    return paths


def test_peak_paths_match_brute_dijkstra(spark):
    pts = (
        _blob(5, 5, 40)       # source (densest peak)
        + _blob(5, 9, 20)     # reachable peak, corridor below
        + _blob(9, 5, 18)     # reachable peak
        + _blob(40, 40, 25)   # disconnected island: unreachable
    )
    # corridors of sparse cells connecting the blobs
    for gy in range(6, 9):
        pts.append((5 * 64 + 5, gy * 64 + 5))
    for gx in range(6, 9):
        pts.append((gx * 64 + 5, 5 * 64 + 5))
    got = {}
    for r in peak_paths(_geo(spark, pts), min_peak=15, budget=24).collect():
        got.setdefault(r["peak"], {})[r["step"]] = (r["gx"], r["gy"], r["cost"])
    expect = _brute(pts, 15, 24)
    assert set(got) == set(expect)
    for pk, steps in got.items():
        cost, seq = expect[pk]
        assert len(steps) == len(seq)
        for i, cell in enumerate(seq):
            assert steps[i][:2] == cell
            assert steps[i][2] == cost
    # the disconnected island peak must NOT appear
    assert 40 * 64 + 40 not in got


def test_peak_paths_structural_invariants(spark, sf_dir):
    from hilbert_curve_spark.config import DEFAULT
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir), DEFAULT)
    rows = peak_paths(geo, 14, 24).collect()
    assert rows
    by_peak = {}
    for r in rows:
        by_peak.setdefault(r["peak"], []).append(r)
    for pk, path in by_peak.items():
        path.sort(key=lambda r: r["step"])
        # contiguous steps, rook-adjacent cells, constant cost, starts at
        # the target peak cell
        assert [r["step"] for r in path] == list(range(len(path)))
        assert len({r["cost"] for r in path}) == 1
        assert path[0]["gx"] * 64 + path[0]["gy"] == pk
        for a, b in zip(path, path[1:]):
            assert abs(a["gx"] - b["gx"]) + abs(a["gy"] - b["gy"]) == 1
