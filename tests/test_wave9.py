"""Wave-9 operators: keyword co-occurrence pairs, per-cell dominant
keyword, and the regional embedding profile — brute-force parity against
plain Python plus the no-per-row-Python plan ban."""

import itertools
import math

from pyspark.sql import functions as F

from hilbert_curve_spark.operators.brq import cell_top_keyword, keyword_cooccurrence
from hilbert_curve_spark.operators.similarity import cell_embedding_profile


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _geo(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, x long, y long, keywords array<string>"
    )


GEO_ROWS = [
    ("doc0000000000", 5, 7, ["ka", "kb", "kc", "ka"]),   # duplicate slot
    ("doc0000000001", 6, 7, ["kb", "ka", "kd", "kc"]),
    ("doc0000000002", 100, 200, ["ka", "kb", "ka", "kb"]),
    ("doc0000000003", 101, 201, ["kz", "kz", "kz", "kz"]),  # no pairs
    ("doc0000000004", 4000, 4000, ["ka", "kc", "kd", "kb"]),
]


def test_keyword_cooccurrence_brute_force(spark):
    expect_counts = {}
    for _, _, _, kws in GEO_ROWS:
        for a, b in itertools.combinations(sorted(set(kws)), 2):
            expect_counts[(a, b)] = expect_counts.get((a, b), 0) + 1
    ranked = sorted(expect_counts.items(), key=lambda t: (-t[1], t[0]))
    expect = {
        (r, a, b, n) for r, ((a, b), n) in enumerate(ranked[:4], start=1)
    }
    got = {
        (r.rank, r.kw_a, r.kw_b, r.n_docs)
        for r in keyword_cooccurrence(_geo(spark, GEO_ROWS), 4).collect()
    }
    assert got == expect


def test_cell_top_keyword_brute_force(spark):
    shift, grid = 6, 4096 >> 6
    counts = {}
    for _, x, y, kws in GEO_ROWS:
        cell = (x >> shift) * grid + (y >> shift)
        for kw in kws:  # slot multiplicity counted
            counts[(cell, kw)] = counts.get((cell, kw), 0) + 1
    expect = set()
    for cell in {c for c, _ in counts}:
        items = sorted(
            ((n, kw) for (c, kw), n in counts.items() if c == cell),
            key=lambda t: (-t[0], t[1]),
        )
        total = sum(n for n, _ in items)
        n, kw = items[0]
        expect.add((cell, kw, n, total, n * 1_000_000 // total))
    got = {
        (r.gcell, r.top_kw, r.kw_count, r.cell_total, r.share_ppm)
        for r in cell_top_keyword(_geo(spark, GEO_ROWS), shift).collect()
    }
    assert got == expect


def test_keyword_cooccurrence_plan_no_python(spark):
    plan = _plan(keyword_cooccurrence(_geo(spark, GEO_ROWS), 4))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cell_embedding_profile_brute_force(spark):
    vecs = {
        0: [0.5, -0.25, 0.126],
        1: [1.0, 0.0, -0.7501],
        2: [-0.3, 0.33, 0.999],
    }
    emb = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    geo = _geo(spark, GEO_ROWS)
    shift, scale, grid = 8, 4096, 4096 >> 8
    expect = {}
    for doc_id, x, y, _ in GEO_ROWS:
        cell = (x >> shift) * grid + (y >> shift)
        vec = vecs[int(doc_id[3:]) % 3]
        for dim, v in enumerate(vec):
            # float32 -> double widening then *2^12 is exact
            import struct

            v32 = struct.unpack("f", struct.pack("f", v))[0]
            q = math.floor(v32 * scale)
            n, s = expect.get((cell, dim), (0, 0))
            expect[(cell, dim)] = (n + 1, s + q)
    want = {(c, d, n, s) for (c, d), (n, s) in expect.items()}
    got = {
        (r.gcell, r.dim, r.n_docs, r.qsum)
        for r in cell_embedding_profile(geo, emb, shift, scale).collect()
    }
    assert got == want


def test_cell_embedding_profile_plan_no_python(spark):
    emb = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id long, embedding array<float>"
    )
    plan = _plan(cell_embedding_profile(_geo(spark, GEO_ROWS), emb, 8, 4096))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
