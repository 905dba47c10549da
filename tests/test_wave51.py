"""Wave-51: bitmap keyword index (`operators/brq.py::keyword_bitmap_query`),
hierarchical cell compaction (`operators/tiles.py::compact_cells`), and the
LBP texture census (`operators/rollup.py::lbp_census`) — semantic
invariants and brute-force parity.  Oracle parity runs in
``test_entry_parity``."""

import pytest
from pyspark.sql import functions as F

from hilbert_curve_spark.operators.brq import keyword_bitmap_query
from hilbert_curve_spark.operators.rollup import lbp_census
from hilbert_curve_spark.operators.tiles import compact_cells


def _geo_kw(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, x long, y long, keywords array<string>"
    )


def test_bitmap_counts_equal_direct_conjunction(spark, sf_dir):
    from hilbert_curve_spark.config import DEFAULT
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4), DEFAULT)
    out = keyword_bitmap_query(geo, ["k8", "k9"])
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    direct = geo.filter(
        F.array_contains("keywords", "k8") & F.array_contains("keywords", "k9")
    ).count()
    assert total == direct and total > 0
    assert out.filter("n_docs <= 0 OR n_docs > 32").count() == 0


def test_bitmap_duplicate_keywords_count_once(spark):
    rows = [
        ("doc0000000032", 0, 0, ["a", "a", "b", "b"]),  # ordinal 32 -> block 1
        ("doc0000000033", 0, 0, ["a", "c", "c", "c"]),
        ("doc0000000096", 0, 0, ["a", "b", "x", "y"]),  # block 3
    ]
    out = {
        r["block"]: r["n_docs"]
        for r in keyword_bitmap_query(_geo_kw(spark, rows), ["a", "b"]).collect()
    }
    assert out == {1: 1, 3: 1}


def test_compact_cells_partition_the_dense_set(spark):
    """Expanding every compacted cell back to level-0 descendants must
    reproduce the dense set exactly, with no overlaps."""
    pts = []
    # a full 4x4 block (compacts to one level-2 cell), a 2x2 block (level
    # 1), and two stray cells
    for gx in range(4):
        for gy in range(4):
            pts.append((gx * 64 + 1, gy * 64 + 1))
    for gx in (8, 9):
        for gy in (8, 9):
            pts.append((gx * 64 + 1, gy * 64 + 1))
    pts += [(20 * 64 + 1, 3 * 64 + 1), (40 * 64 + 1, 40 * 64 + 1)]
    geo = spark.createDataFrame(
        [(f"d{i:04d}", x, y) for i, (x, y) in enumerate(pts)],
        "doc_id string, x long, y long",
    )
    rows = compact_cells(geo, 1, 6).collect()
    expanded = []
    for r in rows:
        w = 1 << r["level"]
        for dx in range(w):
            for dy in range(w):
                expanded.append((r["cx"] * w + dx, r["cy"] * w + dy))
    dense = {(x >> 6, y >> 6) for x, y in pts}
    assert len(expanded) == len(set(expanded)) == len(dense)
    assert set(expanded) == dense
    by_level = {}
    for r in rows:
        by_level[r["level"]] = by_level.get(r["level"], 0) + 1
    assert by_level == {2: 1, 1: 1, 0: 2}


def test_compact_cells_roundtrip_on_fixture(spark, sf_dir):
    from hilbert_curve_spark.config import DEFAULT
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4), DEFAULT)
    dense = {
        (r["gx"], r["gy"])
        for r in geo.select(
            F.shiftright("x", 6).alias("gx"), F.shiftright("y", 6).alias("gy")
        )
        .distinct()
        .collect()
    }
    rows = compact_cells(geo, 1, 6).collect()
    expanded = set()
    n = 0
    for r in rows:
        w = 1 << r["level"]
        for dx in range(w):
            for dy in range(w):
                expanded.add((r["cx"] * w + dx, r["cy"] * w + dy))
                n += 1
    assert expanded == dense and n == len(dense)
    assert any(r["level"] > 0 for r in rows)  # compaction actually bites


def test_lbp_census_matches_brute_force(spark):
    pts = [(100 + 64 * (i % 5), 100 + 64 * (i // 5)) for i in range(23)]
    pts += [(3000, 3000), (3000, 3064)]
    geo = spark.createDataFrame(
        [(f"d{i:04d}", x, y) for i, (x, y) in enumerate(pts)],
        "doc_id string, x long, y long",
    )
    got = {r["code"]: r["n_cells"] for r in lbp_census(geo, 1, 6).collect()}
    occ = {(x >> 6, y >> 6) for x, y in pts}
    offsets = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
    expect = {}
    for gx, gy in occ:
        code = sum(
            1 << i
            for i, (dx, dy) in enumerate(offsets)
            if (gx + dx, gy + dy) in occ
        )
        expect[code] = expect.get(code, 0) + 1
    assert got == expect
    assert sum(got.values()) == len(occ)


def test_lbp_isolated_cell_is_code_zero(spark):
    geo = spark.createDataFrame(
        [("d0", 1000, 1000)], "doc_id string, x long, y long"
    )
    rows = lbp_census(geo, 1, 6).collect()
    assert len(rows) == 1 and rows[0]["code"] == 0 and rows[0]["n_cells"] == 1
