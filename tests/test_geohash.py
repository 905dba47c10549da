"""Geohash cells: construction properties, engine parity, prefix-cover
search correctness (`curve/geohash.py`, `operators/geohash.py`)."""

import duckdb
import numpy as np
import pytest

from hilbert_curve_spark.curve.geohash import (
    ALPHABET,
    cell_rect,
    code_to_str,
    cover_box_prefixes,
    encode_geohash,
    geohash_sql,
    gh_code,
)

ORDER = 12
EDGE = 1 << ORDER


def test_alphabet_is_geohash_base32():
    assert len(ALPHABET) == 32
    assert len(set(ALPHABET)) == 32
    for c in "ailo":  # the four letters geohash excludes
        assert c not in ALPHABET


def test_corner_codes():
    assert encode_geohash(0, 0, ORDER, 4) == "0000"
    assert encode_geohash(EDGE - 1, EDGE - 1, ORDER, 4) == "zzzz"
    # x leads the interleave: the top bit of the first char is x's MSB
    assert encode_geohash(EDGE // 2, 0, ORDER, 1) == ALPHABET[16]
    assert encode_geohash(0, EDGE // 2, ORDER, 1) == ALPHABET[8]


def test_prefix_truncation_is_containment():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, EDGE, 64)
    ys = rng.integers(0, EDGE, 64)
    for x, y in zip(xs.tolist(), ys.tolist()):
        g4 = encode_geohash(x, y, ORDER, 4)
        g2 = encode_geohash(x, y, ORDER, 2)
        assert g4.startswith(g2)
        for chars in (1, 2, 3, 4):
            code = int(gh_code(x, y, ORDER, chars)[()])
            x0, x1, y0, y1 = cell_rect(code, ORDER, chars)
            assert x0 <= x <= x1 and y0 <= y <= y1
            # odd char counts give 2:1 rectangles, even give squares
            if 5 * chars <= 2 * ORDER:
                ratio = (x1 - x0 + 1) / (y1 - y0 + 1)
                assert ratio == (0.5 if chars % 2 == 1 else 1.0)


def test_cover_complete_and_intersecting():
    box = (1000, 1045, 2000, 2037)
    for chars in (3, 4):
        prefixes = set(cover_box_prefixes(*box, ORDER, chars))
        # completeness: every in-box point's prefix is covered
        for x in range(box[0], box[1] + 1, 7):
            for y in range(box[2], box[3] + 1, 5):
                assert encode_geohash(x, y, ORDER, chars) in prefixes
        # tightness: every covered cell intersects the box
        for p in prefixes:
            code = 0
            for ch in p:
                code = code * 32 + ALPHABET.index(ch)
            x0, x1, y0, y1 = cell_rect(code, ORDER, chars)
            assert x0 <= box[1] and x1 >= box[0]
            assert y0 <= box[3] and y1 >= box[2]


def test_code_to_str_roundtrip():
    for code in (0, 1, 31, 32, 12345, (1 << 20) - 1):
        s = code_to_str(code, 4)
        back = 0
        for ch in s:
            back = back * 32 + ALPHABET.index(ch)
        assert back == code


def test_spark_duckdb_python_parity(spark):
    rng = np.random.default_rng(11)
    rows = [
        (int(x), int(y))
        for x, y in zip(rng.integers(0, EDGE, 200), rng.integers(0, EDGE, 200))
    ]
    expected = [encode_geohash(x, y, ORDER, 4) for x, y in rows]
    df = spark.createDataFrame(rows, "x INT, y INT")
    from pyspark.sql import functions as F

    got = [
        r.gh
        for r in df.select(
            F.expr(geohash_sql("x", "y", ORDER, 4, "DIV")).alias("gh")
        ).collect()
    ]
    assert got == expected
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(x INT, y INT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", rows)
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {geohash_sql('x', 'y', ORDER, 4, '//')} FROM pts"
        ).fetchall()
    ]
    assert duck == expected


def test_geohash_search_equals_box(spark):
    from pyspark.sql import functions as F

    from hilbert_curve_spark.operators.geohash import geohash_search

    rng = np.random.default_rng(3)
    rows = [
        (f"d{i}", int(x), int(y))
        for i, (x, y) in enumerate(
            zip(rng.integers(900, 1300, 500), rng.integers(700, 1200, 500))
        )
    ]
    df = spark.createDataFrame(rows, "doc_id STRING, x INT, y INT")
    box = dict(x_lo=950, x_hi=1120, y_lo=800, y_hi=1010)
    got = sorted(
        r.doc_id for r in geohash_search(df, **box, chars=4).collect()
    )
    want = sorted(
        r.doc_id
        for r in df.filter(
            F.col("x").between(box["x_lo"], box["x_hi"])
            & F.col("y").between(box["y_lo"], box["y_hi"])
        ).collect()
    )
    assert got == want and len(got) > 0


def test_search_plan_no_python(spark):
    from hilbert_curve_spark.operators.geohash import geohash_search

    df = spark.createDataFrame([("d0", 1, 2)], "doc_id STRING, x INT, y INT")
    plan = (
        geohash_search(df, 0, 100, 0, 100, chars=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chars_bounds():
    with pytest.raises(ValueError):
        gh_code(0, 0, ORDER, 0)
    with pytest.raises(ValueError):
        cover_box_prefixes(0, EDGE, 0, 10, ORDER, 4)  # x_hi out of bounds
