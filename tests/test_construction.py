"""S16 per-axis tree-cover baseline: dyadic decomposition properties and
result parity with the Hilbert range path (the reference's own comparison,
`Experiment/Comparison/FixRangeCompareToConstructionOne.java`)."""

import pytest

from hilbert_curve_spark import workload as W
from hilbert_curve_spark.config import DEFAULT
from hilbert_curve_spark.operators.construction import construction_grq, dyadic_cover
from hilbert_curve_spark.operators.range_query import grq_range_mode


@pytest.mark.parametrize(
    "lo,hi,order",
    [(0, 7, 3), (1, 6, 3), (3, 3, 3), (5, 12, 4), (0, 4095, 12), (900, 1226, 12)],
)
def test_dyadic_cover_exact_and_aligned(lo, hi, order):
    cov = dyadic_cover(lo, hi, order)
    # exact disjoint cover of [lo, hi]
    covered = []
    for a, b in cov:
        covered.extend(range(a, b + 1))
    assert covered == list(range(lo, hi + 1))
    # every interval is an aligned power-of-two block (a tree node)
    for a, b in cov:
        size = b - a + 1
        assert size & (size - 1) == 0
        assert a % size == 0
    # minimal-cover bound: <= 2*order nodes (binary-tree decomposition)
    assert len(cov) <= 2 * order


def test_dyadic_cover_rejects_out_of_domain():
    with pytest.raises(ValueError):
        dyadic_cover(0, 8, 3)


def test_construction_grq_equals_hilbert_grq(spark, sf_dir):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    via_tree = {
        r["doc_id"] for r in construction_grq(geo, **W.R1, config=DEFAULT).collect()
    }
    via_hilbert = {r["doc_id"] for r in grq_range_mode(geo, **W.R1).collect()}
    assert via_tree == via_hilbert


def test_update_counters_pinned():
    """ConstructionTwo client counters (ConstructionTwo.java:58-59 init to 1,
    :643-656 bump per axis-changing batch): batch 1 moves both axes, batch 2
    moves only x -> C=3, C'=2."""
    from hilbert_curve_spark.operators.construction import update_counters

    assert update_counters() == (3, 2)
    assert update_counters([(1, 5, 0)]) == (2, 1)
    assert update_counters([(1, 0, 0)]) == (1, 1)


def test_apply_moves_newest_wins(spark):
    from hilbert_curve_spark.operators.construction import apply_moves

    geo = spark.createDataFrame(
        [("a", 10, 20), ("b", 30, 40)], "doc_id string, x long, y long"
    )
    moves = spark.createDataFrame(
        [("a", 1, 100, 200), ("a", 2, 111, 222)],
        "doc_id string, version int, x long, y long",
    )
    got = {r.doc_id: (r.x, r.y) for r in apply_moves(geo, moves).collect()}
    assert got == {"a": (111, 222), "b": (30, 40)}


def test_construction2_equals_box_on_moved_corpus(spark, sf_dir):
    """ConstructionTwo's search result equals the plain box filter over the
    move-folded corpus (the tree plumbing changes the plan, never the set)."""
    from hilbert_curve_spark.operators.construction import (
        apply_moves,
        build_move_log,
        construction2_grq,
    )
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=4))
    via_tree = {
        r["doc_id"] for r in construction2_grq(geo, **W.R2, config=DEFAULT).collect()
    }
    moved = apply_moves(geo, build_move_log(geo, DEFAULT))
    box = moved.filter(
        (moved.x.between(W.R2["x_lo"], W.R2["x_hi"]))
        & (moved.y.between(W.R2["y_lo"], W.R2["y_hi"]))
    )
    assert via_tree == {r["doc_id"] for r in box.collect()}
    # the move workload actually moved docs INTO or OUT of the box relative
    # to the unmoved corpus (otherwise this test proves nothing)
    from hilbert_curve_spark.operators.construction import construction_grq

    unmoved = {
        r["doc_id"] for r in construction_grq(geo, **W.R2, config=DEFAULT).collect()
    }
    assert via_tree != unmoved
