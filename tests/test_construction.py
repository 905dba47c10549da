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
