"""Per-axis binary-tree range cover baseline (reference S16 —
``Scheme/Construction/ConstructionOne.java:330-384`` ``findMinimumCover``,
search driver ``:478-543``; compared against the Hilbert path by
``Experiment/Comparison/FixRangeCompareToConstructionOne.java``).

The reference builds a perfect binary tree over each axis domain and
answers a rectangle query as

    (union of x-subtree postings)  AND  (union of y-subtree postings)

where each union ranges over the *minimal node cover* of the axis interval.
The Spark isomorphism: the minimal node cover of ``[lo, hi]`` is the greedy
aligned-dyadic decomposition (every tree node spans an aligned power-of-two
block), each node is an OR'd ``BETWEEN`` on the axis column, and the bitmap
AND is a semi join between the two axis result sets.  Result sets equal the
plain box filter exactly (verified by the driver oracle), which is why
SURVEY §2.1 treats S16 as subsumed by the Hilbert path — this module
closes the §2 checklist with the reference's own plan shape.

Scale note: each axis predicate is a literal OR-of-BETWEEN (<= 2*order
terms) pushed to the scan; the AND is a semi join on doc_id.  On storage
sorted by one axis the x-side is pruned; the Hilbert path (S8) remains the
recommended plan because it prunes on BOTH axes at once — the reference's
experiments reach the same conclusion.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig


def dyadic_cover(lo: int, hi: int, order: int) -> list[tuple[int, int]]:
    """Minimal aligned power-of-two interval cover of ``[lo, hi]`` within
    ``[0, 2**order)`` — the node set ``findMinimumCover`` selects from the
    axis tree (greedy largest-aligned-block; <= 2*order intervals)."""
    if not (0 <= lo <= hi < (1 << order)):
        raise ValueError("interval out of axis domain")
    out: list[tuple[int, int]] = []
    while lo <= hi:
        size = (lo & -lo) if lo else (1 << order)
        while size > hi - lo + 1:
            size >>= 1
        out.append((lo, lo + size - 1))
        lo += size
    return out


def _axis_predicate(col: str, cover: list[tuple[int, int]]) -> F.Column:
    terms = [F.col(col).between(lo, hi) for lo, hi in cover]
    return functools.reduce(operator.or_, terms)


def construction_grq(
    doc_geo: DataFrame,
    x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    config: EngineConfig = DEFAULT,
) -> DataFrame:
    """Rectangle query via the per-axis tree-cover plan: OR-of-BETWEEN per
    axis (each interval one tree node), intersected with a semi join —
    the reference's bitmap-AND (``ConstructionOne.java:478-543``)."""
    xc = dyadic_cover(x_lo, x_hi, config.order)
    yc = dyadic_cover(y_lo, y_hi, config.order)
    xs = doc_geo.filter(_axis_predicate("x", xc))
    ys = doc_geo.filter(_axis_predicate("y", yc)).select("doc_id")
    return xs.join(ys, "doc_id", "semi").select("doc_id", "x", "y")
