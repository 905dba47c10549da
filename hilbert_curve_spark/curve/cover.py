"""Hilbert range-cover planning (driver-side query compilation).

Given an axis-aligned box on the ``[0, 2**order)**2`` lattice, produce a list
of disjoint, ascending ``(lo, hi)`` Hilbert-index intervals that exactly cover
the box's cells — the reference's "Perimeter Algorithm"
(`hilbert/HilbertComponent/SmallHilbertCurve.java:130-231`,
`Box.java:43-104`) — optionally coalesced down to a range budget
(`Ranges.java:42-151`).

Exact-cover semantics are verified bit-for-bit against range lists produced by
executing the reference Java kernel (see ``tests/test_cover.py``).

Budget coalescing note: the reference's buffered merge uses a ``TreeSet`` with
an *inconsistent* comparator (`Node.java:34-50` returns ``-1`` whenever
``next == null`` regardless of gap), so its exact merge order is
JVM-tree-structure-dependent.  We instead use the deterministic global
min-gap merge (repeatedly join the pair of adjacent ranges with the smallest
gap, ties broken by lower bound) — the same objective the reference's buffer
approximates.  Coalesced covers over-approximate the box, so every consumer
re-applies the exact box predicate as a residual filter
(`SmallHilbertCurve.java:156-162` documents the same contract); query result
sets are therefore identical either way.

Scale note: the perimeter walk is O(perimeter) not O(area); for an order-16
full-grid box that is 2**18 cells instead of 2**32.  All cell generation and
encoding below is vectorized numpy; the only Python-level loop is over the
*ranges* (bounded by ``max_ranges`` or the number of curve entry/exit points).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from .hilbert import decode2d, encode2d

__all__ = [
    "Cover", "cover_box", "coalesce_ranges", "dense_cover",
    "ranges_to_sql_predicate", "cell_shift_for_budget", "expand_ranges_to_cells",
]


@dataclass(frozen=True)
class Cover:
    """A compiled range cover: disjoint ascending (lo, hi) intervals plus the
    residual box predicate that must be re-applied after the range join."""

    ranges: list[tuple[int, int]]
    x_lo: int
    x_hi: int
    y_lo: int
    y_hi: int
    order: int
    exact: bool  # True => ranges cover exactly the box cells (no residual needed)


def _perimeter_cells(x_lo: int, x_hi: int, y_lo: int, y_hi: int) -> tuple[np.ndarray, np.ndarray]:
    """All lattice cells on the box perimeter (vectorized, deduplicated)."""
    xs = np.arange(x_lo, x_hi + 1, dtype=np.int64)
    ys = np.arange(y_lo, y_hi + 1, dtype=np.int64)
    px = [xs, xs]
    py = [np.full_like(xs, y_lo), np.full_like(xs, y_hi)]
    if y_hi - y_lo > 1:
        inner = ys[1:-1]
        px += [np.full_like(inner, x_lo), np.full_like(inner, x_hi)]
        py += [inner, inner]
    # duplicates (degenerate boxes) are removed by np.unique on the encoded
    # indices in cover_box
    return np.concatenate(px), np.concatenate(py)


def cover_box(
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    order: int,
    max_ranges: int = 0,
) -> Cover:
    """Exact Hilbert range cover of an inclusive box via the perimeter walk.

    ``max_ranges == 0`` returns the exact cover; otherwise the exact cover is
    coalesced down to at most ``max_ranges`` intervals (over-approximation —
    residual filter required, and ``Cover.exact`` is False).
    """
    if not (0 <= x_lo <= x_hi < (1 << order) and 0 <= y_lo <= y_hi < (1 << order)):
        raise ValueError("box out of lattice bounds")
    cx, cy = _perimeter_cells(x_lo, x_hi, y_lo, y_hi)
    h = np.unique(encode2d(cx, cy, order))
    # Walk sorted perimeter indices; a gap after h[i] ends the current range
    # only if the next curve position (h[i]+1) lies *outside* the box —
    # otherwise the curve dove into the interior and must re-exit through the
    # perimeter, so the range continues (reference SmallHilbertCurve.java:195-221).
    diffs = np.diff(h)
    gap_pos = np.nonzero(diffs > 1)[0]  # index i where h[i+1] > h[i]+1
    if gap_pos.size:
        nx, ny = decode2d(h[gap_pos] + 1, order)
        inside = (nx >= x_lo) & (nx <= x_hi) & (ny >= y_lo) & (ny <= y_hi)
        breaks = gap_pos[~inside]
    else:
        breaks = gap_pos
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [h.size - 1]))
    ranges = [(int(h[s]), int(h[e])) for s, e in zip(starts, ends)]
    exact = True
    if max_ranges and len(ranges) > max_ranges:
        ranges = coalesce_ranges(ranges, max_ranges)
        exact = False
    return Cover(ranges, x_lo, x_hi, y_lo, y_hi, order, exact)


def coalesce_ranges(ranges: list[tuple[int, int]], max_ranges: int) -> list[tuple[int, int]]:
    """Deterministic min-gap coalescing: repeatedly join the adjacent pair with
    the smallest gap (ties: lowest bound) until ``len(ranges) <= max_ranges``.

    Keeps the ``max_ranges - 1`` largest gaps — equivalent to selecting split
    points by descending gap size, which we do directly in O(n log n).
    """
    if max_ranges <= 0 or len(ranges) <= max_ranges:
        return list(ranges)
    gaps = [(ranges[i + 1][0] - ranges[i][1], i) for i in range(len(ranges) - 1)]
    keep = heapq.nlargest(max_ranges - 1, gaps, key=lambda g: (g[0], -g[1]))
    split_after = sorted(i for _, i in keep)
    out = []
    lo = ranges[0][0]
    for i in split_after:
        out.append((lo, ranges[i][1]))
        lo = ranges[i + 1][0]
    out.append((lo, ranges[-1][1]))
    return out


def merge_overlapping(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Union possibly-overlapping intervals into disjoint ascending ones
    (inputs from multiple independent covers, e.g. several polygons)."""
    out: list[tuple[int, int]] = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def dense_cover(x_lo: int, x_hi: int, y_lo: int, y_hi: int, order: int) -> Cover:
    """Exact cover by dense enumeration (encode every cell, sort, merge
    consecutive) — the reference's
    `HilbertApp/HilbertRangeSearchApp.calculateHilbertRanges:46-84`.  O(area);
    used for tests/tiny boxes and as an independent check of ``cover_box``.
    """
    xs = np.arange(x_lo, x_hi + 1, dtype=np.int64)
    ys = np.arange(y_lo, y_hi + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    h = np.sort(encode2d(gx.ravel(), gy.ravel(), order))
    breaks = np.nonzero(np.diff(h) > 1)[0]
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [h.size - 1]))
    return Cover(
        [(int(h[s]), int(h[e])) for s, e in zip(starts, ends)],
        x_lo, x_hi, y_lo, y_hi, order, exact=True,
    )


def ranges_to_sql_predicate(ranges: list[tuple[int, int]], col: str = "hilbert") -> str:
    """Render a cover as an OR-of-BETWEEN SQL predicate (pushdown-friendly)."""
    return " OR ".join(f"({col} BETWEEN {lo} AND {hi})" for lo, hi in ranges)


def cell_shift_for_budget(ranges: list[tuple[int, int]], budget: int = 4096) -> int:
    """Smallest shift ``s`` such that expanding every range to its aligned
    ``hilbert >> s`` cells yields at most ``budget`` cells in total.

    This turns an interval table into an equi-join key: a range join
    ``hilbert BETWEEN lo AND hi`` against N broadcast ranges is a
    nested-loop (every probe row × every range); joining instead on
    ``hilbert >> s == cell`` with the BETWEEN kept as a residual is a
    broadcast *hash* join — O(1) per probe row regardless of N.  The budget
    bounds the broadcast table size; the shift only coarsens the hash key,
    never the result (the residual stays exact).

    The sum is bounded below by ``len(ranges)`` (each range contributes at
    least one cell at any shift), so when more ranges than budget exist no
    shift can satisfy it — the loop caps at shift **63** (every nonnegative
    hilbert collapses to cell 0; the join degrades to the nested-loop
    residual check but stays correct) instead of spinning forever.

    The cap must be 63, not 64: Spark's ``shiftright`` is Java ``>>`` which
    masks the shift amount mod 64, so ``shiftright(hilbert, 64)`` is a
    NO-OP while Python ``h >> 64`` is 0 — at shift 64 the Spark-side cell
    keys would never match the Python-expanded cell 0 and the hash join
    would silently drop every row.  At 63 both engines agree (cell 0 for
    all nonnegative values)."""
    s = 0
    while s < 63 and sum((hi >> s) - (lo >> s) + 1 for lo, hi in ranges) > budget:
        s += 1
    return s


def expand_ranges_to_cells(
    ranges: list[tuple[int, int]], shift: int
) -> list[tuple[int, int, int]]:
    """Each (lo, hi) -> one (cell, lo, hi) row per aligned cell it touches."""
    return [
        (cell, lo, hi)
        for lo, hi in ranges
        for cell in range(lo >> shift, (hi >> shift) + 1)
    ]
