"""Z-order (Morton) curve: encode/decode, exact box covers, and the Spark
column expression — the measured comparison baseline for the Hilbert index.

The reference is Hilbert-only (`hilbert/HilbertComponent/HilbertCurve.java`);
Z-order is the standard alternative space-filling curve (it is what Delta
Lake's OPTIMIZE ZORDER and most commercial engines use), so the engine
carries both and RECORDS the fragmentation difference: a box cover over
Z-order needs more index ranges than over Hilbert because the Z curve's
discontinuous jumps cut boxes into more runs (see
``tests/test_zorder.py::test_hilbert_beats_zorder_fragmentation`` and
BENCH/BASELINE.md).  Same over-approximate-then-refine query contract as
the Hilbert GRQ.

Unlike the Hilbert cover (perimeter walk — valid because a CONTINUOUS curve
must cross the box perimeter to enter or leave), the Z cover uses recursive
quadrant decomposition: a quad fully inside the box emits its aligned
z-interval, a disjoint quad is skipped, anything else recurses into its 4
children in z order.  Emitted ranges arrive in ascending z order, so a
single adjacent-merge pass yields the EXACT maximal-run cover.
"""

from __future__ import annotations

import numpy as np

from .cover import coalesce_ranges


def encode2d_z(x, y, order: int) -> np.ndarray:
    """Vectorized Morton interleave: bit i of x -> bit 2i, y -> 2i+1."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.zeros_like(x)
    for i in range(order):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def decode2d_z(z, order: int) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(z, dtype=np.int64)
    x = np.zeros_like(z)
    y = np.zeros_like(z)
    for i in range(order):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


def zcover_box(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, order: int, max_ranges: int = 0
) -> tuple[list[tuple[int, int]], bool]:
    """Exact (or budget-coalesced) Z-order range cover of an inclusive box.

    Returns ``(ranges, exact)`` — the same contract as the Hilbert
    ``cover_box`` (coalescing over-approximates, so a residual box filter
    is required when ``exact`` is False)."""
    if not (0 <= x_lo <= x_hi < (1 << order) and 0 <= y_lo <= y_hi < (1 << order)):
        raise ValueError("box out of lattice bounds")
    out: list[tuple[int, int]] = []

    def rec(qx: int, qy: int, size: int, zbase: int) -> None:
        if qx > x_hi or qx + size - 1 < x_lo or qy > y_hi or qy + size - 1 < y_lo:
            return
        if qx >= x_lo and qx + size - 1 <= x_hi and qy >= y_lo and qy + size - 1 <= y_hi:
            out.append((zbase, zbase + size * size - 1))
            return
        half = size // 2
        cell = half * half
        # z child order: bit0 = x half, bit1 = y half
        for c in range(4):
            rec(qx + (c & 1) * half, qy + ((c >> 1) & 1) * half, half, zbase + c * cell)

    rec(0, 0, 1 << order, 0)
    # adjacent-merge (out is in ascending z order by construction)
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    exact = True
    if max_ranges and len(merged) > max_ranges:
        merged = coalesce_ranges(merged, max_ranges)
        exact = False
    return merged, exact


def morton_expr_sql(x_col: str, y_col: str, order: int) -> str:
    """Spark SQL expression for the Morton code of two ``order``-bit columns
    (shiftleft/&/| stay in whole-stage codegen — no Python, no UDF).  The
    magic-mask spread handles up to 16 bits per axis."""
    if order > 16:
        raise ValueError("morton_expr_sql supports order <= 16")

    def spread(c: str) -> str:
        e = f"CAST({c} AS BIGINT)"
        e = f"((({e}) | shiftleft({e}, 8)) & 16711935)"        # 0x00FF00FF
        e = f"((({e}) | shiftleft({e}, 4)) & 252645135)"       # 0x0F0F0F0F
        e = f"((({e}) | shiftleft({e}, 2)) & 858993459)"       # 0x33333333
        e = f"((({e}) | shiftleft({e}, 1)) & 1431655765)"      # 0x55555555
        return e

    return f"({spread(x_col)} | shiftleft({spread(y_col)}, 1))"
