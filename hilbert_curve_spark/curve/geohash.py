"""Geohash cells on the engine's integer lattice — the prefix-string DGG.

The reference indexes space with Hilbert prefixes only
(`Scheme/RSKQ/RSKQ_Biginteger.java` preCode trees); geohash is the
remaining classic cell family next to the repo's Hilbert / Z-order / S2 /
hex grids, and the one whose cell id is a *string prefix* — truncating a
geohash widens the cell, so prefix matching IS spatial containment.  That
makes it the natural key for prefix-organized storage (and the public
convention for "nearby" lookups in key-value stores).

Construction (public geohash spec, adapted to the lattice): interleave the
axes x-first (x plays longitude — the first emitted bit), cut the bitstream
into 5-bit groups, render each group with the geohash base32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``.  On an ``order``-bit lattice the
stream has ``2*order`` bits; a ``chars``-character geohash keeps the top
``5*chars`` (zero-padding below the stream for the final partial group,
exactly like real geohash cuts mid-axis).  A ``chars``-prefix cell is an
axis-aligned rectangle: ``ceil(5c/2)`` x-bits by ``floor(5c/2)`` y-bits,
so odd-length prefixes are 2:1 rectangles — the well-known geohash shape
alternation.

Everything is exact nonnegative-integer arithmetic (magic-mask spread via
multiply / ``&`` / ``|``, division by powers of two), identical in Spark
and DuckDB, so the cells query carries a bit-exact SQL oracle
(:func:`geohash_sql` renders the same expression for either engine).
"""

from __future__ import annotations

import numpy as np

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Insert a zero bit above every bit of a 16-bit value (numpy int64)."""
    e = v.astype(np.int64)
    e = (e | (e << 8)) & 0x00FF00FF
    e = (e | (e << 4)) & 0x0F0F0F0F
    e = (e | (e << 2)) & 0x33333333
    e = (e | (e << 1)) & 0x55555555
    return e


def gh_code(x, y, order: int, chars: int) -> np.ndarray:
    """Integer geohash code (top ``5*chars`` bits of the x-first interleave)
    for lattice points.  Vectorized."""
    if not (1 <= chars and 5 * chars <= 2 * order + 4):
        raise ValueError("chars out of range for this order")
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = (_spread_bits(x) << 1) | _spread_bits(y)  # x on odd (leading) bits
    shift = 2 * order - 5 * chars
    return z >> shift if shift >= 0 else z << (-shift)


def code_to_str(code: int, chars: int) -> str:
    """Render an integer geohash code as its base32 string."""
    return "".join(
        ALPHABET[(int(code) >> (5 * (chars - 1 - k))) & 31] for k in range(chars)
    )


def encode_geohash(x: int, y: int, order: int, chars: int) -> str:
    return code_to_str(int(gh_code(x, y, order, chars)[()]), chars)


def cell_rect(code: int, order: int, chars: int) -> tuple[int, int, int, int]:
    """Inclusive lattice rectangle (x_lo, x_hi, y_lo, y_hi) of a geohash
    cell.  bx = ceil(5c/2) leading x bits, by = floor(5c/2) y bits."""
    bx = (5 * chars + 1) // 2
    by = 5 * chars // 2
    xb = 0
    yb = 0
    nbits = 5 * chars
    for i in range(nbits):  # bit (nbits-1-i) of code; even i -> x
        b = (code >> (nbits - 1 - i)) & 1
        if i % 2 == 0:
            xb = (xb << 1) | b
        else:
            yb = (yb << 1) | b
    # the code's axis bits are the TOP bits of each axis (clip at order)
    bx_eff = min(bx, order)
    by_eff = min(by, order)
    xb >>= bx - bx_eff
    yb >>= by - by_eff
    w = 1 << (order - bx_eff)
    h = 1 << (order - by_eff)
    return xb * w, xb * w + w - 1, yb * h, yb * h + h - 1


def cover_box_prefixes(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, order: int, chars: int
) -> list[str]:
    """All ``chars``-character geohash prefixes whose cells intersect the
    inclusive box — the classic geohash neighborhood cover.  Cell grid is
    regular, so this enumerates ``O(box_area / cell_area)`` prefixes; choose
    ``chars`` so the list stays a bounded scan-filter literal."""
    if not (0 <= x_lo <= x_hi < (1 << order) and 0 <= y_lo <= y_hi < (1 << order)):
        raise ValueError("box out of lattice bounds")
    bx = min((5 * chars + 1) // 2, order)
    by = min(5 * chars // 2, order)
    w = 1 << (order - bx)
    h = 1 << (order - by)
    out = []
    for i in range(x_lo // w, x_hi // w + 1):
        for j in range(y_lo // h, y_hi // h + 1):
            code = int(gh_code(i * w, j * h, order, chars)[()])
            out.append(code_to_str(code, chars))
    return sorted(out)


def geohash_sql(x_sql: str, y_sql: str, order: int, chars: int, div: str) -> str:
    """Engine-neutral SQL for the ``chars``-character geohash string.

    ``div`` is the integer floor-division operator ('DIV' Spark, '//'
    DuckDB); shifts are rendered as multiply / floor-divide by powers of
    two and ``& | `` bitwise ops (supported identically by both engines on
    nonnegative BIGINTs), so the rendered string is bit-identical."""

    def spread(c: str) -> str:
        e = f"CAST({c} AS BIGINT)"
        e = f"((({e}) | (({e}) * 256)) & 16711935)"
        e = f"((({e}) | (({e}) * 16)) & 252645135)"
        e = f"((({e}) | (({e}) * 4)) & 858993459)"
        e = f"((({e}) | (({e}) * 2)) & 1431655765)"
        return e

    z = f"(({spread(x_sql)} * 2) | {spread(y_sql)})"
    shift = 2 * order - 5 * chars
    if shift >= 0:
        code = f"(({z}) {div} {1 << shift})"
    else:
        code = f"(({z}) * {1 << (-shift)})"
    parts = [
        f"substr('{ALPHABET}', CAST((({code}) {div} {1 << (5 * (chars - 1 - k))}) % 32 AS INT) + 1, 1)"
        for k in range(chars)
    ]
    return "concat(" + ", ".join(parts) + ")"
