"""Best Prefix Cover (BPC) and per-point prefix generation.

Semantics match the reference (`bpc/BPCGenerator.java:16-125` sibling-merge
algorithm; `Scheme/RSKQ/RSKQ_Biginteger.java:139-163` ``preCode``), verified
against golden outputs from executing the reference (``tests/test_bpc.py``).

A *prefix* is a string over ``{0,1}`` of length ``bits`` with a suffix of
``*`` wildcards: ``"0111**"`` covers Hilbert indices 28..31 of a 6-bit
domain.  A point at order *o* (2-D => ``bits = 2*o``) has ``bits + 1``
prefixes — itself plus every proper prefix up to the all-``*`` root
(RSKQ_Biginteger.java:139-163).  The BPC of a value set is the minimal prefix
set covering exactly that set, built by repeatedly replacing complete sibling
pairs with their parent (BPCGenerator.java:16-44).

These run driver-side at query-compile time (the cover of a query rectangle
is small); the per-document prefix explosion for index build is pure native
Spark SQL (see operators/updates.py), not this module.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pre_code", "bpc_cover", "bpc_cover_of_ranges", "prefix_to_range"]


def _render(value: int, level: int, bits: int) -> str:
    """Binary string of ``value`` over ``bits - level`` digits plus ``level``
    trailing stars; the all-star root renders with an empty binary part
    (reference convertMapToPrefixString emits "" for BigInteger.ZERO at the
    root)."""
    width = bits - level
    stem = format(value, "b").zfill(width) if width > 0 else ""
    return stem + "*" * level


def pre_code(hilbert: int, bits: int) -> list[str]:
    """All ``bits + 1`` wildcard prefixes of one Hilbert index, most-specific
    first: ``["0110", "011*", "01**", "0***", "****"]`` (bits=4).
    Matches RSKQ ``preCode`` ordering exactly."""
    b = format(hilbert, "b").zfill(bits)
    if len(b) > bits:
        raise ValueError(f"hilbert {hilbert} does not fit in {bits} bits")
    out = [b]
    for i in range(bits - 1, -1, -1):
        out.append(b[:i] + "*" * (bits - i))
    return out


def bpc_cover(values: "list[int] | np.ndarray", bits: int) -> list[str]:
    """Minimal prefix cover of a value set (sorted output).

    Vectorized bottom-up sibling merge: at each level, values whose sibling
    (``v ^ 1``) is also present are replaced by their parent (``v >> 1``);
    lone values are emitted with ``level`` trailing ``*``.
    Equivalent to BPCGenerator.GetBPCValueMap + convertMapToPrefixString
    (which merges any parent with >1 distinct children — in a binary domain
    that is exactly the sibling-pair rule).
    """
    vals = np.unique(np.asarray(list(values), dtype=np.int64))
    if vals.size == 0:
        return []
    out: list[str] = []
    level = 0
    while vals.size > 1 and level < bits:
        parents, counts = np.unique(vals >> 1, return_counts=True)
        lone_parents = parents[counts == 1]
        # emit the lone children at this level
        lone_mask = np.isin(vals >> 1, lone_parents)
        for v in vals[lone_mask]:
            out.append(_render(int(v), level, bits))
        vals = parents[counts > 1]
        level += 1
    for v in vals:
        out.append(_render(int(v), level, bits))
    return sorted(out)


def bpc_cover_of_ranges(ranges: list[tuple[int, int]], bits: int) -> list[str]:
    """BPC over the union of inclusive integer ranges (the RSKQ ``preCover``
    entry shape, RSKQ_Biginteger.java:165-188).

    Interval-aware O(output) merge — never materializes the value set, so a
    full-domain range compiles instantly even at bits=34."""
    out: list[str] = []
    for lo, hi in ranges:
        _cover_interval(int(lo), int(hi), bits, out)
    return sorted(out)


def _cover_interval(lo: int, hi: int, bits: int, out: list[str]) -> None:
    """Greedy aligned-block decomposition of [lo, hi] — the classic minimal
    dyadic cover, identical to sibling-merging the dense value set."""
    while lo <= hi:
        # largest aligned block starting at lo that fits in [lo, hi]
        size = lo & -lo if lo else 1 << bits
        while size > hi - lo + 1:
            size >>= 1
        level = size.bit_length() - 1
        out.append(_render(lo >> level, level, bits))
        lo += size


def prefix_to_range(prefix: str) -> tuple[int, int]:
    """Inverse mapping: ``"0111**"`` -> (28, 31)."""
    stars = len(prefix) - len(prefix.rstrip("*"))
    base = int(prefix[: len(prefix) - stars] or "0", 2) << stars
    return base, base + (1 << stars) - 1
