"""Quadrant-orientation classifier for curve positions (reference S14
companion, `hilbert/HilbertApp/HilbertCurveType.findHilbertType:14-47`):
walks the base-4 digits of a curve position bottom-up through the state
machine of sub-square orientations.  Used for tile-rendering decisions
(which way the curve enters/leaves a tile).

Semantics verified against executing the reference (ORIENT golden lines)."""

from __future__ import annotations

STANDARD = "STANDARD"
ROTATED = "ROTATED"
FLIPPED_VERTICAL = "FLIPPED_VERTICAL"
ROTATED_FLIPPED = "ROTATED_FLIPPED"

_TRANSITIONS = {
    STANDARD: {(0, 1): FLIPPED_VERTICAL, (1, 0): ROTATED_FLIPPED, (1, 1): ROTATED},
    ROTATED: {(0, 0): STANDARD, (0, 1): FLIPPED_VERTICAL},
    FLIPPED_VERTICAL: {(0, 0): STANDARD, (1, 0): ROTATED_FLIPPED},
    ROTATED_FLIPPED: {(1, 1): ROTATED},
}


def hilbert_orientation(order: int, n: int, standard_start: bool = True) -> str:
    """Orientation class of curve position ``n`` at ``order`` (the reference
    iterates one state step per level, consuming base-4 digits of n from the
    least-significant end)."""
    state = STANDARD if standard_start else ROTATED
    size = 1 << order
    s = size // 2
    while s > 0:
        rx = (n // 2) % 2
        ry = n % 2
        state = _TRANSITIONS[state].get((rx, ry), state)
        n //= 4
        s //= 2
    return state
