"""BPC / preCode tests — goldens from executing the reference
(`bpc/BPCGenerator.java`, `Scheme/RSKQ/RSKQ_Biginteger.preCode`)."""

from pathlib import Path

import numpy as np
import pytest

from hilbert_curve_spark.curve.bpc import (
    bpc_cover,
    bpc_cover_of_ranges,
    pre_code,
    prefix_to_range,
)

GOLDEN = Path(__file__).parent / "golden" / "reference_golden.txt"


def _golden_bpc():
    cases = []
    for line in GOLDEN.read_text().splitlines():
        if not line.startswith("BPC "):
            continue
        parts = line.split()
        lo, hi, bits = int(parts[1]), int(parts[2]), int(parts[3])
        cases.append((lo, hi, bits, sorted(parts[4].split(","))))
    assert cases
    return cases


@pytest.mark.parametrize("lo,hi,bits,expected", _golden_bpc())
def test_bpc_matches_reference(lo, hi, bits, expected):
    assert bpc_cover(range(lo, hi + 1), bits) == expected
    assert bpc_cover_of_ranges([(lo, hi)], bits) == expected


def test_bpc_pinned():
    # BPCGenerator demo case: 28..35 over a 6-bit domain
    assert bpc_cover(range(28, 36), 6) == ["0111**", "1000**"]


def test_bpc_non_contiguous():
    # {5, 7} share no sibling pair -> two exact codes
    assert bpc_cover([5, 7], 4) == ["0101", "0111"]
    # {4,5,6,7} = subtree 01**
    assert bpc_cover([4, 5, 6, 7], 4) == ["01**"]


@pytest.mark.parametrize("seed", range(10))
def test_bpc_exactness_property(seed):
    """Union of prefix expansions == input set (exact, minimal dyadic)."""
    rng = np.random.default_rng(seed)
    bits = 8
    vals = np.unique(rng.integers(0, 1 << bits, rng.integers(1, 60)))
    cover = bpc_cover(vals, bits)
    expanded = set()
    for p in cover:
        lo, hi = prefix_to_range(p)
        expanded.update(range(lo, hi + 1))
    assert expanded == set(vals.tolist())
    # minimality: no two siblings in output
    stems = {p.rstrip("*") for p in cover}
    for s in stems:
        if s:
            sib = s[:-1] + ("1" if s[-1] == "0" else "0")
            pad = "*" * (bits - len(s))
            assert not (sib + pad in cover and s + pad in cover) or s == ""


def test_pre_code_structure():
    # RSKQ preCode: full binary then progressively starred from the end
    codes = pre_code(39, 6)
    assert codes == ["100111", "10011*", "1001**", "100***", "10****", "1*****", "******"]
    assert len(codes) == 7  # 2*order+1 at order 3


def test_pre_code_membership():
    """Every BPC prefix of a set containing v appears in v's preCode list."""
    bits = 8
    v = 173
    codes = set(pre_code(v, bits))
    for lo, hi, span in [(160, 175, None), (173, 173, None), (0, 255, None)]:
        for p in bpc_cover_of_ranges([(lo, hi)], bits):
            plo, phi = prefix_to_range(p)
            if plo <= v <= phi:
                assert p in codes


def test_prefix_to_range():
    assert prefix_to_range("0111**") == (28, 31)
    assert prefix_to_range("******") == (0, 63)
    assert prefix_to_range("100111") == (39, 39)
