"""Arbitrary-precision n-D Hilbert transforms (reference parity for
``HilbertCurve.java:79-109``, which accepts any ``bits x dimensions`` into
``BigInteger``; the vectorized int64 kernel in :mod:`.hilbert` covers
``order * dims <= 63``, this module covers everything beyond).

Same Skilling algorithm as the vectorized kernel, evaluated on Python ints
(arbitrary precision).  Per-element Python is unavoidable here — numpy has
no >64-bit integer dtype, and the reference's own wide path is a scalar
``BigInteger`` loop — so the engine keeps this as the *compatibility*
surface: the Arrow-batched UDF emits the index as a fixed-width big-endian
hex string, whose lexicographic order equals numeric order (so sorting,
range predicates, and prefix covers all keep working on the string column
at any width).  The hot 100 TB path stays on the int64 kernel.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

__all__ = [
    "encode_point_wide",
    "decode_index_wide",
    "index_to_hex",
    "hex_to_index",
    "hilbert_wide_udf",
    "hilbert_wide_decode_udf",
]


def _axes_to_transpose_scalar(x: list[int], order: int) -> list[int]:
    """Skilling AxestoTranspose on Python ints (one point)."""
    n = len(x)
    x = list(x)
    m = 1 << (order - 1)
    q = m
    while q > 1:
        p = q - 1
        for i in range(n):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = 0
    q = m
    while q > 1:
        if x[n - 1] & q:
            t ^= q - 1
        q >>= 1
    return [v ^ t for v in x]


def _transpose_to_axes_scalar(x: list[int], order: int) -> list[int]:
    """Skilling TransposeToAxes on Python ints (one point)."""
    n = len(x)
    x = list(x)
    t = x[n - 1] >> 1
    for i in range(n - 1, 0, -1):
        x[i] ^= x[i - 1]
    x[0] ^= t
    q = 2
    big = 2 << (order - 1)
    while q != big:
        p = q - 1
        for i in range(n - 1, -1, -1):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q <<= 1
    return x


def encode_point_wide(coords: Iterable[int], order: int) -> int:
    """One n-D point -> arbitrary-width Hilbert index (Python int).

    Bit layout matches the vectorized kernel / reference ``toIndex``:
    dimension 0 contributes the more-significant bit within each group,
    groups run MSB-first."""
    x = [int(c) for c in coords]
    n = len(x)
    for c in x:
        if not 0 <= c < (1 << order):
            raise ValueError("coordinate out of lattice bounds")
    t = _axes_to_transpose_scalar(x, order)
    out = 0
    for b in range(order):  # MSB-first bit groups
        src = order - 1 - b
        for j in range(n):
            dst = (order - 1 - b) * n + (n - 1 - j)
            out |= ((t[j] >> src) & 1) << dst
    return out


def decode_index_wide(h: int, order: int, dims: int) -> list[int]:
    """Arbitrary-width Hilbert index -> n-D point (list of Python ints)."""
    x = [0] * dims
    for b in range(order):
        src_bit = order - 1 - b
        for j in range(dims):
            src = (order - 1 - b) * dims + (dims - 1 - j)
            x[j] |= ((h >> src) & 1) << src_bit
    return _transpose_to_axes_scalar(x, order)


def index_to_hex(h: int, order: int, dims: int) -> str:
    """Fixed-width big-endian hex encoding: lexicographic == numeric order."""
    width = (order * dims + 3) // 4
    return format(h, f"0{width}x")


def hex_to_index(s: str) -> int:
    return int(s, 16)


def hilbert_wide_udf(order: int, dims: int):
    """Arrow-batched UDF: ``array<long>`` coords column -> hex index string.

    The loop is per element over the batch (the unavoidable bigint path),
    but still Arrow-transferred and batch-amortized — no row-at-a-time
    Python UDF serialization."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _enc(coords: pd.Series) -> pd.Series:
        return pd.Series(
            [index_to_hex(encode_point_wide(c, order), order, dims) for c in coords]
        )

    return _enc


def hilbert_wide_decode_udf(order: int, dims: int):
    """Inverse UDF: hex index string -> ``array<long>``-compatible list
    (coordinates each fit in int64 whenever ``order <= 63``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def _dec(hexes: pd.Series) -> pd.Series:
        return pd.Series(
            [decode_index_wide(hex_to_index(s), order, dims) for s in hexes]
        )

    return _dec
