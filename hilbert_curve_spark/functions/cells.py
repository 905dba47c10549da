"""Discrete-global-grid cell encoding (H3 / S2 / lattice cells).

The north_star calls for geo spans "encoded to H3/S2 cells and Hilbert
indices".  On the engine's integer lattice the canonical cell id is the
Hilbert-prefix cell (``hilbert >> 2*shift`` — an aligned curve subsquare,
exactly the reference's prefix-tree node, and the bucketing key for
cell-bucketed joins).

S2 cell ids are REAL: ``curve/s2.py`` implements the public S2 scheme
(cube-face projection + quadratic ST + orientation-aware Hilbert curve)
as vectorized numpy, exposed here as Arrow-batched pandas UDFs and
oracle-checked bit-for-bit against a DuckDB rendering of the same kernel
(``curve/s2_sql.py``).  H3 remains import-gated (hexagonal icosahedral
projection; the ``h3`` package is absent in this container and the lattice
and S2 cells cover the engine's bucketing needs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from hilbert_curve_spark.curve import s2 as _s2k

try:  # pragma: no cover - not installed in this container
    import h3 as _h3
except ImportError:
    _h3 = None


def lattice_cell(hilbert: Column, order: int, cell_order: int) -> Column:
    """Aligned Hilbert subsquare id at resolution ``cell_order``
    (cell side = 2**(order - cell_order) lattice units).  Native shift —
    codegen, and monotone in the curve so cell ranges stay scan-prunable."""
    return F.shiftright(hilbert, 2 * (order - cell_order))


def h3_cell_udf(resolution: int = 9):
    """(lat, lon) -> H3 cell (string).  Requires the ``h3`` package."""
    if _h3 is None:
        raise NotImplementedError(
            "h3 is not installed in this environment; lattice_cell covers the "
            "engine's bucketing needs — install `h3` to emit real H3 ids"
        )
    import pandas as pd

    @F.pandas_udf("string")
    def _enc(lat: "pd.Series", lon: "pd.Series") -> "pd.Series":
        return pd.Series(
            [_h3.latlng_to_cell(a, b, resolution) for a, b in zip(lat, lon)]
        )

    return _enc


def s2_cell_udf(level: int = 13):
    """(lat, lon degrees) -> S2 cell id (signed long, Java-S2 convention).

    Vectorized numpy kernel (``curve/s2.py``) — no per-row Python, no
    external s2 dependency."""

    @F.pandas_udf("long")
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        ids = _s2k.cell_from_latlng(lat.to_numpy(), lon.to_numpy(), level)
        return pd.Series(ids)

    return _enc


def s2_cell_xyz_udf(level: int = 13):
    """(vx, vy, vz doubles, unnormalized direction) -> S2 cell id (long).

    The IEEE-exact encode path (no trig) — bit-reproducible across engines,
    used by the oracle-checked ``s2_cells`` query."""

    @F.pandas_udf("long")
    def _enc(vx: pd.Series, vy: pd.Series, vz: pd.Series) -> pd.Series:
        ids = _s2k.cell_from_xyz(
            vx.to_numpy(), vy.to_numpy(), vz.to_numpy(), level
        )
        return pd.Series(ids)

    return _enc
