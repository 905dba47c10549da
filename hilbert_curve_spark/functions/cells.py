"""Discrete-global-grid cell encoding (H3 / S2 / lattice cells).

The north_star calls for geo spans "encoded to H3/S2 cells and Hilbert
indices".  On the engine's integer lattice the canonical cell id is the
Hilbert-prefix cell (``hilbert >> 2*shift`` — an aligned curve subsquare,
exactly the reference's prefix-tree node, and the bucketing key for
cell-bucketed joins).  For real lat/lon data the same API yields H3 or S2
cell ids when the respective libraries are installed; neither ships in this
container, so those paths are import-gated with a clear error rather than a
silent fallback (stub contract per the build brief).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

try:  # pragma: no cover - not installed in this container
    import h3 as _h3
except ImportError:
    _h3 = None

try:  # pragma: no cover
    import s2sphere as _s2
except ImportError:
    _s2 = None


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
    """(lat, lon) -> S2 cell id (long).  Requires ``s2sphere``."""
    if _s2 is None:
        raise NotImplementedError(
            "s2sphere is not installed in this environment; lattice_cell covers "
            "the engine's bucketing needs — install `s2sphere` for real S2 ids"
        )
    import pandas as pd

    @F.pandas_udf("long")
    def _enc(lat: "pd.Series", lon: "pd.Series") -> "pd.Series":
        out = []
        for a, b in zip(lat, lon):
            ll = _s2.LatLng.from_degrees(float(a), float(b))
            out.append(_s2.CellId.from_lat_lng(ll).parent(level).id())
        return pd.Series(out)

    return _enc
