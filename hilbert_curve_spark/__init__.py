"""hilbert-curve-spark: PySpark-native spatial-join + tiling engine.

Public API surface (see README.md for the architecture):

    from hilbert_curve_spark import EngineConfig, get_spark
    from hilbert_curve_spark.curve import encode2d, decode2d, cover_box, bpc_cover
    from hilbert_curve_spark.operators import ...
"""

from .config import DEFAULT, EngineConfig
from .session import get_spark

__all__ = ["DEFAULT", "EngineConfig", "get_spark"]
__version__ = "0.1.0"
