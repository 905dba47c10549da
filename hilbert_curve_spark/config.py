"""Engine configuration.

``order`` is the Hilbert curve order (bits per axis); the lattice is
``[0, 2**order)**2`` and 2-D indices occupy ``2*order`` bits (reference
default order is 12, `Scheme/RSKQ/RSKQ_Biginteger.java:1008`; the reference
never exceeds 17, so ``long`` always suffices —
`hilbert/HilbertComponent/SmallHilbertCurve.java:51-54`).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    order: int = 12                 # Hilbert bits per axis
    max_ranges: int = 32            # query-cover budget (S5); 0 = exact cover
    salt_buckets: int = 8           # hot-cell salting factor for skewed joins
    cell_shift: int = 6             # cell id = hilbert >> (2*cell_shift): 64x64 cells
    shuffle_partitions: int = 32

    @property
    def edge(self) -> int:
        return 1 << self.order

    @property
    def bits(self) -> int:
        return 2 * self.order


DEFAULT = EngineConfig()
