from .bpc import bpc_cover, bpc_cover_of_ranges, pre_code, prefix_to_range
from .cover import Cover, coalesce_ranges, cover_box, dense_cover
from .hilbert import decode2d, encode2d, decode_nd, encode_nd
from .orientation import hilbert_orientation

__all__ = [
    "Cover", "bpc_cover", "bpc_cover_of_ranges", "coalesce_ranges",
    "cover_box", "decode2d", "decode_nd", "dense_cover", "encode2d",
    "encode_nd", "hilbert_orientation", "pre_code", "prefix_to_range",
]
