"""Pure-numpy codec kernels (Spark-free).

Each codec is an invertible pair over one numpy column, mirroring the
reference's codec framework semantics (reference: python/codec.py:41-183)
but implemented from scratch as vectorized numpy with our own wire format.
"""

from sprintz_spark.codecs import zigzag, delta, bitpack, rle, fire, quantize, gorilla
from sprintz_spark.codecs.sprintz import (
    encode_column,
    decode_column,
    query_compressed,
    compressed_size_report,
)

__all__ = [
    "zigzag",
    "delta",
    "bitpack",
    "rle",
    "fire",
    "quantize",
    "gorilla",
    "encode_column",
    "decode_column",
    "query_compressed",
    "compressed_size_report",
]
