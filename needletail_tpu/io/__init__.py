"""Host-side I/O: compression sniffing/decoding and batched ingestion."""

from .compression import (
    BZ_MAGIC,
    GZ_MAGIC,
    XZ_MAGIC,
    ZST_MAGIC,
    ChainedReader,
    open_uncompressed,
    sniff_compression,
    wrap_decompressor,
)

__all__ = [
    "GZ_MAGIC",
    "BZ_MAGIC",
    "XZ_MAGIC",
    "ZST_MAGIC",
    "ChainedReader",
    "open_uncompressed",
    "sniff_compression",
    "wrap_decompressor",
]
