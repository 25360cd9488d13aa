"""Host-side I/O: compression sniffing/decoding and batched ingestion."""

from .bucketed import DEFAULT_BUCKETS, bucketed_read_batches
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
    "bucketed_read_batches",
    "DEFAULT_BUCKETS",
    "GZ_MAGIC",
    "BZ_MAGIC",
    "XZ_MAGIC",
    "ZST_MAGIC",
    "ChainedReader",
    "open_uncompressed",
    "sniff_compression",
    "wrap_decompressor",
]
