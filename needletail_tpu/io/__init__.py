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

def __getattr__(name):
    # lazy: bucketed -> fast_batch -> parser -> io.compression would be a
    # circular import at package-init time
    if name in ("bucketed_read_batches", "DEFAULT_BUCKETS"):
        from . import bucketed

        return getattr(bucketed, name)
    raise AttributeError(name)


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
