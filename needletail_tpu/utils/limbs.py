"""64-bit-exact accumulation on the x32 device: uint32 limb pairs.

The default JAX x32 mode has no int64 lanes on device, and int32 running
tallies wrap after ~2.15 G windows (less than one large FASTQ).  Per-step
increments are bounded by the batch lane count, so a carry-propagating
limb add is exact to 2^64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "acc64",
    "limbs_to_int",
    "limbs_to_int64_array",
    "int64_array_to_limbs",
]


def int64_array_to_limbs(table):
    """Split a non-negative int64 numpy array into (lo, hi) uint32 limb
    arrays (checkpoint resume — the inverse of ``limbs_to_int64_array``)."""
    import numpy as np

    t = np.asarray(table).astype(np.int64, copy=False)
    return (t & 0xFFFFFFFF).astype(np.uint32), (t >> 32).astype(np.uint32)


def acc64(lo: jax.Array, hi: jax.Array, inc: jax.Array):
    """Accumulate a non-negative int32 increment into (lo, hi) uint32 limbs."""
    lo2 = lo + inc.astype(jnp.uint32)
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    return lo2, hi2


def limbs_to_int(lo, hi) -> int:
    return int(lo) + (int(hi) << 32)


def limbs_to_int64_array(lo, hi):
    """Combine uint32 limb-pair arrays into one int64 numpy array (syncs
    device→host; limbs must be addressable)."""
    import numpy as np

    return np.asarray(lo).astype(np.int64) + (
        np.asarray(hi).astype(np.int64) << 32
    )
