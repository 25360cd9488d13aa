"""Rolling 2-bit k-mer packing and canonicalization on device.

K-mers are represented as ``(hi, lo)`` uint32 pairs holding the packed 2-bit
window (A=0 C=1 G=2 T=3, first base most significant — identical to the
reference's integer encoding, ref bitkmer.rs:26-36):

  * k <= 16: ``lo`` holds all ``2k`` bits, ``hi`` is 0.
  * 16 < k <= 31: ``hi`` holds the first ``k-16`` bases, ``lo`` the last 16.

This keeps the hot loop in native 32-bit lanes (the TPU VPU has no 64-bit
integer datapath; pairs + a carry-free split make compares cheap).

Packing is a static k-step shift-accumulate over the lane dimension — XLA
fuses it into a single HBM pass; the Pallas kernel variant keeps the batch
tile resident in VMEM (see ``pallas_kernels``).

Canonical semantics follow the *bitkmer* path of the reference: the
canonical value is ``min(fwd, rc)`` as integers and ties keep the forward
orientation (ref bitkmer.rs:136-143).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .ops import encode_2bit

__all__ = ["KmerWindows", "pack_kmers", "canonical_kmers", "window_validity"]

_U2 = jnp.uint32(2)


class KmerWindows(NamedTuple):
    """Packed k-mer windows for a batch.

    ``hi``/``lo``: uint32 [B, W] (W = L - k + 1 window positions per read);
    ``valid``: bool [B, W] — all k bases unambiguous and inside the read.
    ``was_rc``: bool [B, W] — only set by ``canonical_kmers``.
    """

    hi: jax.Array
    lo: jax.Array
    valid: jax.Array
    was_rc: jax.Array


def _pack_fwd(codes: jax.Array, m: int, num: int) -> jax.Array:
    """Pack m consecutive codes, first base most significant.
    ``codes``: [B, L] uint32. Result [B, num] uint32 for windows 0..num-1."""
    val = jnp.zeros(codes.shape[:-1] + (num,), dtype=jnp.uint32)
    for j in range(m):
        val = (val << _U2) | jax.lax.dynamic_slice_in_dim(codes, j, num, axis=-1)
    return val


def _pack_rc(codes: jax.Array, m: int, num: int) -> jax.Array:
    """Pack the reverse complement of each m-window: base at the window start
    becomes least significant and is complemented (3 - code)."""
    val = jnp.zeros(codes.shape[:-1] + (num,), dtype=jnp.uint32)
    for j in range(m - 1, -1, -1):
        c = jax.lax.dynamic_slice_in_dim(codes, j, num, axis=-1)
        val = (val << _U2) | (jnp.uint32(3) - c)
    return val


def window_validity(codes: jax.Array, lengths: jax.Array, k: int) -> jax.Array:
    """bool [B, W]: window has k in-bounds, unambiguous bases.

    Matches the emission set of the reference's N-skip machines
    (ref kmer.rs:84-108, bitkmer.rs:39-70).
    """
    b, l = codes.shape
    num = l - k + 1
    good = codes < 4
    # unrolled AND over the k window — a lane-axis cumsum would be exact too
    # but cumsum along the minor axis is very slow on TPU (measured ~100x
    # slower than this fused elementwise chain)
    valid = jax.lax.dynamic_slice_in_dim(good, 0, num, axis=-1)
    for j in range(1, k):
        valid = valid & jax.lax.dynamic_slice_in_dim(good, j, num, axis=-1)
    pos = jnp.arange(num, dtype=jnp.int32)[None, :]
    in_bounds = pos + k <= lengths[:, None]
    return valid & in_bounds


@partial(jax.jit, static_argnames=("k", "normalized"))
def pack_kmers(
    seqs: jax.Array, lengths: jax.Array, k: int, normalized: bool = True
) -> KmerWindows:
    """Forward-strand packed windows for every position (no canonicalization)."""
    if not 1 <= k <= 31:
        raise ValueError(f"k must be in [1, 31], got {k}")
    codes = encode_2bit(seqs, normalized=normalized).astype(jnp.uint32)
    b, l = codes.shape
    if l < k:
        raise ValueError(f"batch max_len {l} shorter than k={k}")
    num = l - k + 1
    valid = window_validity(codes, lengths, k)
    if k <= 16:
        lo = _pack_fwd(codes, k, num)
        hi = jnp.zeros_like(lo)
    else:
        # hi = first k-16 bases of the window, lo = last 16 bases
        hi = _pack_fwd(codes, k - 16, num)
        lo16 = _pack_fwd(codes, 16, l - 16 + 1)
        lo = jax.lax.dynamic_slice_in_dim(lo16, k - 16, num, axis=-1)
    return KmerWindows(hi=hi, lo=lo, valid=valid, was_rc=jnp.zeros_like(valid))


@partial(jax.jit, static_argnames=("k", "normalized"))
def canonical_kmers(
    seqs: jax.Array, lengths: jax.Array, k: int, normalized: bool = True
) -> KmerWindows:
    """Canonical packed windows: integer-min of forward and reverse
    complement; ties keep forward (bitkmer semantics, ref bitkmer.rs:136-143).
    """
    if not 1 <= k <= 31:
        raise ValueError(f"k must be in [1, 31], got {k}")
    codes = encode_2bit(seqs, normalized=normalized).astype(jnp.uint32)
    b, l = codes.shape
    if l < k:
        raise ValueError(f"batch max_len {l} shorter than k={k}")
    num = l - k + 1
    valid = window_validity(codes, lengths, k)

    if k <= 16:
        fwd_lo = _pack_fwd(codes, k, num)
        fwd_hi = jnp.zeros_like(fwd_lo)
        rc_lo = _pack_rc(codes, k, num)
        rc_hi = jnp.zeros_like(rc_lo)
    else:
        fwd_hi = _pack_fwd(codes, k - 16, num)
        fwd_lo16 = _pack_fwd(codes, 16, l - 16 + 1)
        fwd_lo = jax.lax.dynamic_slice_in_dim(fwd_lo16, k - 16, num, axis=-1)
        # rc: bits 2j for source offset j.  lo = offsets 0..15 (complemented,
        # start-of-window least significant), hi = offsets 16..k-1.
        rc_lo = _pack_rc(codes, 16, l - 16 + 1)
        rc_lo = jax.lax.dynamic_slice_in_dim(rc_lo, 0, num, axis=-1)
        rc_hi16 = _pack_rc(codes, k - 16, l - (k - 16) + 1)
        rc_hi = jax.lax.dynamic_slice_in_dim(rc_hi16, 16, num, axis=-1)

    use_rc = (fwd_hi > rc_hi) | ((fwd_hi == rc_hi) & (fwd_lo > rc_lo))
    hi = jnp.where(use_rc, rc_hi, fwd_hi)
    lo = jnp.where(use_rc, rc_lo, fwd_lo)
    return KmerWindows(hi=hi, lo=lo, valid=valid, was_rc=use_rc & valid)
