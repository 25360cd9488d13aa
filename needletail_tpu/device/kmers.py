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


def _roll_left(x: jax.Array, j: int) -> jax.Array:
    """rolled[:, p] == x[:, p + j] (wrap-around lanes only reach windows the
    in-bounds mask rejects, since window p needs p + k <= length <= L)."""
    return x if j == 0 else jnp.roll(x, -j, axis=-1)


def _ladders(codes: jax.Array, k: int, need_rc: bool):
    """Power-of-two doubling ladders over the lane axis (O(log k) rolls and
    a graph XLA compiles in seconds at k=31, vs. minutes for a k-step
    shift-accumulate with per-offset slices):

      * ``W[m][:, p]`` packs codes[p..p+m-1], first base most significant
      * ``R[m][:, p]`` packs the reverse complement (start base least
        significant), doubling as R[2m](p) = (R[m](p+m) << 2m) | R[m](p)
      * ``V[m][:, p]`` — all m codes are unambiguous bases
    """
    W = {1: codes}
    R = {1: ~codes & jnp.uint32(3)} if need_rc else None
    V = {1: codes < 4}
    for m in (1, 2, 4, 8):
        if 2 * m > k:
            break
        W[2 * m] = (W[m] << jnp.uint32(2 * m)) | _roll_left(W[m], m)
        if need_rc:
            R[2 * m] = (_roll_left(R[m], m) << jnp.uint32(2 * m)) | R[m]
        V[2 * m] = V[m] & _roll_left(V[m], m)
    return W, R, V


def _compose_fwd(W, width: int) -> jax.Array:
    acc = None
    off = 0
    for m in (16, 8, 4, 2, 1):
        if width & m:
            part = _roll_left(W[m], off)
            acc = part if acc is None else (acc << jnp.uint32(2 * m)) | part
            off += m
    return acc


def _compose_rc(R, width: int) -> jax.Array:
    acc = None
    off = 0
    for m in (1, 2, 4, 8, 16):
        if width & m:
            part = _roll_left(R[m], off)
            acc = part if acc is None else (part << jnp.uint32(2 * off)) | acc
            off += m
    return acc


def _compose_valid(V, width: int) -> jax.Array:
    acc = None
    off = 0
    for m in (16, 8, 4, 2, 1):
        if width & m:
            part = _roll_left(V[m], off)
            acc = part if acc is None else acc & part
            off += m
    return acc


def window_validity(codes: jax.Array, lengths: jax.Array, k: int) -> jax.Array:
    """bool [B, W]: window has k in-bounds, unambiguous bases.

    Matches the emission set of the reference's N-skip machines
    (ref kmer.rs:84-108, bitkmer.rs:39-70).
    """
    b, l = codes.shape
    num = l - k + 1
    _, _, V = _ladders(codes, k, need_rc=False)
    valid = _compose_valid(V, k)[:, :num]
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
    W, _, V = _ladders(codes, k, need_rc=False)
    pos = jnp.arange(num, dtype=jnp.int32)[None, :]
    valid = _compose_valid(V, k)[:, :num] & (pos + k <= lengths[:, None])
    if k <= 16:
        lo = _compose_fwd(W, k)[:, :num]
        hi = jnp.zeros_like(lo)
    else:
        # hi = first k-16 bases of the window, lo = last 16 bases
        hi = _compose_fwd(W, k - 16)[:, :num]
        lo = _roll_left(W[16], k - 16)[:, :num]
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
    W, R, V = _ladders(codes, k, need_rc=True)
    pos = jnp.arange(num, dtype=jnp.int32)[None, :]
    valid = _compose_valid(V, k)[:, :num] & (pos + k <= lengths[:, None])

    if k <= 16:
        fwd_lo = _compose_fwd(W, k)[:, :num]
        fwd_hi = jnp.zeros_like(fwd_lo)
        rc_lo = _compose_rc(R, k)[:, :num]
        rc_hi = jnp.zeros_like(rc_lo)
    else:
        m_hi = k - 16
        fwd_hi = _compose_fwd(W, m_hi)[:, :num]  # first k-16 bases
        fwd_lo = _roll_left(W[16], m_hi)[:, :num]  # last 16 bases
        rc_lo = R[16][:, :num]  # rc of the first 16 bases
        # rc of the last m_hi bases = bases p+16..p+k-1
        rc_hi = _roll_left(_compose_rc(R, m_hi), 16)[:, :num]

    use_rc = (fwd_hi > rc_hi) | ((fwd_hi == rc_hi) & (fwd_lo > rc_lo))
    hi = jnp.where(use_rc, rc_hi, fwd_hi)
    lo = jnp.where(use_rc, rc_lo, fwd_lo)
    return KmerWindows(hi=hi, lo=lo, valid=valid, was_rc=use_rc & valid)
