"""Minimizers on device.

Two granularities:

  * ``global_minimizer`` — per read, the smallest canonical k-mer value.
    For pure-ACGT sequences this equals the reference's byte-level
    ``minimizer`` (ref sequence.rs:139-152): 2-bit integer order coincides
    with lexicographic byte order over {A,C,G,T}, and the union of forward
    and reverse-complement windows is exactly the canonical-value set.
    (The reference's ``bitkmer::minimizer`` quirk — rc computed at full-k
    width — lives in the host ``bitkmer`` module, ref bitkmer.rs:146-162.)

  * ``window_minimizers`` — the classic (w, k) minimizer sketch: for every
    run of ``w`` consecutive k-mer windows, the minimum canonical value.
    A sketch window is valid iff all ``w`` k-mer windows in it are valid.

Minima over (hi, lo) uint32 pairs are computed with a two-word compare —
no 64-bit lanes needed.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmers import KmerWindows, canonical_kmers

__all__ = ["global_minimizer", "window_minimizers"]

# numpy scalar, not jnp: a module-level jnp constant would initialize the
# XLA backend at import time and break jax.distributed.initialize()
_UMAX = np.uint32(0xFFFFFFFF)


def _pair_min(ahi, alo, bhi, blo):
    """Elementwise min of (hi, lo) 64-bit values held as uint32 pairs."""
    a_smaller = (ahi < bhi) | ((ahi == bhi) & (alo <= blo))
    return (
        jnp.where(a_smaller, ahi, bhi),
        jnp.where(a_smaller, alo, blo),
    )


@partial(jax.jit, static_argnames=("k", "normalized", "precoded"))
def global_minimizer(
    seqs: jax.Array,
    lengths: jax.Array,
    k: int,
    normalized: bool = True,
    precoded: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-read minimum canonical k-mer value.

    Returns ``(hi, lo, any_valid)`` each [B]; reads with no valid window
    report (0xFFFFFFFF, 0xFFFFFFFF) and ``any_valid=False``.
    ``precoded=True``: ``seqs`` holds 2-bit codes already (packed
    transport; see ``kmers.pack_kmers``).
    """
    win = canonical_kmers(
        seqs, lengths, k, normalized=normalized, precoded=precoded
    )
    hi = jnp.where(win.valid, win.hi, _UMAX)
    lo = jnp.where(win.valid, win.lo, _UMAX)
    # reduce along windows with pair order: scan via min of hi, then lo among
    # positions achieving the min hi
    m_hi = jnp.min(hi, axis=1)
    at_min = hi == m_hi[:, None]
    m_lo = jnp.min(jnp.where(at_min, lo, _UMAX), axis=1)
    return m_hi, m_lo, jnp.any(win.valid, axis=1)


@partial(jax.jit, static_argnames=("k", "w", "normalized", "precoded"))
def window_minimizers(
    seqs: jax.Array,
    lengths: jax.Array,
    k: int,
    w: int,
    normalized: bool = True,
    precoded: bool = False,
) -> KmerWindows:
    """(w, k) minimizer sketch: min canonical k-mer per w-window.

    Returns a ``KmerWindows`` whose position axis indexes sketch windows
    (position p covers k-mer windows p..p+w-1); ``was_rc`` is not tracked
    (all False).  ``precoded=True``: ``seqs`` holds 2-bit codes already
    (packed transport; see ``kmers.pack_kmers``).
    """
    if w < 1:
        raise ValueError("w must be >= 1")
    win = canonical_kmers(
        seqs, lengths, k, normalized=normalized, precoded=precoded
    )
    hi = jnp.where(win.valid, win.hi, _UMAX)
    lo = jnp.where(win.valid, win.lo, _UMAX)
    num = hi.shape[1] - w + 1
    if num < 1:
        raise ValueError(f"sequence windows {hi.shape[1]} shorter than w={w}")

    # power-of-two doubling ladder over the window axis (O(log w) rolls;
    # a w-step chain of per-offset slices compiles pathologically slowly
    # for the w seen in practice). Rolled wrap-around lanes only reach
    # sketch positions >= num, which are sliced off below.
    def roll(x, j):
        return x if j == 0 else jnp.roll(x, -j, axis=1)

    lh, ll, lv = hi, lo, win.valid
    m = 1
    while 2 * m <= w:
        rh, rl, rv = (roll(a, m) for a in (lh, ll, lv))
        lh, ll = _pair_min(lh, ll, rh, rl)
        lv = lv & rv
        m *= 2
    # min/AND are idempotent: cover width w with two overlapping m-spans
    if m < w:
        rh, rl, rv = (roll(a, w - m) for a in (lh, ll, lv))
        lh, ll = _pair_min(lh, ll, rh, rl)
        lv = lv & rv
    m_hi, m_lo, valid = (a[:, :num] for a in (lh, ll, lv))
    return KmerWindows(hi=m_hi, lo=m_lo, valid=valid, was_rc=jnp.zeros_like(valid))
