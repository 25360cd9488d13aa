"""Elementwise device ops: LUT gathers over padded [B, L] uint8 batches.

Each op reuses the host 256-entry tables (``needletail_tpu.sequence``), so
device results agree byte-for-byte with the host path.  All ops are
shape-preserving (fixed shapes for XLA); where the host op *compacts* the
sequence (normalize drops whitespace), the device op instead returns a keep
mask — compaction on fixed shapes is a host-side concern.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import sequence as _hostseq
from ..bitkmer import NUC2BIT_LUT

__all__ = [
    "normalize",
    "complement",
    "reverse_complement",
    "quality_mask",
    "decode_phred",
    "encode_2bit",
    "ENCODE_RAW_LUT",
    "ENCODE_NORMALIZED_LUT",
]

_INVALID = 255


def _norm_byte_lut(iupac: bool) -> np.ndarray:
    byte_map, _ = _hostseq.normalize_luts(iupac)
    return byte_map


def _build_encode_norm_lut() -> np.ndarray:
    """2-bit encode composed with strict normalization: byte -> normalize ->
    NUC2BIT.  This makes the device pipeline equal to the reference's
    ``normalize(false)`` + ``bit_kmers`` composition (U/u count as T)."""
    norm = _norm_byte_lut(iupac=False)
    out = np.full(256, _INVALID, dtype=np.uint8)
    for b in range(256):
        nb = norm[b]
        if nb != 0:  # 0 = dropped (whitespace) -> invalid on device
            out[b] = NUC2BIT_LUT[nb]
    return out


ENCODE_RAW_LUT = NUC2BIT_LUT.copy()
ENCODE_NORMALIZED_LUT = _build_encode_norm_lut()


@partial(jax.jit, static_argnames=("iupac",))
def normalize(seqs: jax.Array, iupac: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Normalize bytes (ref sequence.rs:19-62 semantics) on device.

    Returns ``(normalized_bytes, keep_mask)``: whitespace bytes map to 0 with
    ``keep_mask=False`` (host normalize drops them); everything else follows
    the reference mapping.  Padding (byte 0) maps to 'N' with keep=True, so
    mask with your length vector separately.
    """
    byte_map, _ = _hostseq.normalize_luts(iupac)
    lut = jnp.asarray(byte_map)
    out = jnp.take(lut, seqs.astype(jnp.int32), axis=0)
    return out, out != 0


@jax.jit
def complement(seqs: jax.Array) -> jax.Array:
    """Per-base IUPAC complement (ref sequence.rs:68-105)."""
    lut = jnp.asarray(_hostseq.COMPLEMENT_LUT)
    return jnp.take(lut, seqs.astype(jnp.int32), axis=0)


@jax.jit
def reverse_complement(seqs: jax.Array, lengths: jax.Array) -> jax.Array:
    """Length-aware reverse complement of each row (ref sequence.rs:202-208).

    Row i's first ``lengths[i]`` positions hold the reverse complement;
    padding stays zero.
    """
    b, l = seqs.shape
    comp = complement(seqs)
    pos = jnp.arange(l, dtype=jnp.int32)[None, :]
    src = lengths[:, None] - 1 - pos  # index of the mirrored base
    in_range = src >= 0
    src = jnp.clip(src, 0, l - 1)
    flipped = jnp.take_along_axis(comp, src, axis=1)
    return jnp.where(in_range, flipped, 0).astype(jnp.uint8)


@jax.jit
def quality_mask(seqs: jax.Array, quals: jax.Array, score: jax.Array) -> jax.Array:
    """Mask bases with quality below ``score`` to 'N' (ref sequence.rs:280-296)."""
    return jnp.where(quals < score, jnp.uint8(ord("N")), seqs)


@partial(jax.jit, static_argnames=("offset",))
def decode_phred(quals: jax.Array, offset: int = 33) -> Tuple[jax.Array, jax.Array]:
    """Subtract the Phred offset; returns (scores, ok_mask) — chars below the
    offset are flagged instead of raising (ref quality.rs:15-28)."""
    ok = quals >= offset
    return (quals - jnp.uint8(offset)) * ok.astype(jnp.uint8), ok


@partial(jax.jit, static_argnames=("normalized",))
def encode_2bit(seqs: jax.Array, normalized: bool = True) -> jax.Array:
    """Map bytes to 2-bit codes (A=0 C=1 G=2 T=3; 255 = invalid).

    ``normalized=True`` composes strict normalization first, so U/u encode as
    T and IUPAC codes are invalid — matching the reference README pipeline
    (normalize -> kmers).  ``normalized=False`` is the raw ``bit_kmers`` LUT
    (ref bitkmer.rs:5-18): only ACGT/acgt valid.

    Implemented as a branchless select chain rather than a 256-entry
    ``jnp.take``: small-table gathers are ~30x slower than fused elementwise
    selects on TPU (measured 131ms vs 4ms over 16M bases on v5e).
    """
    up = seqs & jnp.uint8(0xDF)  # case-fold: clears the lowercase bit
    code = jnp.where(
        up == jnp.uint8(ord("A")),
        jnp.uint8(0),
        jnp.where(
            up == jnp.uint8(ord("C")),
            jnp.uint8(1),
            jnp.where(
                up == jnp.uint8(ord("G")),
                jnp.uint8(2),
                jnp.uint8(3),
            ),
        ),
    )
    is_t = up == jnp.uint8(ord("T"))
    if normalized:
        is_t = is_t | (up == jnp.uint8(ord("U")))
    valid = (
        (up == jnp.uint8(ord("A")))
        | (up == jnp.uint8(ord("C")))
        | (up == jnp.uint8(ord("G")))
        | is_t
    )
    return jnp.where(valid, code, jnp.uint8(_INVALID))
