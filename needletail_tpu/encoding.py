"""Host-side 2-bit encoding tables and packed-plane helpers.

One source of truth for the byte -> 2-bit code mapping shared by the C
framer's packed fills (``csrc/framer.cpp::nt_fill_*_batch_packed``), the
numpy fallback packer, and the device kernels (``device.ops.encode_2bit``
reproduces the same mapping as a branchless select chain) — so packed
transport is bit-identical to on-device encoding of raw ASCII.

Two modes, matching the reference's two compositions:

  * ``normalized=True``  — strict normalization then encode (U/u count as
    T, IUPAC/other invalid; ref sequence.rs:19-62 + bitkmer.rs:5-18).
  * ``normalized=False`` — the raw ``bit_kmers`` LUT: only ACGT/acgt valid
    (ref bitkmer.rs:5-18).

Packed plane layout (the transport format, VERDICT r2 #1):

  * codes: uint8 [rows, max_len/4] — base j in byte ``j>>2`` at bits
    ``2*(j&3)`` (LSB-first within the byte); invalid/padding bases are 0.
  * vbits: uint8 [rows, max_len/8] — bit ``j&7`` of byte ``j>>3`` set iff
    base j mapped to a real code.  ``None`` means "every in-length base
    valid" (the clean-read fast path: 0.25 B/base on the wire).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import sequence as _hostseq
from .bitkmer import NUC2BIT_LUT

__all__ = [
    "ENCODE_RAW_LUT",
    "ENCODE_NORMALIZED_LUT",
    "encode_lut",
    "pack_codes_host",
    "pack_codes_host_rows",
    "unpack_codes_host",
]

_INVALID = 255


def _build_encode_norm_lut() -> np.ndarray:
    """2-bit encode composed with strict normalization: byte -> normalize ->
    NUC2BIT.  Equal to the reference's ``normalize(false)`` + ``bit_kmers``
    composition (U/u count as T)."""
    norm, _ = _hostseq.normalize_luts(iupac=False)
    out = np.full(256, _INVALID, dtype=np.uint8)
    for b in range(256):
        nb = norm[b]
        if nb != 0:  # 0 = dropped (whitespace) -> invalid on device
            out[b] = NUC2BIT_LUT[nb]
    return out


ENCODE_RAW_LUT = NUC2BIT_LUT.copy()
ENCODE_NORMALIZED_LUT = _build_encode_norm_lut()


def encode_lut(normalized: bool) -> np.ndarray:
    """The 256-entry byte -> 2-bit-code table (0xFF invalid) for a mode."""
    return ENCODE_NORMALIZED_LUT if normalized else ENCODE_RAW_LUT


def pack_codes_host(
    seqs: np.ndarray, lengths: np.ndarray, normalized: bool = True
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Vectorized numpy packer: ASCII [B, L] -> (codes [B, L/4], vbits).

    The pure-host twin of the C framer's packed fills (used as the
    fallback and the test oracle).  L must be a multiple of 8.  ``vbits``
    is None iff every IN-LENGTH byte encoded cleanly (padding beyond
    ``lengths`` never forces a validity plane; consumers mask windows by
    length anyway).
    """
    b, l = seqs.shape
    if l % 8:
        raise ValueError(f"max_len {l} must be a multiple of 8 to pack")
    lut = encode_lut(normalized)
    codes8 = lut[seqs]  # [B, L] uint8, 255 invalid
    in_len = np.arange(l, dtype=np.int32)[None, :] < np.asarray(lengths)[:, None]
    valid = (codes8 != _INVALID) & in_len
    c = np.where(valid, codes8, 0).astype(np.uint8)
    c = c.reshape(b, l // 4, 4)
    packed = (
        c[:, :, 0]
        | (c[:, :, 1] << 1 * 2)
        | (c[:, :, 2] << 2 * 2)
        | (c[:, :, 3] << 3 * 2)
    ).astype(np.uint8)
    if bool((~valid & in_len).any()):
        vbits = np.packbits(valid, axis=1, bitorder="little")
        return packed, vbits
    return packed, None


def pack_codes_host_rows(
    seqs: np.ndarray, lengths: np.ndarray, normalized: bool = True
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """:func:`pack_codes_host` plus the per-row invalid-base counts the
    lean transport needs (host twin of the C framer's ``*_packed_rows``
    fills).  Returns ``(codes, vbits_or_None, row_invalid int32 [B])``."""
    b, l = seqs.shape
    if l % 8:
        raise ValueError(f"max_len {l} must be a multiple of 8 to pack")
    lut = encode_lut(normalized)
    codes8 = lut[seqs]
    in_len = np.arange(l, dtype=np.int32)[None, :] < np.asarray(lengths)[:, None]
    valid = (codes8 != _INVALID) & in_len
    c = np.where(valid, codes8, 0).astype(np.uint8)
    c = c.reshape(b, l // 4, 4)
    packed = (
        c[:, :, 0]
        | (c[:, :, 1] << 1 * 2)
        | (c[:, :, 2] << 2 * 2)
        | (c[:, :, 3] << 3 * 2)
    ).astype(np.uint8)
    row_invalid = (~valid & in_len).sum(axis=1, dtype=np.int32)
    if bool(row_invalid.any()):
        vbits = np.packbits(valid, axis=1, bitorder="little")
        return packed, vbits, row_invalid
    return packed, None, row_invalid


def unpack_codes_host(
    codes: np.ndarray, vbits: Optional[np.ndarray]
) -> np.ndarray:
    """Packed planes -> per-base codes [B, L] uint8 (255 invalid); host
    twin of ``device.ops.unpack_codes`` for tests."""
    b, lq = codes.shape
    l = lq * 4
    out = np.empty((b, l), dtype=np.uint8)
    for j in range(4):
        out[:, j::4] = (codes >> (2 * j)) & 3
    if vbits is not None:
        valid = np.unpackbits(vbits, axis=1, bitorder="little")[:, :l]
        out = np.where(valid.astype(bool), out, np.uint8(_INVALID))
    return out
