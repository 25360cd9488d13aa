"""Hand-written Pallas TPU kernels for the k-mer hot loop.

The fused kernel keeps a ``[block_rows, L]`` tile of reads resident in VMEM
and produces, in a single HBM pass: 2-bit encoding, rolling forward and
reverse-complement window packing (uint32 hi/lo pairs, k <= 31), window
validity, canonical selection (integer-min, forward tie-break — bitkmer
semantics, ref bitkmer.rs:136-143), a masked hash index stream for the
count-table scatter, and running total/forward tallies.

Lane-dimension window shifts use ``pltpu.roll`` (wrap-around lanes land in
positions that are invalid by the in-bounds mask, so wrapped values are
harmless).  All arithmetic is uint32 on the VPU; there is no 64-bit lane
datapath, which is why k-mers ride as (hi, lo) pairs.

Falls back to interpret mode off-TPU so the same code path is testable on
CPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _ladder

__all__ = [
    "canonical_hash_tally",
    "canonical_hash_keys",
    "canonical_hash_keys_packed",
    "canonical_key_planes",
    "canonical_key_planes_packed",
    "canonical_windows_pallas",
    "mxu_histogram16",
    "mxu_compact_slots",
]

_BLOCK_ROWS = 256


def _auto_block_rows(l: int) -> int:
    """Pick block_rows so a [block_rows, L] uint32 plane stays ~128 KiB:
    the kernel holds ~14 ladder/pack planes live, keeping VMEM well under
    the 16 MiB budget for any read length."""
    if l > 28672:
        # rows floor at 8: the ~15 live ladder planes of [8, L] uint32 fit
        # the 16 MiB VMEM budget up to L=28672 (measured; 32768 fails
        # Mosaic allocation); longer records must be tiled
        raise ValueError(
            f"read length {l} exceeds the kernel's single-row VMEM budget; "
            "tile long records first (device.tiling, (k-1)-base halos)"
        )
    rows = max(8, min(_BLOCK_ROWS, (32768 // max(l, 1)) // 8 * 8))
    return rows


def _pad_rows(seqs: jax.Array, lengths: jax.Array, block_rows: int):
    b = seqs.shape[0]
    pad = (-b) % block_rows
    if pad:
        seqs = jnp.concatenate(
            [seqs, jnp.zeros((pad, seqs.shape[1]), dtype=seqs.dtype)]
        )
        lengths = jnp.concatenate([lengths, jnp.zeros((pad,), lengths.dtype)])
    return seqs, lengths, b


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _encode_codes(block: jax.Array, normalized: bool) -> jax.Array:
    """Byte -> 2-bit code (255 invalid) as a branchless select chain.

    All arithmetic in uint32: Mosaic's v5e vector units have no 8-bit
    compare, so bytes are widened on load.
    """
    up = block.astype(jnp.uint32) & jnp.uint32(0xDF)
    code = jnp.where(
        up == jnp.uint32(65),  # A
        jnp.uint32(0),
        jnp.where(
            up == jnp.uint32(67),  # C
            jnp.uint32(1),
            jnp.where(up == jnp.uint32(71), jnp.uint32(2), jnp.uint32(3)),  # G else T
        ),
    )
    is_t = up == jnp.uint32(84)
    if normalized:
        is_t = is_t | (up == jnp.uint32(85))  # U counts as T
    valid = (
        (up == jnp.uint32(65)) | (up == jnp.uint32(67)) | (up == jnp.uint32(71)) | is_t
    )
    return jnp.where(valid, code, jnp.uint32(255))


def _roll_left(x: jax.Array, j: int, l: int) -> jax.Array:
    """rolled[:, p] == x[:, p + j] (wraps; wrapped lanes are masked off).

    pltpu.roll needs a non-negative shift, so a left-roll by j rides as a
    right-roll by (l - j) mod l — the modulo keeps the shift legal when
    j >= l (possible when L < k; every window is then out-of-bounds and
    masked, so the wrapped values never surface).  Mosaic only rotates
    32-bit lanes, which is why every rolled quantity here is uint32.
    """
    j = j % l
    if j == 0:
        return x
    return pltpu.roll(x, l - j, 1)


def _canon_body(seq_ref, len_ref, *, k: int, normalized: bool, encoded: bool):
    """Canonical window values for every lane: (hi, lo, valid, use_rc).

    Window packing rides the shared power-of-two doubling ladders
    (``device._ladder``, one source of truth with the XLA path); only the
    roll primitive differs (``pltpu.roll`` over VMEM lanes here).
    ``encoded=True``: the seq plane already holds 2-bit codes (packed
    transport, unpacked by XLA just before the kernel) — skip the
    byte-compare encode.
    """
    if encoded:
        codes = seq_ref[:].astype(jnp.uint32)  # 0-3, 255 invalid
    else:
        codes = _encode_codes(seq_ref[:], normalized)  # [BR, L] uint32
    br, l = codes.shape

    roll = lambda x, j: _roll_left(x, j, l)
    fwd_hi, fwd_lo, rc_hi, rc_lo, valid_u = _ladder.canonical_parts(codes, k, roll)
    pos = jax.lax.broadcasted_iota(jnp.int32, (br, l), 1)
    valid = (valid_u != jnp.uint32(0)) & (pos + k <= len_ref[:])

    use_rc = (fwd_hi > rc_hi) | ((fwd_hi == rc_hi) & (fwd_lo > rc_lo))
    hi = jnp.where(use_rc, rc_hi, fwd_hi)
    lo = jnp.where(use_rc, rc_lo, fwd_lo)
    return hi, lo, valid, use_rc


def _tally_body(
    seq_ref,
    len_ref,
    *,
    k: int,
    normalized: bool,
    table_mask: int,
    c1: int,
    c2: int,
    encoded: bool = False,
):
    """Shared tally computation: (hash, valid, use_rc) for every window."""
    hi, lo, valid, use_rc = _canon_body(
        seq_ref, len_ref, k=k, normalized=normalized, encoded=encoded
    )
    h = ((lo * jnp.uint32(c1)) ^ (hi * jnp.uint32(c2))) & jnp.uint32(table_mask)
    return h, valid, use_rc


def _accumulate_tallies(i, total_ref, fwd_ref, valid, use_rc):
    block_total = jnp.sum(valid.astype(jnp.int32))
    block_fwd = jnp.sum((valid & ~use_rc).astype(jnp.int32))

    @pl.when(i == 0)
    def _():
        total_ref[0, 0] = 0
        fwd_ref[0, 0] = 0

    total_ref[0, 0] += block_total
    fwd_ref[0, 0] += block_fwd


def _kernel(seq_ref, len_ref, idx_ref, weight_ref, total_ref, fwd_ref, **kw):
    i = pl.program_id(0)
    h, valid, use_rc = _tally_body(seq_ref, len_ref, **kw)
    idx_ref[:] = jnp.where(valid, h, jnp.uint32(0)).astype(jnp.int32)
    weight_ref[:] = valid.astype(jnp.int32)
    _accumulate_tallies(i, total_ref, fwd_ref, valid, use_rc)


def _keys_kernel(seq_ref, len_ref, keys_ref, total_ref, fwd_ref, **kw):
    """Variant emitting -1-masked keys only (no weight plane): feeds
    ``mxu_histogram16(keys, None)`` directly, skipping one [B, L] HBM
    write + read + re-mask pass per step."""
    i = pl.program_id(0)
    h, valid, use_rc = _tally_body(seq_ref, len_ref, **kw)
    keys_ref[:] = jnp.where(valid, h.astype(jnp.int32), jnp.int32(-1))
    _accumulate_tallies(i, total_ref, fwd_ref, valid, use_rc)


def _planes_kernel(
    seq_ref, len_ref, khi_ref, klo_ref, total_ref, fwd_ref, *,
    k, normalized, table_mask, c1, c2, encoded=False,
):
    """Exact-path variant: full canonical (hi, lo) window values with
    invalid lanes masked to the sentinel (0xFFFFFFFF == -1 as int32) —
    the exact input format of ``count.unique_counts``.  One fused HBM
    pass replaces the XLA encode+ladder composition (measured ~3x)."""
    i = pl.program_id(0)
    hi, lo, valid, use_rc = _canon_body(
        seq_ref, len_ref, k=k, normalized=normalized, encoded=encoded
    )
    sentinel = jnp.uint32(0xFFFFFFFF)
    khi_ref[:] = jax.lax.bitcast_convert_type(
        jnp.where(valid, hi, sentinel), jnp.int32
    )
    klo_ref[:] = jax.lax.bitcast_convert_type(
        jnp.where(valid, lo, sentinel), jnp.int32
    )
    _accumulate_tallies(i, total_ref, fwd_ref, valid, use_rc)


def _run_tally(
    kernel_fn,
    n_planes: int,
    seqs: jax.Array,
    lengths: jax.Array,
    k: int,
    table_bits: int,
    normalized: bool,
    block_rows: Optional[int],
    encoded: bool = False,
):
    """Shared launch logic for the fused tally kernels: k validation, VMEM
    block sizing + internal row padding, grid/spec construction.  Returns
    (``n_planes`` [B, L] int32 planes..., total, fwd)."""
    if not 1 <= k <= 31:
        raise ValueError(f"k must be in [1, 31], got {k}")
    b_in, l = seqs.shape
    if block_rows is None:
        block_rows = _auto_block_rows(l)
        seqs, lengths, b_in = _pad_rows(seqs, lengths, block_rows)
    b = seqs.shape[0]
    if b % block_rows:
        raise ValueError(f"batch rows {b} not a multiple of {block_rows}")
    kernel = partial(
        kernel_fn,
        k=k,
        normalized=normalized,
        table_mask=(1 << table_bits) - 1,
        c1=0x9E3779B1,
        c2=0x85EBCA77,
        encoded=encoded,
    )
    plane_spec = pl.BlockSpec(
        (block_rows, l), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // block_rows,),
        in_specs=[
            plane_spec,
            # lengths ride as [B, 1] — 1D operands hit an XLA/Mosaic layout
            # mismatch (T(512) vs T(256))
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[plane_spec] * n_planes + [scalar_spec, scalar_spec],
        out_shape=[jax.ShapeDtypeStruct((b, l), jnp.int32)] * n_planes
        + [jax.ShapeDtypeStruct((1, 1), jnp.int32)] * 2,
        interpret=_interpret(),
    )(seqs, lengths.reshape(b, 1))
    planes, total, fwd = out[:n_planes], out[-2], out[-1]
    if b != b_in:
        planes = [p[:b_in] for p in planes]
    return (*planes, total[0, 0], fwd[0, 0])


@partial(
    jax.jit,
    static_argnames=("k", "normalized", "table_bits", "block_rows"),
)
def canonical_hash_tally(
    seqs: jax.Array,
    lengths: jax.Array,
    k: int,
    table_bits: int = 20,
    normalized: bool = True,
    block_rows: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused Pallas pass: canonical k-mer hash indices + weights + tallies.

    Returns ``(idx, weight, total, fwd)`` where ``idx``/``weight`` are
    [B, L] int32 (window at lane p; weight 0 marks invalid/out-of-bounds
    windows and hashes masked to 0) and ``total``/``fwd`` are scalars.
    The caller scatter-adds ``weight`` at ``idx`` into its count table.
    ``block_rows=None`` sizes VMEM tiles from the read length and pads the
    batch rows internally; an explicit value must divide the batch rows.
    """
    return _run_tally(
        _kernel, 2, seqs, lengths, k, table_bits, normalized, block_rows
    )


@partial(
    jax.jit,
    static_argnames=("k", "normalized", "table_bits", "block_rows"),
)
def canonical_hash_keys(
    seqs: jax.Array,
    lengths: jax.Array,
    k: int,
    table_bits: int = 20,
    normalized: bool = True,
    block_rows: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Like :func:`canonical_hash_tally` but returns ``(keys, total, fwd)``
    with invalid windows masked to -1 in ``keys`` — the exact input format
    of ``mxu_histogram16(keys, None)``.  Skips the weight plane (one fewer
    [B, L] HBM write + read per step).

    ``block_rows=None`` (default) sizes VMEM tiles from the read length and
    pads the batch rows internally (padded rows have length 0, so they emit
    nothing); an explicit value must divide the batch rows.
    """
    return _run_tally(
        _keys_kernel, 1, seqs, lengths, k, table_bits, normalized, block_rows
    )


@partial(jax.jit, static_argnames=("k", "normalized", "block_rows"))
def canonical_key_planes(
    seqs: jax.Array,
    lengths: jax.Array,
    k: int,
    normalized: bool = True,
    block_rows: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused Pallas pass for the EXACT path: full canonical (hi, lo)
    window values, sentinel-masked, plus total/forward tallies.

    Returns ``(khi, klo, total, fwd)`` where ``khi``/``klo`` are uint32
    [B, L] planes with invalid windows carrying (0xFFFFFFFF, 0xFFFFFFFF)
    — exactly what ``count.unique_counts``/``mask_keys`` consumers expect
    (flatten before sorting).  Single HBM pass vs the XLA
    encode+ladder+mask composition (~3x on v5e for 128-base reads).
    """
    khi, klo, total, fwd = _run_tally(
        _planes_kernel, 2, seqs, lengths, k, 16, normalized, block_rows
    )
    u = lambda p: jax.lax.bitcast_convert_type(p, jnp.uint32)
    return u(khi), u(klo), total, fwd


@partial(jax.jit, static_argnames=("k", "block_rows"))
def canonical_key_planes_packed(
    codes: jax.Array,
    vbits: Optional[jax.Array],
    lengths: jax.Array,
    k: int,
    block_rows: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """:func:`canonical_key_planes` over the packed 2-bit transport."""
    from .ops import unpack_codes

    seqs = unpack_codes(codes, vbits)
    khi, klo, total, fwd = _run_tally(
        _planes_kernel, 2, seqs, lengths, k, 16, True, block_rows,
        encoded=True,
    )
    u = lambda p: jax.lax.bitcast_convert_type(p, jnp.uint32)
    return u(khi), u(klo), total, fwd


@partial(jax.jit, static_argnames=("k", "table_bits", "block_rows"))
def canonical_hash_keys_packed(
    codes: jax.Array,
    vbits: Optional[jax.Array],
    lengths: jax.Array,
    k: int,
    table_bits: int = 20,
    block_rows: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`canonical_hash_keys` over the packed transport format.

    ``codes`` [B, L/4] uint8 + optional ``vbits`` [B, L/8] validity plane
    (see ``needletail_tpu.encoding``) unpack to per-base codes in one fused
    XLA pass, then the tally kernel runs with its encode stage skipped.
    The normalization mode was already applied at pack time (host LUT), so
    results equal ``canonical_hash_keys(ascii, ..., normalized=<pack mode>)``
    bit-for-bit while host->device transfer drops 4x.
    """
    from .ops import unpack_codes

    seqs = unpack_codes(codes, vbits)
    return _run_tally(
        _keys_kernel, 1, seqs, lengths, k, table_bits, True, block_rows,
        encoded=True,
    )


def _zero_nibbles8(z: jax.Array) -> jax.Array:
    """Carry-free SWAR zero-nibble test: nibble==0 -> 0x8, else 0x0.

    ``(z & 0x7..) + 0x7..`` sets bit 3 of a nibble iff its low 3 bits are
    nonzero (per-nibble sums max at 0xE, so no cross-nibble carry); OR-ing
    ``z`` back in catches nibbles with bit 3 set.  Complement-and-mask
    leaves 0x8 exactly at zero nibbles.  A subtraction-based test would be
    wrong here: its borrow propagates across nibbles and falsely flags the
    neighbour of a matching bin.
    """
    low3 = jnp.uint32(0x77777777)
    return ~(((z & low3) + low3) | z) & jnp.uint32(0x88888888)


def _packed_hist_kernel(keys_ref, counts_ref, *, rows: int):
    """One grid step: histogram ``rows`` lane-rows of 16-bit keys into the
    shared [256, 256] i32 tile via int4 MXU outer products.

    One-hot operands are built 8 bins per uint32 lane.  A key byte matches
    bin b iff its high nibble equals b>>4 AND its low nibble equals b&15;
    both nibble-compares ride as XORs against packed constants (sublane s
    covers bins 8s..8s+7, so the bin low-nibble pattern alternates between
    0x76543210 and 0xFEDCBA98 and the bin high-nibble is s>>1 replicated),
    OR-combined so a nibble is zero iff both tests pass, then converted to
    0x8 markers with a carry-free SWAR test.  ``pltpu.bitcast``
    reinterprets the [32, W] uint32 tile as [256, W] int4 — nibble n of
    sublane s lands at int4 sublane 8s+n == bin.  The 0x8 nibbles are -8
    as int4; products of two matches are 64 and one shift per grid step
    rescales (bucket sums per step stay under rows*W*64 <= 2^27).

    vs. the earlier byte-packed int8 variant this halves both the VPU
    one-hot build (32 lanes/window/side instead of 64) and the MXU time
    (int4 runs 2x int8 on v5e): 7.5ms -> 5.1ms for 16.7M keys; the
    original compare/bf16 kernel took 32.8ms.

    Keys < 0 are dropped (masked windows ride as -1).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    rep = jnp.uint32(0x11111111)
    s32 = jax.lax.broadcasted_iota(jnp.uint32, (32, 1), 0)
    cpack = jnp.where(
        (s32 & jnp.uint32(1)) != 0,
        jnp.uint32(0xFEDCBA98),
        jnp.uint32(0x76543210),
    )
    apack = (s32 >> jnp.uint32(1)) * rep

    def onehot_nib(byte_vals):  # [1, W] u32 byte -> [32, W] nibble one-hot
        xa = ((byte_vals >> jnp.uint32(4)) * rep) ^ apack
        xc = ((byte_vals & jnp.uint32(0xF)) * rep) ^ cpack
        return _zero_nibbles8(xa | xc)

    acc = jnp.zeros_like(counts_ref)
    for r in range(rows):
        key = keys_ref[r : r + 1, :]  # [1, W] int32
        ku = pltpu.bitcast(key, jnp.uint32)
        vm = jnp.where(key >= 0, jnp.uint32(0x88888888), jnp.uint32(0))
        oh_h = onehot_nib((ku >> jnp.uint32(8)) & jnp.uint32(0xFF))
        oh_l = onehot_nib(ku & jnp.uint32(0xFF)) & vm
        bh = pltpu.bitcast(oh_h, jnp.int4)  # [256, W], sublane == bin
        bl = pltpu.bitcast(oh_l, jnp.int4)
        acc = acc + jax.lax.dot_general(
            bh,
            bl,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    counts_ref[:] += acc >> jnp.int32(6)


def _hist_kernel(keys_ref, counts_ref, *, sub: int):
    """One grid step: histogram a [CHUNK, 1] block of 16-bit keys into the
    shared [256, 256] f32 tile via MXU outer products of one-hot encodings.

    counts[h, l] += sum_n onehot_hi[n, h] * onehot_lo[n, l] — a matmul.
    f32 accumulation of 0/1 products is exact below 2^24 per bucket.
    Keys < 0 are dropped (the extraction kernel marks invalid windows -1).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    keys = keys_ref[:]  # [chunk, 1] int32
    chunk = keys.shape[0]
    acc = counts_ref[:]
    for s in range(0, chunk, sub):
        k_s = keys[s : s + sub]  # [sub, 1]
        bins = jax.lax.broadcasted_iota(jnp.int32, (sub, 256), 1)
        hi_s = (k_s >> 8) & jnp.int32(0xFF)
        lo_s = k_s & jnp.int32(0xFF)
        onehot_hi = (hi_s == bins).astype(jnp.bfloat16)
        onehot_lo = ((lo_s == bins) & (k_s >= 0)).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            onehot_hi,
            onehot_lo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    counts_ref[:] = acc


@partial(jax.jit, static_argnames=("chunk", "sub"))
def mxu_histogram16(
    idx: jax.Array,
    weight: Optional[jax.Array],
    chunk: int = 32768,
    sub: int = 2048,
) -> jax.Array:
    """Exact 65,536-bin histogram of 16-bit keys via MXU outer products.

    ``idx``/``weight``: int32 [B, L]; zero-weight entries are dropped.
    ``weight=None`` means ``idx`` is already -1-masked (the output of
    :func:`canonical_hash_keys`), skipping the re-mask pass.  Returns
    int32 [65536].  Histogramming becomes matmul work instead of
    serialized scatter-adds.  65,536 bins is exactly the per-chip table
    shard of the sharded count-table design (2^20 global over a 16-chip
    mesh).

    On TPU the byte-packed int8 kernel runs (4 bins per uint32 lane +
    int8 MXU dot, ~4.3x the compare/bf16 variant, near the int8 MXU
    roofline); interpret mode (CPU tests) keeps the compare-based kernel
    because the interpreter does not model sublane-expanding bitcasts.
    """
    if idx.size >= (1 << 31):
        # the int32 accumulator is exact because one call can never feed
        # 2^31 same-bin keys; make that contract explicit at the boundary
        raise ValueError(
            f"mxu_histogram16 takes < 2^31 keys per call (got {idx.size}); "
            "split the batch to keep the int32 bins exact"
        )
    keys = idx if weight is None else jnp.where(weight > 0, idx, -1)
    keys = keys.reshape(-1)
    n = keys.shape[0]
    if _interpret():
        pad = (-n) % chunk
        if pad:
            keys = jnp.concatenate([keys, jnp.full((pad,), -1, jnp.int32)])
            n += pad
        keys = keys.reshape(n, 1)
        counts = pl.pallas_call(
            partial(_hist_kernel, sub=sub),
            grid=(n // chunk,),
            in_specs=[
                pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
            interpret=True,
        )(keys)
        return counts.astype(jnp.int32).reshape(65536)
    rows, width = 32, 1024
    pad = (-n) % (rows * width)
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), -1, jnp.int32)])
        n += pad
    keys = keys.reshape(n // width, width)
    counts = pl.pallas_call(
        partial(_packed_hist_kernel, rows=rows),
        grid=(n // (rows * width),),
        in_specs=[
            pl.BlockSpec((rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
    )(keys)
    return counts.reshape(65536)


def canonical_windows_pallas(
    seqs: jax.Array,
    lengths: jax.Array,
    k: int,
    normalized: bool = True,
    block_rows: int = _BLOCK_ROWS,
):
    """Convenience: full (hi, lo, valid, was_rc) via the XLA path — kept for
    API symmetry; the fused hash/tally kernel above is the perf path."""
    from . import kmers as _kmers

    return _kmers.canonical_kmers(seqs, lengths, k, normalized=normalized)


def _compact_kernel(*refs, chunk, slots):
    """One grid step: compact the flagged entries of 8 chunks to per-chunk
    slot prefixes — selection AS MATMUL, no scatter/gather.

    flags = counts > 0 (the distinct-run starts of ``unique_counts``
    output).  Per chunk: an inclusive prefix count of flags via one
    triangular matmul on the MXU, then slot j of the chunk selects the
    j-th flagged entry with a one-hot [slots, chunk] x [chunk] dot — the
    one-hot row (prefix == j+1 & flag) has exactly one 1, so each output
    is a single product accumulated in f32: exact.  u32 values ride as
    four u8 quarters: bf16 represents every integer <= 256, so the
    single-pass bf16 MXU path (Mosaic's DEFAULT f32 dot truncates inputs
    to bf16 — 16-bit halves lose low bits on real hardware) is exact by
    construction.  Chunks with more than ``slots`` flags overflow
    silently here; the wrapper reports a validity flag computed in XLA
    and callers fall back to the sort-based compaction.

    ``refs`` is ``(hi, lo, cnt, oh, ol, oc)`` or — narrow single-u32 keys,
    k <= 15 — ``(lo, cnt, ol, oc)``: the hi planes drop out entirely,
    cutting the one-hot value planes 12 -> 8.
    """
    if len(refs) == 6:
        hi_ref, lo_ref, cnt_ref, oh_ref, ol_ref, oc_ref = refs
    else:
        lo_ref, cnt_ref, ol_ref, oc_ref = refs
        hi_ref = oh_ref = None
    f_bool = cnt_ref[:] > 0  # [8, C]
    f_b16 = f_bool.astype(jnp.bfloat16)
    a = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = (a <= b).astype(jnp.bfloat16)  # U[a, b] = a <= b
    # inclusive prefix count: pc[r, i] = sum_{i' <= i} flags[r, i']
    pc = jax.lax.dot_general(
        f_b16, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # exact: sums of 0/1 <= chunk << 2^24
    jvec = jax.lax.broadcasted_iota(jnp.int32, (slots, chunk), 0) + 1
    hi = None if hi_ref is None else hi_ref[:]
    lo = lo_ref[:]
    cnt = cnt_ref[:].astype(jnp.uint32)
    m8 = jnp.uint32(0xFF)

    def _bf16(x_u32):
        # Mosaic has no u32->float convert; the quarters are < 2^8 so the
        # i32 reinterpretation is value-preserving and bf16-exact
        return x_u32.astype(jnp.int32).astype(jnp.bfloat16)

    def _quarters(x):
        return [_bf16((x >> (8 * (3 - q))) & m8) for q in range(4)]

    for r in range(8):
        sel = (
            (pc[r : r + 1, :] == jvec) & f_bool[r : r + 1, :]
        ).astype(jnp.bfloat16)  # [S, C]
        planes = [] if hi is None else _quarters(hi[r : r + 1, :])
        vals = jnp.concatenate(
            planes
            + _quarters(lo[r : r + 1, :])
            + _quarters(cnt[r : r + 1, :]),
            axis=0,
        )  # [12, C] (or [8, C] narrow)
        out = (
            jax.lax.dot_general(
                vals, sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            .astype(jnp.int32)  # exact: one nonzero product per sum, < 2^8
            .astype(jnp.uint32)
        )  # [12|8, S]

        def _join(base):
            return (
                (out[base : base + 1, :] << 24)
                | (out[base + 1 : base + 2, :] << 16)
                | (out[base + 2 : base + 3, :] << 8)
                | out[base + 3 : base + 4, :]
            )

        base = 0
        if oh_ref is not None:
            oh_ref[r : r + 1, :] = _join(0)
            base = 4
        ol_ref[r : r + 1, :] = _join(base)
        oc_ref[r : r + 1, :] = _join(base + 4).astype(jnp.int32)


@partial(jax.jit, static_argnames=("chunk", "slots"))
def mxu_compact_slots(
    hi: Optional[jax.Array],
    lo: jax.Array,
    counts: jax.Array,
    chunk: int = 1024,
    slots: int = 128,
) -> Tuple[Optional[jax.Array], jax.Array, jax.Array, jax.Array]:
    """Move each chunk's flagged (counts > 0) entries to a slot prefix.

    Order-preserving 8x stream reduction for ``unique_counts`` output:
    returns ``(hi_c, lo_c, counts_c, ok)`` of length ``ceil(N/chunk) *
    slots`` where every chunk's distinct entries occupy its first slots
    (in input order — so a key-sorted input stays key-sorted across the
    used slots) and empty slots carry counts == 0.  ``ok`` is a scalar
    bool: False iff some chunk had more than ``slots`` flagged entries
    (results are then invalid — fall back to the sort-based compaction).

    Cost is ~N/8 MXU one-hot MACs + one [chunk, chunk] triangular matmul
    per 8 chunks — ~6x cheaper than the 4-array stable sort at 55M lanes,
    and cascadable (apply twice for a 64x reduction, then sort the small
    remainder).  See PERF_NOTES.md for the measured comparison.

    ``hi=None`` = narrow single-u32 keys (k <= 15): 8 value planes
    instead of 12 and ``hi_c`` comes back ``None``.
    """
    n = lo.size
    lo = lo.reshape(-1)
    counts = counts.reshape(-1)
    if hi is not None:
        hi = hi.reshape(-1)
    block = 8 * chunk
    pad = (-n) % block
    if pad:
        zc = jnp.zeros((pad,), counts.dtype)
        zk = jnp.zeros((pad,), lo.dtype)
        lo = jnp.concatenate([lo, zk])
        counts = jnp.concatenate([counts, zc])
        if hi is not None:
            hi = jnp.concatenate([hi, zk])
        n += pad
    rows = n // chunk
    per_chunk = jnp.sum(
        (counts > 0).reshape(rows, chunk).astype(jnp.int32), axis=1
    )
    ok = jnp.max(per_chunk) <= slots
    lo2 = lo.reshape(rows, chunk)
    c2 = counts.reshape(rows, chunk).astype(jnp.int32)
    spec = pl.BlockSpec((8, chunk), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((8, slots), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kspec = dict(
        grid=(rows // 8,),
        interpret=_interpret(),
    )
    if hi is None:
        ol, oc = pl.pallas_call(
            partial(_compact_kernel, chunk=chunk, slots=slots),
            in_specs=[spec, spec],
            out_specs=[ospec, ospec],
            out_shape=[
                jax.ShapeDtypeStruct((rows, slots), jnp.uint32),
                jax.ShapeDtypeStruct((rows, slots), jnp.int32),
            ],
            **kspec,
        )(lo2, c2)
        return None, ol.reshape(-1), oc.reshape(-1), ok
    hi2 = hi.reshape(rows, chunk)
    oh, ol, oc = pl.pallas_call(
        partial(_compact_kernel, chunk=chunk, slots=slots),
        in_specs=[spec, spec, spec],
        out_specs=[ospec, ospec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, slots), jnp.uint32),
            jax.ShapeDtypeStruct((rows, slots), jnp.uint32),
            jax.ShapeDtypeStruct((rows, slots), jnp.int32),
        ],
        **kspec,
    )(hi2, lo2, c2)
    return oh.reshape(-1), ol.reshape(-1), oc.reshape(-1), ok
