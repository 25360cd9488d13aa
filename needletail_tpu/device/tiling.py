"""Long-sequence tiling with (k-1)-base halos.

Whole-genome FASTA records (multi-Mbp) don't fit the short-read batch model,
and a single [1, N] row wastes the batch dimension.  The TPU-native answer
(SURVEY.md §5 "long-context"): chunk the sequence into fixed-shape tiles of
``tile_len`` bases plus a ``k-1``-base halo so every k-mer window is complete
within exactly one tile — the moral analogue of context parallelism with halo
exchange.  No window is dropped or duplicated at seams:

  * tile i covers bytes [i*tile_len, i*tile_len + tile_len + k - 1)
  * its valid windows are local positions [0, tile_len) — precisely the
    global windows starting in [i*tile_len, (i+1)*tile_len)

The reference handles long sequences by unbounded host-buffer growth and an
O(1) iterator (ref utils.rs:24-30); counts over tiles equal its stream.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple, Union

import numpy as np

from ..parser import parse_fastx_file

__all__ = ["tile_sequence", "tiled_batches", "genome_spectrum"]


def tile_sequence(
    seq: bytes, k: int, tile_len: int = 8192
) -> Tuple[np.ndarray, np.ndarray]:
    """Split one sequence into halo-overlapped tiles.

    Returns ``(tiles [T, tile_len + k - 1] uint8 zero-padded, lengths [T])``.
    Feeding these to ``canonical_kmers``/``pack_kmers`` yields exactly the
    windows of the original sequence, each once.
    """
    n = len(seq)
    width = tile_len + k - 1
    if n < k:
        return np.zeros((0, width), dtype=np.uint8), np.zeros(0, dtype=np.int32)
    num_windows = n - k + 1
    t = (num_windows + tile_len - 1) // tile_len
    tiles = np.zeros((t, width), dtype=np.uint8)
    lengths = np.zeros(t, dtype=np.int32)
    arr = np.frombuffer(seq, dtype=np.uint8)
    for i in range(t):
        start = i * tile_len
        end = min(start + width, n)
        tiles[i, : end - start] = arr[start:end]
        lengths[i] = end - start
    return tiles, lengths


def tiled_batches(
    path,
    k: int,
    tile_len: int = 8192,
    batch_tiles: int = 128,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Stream a FASTX file as fixed-shape halo-tiled batches.

    Yields ``(tiles [batch_tiles, tile_len+k-1], lengths)`` blocks; the final
    block of each file is zero-padded with empty tiles (length 0 -> every
    window invalid).  Sequences are the newline-stripped ``seq()`` bytes, so
    wrapped FASTA records tile correctly.
    """
    width = tile_len + k - 1
    pend_tiles = []
    pend_lengths = []
    reader = parse_fastx_file(path)
    while True:
        rec = reader.next()
        if rec is None:
            break
        tiles, lengths = tile_sequence(rec.seq(), k, tile_len)
        for i in range(tiles.shape[0]):
            pend_tiles.append(tiles[i])
            pend_lengths.append(lengths[i])
            if len(pend_tiles) == batch_tiles:
                yield np.stack(pend_tiles), np.asarray(pend_lengths, np.int32)
                pend_tiles, pend_lengths = [], []
    if pend_tiles:
        t = np.zeros((batch_tiles, width), dtype=np.uint8)
        l = np.zeros(batch_tiles, dtype=np.int32)
        t[: len(pend_tiles)] = np.stack(pend_tiles)
        l[: len(pend_lengths)] = pend_lengths
        yield t, l


def genome_spectrum(
    path,
    k: int,
    tile_len: int = 8192,
    batch_tiles: int = 64,
    canonical: bool = True,
    normalized: bool = True,
    dense: Optional[bool] = None,
    sparse_format: str = "dict",
    mesh=None,
) -> Tuple[int, Union[np.ndarray, Dict[int, int], Tuple[np.ndarray, np.ndarray]]]:
    """Exact k-mer spectrum of a (possibly multi-Mbp) FASTX file via halo
    tiling (BASELINE config #4: whole-bacterium k=31 spectrum).

    Returns ``(n_bases, spectrum)`` like ``pipeline.count_file`` but scales
    to arbitrarily long records with fixed device shapes.

    For large k the sparse path accumulates masked (hi, lo) key planes on
    device and resolves the whole file with ONE lexicographic device sort +
    run-length count (no per-batch host dicts).  ``sparse_format="arrays"``
    returns ``(keys_u64, counts)`` numpy arrays — for multi-Mbp genomes the
    Python dict itself is the bottleneck, so prefer arrays when consuming
    programmatically.

    ``mesh=`` shards the tiled batches over the mesh's ``data`` axis
    (tiling × sharding: genome tiles are ordinary rows, so the exact
    multi-chip sorted-run path applies; ``batch_tiles`` must divide the
    data axis).  Result is bit-identical to the single-device run.
    """
    import jax.numpy as jnp

    from . import count as _count
    from . import kmers as _kmers

    n_bases = 0
    # count bases separately (tiles double-count halo bytes)
    reader = parse_fastx_file(path)
    while True:
        rec = reader.next()
        if rec is None:
            break
        n_bases += rec.num_bases()

    if dense is None:
        dense = k <= _count.MAX_DENSE_K
    elif dense and k > _count.MAX_DENSE_K:
        raise ValueError(
            f"dense output needs k <= {_count.MAX_DENSE_K}, got {k}; "
            "use dense=False for larger k"
        )

    if mesh is not None:
        from ..parallel.exact import (
            ShardedSpectrumAccumulator,
            _require_single_process,
        )

        _require_single_process("genome_spectrum(mesh=...)")
        # round the tile-batch rows up to the data axis (extra rows are
        # zero tiles whose windows are all invalid — exact no-ops), so any
        # mesh size works without the caller reasoning about divisibility
        n_data = mesh.shape["data"]
        batch_tiles = -(-batch_tiles // n_data) * n_data
        acc = ShardedSpectrumAccumulator(
            mesh, k, canonical=canonical, normalized=normalized
        )
        for tiles, lengths in tiled_batches(path, k, tile_len, batch_tiles):
            acc.add(tiles, lengths)
        keys, counts = acc.finish()
        if dense:
            # same return type as the single-device dense run
            table = np.zeros(4**k, np.int64)
            table[keys.astype(np.int64)] = counts
            return n_bases, table
        if sparse_format == "arrays":
            return n_bases, (keys, counts)
        return n_bases, _count.spectrum_arrays_to_dict(keys, counts)

    from ..utils.limbs import acc64
    dense_limbs = None  # device-resident uint32 limb pairs (exact past 2^31)
    sparse = _count.SparseSpectrumAccumulator()
    fn = _kmers.canonical_kmers if canonical else _kmers.pack_kmers
    for tiles, lengths in tiled_batches(path, k, tile_len, batch_tiles):
        windows = fn(jnp.asarray(tiles), jnp.asarray(lengths), k, normalized=normalized)
        if dense:
            spec = _count.dense_spectrum(windows, k)
            if dense_limbs is None:
                dense_limbs = (
                    jnp.zeros(4**k, jnp.uint32),
                    jnp.zeros(4**k, jnp.uint32),
                )
            dense_limbs = acc64(*dense_limbs, spec)
        else:
            t_hi, t_lo = _count.mask_keys(windows)
            # k <= 15 keys fit one uint32: single-key flush sort
            sparse.add((None if k <= 15 else t_hi), t_lo)
    if dense:
        if dense_limbs is None:
            return n_bases, np.zeros(4**k, np.int64)
        lo, hi = dense_limbs
        from ..utils.limbs import limbs_to_int64_array

        return n_bases, limbs_to_int64_array(lo, hi)
    keys, counts = sparse.finish()
    if sparse_format == "arrays":
        return n_bases, (keys, counts)
    return n_bases, _count.spectrum_arrays_to_dict(keys, counts)
