"""K-mer counting on device: dense spectra, targeted counts, sorted spectra.

The count table is the TPU analogue of a host hash map:

  * ``dense_spectrum`` — a ``4^k`` int32 table filled by scatter-add; exact
    and collective-friendly (tables merge with ``psum``).  Practical for
    k <= 12 (4^12 = 16.7M entries, 64 MiB HBM).
  * ``match_count`` — count occurrences of specific k-mers (the README
    ``AAAA`` tally, ref src/lib.rs:31-38) without materializing a table.
  * ``sorted_spectrum`` — exact counts for any k <= 31 via sort + segment
    boundaries on (hi, lo) pairs; returns fixed-shape arrays the host
    compacts into a dict.

All routines take ``KmerWindows`` so they compose with ``pack_kmers`` /
``canonical_kmers`` under one jit.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmers import KmerWindows

__all__ = [
    "dense_spectrum",
    "match_count",
    "valid_count",
    "forward_count",
    "sorted_spectrum",
    "spectrum_to_dict",
    "merge_spectra",
    "MAX_DENSE_K",
]

MAX_DENSE_K = 12


@partial(jax.jit, static_argnames=("k", "use_mxu"))
def dense_spectrum(windows: KmerWindows, k: int, use_mxu=None) -> jax.Array:
    """Exact counts for all 4^k k-mers (int32 [4^k]).

    On TPU, k <= 9 rides the int4 MXU histogram (the packed k-mer value IS
    the bin — exact, no hashing; 4^9 runs as four masked 2^16-bin passes),
    which is ~25x faster than XLA's serialized scatter-add for 16M keys.
    Larger k (and interpret mode) scatter-add; invalid windows scatter
    weight 0 to index 0, so padding is inert.
    """
    if k > MAX_DENSE_K:
        raise ValueError(f"dense spectrum needs k <= {MAX_DENSE_K}, got {k}")
    n_bins = 4**k
    if use_mxu is None:
        use_mxu = k <= 9 and jax.default_backend() == "tpu"
    if use_mxu:
        from .pallas_kernels import mxu_histogram16

        keys = jnp.where(
            windows.valid, windows.lo.astype(jnp.int32), jnp.int32(-1)
        )
        if n_bins <= 65536:
            return mxu_histogram16(keys, None)[:n_bins]
        parts = []
        for t in range(n_bins // 65536):
            base = jnp.int32(t * 65536)
            in_range = (keys >= base) & (keys < base + 65536)
            parts.append(
                mxu_histogram16(jnp.where(in_range, keys - base, -1), None)
            )
        return jnp.concatenate(parts)
    keys = jnp.where(windows.valid, windows.lo, 0).reshape(-1)
    weights = windows.valid.astype(jnp.int32).reshape(-1)
    table = jnp.zeros(n_bins, dtype=jnp.int32)
    return table.at[keys].add(weights)


@jax.jit
def match_count(windows: KmerWindows, target_hi: jax.Array, target_lo: jax.Array) -> jax.Array:
    """Number of valid windows equal to the target packed k-mer."""
    hit = (windows.hi == target_hi) & (windows.lo == target_lo) & windows.valid
    return jnp.sum(hit.astype(jnp.int32))


@jax.jit
def valid_count(windows: KmerWindows) -> jax.Array:
    """Total number of valid windows (k-mers emitted)."""
    return jnp.sum(windows.valid.astype(jnp.int32))


@jax.jit
def forward_count(windows: KmerWindows) -> jax.Array:
    """Number of valid windows kept in forward orientation (not rc)."""
    fwd = windows.valid & ~windows.was_rc
    return jnp.sum(fwd.astype(jnp.int32))


@jax.jit
def sorted_spectrum(windows: KmerWindows) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact spectrum for any k: sort (hi, lo) keys, segment-count runs.

    Returns ``(hi_sorted, lo_sorted, counts)`` of length B*W where
    ``counts[i]`` is the run length at the first element of each distinct
    key's run and 0 elsewhere; invalid windows sort last under the sentinel
    key (0xFFFFFFFF, 0xFFFFFFFF) with count 0.  ``spectrum_to_dict``
    compacts this on host.
    """
    sentinel = jnp.uint32(0xFFFFFFFF)
    hi = jnp.where(windows.valid, windows.hi, sentinel).reshape(-1)
    lo = jnp.where(windows.valid, windows.lo, sentinel).reshape(-1)
    # single sort key: (hi, lo) as sortable via two stable passes (lexsort)
    order = jnp.lexsort((lo, hi))
    hi_s = hi[order]
    lo_s = lo[order]
    n = hi_s.shape[0]
    prev_same = jnp.concatenate(
        [
            jnp.zeros((1,), dtype=bool),
            (hi_s[1:] == hi_s[:-1]) & (lo_s[1:] == lo_s[:-1]),
        ]
    )
    seg_id = jnp.cumsum((~prev_same).astype(jnp.int32)) - 1
    is_valid = ~((hi_s == sentinel) & (lo_s == sentinel))
    seg_counts = jnp.zeros(n, dtype=jnp.int32).at[seg_id].add(is_valid.astype(jnp.int32))
    first_of_run = ~prev_same
    counts = jnp.where(first_of_run, seg_counts[seg_id], 0)
    counts = jnp.where(is_valid, counts, 0)
    return hi_s, lo_s, counts


def spectrum_to_dict(
    hi: np.ndarray, lo: np.ndarray, counts: np.ndarray, k: int
) -> Dict[int, int]:
    """Host-side compaction of ``sorted_spectrum`` output to {kmer_value: count}."""
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    counts = np.asarray(counts)
    mask = counts > 0
    values = (hi[mask].astype(np.uint64) << np.uint64(32)) | lo[mask].astype(np.uint64)
    return {int(v): int(c) for v, c in zip(values, counts[mask])}


def merge_spectra(dicts) -> Dict[int, int]:
    """Merge per-batch spectrum dicts (host-side reduction)."""
    out: Dict[int, int] = {}
    for d in dicts:
        for kmer, c in d.items():
            out[kmer] = out.get(kmer, 0) + c
    return out
