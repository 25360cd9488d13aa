"""Quality-aware device pipelines (BASELINE config #2: parse + normalize +
quality-mask, byte-equal to the host path).

``quality_mask_batch`` masks low-quality bases to 'N' before any k-mer
work — the batched form of the reference's ``QualitySequence::quality_mask``
(ref sequence.rs:280-296).  ``masked_canonical_kmers`` composes it with the
k-mer engine under one jit: a masked base is simply an invalid code, so
windows overlapping a low-quality base vanish exactly as they would after
host-side masking.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from .kmers import KmerWindows, canonical_kmers, pack_kmers
from .ops import quality_mask

__all__ = ["quality_mask_batch", "masked_canonical_kmers", "mean_quality"]


@jax.jit
def quality_mask_batch(
    seqs: jax.Array, quals: jax.Array, lengths: jax.Array, score: jax.Array
) -> jax.Array:
    """Mask bases with quality < score to 'N'; padding stays zero."""
    masked = quality_mask(seqs, quals, score)
    pos = jnp.arange(seqs.shape[1], dtype=jnp.int32)[None, :]
    return jnp.where(pos < lengths[:, None], masked, jnp.uint8(0))


@partial(jax.jit, static_argnames=("k", "canonical", "normalized"))
def masked_canonical_kmers(
    seqs: jax.Array,
    quals: jax.Array,
    lengths: jax.Array,
    score: jax.Array,
    k: int,
    canonical: bool = True,
    normalized: bool = True,
) -> KmerWindows:
    """Canonical k-mers of the quality-masked batch (masked base -> 'N' ->
    invalid window), fused in one compiled program."""
    masked = quality_mask(seqs, quals, score)
    fn = canonical_kmers if canonical else pack_kmers
    return fn(masked, lengths, k, normalized=normalized)


@jax.jit
def mean_quality(quals: jax.Array, lengths: jax.Array, offset: jax.Array) -> jax.Array:
    """Per-read mean Phred score (f32 [B]); empty reads report 0."""
    pos = jnp.arange(quals.shape[1], dtype=jnp.int32)[None, :]
    in_read = pos < lengths[:, None]
    scores = jnp.where(in_read, quals.astype(jnp.int32) - offset, 0)
    denom = jnp.maximum(lengths, 1).astype(jnp.float32)
    return jnp.sum(scores, axis=1).astype(jnp.float32) / denom
