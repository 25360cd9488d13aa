"""Pallas kernel tests (interpret mode on the CPU backend) against the XLA
device path, which is itself locked to the host/reference oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from needletail_tpu.device import kmers as dkmers
from needletail_tpu.device.pallas_kernels import (
    canonical_hash_keys,
    canonical_hash_tally,
    mxu_histogram16,
)

C1 = np.uint32(0x9E3779B1)
C2 = np.uint32(0x85EBCA77)


def random_batch(b, l, seed=0, alphabet=b"ACGTNacgtu"):
    rng = np.random.default_rng(seed)
    seqs = rng.choice(list(alphabet), size=(b, l)).astype(np.uint8)
    lengths = rng.integers(0, l + 1, size=b).astype(np.int32)
    return jnp.asarray(seqs), jnp.asarray(lengths)


@pytest.mark.parametrize("k", [2, 8, 16, 17, 21, 31])
def test_canonical_hash_tally_matches_xla(k):
    s, l = random_batch(256, 128, seed=k)
    idx, w, total, fwd = canonical_hash_tally(s, l, k, table_bits=16)
    win = dkmers.canonical_kmers(s, l, k, normalized=True)
    ev = np.asarray(win.valid)
    eh = ((np.asarray(win.lo) * C1) ^ (np.asarray(win.hi) * C2)) & np.uint32(0xFFFF)
    W = ev.shape[1]
    gw = np.asarray(w)
    gi = np.asarray(idx)
    assert (gw[:, :W] == ev.astype(np.int32)).all()
    assert (gw[:, W:] == 0).all()
    assert (gi[:, :W][ev] == eh[ev].astype(np.int32)).all()
    assert int(total) == int(ev.sum())
    assert int(fwd) == int((ev & ~np.asarray(win.was_rc)).sum())


def test_canonical_hash_tally_raw_mode():
    s, l = random_batch(256, 128, seed=3)
    _, _, total, _ = canonical_hash_tally(s, l, 5, table_bits=16, normalized=False)
    win = dkmers.canonical_kmers(s, l, 5, normalized=False)
    assert int(total) == int(np.asarray(win.valid).sum())


def test_mxu_histogram16_exact():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 1 << 16, size=(64, 128)).astype(np.int32)
    w = (rng.random((64, 128)) < 0.7).astype(np.int32)
    out = np.asarray(mxu_histogram16(jnp.asarray(idx), jnp.asarray(w), chunk=4096, sub=1024))
    expected = np.bincount(idx[w > 0].reshape(-1), minlength=1 << 16)
    assert (out == expected).all()


@pytest.mark.parametrize("k", [4, 16, 21])
def test_canonical_hash_keys_matches_tally(k):
    s, l = random_batch(256, 128, seed=100 + k)
    idx, w, total, fwd = canonical_hash_tally(s, l, k, table_bits=16)
    keys, total2, fwd2 = canonical_hash_keys(s, l, k, table_bits=16)
    gk = np.asarray(keys)
    gw = np.asarray(w)
    assert int(total) == int(total2) and int(fwd) == int(fwd2)
    assert (gk[gw > 0] == np.asarray(idx)[gw > 0]).all()
    assert (gk[gw == 0] == -1).all()
    # the -1-masked keys feed the histogram without a weight plane
    h1 = np.asarray(mxu_histogram16(idx, w, chunk=4096, sub=1024))
    h2 = np.asarray(mxu_histogram16(keys, None, chunk=4096, sub=1024))
    assert (h1 == h2).all()


def test_mxu_histogram16_all_invalid():
    idx = np.zeros((32, 128), np.int32)
    w = np.zeros((32, 128), np.int32)
    out = np.asarray(mxu_histogram16(jnp.asarray(idx), jnp.asarray(w), chunk=4096, sub=1024))
    assert out.sum() == 0


def test_block_rows_validation():
    s, l = random_batch(100, 128)
    with pytest.raises(ValueError):
        canonical_hash_tally(s, l, 8, block_rows=256)


def test_overlong_reads_rejected_with_guidance():
    s, l = random_batch(8, 128)
    import jax.numpy as jnp
    big = jnp.zeros((8, 70000), jnp.uint8)
    with pytest.raises(ValueError, match="tile long records"):
        canonical_hash_keys(big, jnp.zeros(8, jnp.int32), 21)
