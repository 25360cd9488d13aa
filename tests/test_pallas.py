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


class TestMxuCompactSlots:
    """mxu_compact_slots: order-preserving selection-as-matmul compaction."""

    @staticmethod
    def _oracle(hi, lo, counts, chunk=1024, slots=128):
        pad = (-hi.size) % (8 * chunk)
        hi = np.concatenate([hi, np.zeros(pad, np.uint32)])
        lo = np.concatenate([lo, np.zeros(pad, np.uint32)])
        counts = np.concatenate([counts, np.zeros(pad, np.int32)])
        rows = hi.size // chunk
        eh = np.zeros((rows, slots), np.uint32)
        el = np.zeros((rows, slots), np.uint32)
        ec = np.zeros((rows, slots), np.int32)
        ok = True
        for r in range(rows):
            sl = slice(r * chunk, (r + 1) * chunk)
            m = counts[sl] > 0
            n = int(m.sum())
            if n > slots:
                ok = False
                continue
            eh[r, :n] = hi[sl][m]
            el[r, :n] = lo[sl][m]
            ec[r, :n] = counts[sl][m]
        return eh.reshape(-1), el.reshape(-1), ec.reshape(-1), ok

    def test_matches_oracle(self):
        from needletail_tpu.device.pallas_kernels import mxu_compact_slots

        rng = np.random.default_rng(42)
        n = 30_000
        hi = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        counts = np.zeros(n, np.int32)
        flags = rng.random(n) < 0.05
        counts[flags] = rng.integers(1, 1 << 30, int(flags.sum()))
        oh, ol, oc, ok = mxu_compact_slots(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(counts)
        )
        eh, el, ec, eok = self._oracle(hi, lo, counts)
        assert bool(ok) and eok
        m = ec > 0
        assert np.array_equal(np.asarray(oc), ec)
        assert np.array_equal(np.asarray(oh)[m], eh[m])
        assert np.array_equal(np.asarray(ol)[m], el[m])

    def test_overflow_flag(self):
        from needletail_tpu.device.pallas_kernels import mxu_compact_slots

        n = 8192
        hi = np.arange(n, dtype=np.uint32)
        args = (jnp.asarray(hi), jnp.asarray(hi), jnp.ones(n, jnp.int32))
        assert not bool(mxu_compact_slots(*args)[3])

    def test_narrow_matches_wide_with_zero_hi(self):
        from needletail_tpu.device.pallas_kernels import mxu_compact_slots

        rng = np.random.default_rng(11)
        n = 30_000
        lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        counts = np.zeros(n, np.int32)
        flags = rng.random(n) < 0.05
        counts[flags] = rng.integers(1, 1 << 30, int(flags.sum()))
        oh, ol, oc, ok = mxu_compact_slots(
            None, jnp.asarray(lo), jnp.asarray(counts)
        )
        assert oh is None and bool(ok)
        wh, wl, wc, wok = mxu_compact_slots(
            jnp.zeros(n, jnp.uint32), jnp.asarray(lo), jnp.asarray(counts)
        )
        assert np.array_equal(np.asarray(ol), np.asarray(wl))
        assert np.array_equal(np.asarray(oc), np.asarray(wc))

    def test_cascade_matches_sort_compaction(self):
        from needletail_tpu.device import count as dcount

        rng = np.random.default_rng(7)
        # sorted stream with long runs (the unique_counts output shape)
        distinct = rng.choice(2**40, size=600, replace=False).astype(np.uint64)
        distinct.sort()
        reps = rng.integers(16, 200, size=600)
        keys = np.repeat(distinct, reps)
        hi = (keys >> 32).astype(np.uint32)
        lo = (keys & 0xFFFFFFFF).astype(np.uint32)
        pad = (-keys.size) % 8192
        hi = np.concatenate([hi, np.full(pad, 0xFFFFFFFF, np.uint32)])
        lo = np.concatenate([lo, np.full(pad, 0xFFFFFFFF, np.uint32)])
        hi_s, lo_s, counts = dcount.unique_counts(
            jnp.asarray(hi), jnp.asarray(lo)
        )
        got = dcount.compact_runs_cascade(hi_s, lo_s, counts)
        assert got is not None
        gh, gl, gc, gn = got
        eh, el, ec, en = dcount.compact_runs_device(hi_s, lo_s, counts)
        n = int(en)
        assert int(gn) == n == 600
        assert np.array_equal(np.asarray(gh)[:n], np.asarray(eh)[:n])
        assert np.array_equal(np.asarray(gl)[:n], np.asarray(el)[:n])
        assert np.array_equal(np.asarray(gc)[:n], np.asarray(ec)[:n])

    def test_cascade_overflow_falls_back(self):
        from needletail_tpu.device import count as dcount

        # all-singleton sorted stream: every chunk overflows 128 slots
        keys = np.arange(16384, dtype=np.uint64) * 7919
        hi = (keys >> 32).astype(np.uint32)
        lo = (keys & 0xFFFFFFFF).astype(np.uint32)
        hi_s, lo_s, counts = dcount.unique_counts(
            jnp.asarray(hi), jnp.asarray(lo)
        )
        assert dcount.compact_runs_cascade(hi_s, lo_s, counts) is None
