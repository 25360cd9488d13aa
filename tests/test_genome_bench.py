"""BASELINE config #4 machinery (VERDICT r3 #3): the genome benchmark's
device flush (ladder extraction -> sort -> run-length -> compaction ->
mod-2^32 spectrum checksum) must agree with the host-oracle
``genome_spectrum`` path, and the synthetic genome must be byte-stable
across rounds (the golden asserts in bench.py depend on it)."""

import hashlib

import numpy as np
import pytest

from needletail_tpu.utils.synth import synthetic_genome

N = 200_000
K = 31


def test_synthetic_genome_deterministic():
    a = synthetic_genome(N, seed=31)
    b = synthetic_genome(N, seed=31)
    assert a == b
    assert a.startswith(b">synth ")
    seq = bytes(a[a.index(b"\n") + 1 :]).replace(b"\n", b"")
    assert len(seq) == N
    assert set(seq) <= set(b"ACGT")
    # bench.py's 5 Mbp goldens ride on this exact byte stream staying
    # fixed; lock the prefix generator via a digest of the small case
    assert hashlib.sha256(a).hexdigest() == (
        "dd74a0f992c6ffe4969480b66b5cce1ee89c9fce7b23430d28b513f9e83f4c53"
    )


def test_synthetic_genome_line_wrap():
    fa = synthetic_genome(1003, seed=7, line_width=60)
    lines = fa.split(b"\n")
    assert lines[0].startswith(b">")
    body = lines[1:-1] if lines[-1] == b"" else lines[1:]
    assert all(len(l) == 60 for l in body[:-1])
    assert len(body[-1]) == 1003 % 60
    assert sum(len(l) for l in body) == 1003


@pytest.fixture(scope="module")
def genome_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("genome") / "synth.fa"
    p.write_bytes(synthetic_genome(N, seed=31))
    return str(p)


def test_bench_flush_matches_host_oracle(genome_file):
    import jax
    import jax.numpy as jnp

    from needletail_tpu.device import count as _count
    from needletail_tpu.device import kmers as _kmers
    from needletail_tpu.device.tiling import genome_spectrum, tile_sequence

    # host-oracle spectrum (the correctness-tested path)
    n_bases, (keys, counts) = genome_spectrum(
        genome_file, K, sparse_format="arrays"
    )
    assert n_bases == N
    M = np.uint64(0xFFFFFFFF)
    c = counts.astype(np.uint64)
    want = (
        len(keys),
        int(counts.sum()),
        int(((keys & M) * c).sum() & M),
        int(((keys >> np.uint64(32)) * c).sum() & M),
    )

    # bench.py's one-flush device-resident formulation
    fa = open(genome_file, "rb").read()
    seq = bytes(fa[fa.index(b"\n") + 1 :]).replace(b"\n", b"")
    tiles, lens = tile_sequence(seq, K, tile_len=8192)

    @jax.jit
    def flush(tiles, lengths):
        win = _kmers.canonical_kmers(tiles, lengths, K)
        hi, lo = _count.mask_keys(win)
        pad = (-lo.shape[0]) % (1 << 20)
        if pad:
            fill = jnp.full((pad,), 0xFFFFFFFF, dtype=jnp.uint32)
            hi = jnp.concatenate([hi, fill])
            lo = jnp.concatenate([lo, fill])
        hi_s, lo_s, cnt = _count.unique_counts(hi, lo)
        hi_c, lo_c, c_c, n = _count.compact_runs_device(hi_s, lo_s, cnt)
        cu = c_c.astype(jnp.uint32)
        return jnp.stack(
            [
                n.astype(jnp.uint32),
                cnt.sum().astype(jnp.uint32),
                jnp.sum(lo_c * cu, dtype=jnp.uint32),
                jnp.sum(hi_c * cu, dtype=jnp.uint32),
            ]
        )

    got = np.asarray(flush(jnp.asarray(tiles), jnp.asarray(lens)))
    assert tuple(int(x) for x in got) == want
