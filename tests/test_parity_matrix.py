"""Composition parity matrix (VERDICT-9): every framing front x counting
path x masking option agrees with the reference-semantics host oracle on
one randomized adversarial corpus (mixed lengths, Ns, lowercase, CRLF).
"""

import gzip

import numpy as np
import pytest

from needletail_tpu.device.pipeline import count_file, hash_count_file


def _mask_seq(seq: bytes, qual: bytes, cutoff: int, offset: int = 33) -> bytes:
    return bytes(
        b if q >= offset + cutoff else ord("N") for b, q in zip(seq, qual)
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(99)
    d = tmp_path_factory.mktemp("matrix")
    reads = []
    for i in range(1200):
        ln = int(rng.choice([31, 36, 75, 100, 150, 240]))
        seq = bytes(
            rng.choice(np.frombuffer(b"ACGTNacgtn", np.uint8), ln)
        )
        qual = bytes(rng.integers(33, 74, ln, dtype=np.uint8))
        crlf = i % 7 == 0
        reads.append((b"r%d" % i, seq, qual, crlf))
    parts = []
    for rid, seq, qual, crlf in reads:
        e = b"\r\n" if crlf else b"\n"
        parts.append(b"@" + rid + e + seq + e + b"+" + e + qual + e)
    plain = d / "m.fq"
    plain.write_bytes(b"".join(parts))
    gz = d / "m.fq.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    return {"reads": reads, "plain": str(plain), "gz": str(gz)}


def _oracle(corpus, k, quality_cutoff=None):
    """Host spectrum {packed: count} with reference semantics."""
    import needletail_tpu.sequence as seqops
    from needletail_tpu.bitkmer import bytes_to_bitmer
    from needletail_tpu.kmer import canonical_kmers

    out = {}
    for _, seq, qual, _ in corpus["reads"]:
        if quality_cutoff is not None:
            seq = _mask_seq(seq, qual, quality_cutoff)
        norm = seqops.normalize(seq, False) or seq
        rc = seqops.reverse_complement(norm)
        for (_, kmer, _) in canonical_kmers(norm, rc, k):
            v, _ = bytes_to_bitmer(kmer)
            out[v] = out.get(v, 0) + 1
    return out


def _dense_to_dict(spec):
    idx = np.flatnonzero(spec)
    return {int(i): int(spec[i]) for i in idx}


FRONTS = [
    ("plain", {}),
    ("bucketed", {"bucketed": True}),
    ("workers", {"host_workers": 2}),
]


@pytest.mark.parametrize("front,kw", FRONTS, ids=[f[0] for f in FRONTS])
@pytest.mark.parametrize("cutoff", [None, 25], ids=["nomask", "qmask"])
def test_dense_k7(corpus, front, kw, cutoff):
    n_bases, spec = count_file(
        corpus["plain"], k=7, batch_size=256,
        quality_cutoff=cutoff, **kw,
    )
    assert _dense_to_dict(spec) == _oracle(corpus, 7, cutoff)


@pytest.mark.parametrize("front,kw", FRONTS, ids=[f[0] for f in FRONTS])
def test_sparse_k17(corpus, front, kw):
    _, (keys, counts) = count_file(
        corpus["plain"], k=17, dense=False, sparse_format="arrays",
        batch_size=256, **kw,
    )
    assert dict(zip(keys.tolist(), counts.tolist())) == _oracle(corpus, 17)


def test_gz_spill_workers(corpus):
    _, spec = count_file(corpus["gz"], k=7, host_workers=2, batch_size=256)
    assert _dense_to_dict(spec) == _oracle(corpus, 7)


def test_hash_tally_matches_oracle_total(corpus):
    oracle = _oracle(corpus, 21)
    n_bases, total, fwd, table = hash_count_file(
        corpus["plain"], k=21, batch_size=1024
    )
    assert total == sum(oracle.values())
    assert int(table.sum()) == total


def test_multi_k_matches(corpus):
    _, spectra = count_file(
        corpus["plain"], k=(7, 17), sparse_format="arrays", batch_size=256
    )
    assert _dense_to_dict(spectra[7]) == _oracle(corpus, 7)
    keys, counts = spectra[17]
    assert dict(zip(keys.tolist(), counts.tolist())) == _oracle(corpus, 17)


def test_minimizer_transport_matrix(corpus):
    """VERDICT r4 #4: the minimizer driver joins the matrix — packed and
    ASCII transports produce one identical sketch on the adversarial
    corpus (Ns, lowercase, CRLF, mixed lengths)."""
    from needletail_tpu.device.pipeline import minimizer_spectrum_file

    outs = {}
    for packed in (False, True):
        nb, (keys, counts) = minimizer_spectrum_file(
            corpus["plain"], k=11, w=5, batch_size=256, packed=packed
        )
        outs[packed] = (nb, keys, counts)
    assert outs[False][0] == outs[True][0]
    assert np.array_equal(outs[False][1], outs[True][1])
    assert np.array_equal(outs[False][2], outs[True][2])


def test_multi_k_checkpointed_matches(corpus, tmp_path):
    """Checkpointing the fused multi-k stream doesn't perturb results."""
    ref_n, ref = count_file(
        corpus["plain"], k=(7, 17), sparse_format="arrays", batch_size=256
    )
    n, spectra = count_file(
        corpus["plain"], k=(7, 17), sparse_format="arrays", batch_size=256,
        checkpoint_every=2, checkpoint_path=str(tmp_path / "mk.npz"),
        host_workers=1,
    )
    assert n == ref_n
    assert np.array_equal(spectra[7], ref[7])
    assert np.array_equal(spectra[17][0], ref[17][0])
    assert np.array_equal(spectra[17][1], ref[17][1])


def test_tiled_long_record(tmp_path):
    """(k-1)-halo tiling on one long record equals the window-free oracle."""
    import needletail_tpu.sequence as seqops
    from needletail_tpu.bitkmer import bytes_to_bitmer
    from needletail_tpu.device.tiling import genome_spectrum
    from needletail_tpu.kmer import canonical_kmers

    rng = np.random.default_rng(5)
    seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), 50_000))
    p = tmp_path / "g.fa"
    p.write_bytes(b">g\n" + seq + b"\n")
    k = 21
    n_bases, (keys, counts) = genome_spectrum(
        str(p), k=k, sparse_format="arrays", dense=False
    )
    oracle = {}
    rc = seqops.reverse_complement(seq)
    for (_, kmer, _) in canonical_kmers(seq, rc, k):
        v, _ = bytes_to_bitmer(kmer)
        oracle[v] = oracle.get(v, 0) + 1
    assert dict(zip(keys.tolist(), counts.tolist())) == oracle
