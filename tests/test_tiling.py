"""Halo-tiling tests: seam exactness vs the host bitkmer oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from needletail_tpu import bitkmer as hb
from needletail_tpu.device import count as dcount
from needletail_tpu.device import kmers as dkmers
from needletail_tpu.device.tiling import genome_spectrum, tile_sequence, tiled_batches
from conftest import DATA_DIR


def host_spectrum(seq, k):
    out = {}
    for (_, (v, _), _) in hb.bit_kmers(seq, k, True):
        out[v] = out.get(v, 0) + 1
    return out


def device_spectrum_from_tiles(seq, k, tile_len):
    tiles, lengths = tile_sequence(seq, k, tile_len)
    if tiles.shape[0] == 0:
        return {}
    win = dkmers.canonical_kmers(jnp.asarray(tiles), jnp.asarray(lengths), k,
                                 normalized=False)
    hi, lo, counts = dcount.sorted_spectrum(win)
    return dcount.spectrum_to_dict(hi, lo, counts, k)


@pytest.mark.parametrize("n,k,tile_len", [
    (1000, 31, 128),     # many seams
    (1024, 21, 256),     # windows divide evenly
    (500, 31, 470),      # window count == tile_len exactly
    (31, 31, 64),        # single window
    (30, 31, 64),        # shorter than k -> empty
    (997, 17, 100),      # prime-ish sizes
])
def test_tiled_spectrum_matches_host(n, k, tile_len):
    rng = np.random.default_rng(n * 1000 + k)
    seq = bytes(rng.choice(list(b"ACGTNacgt"), size=n).astype(np.uint8))
    assert device_spectrum_from_tiles(seq, k, tile_len) == host_spectrum(seq, k)


def test_window_counts_at_seams():
    # every global window must appear exactly once across tiles
    rng = np.random.default_rng(7)
    seq = bytes(rng.choice(list(b"ACGT"), size=777).astype(np.uint8))
    k, tile_len = 11, 64
    tiles, lengths = tile_sequence(seq, k, tile_len)
    win = dkmers.pack_kmers(jnp.asarray(tiles), jnp.asarray(lengths), k,
                            normalized=False)
    assert int(np.asarray(win.valid).sum()) == len(seq) - k + 1


def test_genome_spectrum_dense(tmp_path):
    rng = np.random.default_rng(11)
    genome = bytes(rng.choice(list(b"ACGTN"), size=50_000,
                              p=[0.24, 0.24, 0.24, 0.24, 0.04]).astype(np.uint8))
    fa = tmp_path / "genome.fa"
    fa.write_bytes(b">chr1\n" + b"\n".join(
        genome[i : i + 70] for i in range(0, len(genome), 70)) + b"\n")
    n_bases, spec = genome_spectrum(fa, k=7, tile_len=1024, batch_tiles=16)
    assert n_bases == 50_000
    host = host_spectrum(genome, 7)
    got = {i: int(c) for i, c in enumerate(np.asarray(spec)) if c}
    assert got == host


def test_genome_spectrum_large_k(tmp_path):
    rng = np.random.default_rng(13)
    genome = bytes(rng.choice(list(b"ACGT"), size=30_000).astype(np.uint8))
    fa = tmp_path / "genome.fa"
    fa.write_bytes(b">contig\n" + genome + b"\n")
    n_bases, spec = genome_spectrum(fa, k=31, tile_len=2048, batch_tiles=8)
    assert n_bases == 30_000
    assert spec == host_spectrum(genome, 31)


def test_tiled_batches_multi_record(tmp_path):
    fa = tmp_path / "two.fa"
    fa.write_bytes(b">a\n" + b"ACGT" * 100 + b"\n>b\n" + b"TTGGCC" * 80 + b"\n")
    total_windows = 0
    k, tile_len = 9, 50
    for tiles, lengths in tiled_batches(fa, k, tile_len, batch_tiles=4):
        win = dkmers.pack_kmers(jnp.asarray(tiles), jnp.asarray(lengths), k,
                                normalized=False)
        total_windows += int(np.asarray(win.valid).sum())
    assert total_windows == (400 - k + 1) + (480 - k + 1)


class TestCompressedCounting:
    """BASELINE config #3: gzip-compressed FASTQ streaming with k=21
    counting must equal the plain-file spectrum exactly."""

    def test_gzip_fastq_k21_spectrum_equality(self, tmp_path):
        import gzip

        from needletail_tpu.device.pipeline import count_file

        src = (DATA_DIR / "PRJNA271013_head.fq").read_bytes()
        # keep CPU runtime modest: first 200 records (4 lines each)
        head = b"\n".join(src.split(b"\n")[: 200 * 4]) + b"\n"
        plain = tmp_path / "h.fq"
        plain.write_bytes(head)
        gz = tmp_path / "h.fq.gz"
        gz.write_bytes(gzip.compress(head))

        nb1, (k1, c1) = count_file(str(plain), k=21, sparse_format="arrays")
        nb2, (k2, c2) = count_file(str(gz), k=21, sparse_format="arrays")
        assert nb1 == nb2 > 0
        assert np.array_equal(k1, k2) and np.array_equal(c1, c2)

    def test_sparse_arrays_match_dict(self, tmp_path):
        from needletail_tpu.device.pipeline import count_file

        src = (DATA_DIR / "PRJNA271013_head.fq").read_bytes()
        head = b"\n".join(src.split(b"\n")[: 50 * 4]) + b"\n"
        p = tmp_path / "h.fq"
        p.write_bytes(head)
        _, (keys, counts) = count_file(str(p), k=17, sparse_format="arrays")
        _, d = count_file(str(p), k=17)
        assert d == {int(key): int(c) for key, c in zip(keys, counts)}


def test_genome_spectrum_mesh_matches_single_device(tmp_path):
    """Tiling x sharding: the mesh path must be bit-identical."""
    from needletail_tpu.device.tiling import genome_spectrum
    from needletail_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), 60_000))
    p = tmp_path / "g.fa"
    p.write_bytes(b">g\n" + seq + b"\n")
    single = genome_spectrum(
        str(p), k=21, tile_len=2048, batch_tiles=16,
        dense=False, sparse_format="arrays",
    )
    mesh = make_mesh(data=8, table=1)
    sharded = genome_spectrum(
        str(p), k=21, tile_len=2048, batch_tiles=16,
        sparse_format="arrays", mesh=mesh,
    )
    assert single[0] == sharded[0]
    assert np.array_equal(single[1][0], sharded[1][0])
    assert np.array_equal(single[1][1], sharded[1][1])


def test_genome_spectrum_mesh_rounds_batch_tiles(tmp_path):
    """ADVICE r2: batch_tiles that don't divide the data axis round up
    internally (extra zero tiles are exact no-ops)."""
    from needletail_tpu.device.tiling import genome_spectrum
    from needletail_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 9_000))
    p = tmp_path / "g.fa"
    p.write_bytes(b">g\n" + seq + b"\n")
    single = genome_spectrum(
        str(p), k=15, tile_len=1024, batch_tiles=3,
        dense=False, sparse_format="arrays",
    )
    mesh = make_mesh(data=8, table=1)
    sharded = genome_spectrum(
        str(p), k=15, tile_len=1024, batch_tiles=3,
        sparse_format="arrays", mesh=mesh,
    )
    assert single[0] == sharded[0]
    assert np.array_equal(single[1][0], sharded[1][0])
    assert np.array_equal(single[1][1], sharded[1][1])
