"""Single-pass multi-k counting vs per-k passes (BASELINE "4..31-mer")."""

import numpy as np
import pytest

from needletail_tpu.device.pipeline import count_file, multi_k_count_file


def test_matches_per_k_passes(data_dir):
    path = str(data_dir / "PRJNA271013_head.fq")
    ks = (4, 9, 13, 21, 31)
    n_bases, spectra = multi_k_count_file(path, ks, batch_size=256)
    assert n_bases == 250000
    assert set(spectra) == set(ks)
    for k in ks:
        if k <= 12:
            nb, ref = count_file(path, k=k, batch_size=256)
            assert nb == n_bases
            assert np.array_equal(spectra[k], ref)
        else:
            nb, (rk, rc) = count_file(
                path, k=k, dense=False, sparse_format="arrays", batch_size=256
            )
            gk, gc = spectra[k]
            assert np.array_equal(gk, rk)
            assert np.array_equal(gc, rc)


def test_count_file_tuple_routing(data_dir):
    path = str(data_dir / "28S.fasta")
    n_bases, spectra = count_file(path, k=(4, 31), sparse_format="arrays")
    assert n_bases == 738580
    # reference benchmark vectors (ref benches/benchmark.rs:43-44)
    _, counts31 = spectra[31]
    assert int(counts31.sum()) == 718007
    nb4, ref4 = count_file(path, k=4)
    assert np.array_equal(spectra[4], ref4)


def test_quality_cutoff_multi_k(data_dir):
    path = str(data_dir / "PRJNA271013_head.fq")
    n_bases, spectra = multi_k_count_file(
        path, (5, 15), quality_cutoff=20, batch_size=256
    )
    _, ref5 = count_file(path, k=5, quality_cutoff=20, batch_size=256)
    _, (rk, rc) = count_file(
        path, k=15, dense=False, sparse_format="arrays",
        quality_cutoff=20, batch_size=256,
    )
    assert np.array_equal(spectra[5], ref5)
    gk, gc = spectra[15]
    assert np.array_equal(gk, rk)
    assert np.array_equal(gc, rc)


def test_short_reads_skip_large_k(tmp_path):
    """Batches shorter than a k simply contribute nothing for that k."""
    p = tmp_path / "short.fa"
    p.write_bytes(b">a\nACGTACGT\n>b\nAC\n")
    n_bases, spectra = multi_k_count_file(str(p), (4, 21))
    assert n_bases == 10
    assert spectra[4].sum() == 5  # 8-4+1 windows from read a only
    keys, counts = spectra[21]
    assert len(keys) == 0


def test_rejects_bad_ks(tmp_path):
    p = tmp_path / "a.fa"
    p.write_bytes(b">r\nACGT\n")
    with pytest.raises(ValueError):
        multi_k_count_file(str(p), ())
    with pytest.raises(ValueError):
        multi_k_count_file(str(p), (0, 4))
    with pytest.raises(ValueError):
        multi_k_count_file(str(p), (32,))
    with pytest.raises(ValueError, match="multi-k"):
        count_file(str(p), k=(4, 5), bucketed=True)
