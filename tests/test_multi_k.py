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


class TestShardedMultiK:
    """Multi-k over the mesh (VERDICT r2 #4): one fused shard_map step,
    encode shared across k; per-k results equal single-k runs."""

    def test_matches_per_k_runs(self):
        import jax

        from needletail_tpu.device.pipeline import count_file
        from needletail_tpu.parallel import (
            make_mesh,
            sharded_count_file,
            sharded_multi_k_count_file,
        )

        mesh = make_mesh(jax.devices(), data=8, table=1)
        path = "tests/data/28S.fasta"
        nb, spec = sharded_multi_k_count_file(
            path, (4, 21, 31), mesh=mesh, batch_size=128, host_workers=1
        )
        assert nb == 738_580
        _, d4 = count_file(path, k=4, batch_size=128)
        assert np.array_equal(spec[4], d4)
        for k in (21, 31):
            _, (kk, cc) = sharded_count_file(
                path, k, mesh=mesh, batch_size=128, host_workers=1
            )
            assert np.array_equal(spec[k][0], kk), k
            assert np.array_equal(spec[k][1], cc), k
        # the reference's own k=31 vectors (ref benches/benchmark.rs:43-44)
        assert int(spec[31][1].sum()) == 718_007

    def test_packed_matches_ascii(self):
        import jax

        from needletail_tpu.parallel import make_mesh, sharded_multi_k_count_file

        mesh = make_mesh(jax.devices(), data=8, table=1)
        path = "tests/data/PRJNA271013_head.fq"
        nb1, s1 = sharded_multi_k_count_file(
            path, (7, 21), mesh=mesh, batch_size=256, host_workers=1,
            packed=False,
        )
        nb2, s2 = sharded_multi_k_count_file(
            path, (7, 21), mesh=mesh, batch_size=256, host_workers=1,
            packed=True,
        )
        assert nb1 == nb2 == 250_000
        assert np.array_equal(s1[7], s2[7])
        assert np.array_equal(s1[21][0], s2[21][0])
        assert np.array_equal(s1[21][1], s2[21][1])

    def test_quality_cutoff_matches_per_k(self):
        """Quality masking shared across k equals per-k sharded runs."""
        import jax

        from needletail_tpu.parallel import (
            make_mesh,
            sharded_count_file,
            sharded_multi_k_count_file,
        )

        mesh = make_mesh(jax.devices(), data=8, table=1)
        path = "tests/data/PRJNA271013_head.fq"
        nb, spec = sharded_multi_k_count_file(
            path, (5, 17), mesh=mesh, batch_size=256, host_workers=1,
            quality_cutoff=20,
        )
        assert nb == 250_000
        from needletail_tpu.device.pipeline import count_file

        _, d5 = count_file(path, k=5, quality_cutoff=20, batch_size=256)
        assert np.array_equal(spec[5], d5)
        _, (rk, rc) = sharded_count_file(
            path, 17, mesh=mesh, batch_size=256, host_workers=1,
            quality_cutoff=20,
        )
        assert np.array_equal(spec[17][0], rk)
        assert np.array_equal(spec[17][1], rc)

    def test_bucketed_matches_plain(self, tmp_path):
        """Length-bucketed framing yields a bit-identical multi-k result."""
        import jax

        from needletail_tpu.parallel import make_mesh, sharded_multi_k_count_file

        rng = np.random.default_rng(23)
        p = tmp_path / "mix.fa"
        with open(p, "wb") as f:
            for i in range(160):
                ln = int(rng.choice([30, 80, 150]))
                seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), ln).tobytes()
                f.write(b">r%d\n" % i + seq + b"\n")
        mesh = make_mesh(jax.devices(), data=8, table=1)
        nb1, s1 = sharded_multi_k_count_file(
            p, (6, 19), mesh=mesh, batch_size=64, host_workers=1,
        )
        nb2, s2 = sharded_multi_k_count_file(
            p, (6, 19), mesh=mesh, batch_size=64, host_workers=1,
            bucketed=True,
        )
        assert nb1 == nb2
        assert np.array_equal(s1[6], s2[6])
        assert np.array_equal(s1[19][0], s2[19][0])
        assert np.array_equal(s1[19][1], s2[19][1])

    def test_differential_fuzz_vs_per_k(self, tmp_path):
        """Random corpora (N bases, mixed lengths, random qualities): the
        fused mesh pass must equal per-k single-device runs bit-for-bit.
        Shapes/ks are pinned so every trial reuses one compiled step."""
        import jax

        from needletail_tpu.device.pipeline import count_file
        from needletail_tpu.parallel import make_mesh, sharded_multi_k_count_file

        mesh = make_mesh(jax.devices(), data=8, table=1)
        # every routing class: MXU-dense (<=9), densify-at-finish (10..12),
        # narrow sparse (13..15), wide sparse (>15)
        ks = (4, 11, 13, 21)
        rng = np.random.default_rng(777)
        for trial in range(3):
            quality = trial == 2
            p = tmp_path / f"fz{trial}.{'fq' if quality else 'fa'}"
            with open(p, "wb") as f:
                for i in range(96):
                    ln = int(rng.integers(1, 90))
                    seq = rng.choice(
                        np.frombuffer(b"ACGTN", np.uint8), ln
                    ).tobytes()
                    if quality:
                        q = rng.integers(33, 74, ln, dtype=np.uint8).tobytes()
                        f.write(b"@r%d\n" % i + seq + b"\n+\n" + q + b"\n")
                    else:
                        f.write(b">r%d\n" % i + seq + b"\n")
            qc = 20 if quality else None
            nb, spec = sharded_multi_k_count_file(
                p, ks, mesh=mesh, batch_size=96, max_len=96,
                host_workers=1, quality_cutoff=qc,
            )
            for k in ks:
                if k <= 12:
                    nbr, ref = count_file(
                        p, k=k, batch_size=96, max_len=96,
                        quality_cutoff=qc, host_workers=1,
                    )
                    assert nbr == nb
                    assert np.array_equal(spec[k], ref), (trial, k)
                else:
                    _, (rk, rc) = count_file(
                        p, k=k, dense=False, sparse_format="arrays",
                        batch_size=96, max_len=96, quality_cutoff=qc,
                        host_workers=1,
                    )
                    assert np.array_equal(spec[k][0], rk), (trial, k)
                    assert np.array_equal(spec[k][1], rc), (trial, k)

    def test_north_star_full_range_4_to_31(self, tmp_path):
        """The BASELINE north-star workload verbatim: canonical 4..31-mer
        counting — all 28 k values in ONE fused pass over the mesh, each
        equal to its per-k single-device run bit-for-bit."""
        import jax

        from needletail_tpu.device.pipeline import count_file
        from needletail_tpu.parallel import make_mesh, sharded_multi_k_count_file

        mesh = make_mesh(jax.devices(), data=8, table=1)
        rng = np.random.default_rng(41)
        p = tmp_path / "ns.fa"
        with open(p, "wb") as f:
            for i in range(64):
                ln = int(rng.integers(20, 70))
                seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln)
                f.write(b">r%d\n" % i + seq.tobytes() + b"\n")
        ks = tuple(range(4, 32))
        nb, spec = sharded_multi_k_count_file(
            p, ks, mesh=mesh, batch_size=64, max_len=72, host_workers=1,
            shard_lanes=1 << 12,
        )
        assert set(spec) == set(ks)
        for k in ks:
            if k <= 12:
                _, ref = count_file(
                    p, k=k, batch_size=64, max_len=72, host_workers=1
                )
                assert np.array_equal(spec[k], ref), k
            else:
                _, (rk, rc) = count_file(
                    p, k=k, dense=False, sparse_format="arrays",
                    batch_size=64, max_len=72, host_workers=1,
                )
                assert np.array_equal(spec[k][0], rk), k
                assert np.array_equal(spec[k][1], rc), k

    def test_packed_quality_conflict(self):
        import jax

        from needletail_tpu.parallel import make_mesh, sharded_multi_k_count_file

        mesh = make_mesh(jax.devices(), data=8, table=1)
        with pytest.raises(ValueError, match="quality"):
            sharded_multi_k_count_file(
                "tests/data/PRJNA271013_head.fq", (5, 17), mesh=mesh,
                quality_cutoff=20, packed=True,
            )

    def test_short_batches_skip_wide_ks(self, tmp_path):
        import jax

        from needletail_tpu.parallel import make_mesh, sharded_multi_k_count_file

        p = tmp_path / "short.fq"
        p.write_bytes(b"@r0\nACGTACGTAC\n+\nIIIIIIIIII\n" * 64)
        mesh = make_mesh(jax.devices(), data=8, table=1)
        nb, spec = sharded_multi_k_count_file(
            p, (4, 31), mesh=mesh, batch_size=64, host_workers=1
        )
        assert nb == 640
        assert int(spec[4].sum()) == 64 * 7  # 10-base reads: 7 windows
        assert len(spec[31][0]) == 0  # no 31-mer fits a 10-base read


class TestShardedMultiKMeter:
    def test_metered_run_identical(self):
        import jax

        from needletail_tpu.parallel import (
            make_mesh,
            sharded_multi_k_count_file,
        )
        from needletail_tpu.utils.profiling import ThroughputMeter

        mesh = make_mesh(jax.devices(), data=8, table=1)
        path = "tests/data/PRJNA271013_head.fq"
        base = sharded_multi_k_count_file(
            path, (4, 21), mesh=mesh, batch_size=256, host_workers=1
        )
        meter = ThroughputMeter()
        got = sharded_multi_k_count_file(
            path, (4, 21), mesh=mesh, batch_size=256, host_workers=1,
            meter=meter,
        )
        assert base[0] == got[0]
        assert np.array_equal(base[1][4], got[1][4])
        assert np.array_equal(base[1][21][0], got[1][21][0])
        assert np.array_equal(base[1][21][1], got[1][21][1])
        d = meter.as_dict()
        for stage in ("frame", "dispatch", "drain", "wall"):
            assert stage in d, d.keys()
        assert d["wall"]["items"] == base[0]
