"""Device minimizer + quality pipeline tests vs host oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from needletail_tpu import bitkmer as hb
from needletail_tpu import sequence as hs
from needletail_tpu.device.minimizers import global_minimizer, window_minimizers
from needletail_tpu.device.quality import (
    masked_canonical_kmers,
    mean_quality,
    quality_mask_batch,
)


def batch_of(seqs, quals=None, max_len=None):
    L = max_len or max(len(s) for s in seqs)
    arr = np.zeros((len(seqs), L), dtype=np.uint8)
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    q = None
    if quals is not None:
        q = np.zeros((len(seqs), L), dtype=np.uint8)
        for i, s in enumerate(quals):
            q[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    return (
        jnp.asarray(arr),
        jnp.asarray(lengths),
        jnp.asarray(q) if q is not None else None,
    )


def host_min_canonical(seq, k):
    vals = [v for (_, (v, _), _) in hb.bit_kmers(seq, k, True)]
    return min(vals) if vals else None


class TestGlobalMinimizer:
    @pytest.mark.parametrize("k", [3, 15, 21, 31])
    def test_matches_host_canonical_min(self, k):
        rng = np.random.default_rng(k)
        seqs = [
            bytes(rng.choice(list(b"ACGTN"), size=int(rng.integers(k, 70))).astype(np.uint8))
            for _ in range(8)
        ]
        s, l, _ = batch_of(seqs, max_len=80)
        hi, lo, any_valid = global_minimizer(s, l, k, normalized=False)
        for i, seq in enumerate(seqs):
            expected = host_min_canonical(seq, k)
            if expected is None:
                assert not bool(any_valid[i])
            else:
                got = (int(hi[i]) << 32) | int(lo[i])
                assert got == expected, (seq, k)

    def test_matches_reference_byte_minimizer_on_acgt(self):
        # For pure-ACGT input the canonical-value min equals the reference's
        # lexicographic byte minimizer (ref sequence.rs:139-152)
        seq = b"ATTTCG"
        s, l, _ = batch_of([seq])
        hi, lo, ok = global_minimizer(s, l, 3, normalized=False)
        got = hb.bitmer_to_bytes((int(lo[0]), 3))
        assert got == hs.minimizer(seq, 3) == b"AAA"


class TestWindowMinimizers:
    def test_sliding_min(self):
        rng = np.random.default_rng(5)
        seq = bytes(rng.choice(list(b"ACGT"), size=60).astype(np.uint8))
        k, w = 7, 5
        s, l, _ = batch_of([seq])
        sk = window_minimizers(s, l, k, w, normalized=False)
        vals = {p: v for (p, (v, _), _) in hb.bit_kmers(seq, k, True)}
        hi = np.asarray(sk.hi)[0]
        lo = np.asarray(sk.lo)[0]
        valid = np.asarray(sk.valid)[0]
        for p in range(len(seq) - k + 1 - w + 1):
            window_vals = [vals.get(p + j) for j in range(w)]
            if all(v is not None for v in window_vals):
                assert bool(valid[p])
                assert ((int(hi[p]) << 32) | int(lo[p])) == min(window_vals)
        # N-containing sketch windows are invalid
        seq2 = b"ACGTNACGTACGT"
        s2, l2, _ = batch_of([seq2])
        sk2 = window_minimizers(s2, l2, 3, 3, normalized=False)
        assert not bool(np.asarray(sk2.valid)[0][2])  # covers the N


class TestQuality:
    def test_mask_matches_host(self):
        seqs = [b"AGCT", b"ACGTACGT"]
        quals = [b"AAA0", b"IIII!!II"]
        s, l, q = batch_of(seqs, quals)
        out = np.asarray(quality_mask_batch(s, q, l, jnp.uint8(ord("5"))))
        for i, (sq, ql) in enumerate(zip(seqs, quals)):
            assert bytes(out[i, : len(sq)]) == hs.quality_mask(sq, ql, ord("5"))
            assert not out[i, len(sq):].any()

    def test_masked_kmers_drop_low_quality_windows(self):
        seq = b"ACGTACGTACGT"
        qual = b"IIII!IIIIIII"  # one bad base at position 4
        s, l, q = batch_of([seq], [qual])
        win = masked_canonical_kmers(s, q, l, jnp.uint8(ord("5")), k=4,
                                     normalized=False)
        masked = hs.quality_mask(seq, qual, ord("5"))
        expected_pos = [p for (p, _, _) in hb.bit_kmers(masked, 4, True)]
        got_pos = np.nonzero(np.asarray(win.valid)[0])[0].tolist()
        assert got_pos == expected_pos

    def test_mean_quality(self):
        s, l, q = batch_of([b"ACGT"], [b"IIII"])
        mq = np.asarray(mean_quality(q, l, jnp.int32(33)))
        assert mq[0] == pytest.approx(40.0)


class TestMinimizerSpectrumFile:
    def test_matches_batch_oracle(self, tmp_path):
        import collections

        from needletail_tpu.device import count as dcount
        from needletail_tpu.device import minimizers as dmin
        from needletail_tpu.device.pipeline import minimizer_spectrum_file
        from needletail_tpu.io.fast_batch import fast_read_batches

        rng = np.random.default_rng(6)
        p = tmp_path / "m.fq"
        with open(p, "wb") as f:
            for i in range(30):
                ln = int(rng.integers(5, 80))
                seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln).tobytes()
                f.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * ln + b"\n")
        k, w = 7, 5
        # oracle: window_minimizers per batch, host counting
        host = collections.Counter()
        for b in fast_read_batches(str(p), batch_size=8):
            if b.max_len < k + w - 1:
                continue
            win = dmin.window_minimizers(
                jnp.asarray(b.seqs), jnp.asarray(b.lengths), k, w
            )
            hi = np.asarray(win.hi)[np.asarray(win.valid)]
            lo = np.asarray(win.lo)[np.asarray(win.valid)]
            for h, l in zip(hi, lo):
                host[(int(h) << 32) | int(l)] += 1
        n_bases, (keys, counts) = minimizer_spectrum_file(str(p), k=k, w=w, batch_size=8)
        assert dict(zip(keys.tolist(), counts.tolist())) == dict(host)

    def test_packed_transport_matches_ascii(self, tmp_path):
        """VERDICT r4 #4: the packed (2-bit wire) minimizer path is
        bit-identical to the ASCII one, including N-dirty reads (lean or
        dense validity)."""
        from needletail_tpu.device.pipeline import minimizer_spectrum_file

        rng = np.random.default_rng(17)
        p = tmp_path / "m.fq"
        with open(p, "wb") as f:
            for i in range(60):
                ln = int(rng.integers(5, 90))
                seq = rng.choice(
                    np.frombuffer(b"ACGTACGTN", np.uint8), ln
                ).tobytes()
                f.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * ln + b"\n")
        k, w = 11, 4
        nb_a, (ka, ca) = minimizer_spectrum_file(
            str(p), k=k, w=w, batch_size=16, packed=False
        )
        nb_p, (kp, cp) = minimizer_spectrum_file(
            str(p), k=k, w=w, batch_size=16, packed=True
        )
        assert nb_a == nb_p
        assert np.array_equal(ka, kp)
        assert np.array_equal(ca, cp)

    def test_meter_stages(self, data_dir):
        """meter= attributes frame/h2d/dispatch/drain/wall stages."""
        from needletail_tpu.device.pipeline import minimizer_spectrum_file
        from needletail_tpu.utils.profiling import ThroughputMeter

        meter = ThroughputMeter()
        fa = str(data_dir / "28S.fasta")
        nb, _ = minimizer_spectrum_file(
            fa, k=9, w=5, batch_size=64, meter=meter
        )
        stages = meter.stages
        assert {"frame", "h2d", "dispatch", "drain", "wall"} <= set(stages)
        assert stages["wall"].items == nb

    def test_packed_on_mesh_rejected(self, data_dir):
        import jax

        from needletail_tpu.device.pipeline import minimizer_spectrum_file
        from needletail_tpu.parallel import make_mesh

        mesh = make_mesh(jax.devices(), data=8, table=1)
        with pytest.raises(ValueError, match="ASCII"):
            minimizer_spectrum_file(
                str(data_dir / "28S.fasta"), k=9, w=5, mesh=mesh,
                packed=True,
            )

    def test_sharded_matches_single_device(self, tmp_path, data_dir):
        """minimizer_spectrum_file(mesh=...) — per-chip sketches inside
        shard_map + host merge — equals the single-device run bit-for-bit
        (narrow k<=15 and wide k>15 both)."""
        import jax

        from needletail_tpu.device.pipeline import minimizer_spectrum_file
        from needletail_tpu.parallel import make_mesh

        mesh = make_mesh(jax.devices(), data=8, table=1)
        fa = str(data_dir / "28S.fasta")
        for k, w in ((9, 11), (21, 5)):
            nb, (rk, rc) = minimizer_spectrum_file(fa, k=k, w=w, batch_size=64)
            nbm, (mk, mc) = minimizer_spectrum_file(
                fa, k=k, w=w, batch_size=64, mesh=mesh
            )
            assert nb == nbm == 738_580
            assert np.array_equal(rk, mk), (k, w)
            assert np.array_equal(rc, mc), (k, w)


class TestQualityFilterFile:
    def test_filters_by_mean_quality(self, tmp_path):
        from needletail_tpu.device.pipeline import quality_filter_file
        from needletail_tpu.parser import parse_fastx_file

        p = tmp_path / "in.fq"
        # read a: all 'I' (Q40); read b: all '#' (Q2); read c: mixed
        p.write_bytes(
            b"@a desc\nACGT\n+\nIIII\n"
            b"@b\nGGGG\n+\n####\n"
            b"@c\nACAC\n+\nII##\n"
        )
        out = tmp_path / "out.fq"
        n_in, n_kept = quality_filter_file(str(p), str(out), min_mean_quality=20.0)
        assert (n_in, n_kept) == (3, 2)  # a (40) and c (21) survive
        recs = []
        r = parse_fastx_file(str(out))
        while (rec := r.next()) is not None:
            recs.append((bytes(rec.id()), bytes(rec.seq()), bytes(rec.qual())))
        assert recs == [
            (b"a desc", b"ACGT", b"IIII"),
            (b"c", b"ACAC", b"II##"),
        ]

    def test_rejects_fasta(self, tmp_path, data_dir):
        from needletail_tpu.device.pipeline import quality_filter_file

        with pytest.raises(ValueError, match="FASTQ"):
            quality_filter_file(str(data_dir / "test.fa"), str(tmp_path / "o.fq"), 10)


def test_minimizer_spectrum_multi_file(tmp_path):
    """The minimizer driver rides the shared input front: a list of paths
    accumulates one sketch, equal to the concatenated-file run."""
    import numpy as np

    from needletail_tpu.device.pipeline import minimizer_spectrum_file

    src = open("tests/data/PRJNA271013_head.fq", "rb").read()
    a, b = tmp_path / "a.fq", tmp_path / "b.fq"
    cut = src.index(b"\n@", len(src) // 2) + 1
    a.write_bytes(src[:cut])
    b.write_bytes(src[cut:])
    nb_ref, (k_ref, c_ref) = minimizer_spectrum_file(
        "tests/data/PRJNA271013_head.fq", k=11, w=5, host_workers=1
    )
    nb, (keys, counts) = minimizer_spectrum_file(
        [str(a), str(b)], k=11, w=5, host_workers=1, max_len=128
    )
    assert nb == nb_ref == 250_000
    assert np.array_equal(keys, k_ref)
    assert np.array_equal(counts, c_ref)
