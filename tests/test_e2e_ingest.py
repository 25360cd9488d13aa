"""E2E ingest front: BGZF parallel decode, spill, double-buffered feed.

These lock the VERDICT-1 pipeline: compressed input -> (parallel) decode ->
range-split multi-worker framing -> device counting, with bit-identical
results to the plain single-stream path.
"""

import gzip
import io
import os

import numpy as np
import pytest

from needletail_tpu.io.bgzf import (
    BGZF_EOF,
    BGZFReader,
    is_bgzf,
    scan_bgzf_blocks,
    write_bgzf,
)
from needletail_tpu.io.feed import device_feed
from needletail_tpu.io.spill import decompress_to_spill, spilled_input


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    src = open("tests/data/PRJNA271013_head.fq", "rb").read() * 4
    plain = d / "reads.fq"
    plain.write_bytes(src)
    bg = d / "reads.fq.bgz"
    write_bgzf(src, bg, block_size=50_000)
    gz = d / "reads.fq.gz"
    gz.write_bytes(gzip.compress(src))
    return {"src": src, "plain": plain, "bgzf": bg, "gz": gz}


class TestBGZF:
    def test_is_bgzf(self, corpus):
        assert is_bgzf(corpus["bgzf"])
        assert not is_bgzf(corpus["gz"])
        assert not is_bgzf(corpus["plain"])

    def test_gzip_compatible(self, corpus):
        """BGZF output must decode with plain (multi-member) gzip."""
        assert gzip.decompress(corpus["bgzf"].read_bytes()) == corpus["src"]

    def test_block_scan(self, corpus):
        data = corpus["bgzf"].read_bytes()
        blocks = scan_bgzf_blocks(data)
        assert sum(s for _, s in blocks) == len(data)
        assert blocks[-1][1] == len(BGZF_EOF)

    def test_parallel_reader_roundtrip(self, corpus):
        r = BGZFReader(corpus["bgzf"], threads=4, lookahead=3)
        assert r.read() == corpus["src"]
        r.close()

    def test_reader_small_reads(self, corpus):
        r = BGZFReader(corpus["bgzf"], threads=2)
        out = bytearray()
        while chunk := r.read(12345):
            out += chunk
        r.close()
        assert bytes(out) == corpus["src"]

    def test_readinto(self, corpus):
        r = BGZFReader(corpus["bgzf"], threads=2)
        buf = bytearray(len(corpus["src"]) + 100)
        n = r.readinto(buf)
        r.close()
        assert n == len(corpus["src"])
        assert bytes(buf[:n]) == corpus["src"]

    def test_corrupt_block_raises(self, tmp_path, corpus):
        data = bytearray(corpus["bgzf"].read_bytes())
        data[200] ^= 0xFF  # flip a payload byte in the first block
        p = tmp_path / "bad.bgz"
        p.write_bytes(bytes(data))
        r = BGZFReader(p, threads=2)
        with pytest.raises(Exception):
            r.read()
        r.close()

    def test_incompressible_data_stored(self, tmp_path):
        rng = np.random.default_rng(7)
        blob = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
        p = tmp_path / "rand.bgz"
        write_bgzf(blob, p, block_size=60_000)
        assert gzip.decompress(p.read_bytes()) == blob
        r = BGZFReader(p)
        assert r.read() == blob
        r.close()


class TestSpill:
    def test_spill_bgzf(self, corpus):
        p = decompress_to_spill(corpus["bgzf"], threads=4)
        try:
            assert open(p, "rb").read() == corpus["src"]
        finally:
            os.unlink(p)

    def test_spill_gz(self, corpus):
        p = decompress_to_spill(corpus["gz"])
        try:
            assert open(p, "rb").read() == corpus["src"]
        finally:
            os.unlink(p)

    def test_spill_rejects_plain(self, corpus):
        with pytest.raises(ValueError, match="not compressed"):
            decompress_to_spill(corpus["plain"])

    def test_spilled_input_passthrough(self, corpus):
        with spilled_input(corpus["plain"]) as p:
            assert str(p) == str(corpus["plain"])

    def test_spilled_input_cleanup(self, corpus):
        with spilled_input(corpus["gz"]) as p:
            assert p != str(corpus["gz"])
            assert open(p, "rb").read() == corpus["src"]
        assert not os.path.exists(p)

    def test_spill_corrupt_gz(self, tmp_path, corpus):
        from needletail_tpu.errors import ParseError

        data = corpus["gz"].read_bytes()
        p = tmp_path / "trunc.gz"
        p.write_bytes(data[: len(data) // 2])
        with pytest.raises(ParseError):
            decompress_to_spill(p)


class TestDeviceFeed:
    def test_parity(self):
        out = list(device_feed(range(100), lambda x: x * 2, depth=3))
        assert out == [x * 2 for x in range(100)]

    def test_source_error_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("framer died")

        it = device_feed(gen(), lambda x: x)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="framer died"):
            list(it)

    def test_place_error_propagates(self):
        with pytest.raises(ZeroDivisionError):
            list(device_feed([1, 0], lambda x: 1 // x))

    def test_abandonment_stops_feeder(self):
        import threading

        before = threading.active_count()
        it = device_feed(iter(range(10_000)), lambda x: x, depth=2)
        next(it)
        it.close()  # generator close triggers the finally drain
        import time

        for _ in range(50):
            if threading.active_count() <= before:
                break
            time.sleep(0.05)
        assert threading.active_count() <= before + 1


class TestE2EParity:
    """Counting through every input front must be bit-identical."""

    def _golden(self, corpus):
        from needletail_tpu.device.pipeline import hash_count_file

        return hash_count_file(
            corpus["plain"], k=21, batch_size=2048, host_workers=1,
            double_buffer=False,
        )

    def test_double_buffer_matches(self, corpus):
        from needletail_tpu.device.pipeline import hash_count_file

        base = self._golden(corpus)
        fed = hash_count_file(
            corpus["plain"], k=21, batch_size=2048, host_workers=1,
            double_buffer=True,
        )
        assert base[0] == fed[0] and base[1] == fed[1] and base[2] == fed[2]
        assert np.array_equal(base[3], fed[3])

    def test_workers_plain_matches(self, corpus):
        from needletail_tpu.device.pipeline import hash_count_file

        base = self._golden(corpus)
        par = hash_count_file(
            corpus["plain"], k=21, batch_size=2048, host_workers=2
        )
        assert base[:3] == par[:3]
        assert np.array_equal(base[3], par[3])

    def test_workers_bgzf_matches(self, corpus):
        from needletail_tpu.device.pipeline import hash_count_file

        base = self._golden(corpus)
        par = hash_count_file(
            corpus["bgzf"], k=21, batch_size=2048, host_workers=2
        )
        assert base[:3] == par[:3]
        assert np.array_equal(base[3], par[3])

    def test_workers_gz_matches(self, corpus):
        from needletail_tpu.device.pipeline import hash_count_file

        base = self._golden(corpus)
        par = hash_count_file(
            corpus["gz"], k=21, batch_size=2048, host_workers=2
        )
        assert base[:3] == par[:3]
        assert np.array_equal(base[3], par[3])

    def test_count_file_workers_gz(self, corpus):
        from needletail_tpu.device.pipeline import count_file

        nb1, s1 = count_file(corpus["plain"], k=7, host_workers=1)
        nb2, s2 = count_file(corpus["gz"], k=7, host_workers=2)
        assert nb1 == nb2
        assert np.array_equal(s1, s2)


class TestParallelErrorPositions:
    """Worker errors must carry FILE-global line numbers + ids (VERDICT-7;
    ref errors.rs:10-24 position fidelity)."""

    def _make_bad_file(self, tmp_path, n_good=3000):
        # valid records, then an unequal-length record deep in the file so
        # it lands in a later worker's byte range
        parts = [b"@r%d\nACGTACGT\n+\nIIIIIIII\n" % i for i in range(n_good)]
        parts.append(b"@badrec oops\nACGTACGT\n+\nIII\n")
        parts.extend(b"@s%d\nACGT\n+\nIIII\n" % i for i in range(50))
        p = tmp_path / "bad.fq"
        p.write_bytes(b"".join(parts))
        return p

    def _stream_error(self, path):
        from needletail_tpu.errors import ParseError
        from needletail_tpu.parser import parse_fastx_file

        r = parse_fastx_file(str(path))
        try:
            while r.next() is not None:
                pass
        except ParseError as exc:
            return exc
        raise AssertionError("expected a ParseError")

    def _parallel_error(self, path, workers):
        from needletail_tpu.errors import ParseError
        from needletail_tpu.io.parallel_host import parallel_read_batches

        try:
            for _ in parallel_read_batches(path, workers=workers, batch_size=256):
                pass
        except ParseError as exc:
            return exc
        raise AssertionError("expected a ParseError")

    def test_error_position_matches_single_stream(self, tmp_path):
        p = self._make_bad_file(tmp_path)
        ref = self._stream_error(p)
        got = self._parallel_error(p, workers=3)
        assert got.kind == ref.kind
        assert got.position.id == ref.position.id == "badrec"
        assert got.position.line == ref.position.line

    def test_error_in_first_range_unchanged(self, tmp_path):
        parts = [b"@r0\nACGT\n+\nII\n"]  # unequal lengths immediately
        parts.extend(b"@s%d\nACGT\n+\nIIII\n" % i for i in range(2000))
        p = tmp_path / "bad0.fq"
        p.write_bytes(b"".join(parts))
        ref = self._stream_error(p)
        got = self._parallel_error(str(p), workers=3)
        assert (got.kind, got.position.line, got.position.id) == (
            ref.kind, ref.position.line, ref.position.id,
        )

    def test_parallel_ids_shipped(self, tmp_path):
        from needletail_tpu.io.fast_batch import fast_read_batches
        from needletail_tpu.io.parallel_host import parallel_read_batches

        p = tmp_path / "ok.fq"
        p.write_bytes(
            b"".join(b"@name%d extra\nACGT\n+\nIIII\n" % i for i in range(5000))
        )
        want = sorted(
            bytes(i)
            for b in fast_read_batches(str(p), batch_size=512, with_ids=True)
            for i in b.ids
        )
        got = sorted(
            bytes(i)
            for b in parallel_read_batches(
                str(p), workers=3, batch_size=512, with_ids=True
            )
            for i in b.ids
        )
        assert got == want


class TestSharedMemoryTransport:
    """Worker batches through the shm segment pool (engaged by an
    explicit max_len) must be bit-identical to the pickle queue."""

    def test_parity_with_pickle(self, corpus):
        from needletail_tpu.io.parallel_host import parallel_read_batches

        def collect(**kw):
            reads = []
            for b in parallel_read_batches(
                str(corpus["plain"]), workers=3, batch_size=512,
                max_len=128, **kw,
            ):
                for j in range(b.num_reads):
                    ln = int(b.lengths[j])
                    reads.append(
                        (b.seqs[j, :ln].tobytes(), b.quals[j, :ln].tobytes())
                    )
            return sorted(reads)

        assert collect() == collect(shared_mem=False)

    def test_hash_count_through_shm(self, corpus):
        from needletail_tpu.device.pipeline import hash_count_file

        base = hash_count_file(
            corpus["plain"], k=21, batch_size=2048, host_workers=1,
            max_len=128,
        )
        shm = hash_count_file(
            corpus["plain"], k=21, batch_size=2048, host_workers=2,
            max_len=128,
        )
        assert base[:3] == shm[:3]
        assert np.array_equal(base[3], shm[3])

    def test_error_still_propagates(self, tmp_path):
        from needletail_tpu.errors import ParseError
        from needletail_tpu.io.parallel_host import parallel_read_batches

        parts = [b"@r%d\nACGT\n+\nIIII\n" % i for i in range(3000)]
        parts.append(b"@bad\nACGT\n+\nII\n")
        p = tmp_path / "bad.fq"
        p.write_bytes(b"".join(parts))
        with pytest.raises(ParseError):
            for _ in parallel_read_batches(
                str(p), workers=3, batch_size=256, max_len=64
            ):
                pass

    def test_early_abandon_cleans_up(self, corpus):
        from needletail_tpu.io.parallel_host import parallel_read_batches

        it = parallel_read_batches(
            str(corpus["plain"]), workers=2, batch_size=256, max_len=128
        )
        next(it)
        it.close()  # generator finally must terminate workers + unlink shm

    def test_requires_max_len(self, corpus):
        from needletail_tpu.io.parallel_host import parallel_read_batches

        with pytest.raises(ValueError, match="max_len"):
            list(
                parallel_read_batches(
                    str(corpus["plain"]), workers=2, shared_mem=True
                )
            )


class TestReviewFixes:
    """Round-2 self-review regressions."""

    def test_hybrid_bgzf_gzip_spill_falls_back(self, corpus, tmp_path):
        """BGZF blocks followed by an ordinary gzip member is legal
        multi-member gzip; the spill path must stream-decode it."""
        hybrid = tmp_path / "hybrid.fq.gz"
        # strip the BGZF EOF marker, append a plain gzip member
        from needletail_tpu.io.bgzf import BGZF_EOF

        bg = corpus["bgzf"].read_bytes()
        assert bg.endswith(BGZF_EOF)
        extra = b"@x\nACGT\n+\nIIII\n"
        hybrid.write_bytes(bg[: -len(BGZF_EOF)] + gzip.compress(extra))
        assert gzip.decompress(hybrid.read_bytes()) == corpus["src"] + extra

        from needletail_tpu.io.spill import decompress_to_spill

        p = decompress_to_spill(hybrid, threads=2)
        try:
            assert open(p, "rb").read() == corpus["src"] + extra
        finally:
            os.unlink(p)

    def test_bgzf_reader_rejects_hybrid_without_leak(self, corpus, tmp_path):
        from needletail_tpu.io.bgzf import BGZF_EOF, BGZFReader

        bg = corpus["bgzf"].read_bytes()
        p = tmp_path / "h.gz"
        p.write_bytes(bg[: -len(BGZF_EOF)] + gzip.compress(b"x"))
        with pytest.raises(ValueError):
            BGZFReader(p)

    def test_dense_large_k_fails_fast(self, corpus):
        from needletail_tpu.device.pipeline import count_file

        with pytest.raises(ValueError, match="dense"):
            count_file(corpus["plain"], k=21, dense=True)

    def test_write_bgzf_block_size_limit(self, tmp_path):
        from needletail_tpu.io.bgzf import MAX_BLOCK_SIZE, write_bgzf

        with pytest.raises(ValueError, match="block_size"):
            write_bgzf(b"x" * 100, tmp_path / "a.gz", block_size=65536)
        assert MAX_BLOCK_SIZE == 65280

    def test_write_bgzf_stream_roundtrip(self, corpus, tmp_path):
        import io as _io

        from needletail_tpu.io.bgzf import write_bgzf_stream

        p = tmp_path / "s.bgz"
        n = write_bgzf_stream(_io.BytesIO(corpus["src"]), p, block_size=40_000)
        assert n == len(corpus["src"])
        assert gzip.decompress(p.read_bytes()) == corpus["src"]

    def test_sharded_count_file_rounds_batch_size(self, corpus):
        import jax

        from needletail_tpu.parallel import make_mesh, sharded_count_file

        mesh = make_mesh(data=8, table=1)
        # 100 is not a multiple of 8; must be rounded up, not crash
        n_bases, (keys, counts) = sharded_count_file(
            str(corpus["plain"]), 9, mesh=mesh, batch_size=100,
            shard_lanes=1 << 15,
        )
        assert n_bases == 1_000_000

    def test_sharded_count_file_quality_cutoff(self, corpus):
        from needletail_tpu.device.pipeline import count_file
        from needletail_tpu.parallel import make_mesh, sharded_count_file

        mesh = make_mesh(data=8, table=1)
        _, (ks, cs) = sharded_count_file(
            str(corpus["plain"]), 15, mesh=mesh, batch_size=256,
            quality_cutoff=20, shard_lanes=1 << 15,
        )
        _, (rk, rc) = count_file(
            str(corpus["plain"]), k=15, dense=False, sparse_format="arrays",
            quality_cutoff=20, batch_size=256, host_workers=1,
        )
        assert np.array_equal(ks, rk) and np.array_equal(cs, rc)

    def test_genome_spectrum_mesh_dense(self, tmp_path):
        from needletail_tpu.device.tiling import genome_spectrum
        from needletail_tpu.parallel import make_mesh

        rng = np.random.default_rng(9)
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 5000))
        p = tmp_path / "g.fa"
        p.write_bytes(b">g\n" + seq + b"\n")
        single = genome_spectrum(str(p), k=6, tile_len=512, batch_tiles=8)
        mesh = make_mesh(data=8, table=1)
        sharded = genome_spectrum(
            str(p), k=6, tile_len=512, batch_tiles=8, mesh=mesh
        )
        assert isinstance(sharded[1], np.ndarray)
        assert np.array_equal(single[1], sharded[1])

    def test_fasta_through_shm_has_no_fabricated_quals(self, tmp_path):
        from needletail_tpu.io.parallel_host import parallel_read_batches

        p = tmp_path / "many.fa"
        p.write_bytes(b"".join(b">r%d\nACGTACGT\n" % i for i in range(3000)))
        for b in parallel_read_batches(
            str(p), workers=2, batch_size=256, max_len=64
        ):
            assert b.quals is None

    def test_missing_file_raises_parse_error_with_workers(self):
        from needletail_tpu.errors import ParseError
        from needletail_tpu.io.parallel_host import parallel_read_batches

        with pytest.raises(ParseError):
            list(parallel_read_batches("/nonexistent/x.fq", workers=2))

    def test_device_feed_depth_zero_still_bounded(self):
        out = list(device_feed(range(50), lambda x: x, depth=0))
        assert out == list(range(50))


class TestSpillRails:
    """Round-3 spill safety rails: free-space estimate, graceful fallback,
    and the ADVICE-r2 contract that compressed input streams unless the
    caller opts into decode-to-spill."""

    def test_estimate_gzip_isize(self, corpus):
        from needletail_tpu.io.spill import estimate_decompressed_size

        assert estimate_decompressed_size(corpus["gz"]) >= len(corpus["src"])

    def test_space_check_raises(self, corpus, monkeypatch):
        import needletail_tpu.io.spill as spill_mod

        class DU:
            free = 1000

        monkeypatch.setattr(spill_mod.shutil, "disk_usage", lambda p: DU)
        with pytest.raises(spill_mod.SpillSpaceError):
            spill_mod.decompress_to_spill(corpus["gz"])

    def test_driver_falls_back_to_streaming(self, corpus, monkeypatch):
        import needletail_tpu.io.spill as spill_mod
        from needletail_tpu.device.pipeline import _make_batch_source

        class DU:
            free = 1000

        monkeypatch.setattr(spill_mod.shutil, "disk_usage", lambda p: DU)
        with pytest.warns(RuntimeWarning, match="single-stream"):
            gen, _ = _make_batch_source(
                str(corpus["gz"]), 512, 128, 2, False
            )
            total = sum(b.num_bases for b in gen)
        assert total == 250_000 * 4

    def test_compressed_auto_streams_without_spill(self, corpus, monkeypatch):
        # host_workers=None on compressed input must NOT decode-to-spill
        # (ADVICE r2): it streams single-process with bounded memory
        import needletail_tpu.io.parallel_host as ph
        import needletail_tpu.io.spill as spill_mod
        from needletail_tpu.device.pipeline import _make_batch_source

        monkeypatch.setattr(ph, "auto_host_workers", lambda: 8)

        def _boom(*a, **k):  # any spill attempt is a test failure
            raise AssertionError("auto workers spilled compressed input")

        monkeypatch.setattr(spill_mod, "decompress_to_spill", _boom)
        gen, workers = _make_batch_source(
            str(corpus["gz"]), 512, 128, None, False
        )
        assert workers == 1
        assert sum(b.num_bases for b in gen) == 250_000 * 4

    def test_explicit_workers_still_spill(self, corpus):
        from needletail_tpu.device.pipeline import _make_batch_source

        gen, workers = _make_batch_source(str(corpus["gz"]), 512, 128, 2, False)
        assert workers == 2
        assert sum(b.num_bases for b in gen) == 250_000 * 4


class TestMeteredDrivers:
    """VERDICT r3 weak #1: the ThroughputMeter must observe the real
    pipeline — per-stage seconds/bytes from the production drivers."""

    def test_hash_count_file_metered(self, corpus):
        from needletail_tpu.device.pipeline import hash_count_file
        from needletail_tpu.utils.profiling import ThroughputMeter

        base = hash_count_file(
            corpus["plain"], k=21, batch_size=2048, host_workers=1,
            double_buffer=False,
        )
        meter = ThroughputMeter()
        got = hash_count_file(
            corpus["plain"], k=21, batch_size=2048, host_workers=1,
            double_buffer=True, meter=meter,
        )
        assert base[:3] == got[:3]
        assert np.array_equal(base[3], got[3])
        d = meter.as_dict()
        for stage in ("frame", "h2d", "wait", "dispatch", "drain", "wall"):
            assert stage in d, d.keys()
        # the framer saw every transport byte and every base
        assert d["frame"]["items"] == base[0]
        assert d["frame"]["bytes"] == d["h2d"]["bytes"]
        assert d["wall"]["s"] > 0
        # stages report rates for the bench breakdown
        assert "mb_per_s" in d["h2d"]

    def test_count_file_metered(self, corpus):
        from needletail_tpu.device.pipeline import count_file
        from needletail_tpu.utils.profiling import ThroughputMeter

        nb1, s1 = count_file(corpus["plain"], k=7, host_workers=1)
        meter = ThroughputMeter()
        nb2, s2 = count_file(
            corpus["plain"], k=7, host_workers=1, meter=meter
        )
        assert nb1 == nb2
        assert np.array_equal(s1, s2)
        d = meter.as_dict()
        for stage in ("frame", "h2d", "dispatch", "drain", "wall"):
            assert stage in d, d.keys()
        assert d["wall"]["items"] == nb1


class TestMultiFile:
    """Multi-file counting: a list of paths chains through one batch
    source; integer adds commute, so the combined spectrum equals the
    concatenated-file run bit-for-bit."""

    def test_count_file_list_equals_concat(self, corpus, tmp_path):
        from needletail_tpu.device.pipeline import count_file

        src = open(corpus["plain"], "rb").read()
        a = tmp_path / "a.fq"
        b = tmp_path / "b.fq"
        half = len(src) // 2
        # split at a record boundary ('@' after a newline)
        cut = src.index(b"\n@", half) + 1
        a.write_bytes(src[:cut])
        b.write_bytes(src[cut:])
        nb_ref, spec_ref = count_file(corpus["plain"], k=9, host_workers=1)
        nb, spec = count_file([str(a), str(b)], k=9, host_workers=1,
                              max_len=128)
        assert nb == nb_ref
        assert np.array_equal(spec, spec_ref)

    def test_hash_count_file_list(self, corpus, tmp_path):
        from needletail_tpu.device.pipeline import hash_count_file

        ref = hash_count_file(corpus["plain"], 9, batch_size=512,
                              max_len=128)
        got = hash_count_file([corpus["plain"]], 9, batch_size=512,
                              max_len=128)
        assert got[:3] == ref[:3]
        assert np.array_equal(got[3], ref[3])
        # two copies of the file = doubled tallies, same key set
        two = hash_count_file(
            [corpus["plain"], corpus["plain"]], 9, batch_size=512,
            max_len=128,
        )
        assert two[0] == 2 * ref[0] and two[1] == 2 * ref[1]
        assert np.array_equal(two[3], 2 * ref[3])

    def test_checkpoint_rejects_multi_file(self, corpus, tmp_path):
        from needletail_tpu.device.pipeline import hash_count_file

        with pytest.raises(ValueError, match="single-file"):
            hash_count_file(
                [corpus["plain"], corpus["plain"]], 9,
                checkpoint_every=2, checkpoint_path=str(tmp_path / "c.npz"),
                host_workers=1,
            )
