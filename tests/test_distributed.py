"""Byte-range partitioning + checkpoint/resume tests (simulated multi-host:
N independent range-readers on one machine must reproduce the whole file)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from needletail_tpu.parallel import init_count_state, make_mesh
from needletail_tpu.parallel.checkpoint import load_count_state, save_count_state
from needletail_tpu.parallel.distributed import read_range, split_fastx_ranges
from needletail_tpu.parallel.sharded import make_update_step
from needletail_tpu.parser import parse_fastx_file


def collect_ids(reader):
    out = []
    while (rec := reader.next()) is not None:
        out.append(rec.id())
    return out


class TestRangeSplitting:
    @pytest.mark.parametrize("n", [1, 2, 3, 4, 7])
    def test_fastq_ranges_cover_all_records(self, data_dir, n):
        path = data_dir / "PRJNA271013_head.fq"
        whole = collect_ids(parse_fastx_file(path))
        ranges = split_fastx_ranges(path, n)
        # disjoint and covering
        assert ranges[0][0] == 0
        for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
            assert e0 == s1
        got = []
        for start, end in ranges:
            if start == end:
                continue
            got.extend(collect_ids(read_range(path, start, end)))
        assert got == whole

    @pytest.mark.parametrize("n", [2, 3])
    def test_fasta_ranges(self, data_dir, n):
        path = data_dir / "28S.fasta"
        whole = collect_ids(parse_fastx_file(path))
        got = []
        for start, end in split_fastx_ranges(path, n):
            if start == end:
                continue
            got.extend(collect_ids(read_range(path, start, end)))
        assert got == whole

    def test_quality_lines_with_at_signs(self, tmp_path):
        # '@' at the start of a quality line must not be taken as a record
        p = tmp_path / "at.fq"
        recs = b"".join(
            b"@r%d\nACGTACGT\n+\n@@@@@@@@\n" % i for i in range(50)
        )
        p.write_bytes(recs)
        whole = collect_ids(parse_fastx_file(p))
        got = []
        for start, end in split_fastx_ranges(p, 4):
            if start == end:
                continue
            got.extend(collect_ids(read_range(p, start, end)))
        assert got == whole

    def test_more_ranges_than_records(self, tmp_path):
        p = tmp_path / "two.fq"
        p.write_bytes(b"@a\nAC\n+\nII\n@b\nGT\n+\n!!\n")
        got = []
        for start, end in split_fastx_ranges(p, 8):
            if start == end:
                continue
            got.extend(collect_ids(read_range(p, start, end)))
        assert got == [b"a", b"b"]


class TestCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        mesh = make_mesh()
        k = 5
        rng = np.random.default_rng(0)
        seqs = rng.choice(list(b"ACGTN"), size=(16, 64)).astype(np.uint8)
        lengths = np.full(16, 64, np.int32)
        step, place, _ = make_update_step(mesh, k)

        # full run: two batches
        state = init_count_state(mesh, k)
        s, l = place(jnp.asarray(seqs), jnp.asarray(lengths))
        state = step(state, s, l)
        ckpt_path = tmp_path / "count.npz"
        save_count_state(ckpt_path, state, byte_offset=1234, k=k, input_path="x.fq")
        state = step(state, *place(jnp.asarray(seqs), jnp.asarray(lengths)))
        full_table = np.asarray(state.table)

        # resume from checkpoint: one more batch
        ckpt = load_count_state(ckpt_path)
        assert ckpt.byte_offset == 1234 and ckpt.k == k and ckpt.path == "x.fq"
        resumed = ckpt.to_state(mesh)
        resumed = step(resumed, *place(jnp.asarray(seqs), jnp.asarray(lengths)))
        assert (np.asarray(resumed.table) == full_table).all()
        assert int(resumed.n_bases) == int(state.n_bases)


class TestSplitFuzz:
    """VERDICT r2 #6: property-fuzz split_fastx_ranges — concatenated
    per-range record streams must equal the single-stream sequence on
    adversarial corpora (quality lines opening with '@', sequences opening
    with '+', records shaped to mimic record starts, CRLF, empty reads)."""

    @staticmethod
    def _records(reader):
        out = []
        while (rec := reader.next()) is not None:
            out.append((bytes(rec.id()), bytes(rec.seq()),
                        bytes(rec.qual() or b"")))
        return out

    @staticmethod
    def _adversarial_fastq(rng, n_records):
        chunks = []
        for i in range(n_records):
            kind = rng.integers(0, 6)
            if kind == 0:
                ln = 0  # empty read (NCBI-style)
                seq = b""
            else:
                ln = int(rng.integers(1, 40))
                seq = bytes(
                    rng.choice(np.frombuffer(b"ACGT", np.uint8), ln)
                )
            if kind == 1 and ln > 0:
                # sequence opening with '+': fools separator-lookahead
                seq = b"+" + seq[1:]
            if kind == 2 and ln > 0:
                # quality opening with '@' and id-like content: fake start
                qual = b"@r%d" % i + b"I" * max(ln - len(b"@r%d" % i), 0)
                qual = qual[:ln]
            else:
                qual = bytes(
                    rng.choice(np.frombuffer(b"!IJ@+", np.uint8), ln)
                )
            eol = b"\r\n" if kind == 3 else b"\n"
            chunks.append(
                b"@r%d%s%s%s+%s%s%s"
                % (i, eol, seq, eol, eol, qual, eol)
            )
        return b"".join(chunks)

    def test_fastq_ranges_reproduce_stream(self, tmp_path):
        from needletail_tpu.parallel.distributed import (
            read_range,
            split_fastx_ranges,
        )
        from needletail_tpu.parser import FastqReader

        rng = np.random.default_rng(23)
        for trial in range(25):
            data = self._adversarial_fastq(rng, int(rng.integers(5, 120)))
            p = tmp_path / f"fz{trial}.fq"
            p.write_bytes(data)
            want = self._records(FastqReader(data))
            for n in (2, 3, 5):
                ranges = split_fastx_ranges(p, n)
                assert ranges[0][0] == 0 and ranges[-1][1] == len(data)
                got = []
                for s, e in ranges:
                    if s < e:
                        got.extend(self._records(read_range(p, s, e)))
                assert got == want, (trial, n, ranges)

    def test_fasta_ranges_reproduce_stream(self, tmp_path):
        from needletail_tpu.parallel.distributed import (
            read_range,
            split_fastx_ranges,
        )
        from needletail_tpu.parser import FastaReader

        rng = np.random.default_rng(29)
        for trial in range(15):
            chunks = []
            for i in range(int(rng.integers(3, 60))):
                lines = []
                for _ in range(int(rng.integers(0, 4))):
                    ln = int(rng.integers(0, 50))
                    lines.append(bytes(
                        rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln)
                    ))
                eol = b"\r\n" if rng.integers(0, 4) == 0 else b"\n"
                body = eol.join(lines)
                chunks.append(b">s%d%s%s%s" % (i, eol, body, eol))
            data = b"".join(chunks)
            p = tmp_path / f"fa{trial}.fa"
            p.write_bytes(data)
            want = self._records(FastaReader(data))
            for n in (2, 4):
                ranges = split_fastx_ranges(p, n)
                got = []
                for s, e in ranges:
                    if s < e:
                        got.extend(self._records(read_range(p, s, e)))
                assert got == want, (trial, n, ranges)
