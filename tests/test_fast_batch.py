"""Native fast-batcher tests: parity with the Python readers (the
reference-locked oracle) on data, errors, and edge cases."""

import gzip
import pathlib

import numpy as np
import pytest

from needletail_tpu.batch import read_batches
from needletail_tpu.errors import ParseError, ParseErrorKind
from needletail_tpu.io import native
from needletail_tpu.io.fast_batch import fast_read_batches
from needletail_tpu.parser import FastqReader

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native framer not built"
)


def test_parity_with_python_batcher(data_dir):
    for bs in (64, 512, 2000):
        fast = list(
            fast_read_batches(data_dir / "PRJNA271013_head.fq", batch_size=bs, max_len=128)
        )
        slow = list(
            read_batches(data_dir / "PRJNA271013_head.fq", batch_size=bs, max_len=128)
        )
        fs = np.concatenate([b.seqs for b in fast])
        ss = np.concatenate([b.seqs for b in slow])
        fq = np.concatenate([b.quals for b in fast])
        sq = np.concatenate([b.quals for b in slow])
        fl = np.concatenate([b.lengths for b in fast])
        sl = np.concatenate([b.lengths for b in slow])
        assert (fl[:2000] == sl[:2000]).all()
        assert (fs[:2000] == ss[:2000]).all()
        assert (fq[:2000] == sq[:2000]).all()


def test_gz_same_as_plain(data_dir, tmp_path):
    src = (data_dir / "PRJNA271013_head.fq").read_bytes()
    gz = tmp_path / "x.fq.gz"
    gz.write_bytes(gzip.compress(src))
    a = list(fast_read_batches(gz, batch_size=512, max_len=128))
    b = list(fast_read_batches(data_dir / "PRJNA271013_head.fq", batch_size=512, max_len=128))
    assert sum(x.num_bases for x in a) == sum(x.num_bases for x in b) == 250000


@pytest.mark.parametrize(
    "content",
    [
        b"@a\nACGT\n+\nII\n",
        b"@a\nAC\n+\nII\n@b\nACGT\n+\nII\n",
        b"@a\nAC\n+\nII\n@b\nACGT\nX\nIIII\n",
        b"@a\nAC\n+\nII\nxyz\nACGT\n+\nIIII\n",
        b"@a\nAC\n+\nII\n@trunc\nACGT\n",
        b"@a\nAC\n+\nII\n@t\nACGT\n+\nIII",
        b"@a\nAC\n+\nII\n@t\n",
        b"@a\nAC\n+\nII\n@t",
    ],
)
def test_error_parity_with_python_reader(tmp_path, content):
    p = tmp_path / "case.fq"
    p.write_bytes(content)
    with pytest.raises(ParseError) as fast_ei:
        for _ in fast_read_batches(p):
            pass
    reader = FastqReader(content)
    with pytest.raises(ParseError) as py_ei:
        while reader.next() is not None:
            pass
    assert fast_ei.value.kind == py_ei.value.kind
    assert fast_ei.value.position == py_ei.value.position
    assert fast_ei.value.msg == py_ei.value.msg


def test_final_record_no_newline(tmp_path):
    p = tmp_path / "t.fq"
    p.write_bytes(b"@a\nAC\n+\nII\n@b\nGT\n+\n!!")
    got = list(fast_read_batches(p))
    assert sum(b.num_reads for b in got) == 2
    assert bytes(got[0].seqs[1, :2]) == b"GT"
    assert bytes(got[0].quals[1, :2]) == b"!!"


def test_trailing_blank_lines(tmp_path):
    p = tmp_path / "t.fq"
    p.write_bytes(b"@a\nAC\r\n+\r\nII\r\n\r\n\n")
    got = list(fast_read_batches(p))
    assert sum(b.num_reads for b in got) == 1
    assert bytes(got[0].seqs[0, :2]) == b"AC"


def test_fasta_small_file(data_dir):
    got = list(fast_read_batches(data_dir / "test.fa", batch_size=4))
    assert sum(b.num_bases for b in got) == 14


def test_tiny_batch_spanning_chunks(tmp_path):
    # many records, batch_size forces spans across scan boundaries
    p = tmp_path / "many.fq"
    p.write_bytes(b"".join(b"@r%d\nACGT\n+\nIIII\n" % i for i in range(1000)))
    got = list(fast_read_batches(p, batch_size=7))
    assert sum(b.num_reads for b in got) == 1000
    assert all((b.lengths[: b.num_reads] == 4).all() for b in got)


def test_scan_fasta_native(data_dir):
    raw = np.frombuffer((data_dir / "test.fa").read_bytes(), dtype=np.uint8)
    recs, n, consumed = native.scan_fasta(raw, 16)
    # only the first record is complete (terminated by "\n>")
    assert n == 1
    assert recs[0, 0] == 0
    data = raw.tobytes()
    assert data[recs[0, 1]] == ord("\n")  # header newline
    assert data[recs[0, 2] + 1] == ord(">")  # record ends before next '>'


class TestFastaFastPath:
    def test_28s_parity(self, data_dir):
        fast = list(fast_read_batches(data_dir / "28S.fasta", batch_size=100, max_len=5120))
        slow = list(read_batches(data_dir / "28S.fasta", batch_size=100, max_len=5120))
        fs = np.concatenate([b.seqs for b in fast])
        ss = np.concatenate([b.seqs for b in slow])
        fl = np.concatenate([b.lengths for b in fast])
        sl = np.concatenate([b.lengths for b in slow])
        assert (fl[:570] == sl[:570]).all()
        assert (fs[:570] == ss[:570]).all()

    def test_crlf_wrapped_empty(self, tmp_path):
        p = tmp_path / "t.fa"
        p.write_bytes(b">a\r\nAC\r\nGT\r\n>b\r\n\r\n>c\r\nTTT")
        got = list(fast_read_batches(p))
        seqs = [
            bytes(b.seqs[i, : b.lengths[i]]) for b in got for i in range(b.num_reads)
        ]
        assert seqs == [b"ACGT", b"", b"TTT"]

    def test_midline_cr_stripped(self, tmp_path):
        from needletail_tpu.parser import parse_fastx_file

        p = tmp_path / "t.fa"
        p.write_bytes(b">a\nAC\rGT\n>b\nAAAA\n")
        got = list(fast_read_batches(p))
        expected = parse_fastx_file(p).next().seq()
        assert bytes(got[0].seqs[0, : got[0].lengths[0]]) == expected == b"ACGT"

    @pytest.mark.parametrize(
        "content", [b">a\nACGT\n>b", b">a\nACGT\n>b\r\n", b">x"]
    )
    def test_error_parity(self, tmp_path, content):
        from needletail_tpu.parser import FastaReader

        p = tmp_path / "t.fa"
        p.write_bytes(content)
        with pytest.raises(ParseError) as fast_ei:
            for _ in fast_read_batches(p):
                pass
        reader = FastaReader(content)
        with pytest.raises(ParseError) as py_ei:
            while reader.next() is not None:
                pass
        assert fast_ei.value.kind == py_ei.value.kind
        assert fast_ei.value.position == py_ei.value.position

    def test_overflow_suggests_tiling(self, tmp_path):
        p = tmp_path / "g.fa"
        p.write_bytes(b">chr\n" + b"ACGT" * 200 + b"\n>next\nAC\n")
        with pytest.raises(ValueError, match="tiling"):
            list(fast_read_batches(p, max_len=128))


class TestAutoMaxLenWidening:
    """Auto max_len must widen for records longer than anything in the
    first scan chunk instead of erroring (explicit max_len still errors)."""

    def test_fasta_long_final_record(self, tmp_path):
        p = tmp_path / "x.fa"
        p.write_bytes(b">a\nACGT\n>b\n" + b"A" * 1000 + b"\n")
        batches = list(fast_read_batches(str(p), batch_size=8))
        lens = sorted(int(x) for b in batches for x in b.lengths[: b.num_reads])
        assert lens == [4, 1000]

    def test_fastq_long_later_read(self, tmp_path):
        long = b"C" * 700
        recs = b"@r1\nACGT\n+\nIIII\n" + b"@r2\n" + long + b"\n+\n" + b"I" * 700 + b"\n"
        p = tmp_path / "x.fq"
        p.write_bytes(recs)
        batches = list(fast_read_batches(str(p), batch_size=8))
        lens = sorted(int(x) for b in batches for x in b.lengths[: b.num_reads])
        assert lens == [4, 700]
        # quality plane widened in lockstep
        b = batches[0]
        row = list(b.lengths).index(700)
        assert bytes(b.quals[row][:700]) == b"I" * 700

    def test_explicit_max_len_still_errors(self, tmp_path):
        p = tmp_path / "x.fa"
        p.write_bytes(b">a\n" + b"A" * 300 + b"\n")
        with pytest.raises(ValueError):
            list(fast_read_batches(str(p), batch_size=8, max_len=128))


class TestBucketedBatches:
    """Length-bucketed batching: every record preserved, batch widths are
    the smallest bucket holding all their reads (SURVEY §7 hard part 4)."""

    def _mixed_file(self, tmp_path, lengths, fmt="fastq"):
        rng = np.random.default_rng(11)
        p = tmp_path / ("m.fq" if fmt == "fastq" else "m.fa")
        with open(p, "wb") as f:
            for i, ln in enumerate(lengths):
                seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), ln).tobytes()
                if fmt == "fastq":
                    f.write(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * ln + b"\n")
                else:
                    f.write(b">r%d\n" % i + seq + b"\n")
        return p

    def test_mixed_lengths_bucketed(self, tmp_path):
        from needletail_tpu.io.bucketed import bucketed_read_batches

        lengths = [36] * 10 + [150] * 7 + [300] * 3 + [5000]
        p = self._mixed_file(tmp_path, lengths)
        seen = []
        for b in bucketed_read_batches(str(p), batch_size=4):
            assert b.seqs.shape[1] in (128, 256, 512, 5120)
            assert (b.lengths[: b.num_reads] <= b.seqs.shape[1]).all()
            seen.extend(int(x) for x in b.lengths[: b.num_reads])
        assert sorted(seen) == sorted(lengths)

    def test_content_preserved_and_quals(self, tmp_path):
        from needletail_tpu.io.bucketed import bucketed_read_batches

        lengths = [20, 200, 20, 200, 20]
        p = self._mixed_file(tmp_path, lengths)
        # oracle: streaming reader
        from needletail_tpu.parser import parse_fastx_file

        recs = {}
        reader = parse_fastx_file(str(p))
        while (r := reader.next()) is not None:
            recs[bytes(r.seq())] = bytes(r.qual())
        got = {}
        for b in bucketed_read_batches(str(p), batch_size=2):
            for i in range(b.num_reads):
                ln = int(b.lengths[i])
                got[bytes(b.seqs[i, :ln])] = bytes(b.quals[i, :ln])
        assert got == recs


class TestParallelHostFraming:
    def test_two_workers_cover_all_records(self, data_dir):
        from needletail_tpu.io.parallel_host import parallel_read_batches
        from needletail_tpu.io.fast_batch import fast_read_batches

        path = str(data_dir / "PRJNA271013_head.fq")
        single = {}
        for b in fast_read_batches(path, batch_size=256):
            for i in range(b.num_reads):
                ln = int(b.lengths[i])
                key = bytes(b.seqs[i, :ln])
                single[key] = single.get(key, 0) + 1
        par = {}
        n = 0
        for b in parallel_read_batches(path, workers=2, batch_size=256):
            for i in range(b.num_reads):
                ln = int(b.lengths[i])
                key = bytes(b.seqs[i, :ln])
                par[key] = par.get(key, 0) + 1
                n += 1
        assert n == 2000 and par == single

    def test_worker_error_propagates(self, tmp_path):
        from needletail_tpu.io.parallel_host import parallel_read_batches

        p = tmp_path / "bad.fq"
        p.write_bytes(b"@r1\nACGT\n+\nII\n" * 50)  # unequal lengths
        with pytest.raises(ParseError):
            for _ in parallel_read_batches(str(p), workers=2, batch_size=8):
                pass

    def test_compressed_rejected(self, data_dir):
        from needletail_tpu.io.parallel_host import parallel_read_batches

        with pytest.raises(ValueError):
            list(parallel_read_batches(str(data_dir / "test.fa.gz"), workers=2))


class TestBucketedEdgeCases:
    def test_fasta_has_no_fabricated_quals(self, tmp_path):
        from needletail_tpu.io.bucketed import bucketed_read_batches

        p = tmp_path / "x.fa"
        p.write_bytes(b">a\nACGTACGT\n>b\nGG\n")
        batches = list(bucketed_read_batches(str(p), batch_size=4))
        assert batches and all(b.quals is None for b in batches)

    def test_quality_cutoff_on_fasta_still_raises_when_bucketed(self, tmp_path):
        from needletail_tpu.device.pipeline import count_file

        p = tmp_path / "x.fa"
        p.write_bytes(b">a\nACGTACGT\n")
        with pytest.raises(ValueError, match="qualities"):
            count_file(str(p), k=4, quality_cutoff=20, bucketed=True)

    def test_explicit_max_len_contract(self, tmp_path):
        from needletail_tpu.io.bucketed import bucketed_read_batches

        p = tmp_path / "x.fa"
        p.write_bytes(b">a\n" + b"A" * 300 + b"\n")
        with pytest.raises(ValueError, match="max_len"):
            list(bucketed_read_batches(str(p), batch_size=4, max_len=128))

    def test_max_len_quantum_matches_flat_paths(self, tmp_path):
        # the flat transports round an explicit max_len UP to a multiple
        # of 8 (packed planes are byte-quantized); bucketed framing must
        # apply the identical quantum so toggling `bucketed` never flips
        # a read between accepted and "exceeds max_len"
        from needletail_tpu.device.pipeline import count_file
        from needletail_tpu.io.bucketed import bucketed_read_batches

        p = tmp_path / "x.fa"
        p.write_bytes(b">a\n" + b"ACGT" * 33 + b"A\n")  # 133 bases
        batches = list(bucketed_read_batches(str(p), batch_size=4, max_len=130))
        assert sum(b.num_reads for b in batches) == 1
        n_flat, t_flat = count_file(str(p), k=4, max_len=130)
        n_bkt, t_bkt = count_file(str(p), k=4, max_len=130, bucketed=True)
        assert (n_flat, n_bkt) == (133, 133)
        assert np.array_equal(t_flat, t_bkt)
        # past the quantized cap both paths still refuse
        with pytest.raises(ValueError, match="max_len"):
            list(bucketed_read_batches(str(p), batch_size=4, max_len=120))


class TestBatchIds:
    """Opt-in id extraction on the fast path must match the streaming
    readers' record ids (including the EOF-tail records)."""

    @staticmethod
    def _stream_ids(path):
        from needletail_tpu.parser import parse_fastx_file

        reader = parse_fastx_file(path)
        out = []
        while (rec := reader.next()) is not None:
            out.append(bytes(rec.id()))
        return out

    @staticmethod
    def _batched_ids(path, **kw):
        out = []
        for b in fast_read_batches(path, with_ids=True, **kw):
            assert len(b.ids) == b.num_reads
            out.extend(bytes(i) for i in b.ids)
        return out

    def test_fastq_ids(self, data_dir):
        p = str(data_dir / "PRJNA271013_head.fq")
        assert self._batched_ids(p, batch_size=64) == self._stream_ids(p)

    def test_fasta_ids(self, data_dir):
        p = str(data_dir / "28S.fasta")
        assert self._batched_ids(p, batch_size=7) == self._stream_ids(p)

    def test_fastq_tail_record_id(self, tmp_path):
        # final record misses its trailing newline -> tail path
        p = tmp_path / "t.fq"
        p.write_bytes(b"@r1 extra\nACGT\n+\nIIII\n@r2\nGG\n+\nII")
        assert self._batched_ids(str(p), batch_size=8) == [b"r1 extra", b"r2"]

    def test_default_off(self, data_dir):
        for b in fast_read_batches(str(data_dir / "28S.fasta"), batch_size=64):
            assert b.ids == []


def test_window_boundary_straddle(tmp_path):
    """Multi-MB records force window growth and straddle the 4 MB scan
    boundary; the batched path must still match the streaming reader
    byte-for-byte (ids + seqs)."""
    from needletail_tpu.parser import parse_fastx_file

    rng = np.random.default_rng(42)
    p = tmp_path / "straddle.fq"
    with open(p, "wb") as f:
        sizes = [100, 3_000_000, 50, 2_000_000, 7, 0] + [137] * 500
        for i, ln in enumerate(sizes):
            seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln).tobytes()
            f.write(b"@r%d x\n" % i + seq + b"\n+\n" + b"I" * ln + b"\n")
    sdata = []
    r = parse_fastx_file(str(p))
    while (rec := r.next()) is not None:
        sdata.append((bytes(rec.id()), bytes(rec.seq())))
    bdata = []
    for b in fast_read_batches(str(p), batch_size=64, with_ids=True):
        for j in range(b.num_reads):
            ln = int(b.lengths[j])
            bdata.append((bytes(b.ids[j]), bytes(b.seqs[j, :ln])))
    assert sdata == bdata


class TestLazyIdsAndMmap:
    def test_lazy_ids_protocol(self, tmp_path):
        from needletail_tpu.batch import LazyIds

        p = tmp_path / "r.fq"
        p.write_bytes(b"@a x\nAC\n+\nII\n@b\nGG\n+\nII\n@c\nTT\n+\nII\n")
        (b,) = list(fast_read_batches(p, batch_size=8, with_ids=True))
        assert isinstance(b.ids, LazyIds)
        assert len(b.ids) == 3
        assert b.ids[0] == b"a x" and b.ids[-1] == b"c"
        assert list(b.ids) == [b"a x", b"b", b"c"]
        assert b.ids == [b"a x", b"b", b"c"]
        assert b.ids[1:] == [b"b", b"c"]
        with pytest.raises(IndexError):
            b.ids[3]

    def test_lazy_ids_crlf_and_empty(self, tmp_path):
        p = tmp_path / "r.fq"
        p.write_bytes(b"@a\r\nAC\r\n+\r\nII\r\n@\nGG\n+\nII\n")
        (b,) = list(fast_read_batches(p, batch_size=8, with_ids=True))
        assert list(b.ids) == [b"a", b""]

    def test_mmap_range_framing_matches_stream(self, data_dir, tmp_path):
        """Byte-range framing (now mmap-backed) still equals whole-file."""
        from needletail_tpu.io.fast_batch import fast_read_batches_range
        from needletail_tpu.parallel.distributed import split_fastx_ranges

        path = str(data_dir / "PRJNA271013_head.fq")
        whole = []
        for b in fast_read_batches(path, batch_size=512, with_ids=True):
            for j in range(b.num_reads):
                ln = int(b.lengths[j])
                whole.append((bytes(b.ids[j]), b.seqs[j, :ln].tobytes()))
        ranged = []
        for start, end in split_fastx_ranges(path, 3):
            for b in fast_read_batches_range(
                path, start, end, batch_size=512, with_ids=True
            ):
                for j in range(b.num_reads):
                    ln = int(b.lengths[j])
                    ranged.append((bytes(b.ids[j]), b.seqs[j, :ln].tobytes()))
        assert whole == ranged

    def test_pad_reads_to_with_lazy_ids(self, tmp_path):
        p = tmp_path / "r.fq"
        p.write_bytes(b"@a\nAC\n+\nII\n@b\nGG\n+\nII\n")
        (b,) = list(fast_read_batches(p, batch_size=8, with_ids=True))
        padded = b.pad_reads_to(8)
        assert list(padded.ids) == [b"a", b"b"]


def test_wrapped_fasta_no_newline_overpadding(tmp_path):
    """Batch width must track true sequence length, not the raw span with
    newlines (round-2 regression: 10-char-wrapped records over-padded by
    ~10%)."""
    seq = b"ACGT" * 2500  # 10,000 bases
    wrapped = b"\n".join(seq[i : i + 10] for i in range(0, len(seq), 10))
    p = tmp_path / "wrap.fa"
    p.write_bytes(b">a\n" + wrapped + b"\n>b\n" + wrapped + b"\n")
    batches = list(fast_read_batches(p, batch_size=8))
    assert all(b.max_len == 10112 for b in batches)  # round128(10000)
    for b in batches:
        assert (b.lengths[: b.num_reads] == 10000).all()
        assert bytes(b.seqs[0, :10000]) == seq
