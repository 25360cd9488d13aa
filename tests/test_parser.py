"""Parser tests — vectors match the reference unit tests
(needletail src/parser/fasta.rs:378-483, fastq.rs:460-629, record.rs:249-294,
mod.rs:169-254)."""

import bz2
import gzip
import io
import lzma

import pytest

from needletail_tpu.errors import ParseError, ParseErrorKind
from needletail_tpu.parser import (
    FastaReader,
    FastqReader,
    LineEnding,
    parse_fastx_reader,
)
from needletail_tpu.quality import PhredEncoding


def collect(reader):
    out = []
    while True:
        rec = reader.next()
        if rec is None:
            return out
        out.append(rec)


class TestFasta:
    def test_basic(self):
        reader = FastaReader(b">test\nACGT\n>test2\nTGCA\n")
        assert reader.line_ending() is None
        r = reader.next()
        assert r.id() == b"test"
        assert r.raw_seq() == b"ACGT"
        assert r.all() == b">test\nACGT"
        assert reader.line_ending() == LineEnding.UNIX
        r = reader.next()
        assert r.id() == b"test2"
        assert r.raw_seq() == b"TGCA"
        assert reader.next() is None

    def test_wrapped(self):
        reader = FastaReader(b">test\nACGT\nACGT\n>test2\nTGCA\nTG")
        r = reader.next()
        assert r.id() == b"test"
        assert r.raw_seq() == b"ACGT\nACGT"
        assert r.num_bases() == 8
        assert reader.line_ending() == LineEnding.UNIX
        r = reader.next()
        assert r.id() == b"test2"
        assert r.raw_seq() == b"TGCA\nTG"
        assert r.num_bases() == 6
        assert reader.next() is None

    def test_wrapped_windows(self):
        reader = FastaReader(b">test\r\nACGT\r\nACGT\r\n>test2\r\nTGCA\r\nTG")
        r = reader.next()
        assert r.id() == b"test"
        assert r.raw_seq() == b"ACGT\r\nACGT"
        assert r.num_bases() == 8
        assert r.start_line_number() == 1
        assert reader.line_ending() == LineEnding.WINDOWS
        r = reader.next()
        assert r.id() == b"test2"
        assert r.raw_seq() == b"TGCA\r\nTG"
        assert r.num_bases() == 6
        assert r.start_line_number() == 4
        assert reader.next() is None

    def test_premature_ending(self):
        reader = FastaReader(b">test\nAGCT\n>test2")
        reader.next()
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.UNEXPECTED_END

        reader = FastaReader(b">test\r\nAGCT\r\n>test2\r\n")
        reader.next()
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.UNEXPECTED_END

    def test_empty_records(self):
        reader = FastaReader(b">\n\n>shine\nAGGAGGU")
        r = reader.next()
        assert r.id() == b""
        assert r.raw_seq() == b""
        r = reader.next()
        assert r.id() == b"shine"
        assert r.raw_seq() == b"AGGAGGU"

        reader = FastaReader(b">\r\n\r\n>shine\r\nAGGAGGU")
        r = reader.next()
        assert r.id() == b""
        assert r.raw_seq() == b""
        r = reader.next()
        assert r.id() == b"shine"
        assert r.raw_seq() == b"AGGAGGU"

    def test_invalid_start(self):
        reader = FastaReader(b"AGCT\nACGT\n")
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.INVALID_START

    def test_empty_input(self):
        reader = FastaReader(b"")
        assert reader.next() is None

    def test_header_only_mid_file(self):
        reader = FastaReader(b">a\n>b\nACGT\n")
        r = reader.next()
        assert r.id() == b"a"
        assert r.raw_seq() == b""
        assert r.all() == b">a"
        r = reader.next()
        assert r.id() == b"b"
        assert r.raw_seq() == b"ACGT"

    def test_seq_method_strips_newlines(self):
        reader = FastaReader(b">test\nAC\r\nGT\nAA\n")
        r = reader.next()
        assert r.raw_seq() == b"AC\r\nGT\nAA"
        assert r.seq() == b"ACGTAA"
        assert r.num_bases() == 6

    def test_small_chunks(self):
        # stress the incremental refill path with a tiny chunk size
        data = b">test\nACGT\nACGT\n>test2\nTGCA\nTG"
        reader = FastaReader(io.BytesIO(data), capacity=3)
        recs = collect(reader)
        assert [r.id() for r in recs] == [b"test", b"test2"]
        assert [r.raw_seq() for r in recs] == [b"ACGT\nACGT", b"TGCA\nTG"]


class TestFastq:
    def test_simple(self):
        for data, ending in [
            (b"@test\nAGCT\n+test\n~~a!\n@test2\nTGCA\n+test\nWUI9", LineEnding.UNIX),
            (
                b"@test\r\nAGCT\r\n+test\r\n~~a!\r\n@test2\r\nTGCA\r\n+test\r\nWUI9",
                LineEnding.WINDOWS,
            ),
        ]:
            reader = FastqReader(data)
            recs = collect(reader)
            assert len(recs) == 2
            assert recs[0].id() == b"test"
            assert recs[0].raw_seq() == b"AGCT"
            assert recs[0].qual() == b"~~a!"
            assert recs[1].id() == b"test2"
            assert recs[1].raw_seq() == b"TGCA"
            assert recs[1].qual() == b"WUI9"
            assert reader.line_ending() == ending

    def test_eof_in_qual(self):
        reader = FastqReader(b"@test\nACGT\n+\nIII")
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.UNEQUAL_LENGTHS

    def test_eof_in_seq(self):
        reader = FastqReader(b"@test\nAGCT\n+test\n~~a!\n@test2\nTGCA")
        assert reader.next() is not None
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.UNEXPECTED_END

    def test_trailing_empty_lines_ok(self):
        reader = FastqReader(b"@test\nAGCT\n+test\n~~a!\n\n")
        assert reader.next() is not None
        assert reader.next() is None

    def test_trailing_nonempty_not_ok(self):
        reader = FastqReader(b"@test\nAGCT\n+test\n~~a!\n\n@TEST\nA\n+TEST\n~")
        assert reader.next() is not None
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.INVALID_START

    def test_empty_records(self):
        reader = FastqReader(b"@\n\n+\n\n@test2\nTGCA\n+test2\n~~~~\n")
        r = reader.next()
        assert r.id() == b""
        assert r.raw_seq() == b""
        assert r.qual() == b""
        assert r.all() == b"@\n\n+\n"
        r = reader.next()
        assert r.id() == b"test2"
        assert r.raw_seq() == b"TGCA"
        assert r.qual() == b"~~~~"
        assert r.all() == b"@test2\nTGCA\n+test2\n~~~~"
        assert reader.next() is None

    def test_weird_ncbi(self):
        seq = b"ACGT" * 21 + b"AC"
        qual = b"0" * 86
        data = (
            b"@NCBI actually has files like this\n" + seq + b"\n+\n" + qual + b"\n"
            b"@NCBI actually has files like this\n\n+\n\n"
            b"@NCBI actually has files like this\n" + seq + b"\n+\n" + qual
        )
        reader = FastqReader(data)
        assert reader.next().start_line_number() == 1
        assert reader.next().start_line_number() == 5
        assert reader.next().start_line_number() == 9

    def test_mismatched_lengths(self):
        reader = FastqReader(b"@test\nAGCT\n+\nIII\n@TEST\nA\n+\nI")
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.UNEQUAL_LENGTHS

    def test_bad_headers_file(self, data_dir):
        reader = FastqReader.from_path(data_dir / "bad_header.fastq")
        assert reader.next() is not None
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.UNEXPECTED_END

    def test_random_tsv_file(self, data_dir):
        reader = FastqReader.from_path(data_dir / "random_tsv.fq")
        assert reader.next() is not None
        with pytest.raises(ParseError) as ei:
            reader.next()
        assert ei.value.kind == ParseErrorKind.INVALID_SEPARATOR

    def test_small_chunks(self):
        data = b"@test\nAGCT\n+test\n~~a!\n@test2\nTGCA\n+test\nWUI9"
        reader = FastqReader(io.BytesIO(data), capacity=3)
        recs = collect(reader)
        assert [r.id() for r in recs] == [b"test", b"test2"]


class TestRecordPositions:
    def test_start_line_number(self):
        reader = parse_fastx_reader(b"@test\nACGT\n+\nIIII\n@test2\nACGT\n+\nIIII")
        assert reader.next().start_line_number() == 1
        assert reader.next().start_line_number() == 5

    def test_position_bytes(self):
        reader = parse_fastx_reader(
            b"@test1\nACGT\n+\nIIII\n@test222\nACGT\n+\nIIII\n@test3\nACGT\n+\nIIII"
        )
        assert reader.next().position().byte() == 0
        assert reader.next().position().byte() == 19
        assert reader.next().position().byte() == 40

    def test_decode_phred(self):
        reader = parse_fastx_reader(b"@test1\nACGT\n+\nIIII")
        rec = reader.next()
        assert list(rec.decode_phred(PhredEncoding.PHRED33)) == [40, 40, 40, 40]

    def test_fasta_decode_phred_none(self):
        reader = parse_fastx_reader(b">x\nACGT\n")
        assert reader.next().decode_phred(PhredEncoding.PHRED33) is None


class TestDispatch:
    def test_doc_example(self):
        reader = parse_fastx_reader(b">read1\nACGT\nread2\nGGGG")
        recs = collect(reader)
        assert len(recs) == 1  # "read2" line is part of read1's sequence
        assert recs[0].id() == b"read1"
        assert recs[0].raw_seq() == b"ACGT\nread2\nGGGG"

    def test_empty_file(self):
        with pytest.raises(ParseError) as ei:
            parse_fastx_reader(b"")
        assert ei.value.kind == ParseErrorKind.EMPTY_FILE

    def test_one_byte(self):
        with pytest.raises(ParseError) as ei:
            parse_fastx_reader(b"@")
        assert ei.value.kind == ParseErrorKind.EMPTY_FILE

    def test_unknown_format(self):
        with pytest.raises(ParseError) as ei:
            parse_fastx_reader(b"Not a valid file")
        assert ei.value.kind == ParseErrorKind.UNKNOWN_FORMAT

    def test_empty_gz(self):
        payload = gzip.compress(b"")
        with pytest.raises(ParseError) as ei:
            parse_fastx_reader(payload)
        assert ei.value.kind == ParseErrorKind.EMPTY_FILE

    def test_empty_bz2(self):
        payload = bz2.compress(b"")
        with pytest.raises(ParseError) as ei:
            parse_fastx_reader(payload)
        assert ei.value.kind == ParseErrorKind.EMPTY_FILE

    def test_empty_xz(self):
        payload = lzma.compress(b"")
        with pytest.raises(ParseError) as ei:
            parse_fastx_reader(payload)
        assert ei.value.kind == ParseErrorKind.EMPTY_FILE

    def test_empty_zstd(self):
        zstandard = pytest.importorskip("zstandard")
        payload = zstandard.ZstdCompressor().compress(b"")
        with pytest.raises(ParseError) as ei:
            parse_fastx_reader(payload)
        assert ei.value.kind == ParseErrorKind.EMPTY_FILE

    def test_gz_roundtrip(self):
        payload = gzip.compress(b">test\nACGT\n")
        reader = parse_fastx_reader(payload)
        rec = reader.next()
        assert rec.id() == b"test" and rec.raw_seq() == b"ACGT"

    def test_multimember_gz(self):
        payload = gzip.compress(b">a\nAC\n") + gzip.compress(b">b\nGT\n")
        reader = parse_fastx_reader(payload)
        recs = collect(reader)
        assert [r.id() for r in recs] == [b"a", b"b"]


class TestCompressedFiles:
    @pytest.mark.parametrize("ext", ["gz", "bz2", "xz", "zst"])
    def test_compressed_fa(self, data_dir, ext):
        if ext == "zst":
            pytest.importorskip("zstandard")
        from needletail_tpu.parser import parse_fastx_file

        reader = parse_fastx_file(data_dir / f"test.fa.{ext}")
        recs = collect(reader)
        assert [r.id() for r in recs] == [b"test", b"test2"]
        assert [r.raw_seq() for r in recs] == [b"AGCTGATCGA", b"TAGC"]

    def test_plain_fa(self, data_dir):
        from needletail_tpu.parser import parse_fastx_file

        reader = parse_fastx_file(data_dir / "test.fa")
        recs = collect(reader)
        assert [r.raw_seq() for r in recs] == [b"AGCTGATCGA", b"TAGC"]


class TestIoErrors:
    def test_truncated_gzip_is_parse_error(self, data_dir, tmp_path):
        import gzip as _gzip

        payload = _gzip.compress(b">test\nAGCTGATCGA\n>test2\nTAGC\n" * 100)
        trunc = tmp_path / "trunc.fa.gz"
        trunc.write_bytes(payload[:40])
        from needletail_tpu.parser import parse_fastx_file

        reader = parse_fastx_file(trunc)
        with pytest.raises(ParseError) as ei:
            while reader.next() is not None:
                pass
        assert ei.value.kind == ParseErrorKind.IO


def test_multi_member_gzip(tmp_path):
    """Concatenated gzip members decode as one stream (ref MultiGzDecoder,
    mod.rs:98-106)."""
    import gzip

    import needletail_tpu as nt

    p = tmp_path / "mm.fa.gz"
    p.write_bytes(gzip.compress(b">a\nACGT\n") + gzip.compress(b">b\nGGCC\n"))
    recs = [(r.id, r.seq) for r in nt.parse_fastx_file(str(p))]
    assert recs == [("a", "ACGT"), ("b", "GGCC")]


class TestDecompressionErrorTaxonomy:
    """Mid-stream decode corruption must surface as ParseError(Io) for every
    codec, not the codec's raw exception type."""

    @pytest.mark.parametrize("codec", ["gzip", "xz", "bz2", "zstd"])
    def test_midstream_corruption(self, codec, tmp_path):
        import bz2 as _bz2
        import gzip as _gzip
        import lzma as _lzma

        from needletail_tpu.errors import ParseError, ParseErrorKind
        from needletail_tpu.parser import parse_fastx_file as parse_low

        payload = b">a\n" + b"ACGT" * 5000 + b"\n"
        if codec == "gzip":
            data = _gzip.compress(payload)
        elif codec == "xz":
            data = _lzma.compress(payload)
        elif codec == "bz2":
            data = _bz2.compress(payload)
        else:
            zstd = pytest.importorskip("zstandard")
            data = zstd.ZstdCompressor().compress(payload)
        # corrupt the middle of the stream (keep the magic intact)
        bad = bytearray(data)
        mid = len(bad) // 2
        for i in range(mid, min(mid + 16, len(bad))):
            bad[i] ^= 0xFF
        p = tmp_path / f"c.{codec}"
        p.write_bytes(bytes(bad))
        with pytest.raises(ParseError) as ei:
            reader = parse_low(str(p))
            while reader.next() is not None:
                pass
        assert ei.value.kind == ParseErrorKind.IO


def test_empty_header_error_id_parity(tmp_path):
    """'@\\n...' (empty header) must report the same ErrorPosition.id from
    the streaming reader and the batched path (empty string, not None)."""
    import io as _io

    from needletail_tpu.io.fast_batch import fast_read_batches
    from needletail_tpu.parser import FastqReader

    payload = b"@\nACGT\nX\nIIII\n"
    try:
        r = FastqReader(_io.BytesIO(payload))
        while r.next() is not None:
            pass
        raise AssertionError("expected ParseError")
    except ParseError as e:
        stream_id = e.position.id
    p = tmp_path / "e.fq"
    p.write_bytes(payload)
    try:
        for _ in fast_read_batches(str(p)):
            pass
        raise AssertionError("expected ParseError")
    except ParseError as e:
        assert e.position.id == stream_id
