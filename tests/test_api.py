"""High-level API tests — semantics match the reference bindings test suite
(needletail test_python.py, 230 lines) plus the record writers."""

import io

import pytest

from needletail_tpu import (
    NeedletailError,
    Record,
    decode_phred,
    normalize_seq,
    parse_fastx_file,
    parse_fastx_string,
    reverse_complement,
)
from needletail_tpu.parser import (
    LineEnding,
    mask_header_tabs,
    mask_header_utf8,
    parse_fastx_reader,
    write_fasta,
    write_fastq,
)

FASTA_FILE = "tests/data/test.fa"
FASTQ_FILE = "tests/specimen/FASTQ/example.fastq"


class TestRecordClass:
    def test_fasta_record(self):
        record = Record("test description", "AGCTGATCGA")
        assert record.id == "test description"
        assert record.seq == "AGCTGATCGA"
        assert record.qual is None

    def test_fastq_record(self):
        record = Record("test description", "AGCTGATCGA", ";**9;;????")
        assert record.qual == ";**9;;????"

    def test_properties(self):
        record = Record("test description", "AGCTGATCGA")
        assert record.name == "test"
        assert record.description == "description"
        assert Record("solo", "A").description is None

    def test_normalize(self):
        record = Record("test", "AGCTGYrtcga")
        record.normalize(iupac=True)
        assert record.seq == "AGCTGYRTCGA"
        record.normalize()
        assert record.seq == "AGCTGNNTCGA"

    def test_format_methods(self):
        record = Record("test", "AGCTGATCGA")
        assert record.is_fasta() and not record.is_fastq()
        record = Record("test", "AGCTGATCGA", ";**9;;????")
        assert record.is_fastq() and not record.is_fasta()

    def test_eq(self):
        r1 = Record("test", "AGCTGATCGA", ";**9;;????")
        r2 = Record("test", "AGCTGATCGA", ";**9;;????")
        assert r1 == r2
        assert r1 != Record("test2", "AGCTGATCGA", ";**9;;????")
        assert r1 != Record("test", "TCGATCAGCT", ";**9;;????")
        assert r1 != Record("test", "AGCTGATCGA", "????;**9;;")
        assert r1 != Record("test", "AGCTGATCGA")

    def test_str(self):
        assert str(Record("test", "AGCTGATCGA")) == ">test\nAGCTGATCGA\n"
        assert (
            str(Record("test", "AGCTGATCGA", ";**9;;????"))
            == "@test\nAGCTGATCGA\n+\n;**9;;????\n"
        )

    def test_repr(self):
        assert (
            repr(Record("test", "AGCTGATCGAAGCTGATCGAA"))
            == "Record(id=test, seq=AGCTGATCGAAGCTGA…GAA, qual=None)"
        )
        assert (
            repr(Record("test", "AGCTGATCGAAGCTGATCGAA", ";**9;;????;**9;;????;"))
            == "Record(id=test, seq=AGCTGATCGAAGCTGA…GAA, qual=;**9;;????;**9;;…??;)"
        )

    def test_len(self):
        assert len(Record("test", "AGCTGATCGA")) == 10

    def test_hash(self):
        assert hash(Record("t", "A")) == hash(Record("t", "A"))
        assert hash(Record("t", "A", "I")) == hash(Record("t", "A", "I"))
        assert hash(Record("t", "A")) != hash(Record("t", "A", "I"))

    def test_qual_len_validation(self):
        with pytest.raises(ValueError):
            Record("test", "AGCT", "II")


class TestNormalizeSeq:
    def test_vectors(self):
        assert normalize_seq("ACGTU", iupac=False) == "ACGTT"
        assert normalize_seq("acgtu", iupac=False) == "ACGTT"
        assert normalize_seq("BDHVRYSWKM") == normalize_seq("BDHVRYSWKM", iupac=False)
        assert normalize_seq("BDHVRYSWKM", iupac=False) == "NNNNNNNNNN"
        assert normalize_seq("BDHVRYSWKM", iupac=True) == "BDHVRYSWKM"
        assert normalize_seq("bdhvryswkm", iupac=True) == "BDHVRYSWKM"
        assert normalize_seq("N.N.N.N", iupac=False) == "N-N-N-N"
        assert normalize_seq("N~N~N~N", iupac=False) == "N-N-N-N"
        assert normalize_seq("N N N N", iupac=False) == "NNNN"
        assert normalize_seq("N\tN\tN\tN", iupac=False) == "NNNN"
        assert normalize_seq("N!N!N!N", iupac=False) == "NNNNNNN"
        assert normalize_seq("N9N5N1N", iupac=False) == "NNNNNNN"


class TestReverseComplement:
    def test_vectors(self):
        assert reverse_complement("a") == "t"
        assert reverse_complement("c") == "g"
        assert reverse_complement("g") == "c"
        assert reverse_complement("n") == "n"
        assert reverse_complement("atcg") == "cgat"
        assert reverse_complement("ATCG") == "CGAT"


class TestDecodePhred:
    def test_vectors(self):
        assert decode_phred("#</</BBFFFBF<") == (
            2, 27, 14, 27, 14, 33, 33, 37, 37, 37, 33, 37, 27,
        )
        assert decode_phred("B[N[Naaeeeae[", base_64=True) == (
            2, 27, 14, 27, 14, 33, 33, 37, 37, 37, 33, 37, 27,
        )
        assert decode_phred("") == ()

    def test_invalid(self):
        with pytest.raises(ValueError):
            decode_phred("#</</BBFFFBF ")
        with pytest.raises(ValueError):
            decode_phred("B[N[Naaeeeae?", base_64=True)


class _StrParsingMixin:
    def get_fasta_reader(self):
        with open(FASTA_FILE) as f:
            return parse_fastx_string(f.read())

    def get_fastq_reader(self):
        with open(FASTQ_FILE) as f:
            return parse_fastx_string(f.read())

    def test_can_parse_fasta(self):
        for i, record in enumerate(self.get_fasta_reader()):
            if i == 0:
                assert record.id == "test"
                assert record.seq == "AGCTGATCGA"
                assert record.qual is None
            if i == 1:
                assert record.id == "test2"
                assert record.seq == "TAGC"
            assert i <= 1

    def test_can_parse_fastq(self):
        for i, record in enumerate(self.get_fastq_reader()):
            if i == 0:
                assert record.id == "EAS54_6_R1_2_1_413_324"
                assert record.seq == "CCCTTCTTGTCTTCAGCGTTTCTCC"
                assert record.qual == ";;3;;;;;;;;;;;;7;;;;;;;88"
            if i == 1:
                assert record.id == "EAS54_6_R1_2_1_540_792"
                assert record.seq == "TTGGCAGGCCAAGGCCGATGGATCA"
                assert record.qual == ";;;;;;;;;;;7;;;;;-;;;3;83"
            assert i <= 2


class TestStrParsing(_StrParsingMixin):
    pass


class TestFileParsing(_StrParsingMixin):
    def get_fasta_reader(self):
        return parse_fastx_file(FASTA_FILE)

    def get_fastq_reader(self):
        return parse_fastx_file(FASTQ_FILE)

    def test_pathlib_input(self):
        from pathlib import Path

        parse_fastx_file(Path(FASTA_FILE))


class TestErroring:
    def test_file_not_found(self):
        with pytest.raises(NeedletailError):
            parse_fastx_file("hey")

    def test_invalid_record(self):
        with pytest.raises(NeedletailError):
            for _ in parse_fastx_string("Not a valid file"):
                pass


class TestWriters:
    def test_write_fasta(self):
        buf = io.BytesIO()
        write_fasta(b"id", b"ACGT", buf, LineEnding.UNIX)
        assert buf.getvalue() == b">id\nACGT\n"
        buf = io.BytesIO()
        write_fasta(b"id", b"ACGT", buf, LineEnding.WINDOWS)
        assert buf.getvalue() == b">id\r\nACGT\r\n"

    def test_write_fastq_fill(self):
        buf = io.BytesIO()
        write_fastq(b"id", b"ACGT", None, buf, LineEnding.UNIX)
        assert buf.getvalue() == b"@id\nACGT\n+\nIIII\n"

    def test_record_roundtrip_preserves_ending(self):
        data = b"@test\r\nAGCT\r\n+x\r\n~~a!\r\n"
        reader = parse_fastx_reader(data)
        rec = reader.next()
        buf = io.BytesIO()
        rec.write(buf)
        # '+' line content is not preserved (reference writes bare '+')
        assert buf.getvalue() == b"@test\r\nAGCT\r\n+\r\n~~a!\r\n"

    def test_record_roundtrip_forced_ending(self):
        reader = parse_fastx_reader(b">a\nACGT\n")
        rec = reader.next()
        buf = io.BytesIO()
        rec.write(buf, LineEnding.WINDOWS)
        assert buf.getvalue() == b">a\r\nACGT\r\n"

    def test_mask_header_tabs(self):
        assert mask_header_tabs(b"a\tb") == b"a|b"
        assert mask_header_tabs(b"ab") is None

    def test_mask_header_utf8(self):
        assert mask_header_utf8(b"ok") is None
        masked = mask_header_utf8(b"bad\xff")
        assert masked == "bad�".encode("utf-8")
