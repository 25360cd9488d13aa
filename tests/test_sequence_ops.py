"""Host sequence-op tests — vectors match the reference unit tests
(needletail src/sequence.rs:311-375, src/kmer.rs:132-227,
src/bitkmer.rs:188-297, src/quality.rs:30-65)."""

import pytest

from needletail_tpu import bitkmer, kmer, quality, sequence
from needletail_tpu.errors import PhredOffsetError


class TestNormalize:
    def test_basic(self):
        assert sequence.normalize(b"ACGTU", False) == b"ACGTT"
        assert sequence.normalize(b"acgtu", False) == b"ACGTT"
        assert sequence.normalize(b"N.N-N~N N", False) == b"N-N-N-NN"

    def test_iupac(self):
        assert sequence.normalize(b"BDHVRYSWKM", True) is None
        assert sequence.normalize(b"bdhvryswkm", True) == b"BDHVRYSWKM"
        assert sequence.normalize(b"BDHVRYSWKM", False) == b"NNNNNNNNNN"
        assert sequence.normalize(b"bdhvryswkm", False) == b"NNNNNNNNNN"

    def test_unchanged_returns_none(self):
        assert sequence.normalize(b"ACGTN-", False) is None
        assert sequence.normalize(b"", False) is None

    def test_whitespace_and_garbage(self):
        assert sequence.normalize(b"N\tN\nN\rN", False) == b"NNNN"
        assert sequence.normalize(b"N!N@N#N", False) == b"NNNNNNN"
        assert sequence.normalize(b"N9N5N1N", False) == b"NNNNNNN"

    def test_doc_examples(self):
        # ref sequence.rs:216-224 doc-tests
        assert sequence.normalize(b"ADGH", False) == b"ANGN"
        assert sequence.normalize(b"ADGH", True) is None  # already normal
        assert sequence.normalize(b"ACGU", True) == b"ACGT"


class TestComplement:
    def test_single(self):
        assert sequence.complement(ord("a")) == ord("t")
        assert sequence.complement(ord("c")) == ord("g")
        assert sequence.complement(ord("g")) == ord("c")
        assert sequence.complement(ord("n")) == ord("n")

    def test_iupac_pairs(self):
        for a, b in [("R", "Y"), ("K", "M"), ("B", "V"), ("D", "H"), ("S", "S"), ("W", "W")]:
            assert sequence.complement(ord(a)) == ord(b)
            assert sequence.complement(ord(b)) == ord(a)
            assert sequence.complement(ord(a.lower())) == ord(b.lower())

    def test_passthrough(self):
        # U and unknown bytes pass through (ref sequence.rs:101-103)
        assert sequence.complement(ord("U")) == ord("U")
        assert sequence.complement(ord("!")) == ord("!")

    def test_reverse_complement(self):
        assert sequence.reverse_complement(b"AACC") == b"GGTT"


class TestCanonical:
    def test_vectors(self):
        assert sequence.canonical(b"A") == b"A"
        assert sequence.canonical(b"T") == b"A"
        assert sequence.canonical(b"AAGT") == b"AAGT"
        assert sequence.canonical(b"ACTT") == b"AAGT"
        assert sequence.canonical(b"GC") == b"GC"


class TestMinimizer:
    def test_vector(self):
        assert sequence.minimizer(b"ATTTCG", 3) == b"AAA"


class TestQualityMask:
    def test_vector(self):
        assert sequence.quality_mask(b"AGCT", b"AAA0", ord("5")) == b"AGCN"


class TestStripReturns:
    def test_strip(self):
        assert sequence.strip_returns(b"AC\r\nGT\n") == b"ACGT"
        assert sequence.strip_returns(b"ACGT") == b"ACGT"


class TestKmers:
    def test_plain(self):
        assert list(kmer.kmers(b"AGCT", 1)) == [b"A", b"G", b"C", b"T"]
        assert list(kmer.kmers(b"AGNCT", 2)) == [b"AG", b"GN", b"NC", b"CT"]
        assert list(kmer.kmers(b"AC", 2)) == [b"AC"]

    def test_canonical(self):
        seq = b"AGCT"
        rc = sequence.reverse_complement(seq)
        out = list(kmer.canonical_kmers(seq, rc, 1))
        assert out == [
            (0, b"A", False),
            (1, b"C", True),
            (2, b"C", False),
            (3, b"A", True),
        ]

    def test_canonical_k2(self):
        seq = b"AGCTA"
        rc = sequence.reverse_complement(seq)
        got = [k for (_, k, _) in kmer.canonical_kmers(seq, rc, 2)]
        assert got == [b"AG", b"GC", b"AG", b"TA"]

    def test_n_skip(self):
        seq = b"AGNTA"
        rc = sequence.reverse_complement(seq)
        got = [(p, k) for (p, k, _) in kmer.canonical_kmers(seq, rc, 2)]
        assert got == [(0, b"AG"), (3, b"TA")]

    def test_tie_prefers_rc(self):
        # palindrome: fwd == rc slice -> was_rc True (ref kmer.rs:124-128)
        seq = b"AT"
        rc = sequence.reverse_complement(seq)
        out = list(kmer.canonical_kmers(seq, rc, 2))
        assert out == [(0, b"AT", True)]


class TestBitKmer:
    def test_kmerize(self):
        vals = [k[0] for (_, k, _) in bitkmer.bit_kmers(b"AGCT", 1)]
        assert vals == [0b00, 0b10, 0b01, 0b11]
        vals = [k[0] for (_, k, _) in bitkmer.bit_kmers(b"ACNGT", 2)]
        assert vals == [0b0001, 0b1011]
        vals = [k[0] for (_, k, _) in bitkmer.bit_kmers(b"ACNG", 2)]
        assert vals == [0b0001]
        vals = [k[0] for (_, k, _) in bitkmer.bit_kmers(b"AC", 2)]
        assert vals == [0b0001]

    def test_iterator(self):
        it = bitkmer.bit_kmers(b"ACGTA", 3)
        assert list(it) == [
            (0, (6, 3), False),
            (1, (27, 3), False),
            (2, (44, 3), False),
        ]
        assert list(bitkmer.bit_kmers(b"TA", 3)) == []

    def test_reverse_complement(self):
        assert bitkmer.reverse_complement((0b00_0000, 3))[0] == 0b11_1111
        assert bitkmer.reverse_complement((0b11_1111, 3))[0] == 0b00_0000
        assert bitkmer.reverse_complement((0b0000_0000, 4))[0] == 0b1111_1111
        assert bitkmer.reverse_complement((0b0001_1011, 4))[0] == 0b0001_1011

    def test_canonical_tie_prefers_fwd(self):
        # palindromic bit-kmer: canonical keeps forward (ref bitkmer.rs:136-143)
        km = (0b0001_1011, 4)
        out, was_rc = bitkmer.canonical(km)
        assert out == km and was_rc is False

    def test_minimizer(self):
        assert bitkmer.minimizer((0b00_1011, 3), 2)[0] == 0b0010
        assert bitkmer.minimizer((0b00_1011, 3), 1)[0] == 0b00
        assert bitkmer.minimizer((0b1100_0011, 4), 2)[0] == 0b0000
        assert bitkmer.minimizer((0b11_0001, 3), 2)[0] == 0b0001

    def test_roundtrip(self):
        assert bitkmer.bytes_to_bitmer(b"C")[0] == 1
        assert bitkmer.bytes_to_bitmer(b"TTA")[0] == 60
        assert bitkmer.bytes_to_bitmer(b"AAA")[0] == 0
        assert bitkmer.bitmer_to_bytes((1, 1)) == b"C"
        assert bitkmer.bitmer_to_bytes((60, 3)) == b"TTA"
        assert bitkmer.bitmer_to_bytes((0, 3)) == b"AAA"

    def test_k31(self):
        seq = b"A" * 30 + b"C" * 31
        out = list(bitkmer.bit_kmers(seq, 31, True))
        assert len(out) == 31
        # first window: A*30 + C -> value 1, canonical?
        val, k = out[0][1]
        assert k == 31


class TestPhred:
    def test_decode33(self):
        assert list(quality.decode_phred(b"#</</BBFFFBF<", quality.PhredEncoding.PHRED33)) == [
            2, 27, 14, 27, 14, 33, 33, 37, 37, 37, 33, 37, 27,
        ]

    def test_decode64(self):
        assert list(quality.decode_phred(b"B[N[Naaeeeae[", quality.PhredEncoding.PHRED64)) == [
            2, 27, 14, 27, 14, 33, 33, 37, 37, 37, 33, 37, 27,
        ]

    def test_errors(self):
        with pytest.raises(PhredOffsetError) as ei:
            quality.decode_phred(b"#</</BBFFFBF ", quality.PhredEncoding.PHRED33)
        assert ei.value.q == 32 and ei.value.offset == 33
        with pytest.raises(PhredOffsetError) as ei:
            quality.decode_phred(b"B[N[Naaeeeae?", quality.PhredEncoding.PHRED64)
        assert ei.value.q == 63 and ei.value.offset == 64

    def test_empty(self):
        assert quality.decode_phred(b"", quality.PhredEncoding.PHRED33) == b""


class TestSequenceWrapper:
    def test_trait_methods(self):
        from needletail_tpu import Sequence

        s = Sequence(b"AACC")
        assert s.reverse_complement() == b"GGTT"
        assert Sequence(b"ADGH").normalize(False) == b"ANGN"
        assert Sequence(b"ADGH").normalize(True) == b"ADGH"
        assert Sequence(b"ACTT").canonical() == b"AAGT"
        assert Sequence(b"ATTTCG").minimizer(3) == b"AAA"
        assert Sequence(b"AC\r\nGT\n").strip_returns() == b"ACGT"
        assert list(Sequence(b"AGCT").kmers(2)) == [b"AG", b"GC", b"CT"]
        rc = s.reverse_complement()
        assert list(s.canonical_kmers(4, rc))[0][1] == b"AACC"
        assert list(Sequence(b"ACGT").bit_kmers(2))[0] == (0, (1, 2), False)
        assert Sequence(b"AGCT").quality_mask(b"AAA0", ord("5")) == b"AGCN"

    def test_normalize_returns_self_when_unchanged(self):
        from needletail_tpu import Sequence

        s = Sequence(b"ACGT")
        assert s.normalize(False) is s
