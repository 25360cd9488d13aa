"""Third-party format-specimen corpus tests (ref tests/format_specimens.rs).

Every `valid` file must parse end to end; every `invalid` FASTQ must raise.
The same documented carve-outs as the reference apply:
  * FASTA comment lines unsupported (ref format_specimens.rs:34-41)
  * line-wrapped FASTQ quality unsupported (ref format_specimens.rs:54-61)
  * quality-char range / id consistency not validated for perf
    (ref format_specimens.rs:71-85)
"""

import tomllib

import pytest

from needletail_tpu.errors import ParseError
from needletail_tpu.parser import parse_fastx_file

FASTQ_SKIP_VALID = {
    "wrapping_original_sanger.fastq",
    "longreads_original_sanger.fastq",
    "tricky.fastq",
}
FASTQ_SKIP_INVALID_PREFIX = "error_qual_"
FASTQ_SKIP_INVALID = {"error_spaces.fastq", "error_tabs.fastq", "error_diff_ids.fastq"}


def _load_index(path):
    with open(path, "rb") as f:
        return tomllib.load(f)


def _parse_all(path):
    reader = parse_fastx_file(path)
    n = 0
    while reader.next() is not None:
        n += 1
    return n


def _fasta_cases():
    index = _load_index("tests/specimen/FASTA/index.toml")
    for case in index["valid"]:
        if "comments" in (case.get("tags") or []):
            continue
        yield case["filename"]


def _fastq_valid_cases():
    index = _load_index("tests/specimen/FASTQ/index.toml")
    for case in index["valid"]:
        if case["filename"] in FASTQ_SKIP_VALID:
            continue
        yield case["filename"]


def _fastq_invalid_cases():
    index = _load_index("tests/specimen/FASTQ/index.toml")
    for case in index.get("invalid", []):
        name = case["filename"]
        if name in FASTQ_SKIP_INVALID or name.startswith(FASTQ_SKIP_INVALID_PREFIX):
            continue
        yield name


@pytest.mark.parametrize("filename", sorted(_fasta_cases()))
def test_specimen_fasta_valid(filename):
    assert _parse_all(f"tests/specimen/FASTA/{filename}") >= 0


@pytest.mark.parametrize("filename", sorted(_fastq_valid_cases()))
def test_specimen_fastq_valid(filename):
    assert _parse_all(f"tests/specimen/FASTQ/{filename}") >= 0


@pytest.mark.parametrize("filename", sorted(_fastq_invalid_cases()))
def test_specimen_fastq_invalid(filename):
    with pytest.raises(ParseError):
        _parse_all(f"tests/specimen/FASTQ/{filename}")


class TestBatchedPathOnSpecimens:
    """The native batched framer must agree with the streaming reader on
    every valid specimen: same record count, same newline-stripped
    sequences in order."""

    @staticmethod
    def _stream_seqs(path):
        reader = parse_fastx_file(path)
        out = []
        while (rec := reader.next()) is not None:
            out.append(bytes(rec.seq()))
        return out

    @staticmethod
    def _batched_seqs(path):
        from needletail_tpu.io.fast_batch import fast_read_batches

        out = []
        for b in fast_read_batches(path, batch_size=7):
            for i in range(b.num_reads):
                ln = int(b.lengths[i])
                out.append(bytes(b.seqs[i, :ln]))
        return out

    @pytest.mark.parametrize("filename", list(_fasta_cases()))
    def test_fasta_specimens(self, filename):
        path = f"tests/specimen/FASTA/{filename}"
        assert self._batched_seqs(path) == self._stream_seqs(path)

    @pytest.mark.parametrize("filename", list(_fastq_valid_cases()))
    def test_fastq_specimens(self, filename):
        path = f"tests/specimen/FASTQ/{filename}"
        assert self._batched_seqs(path) == self._stream_seqs(path)
