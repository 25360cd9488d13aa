"""Fuzz-style property tests (the reference fuzzes each parser with
libfuzzer, ref fuzz/fuzz_targets/*.rs): arbitrary bytes must either parse or
raise ParseError — never crash, hang, or leak another exception type."""

import gzip

import numpy as np
import pytest

from needletail_tpu.errors import NeedletailError, ParseError
from needletail_tpu.io import native
from needletail_tpu.io.fast_batch import fast_read_batches
from needletail_tpu.parser import FastaReader, FastqReader, parse_fastx_reader

N_CASES = 200


def _random_blobs(seed, prefix):
    rng = np.random.default_rng(seed)
    for _ in range(N_CASES):
        n = int(rng.integers(0, 400))
        # bias towards structure-ish bytes so we exercise deep parser states
        blob = rng.choice(
            np.frombuffer(b">@+ACGTN\n\r\t xyz!0123~", dtype=np.uint8),
            size=n,
        ).tobytes()
        yield prefix + blob


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_fasta(seed):
    for blob in _random_blobs(seed, b">"):
        reader = FastaReader(blob)
        try:
            for _ in range(10_000):
                if reader.next() is None:
                    break
            else:
                pytest.fail(f"parser did not terminate on {blob[:40]!r}")
        except ParseError:
            pass


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_fastq(seed):
    for blob in _random_blobs(seed, b"@"):
        reader = FastqReader(blob)
        try:
            for _ in range(10_000):
                if reader.next() is None:
                    break
            else:
                pytest.fail(f"parser did not terminate on {blob[:40]!r}")
        except ParseError:
            pass


def test_fuzz_dispatch():
    rng = np.random.default_rng(99)
    for _ in range(N_CASES):
        blob = rng.integers(0, 256, size=int(rng.integers(0, 200)), dtype=np.uint8).tobytes()
        try:
            reader = parse_fastx_reader(blob)
            while reader.next() is not None:
                pass
        except ParseError:
            pass


@pytest.mark.skipif(not native.available(), reason="native framer not built")
def test_fuzz_fast_batcher(tmp_path):
    rng = np.random.default_rng(7)
    p = tmp_path / "fuzz.fq"
    for i in range(60):
        n = int(rng.integers(0, 300))
        blob = b"@" + rng.choice(
            np.frombuffer(b"@+ACGTN\n\r xyz0", dtype=np.uint8), size=n
        ).tobytes()
        p.write_bytes(blob)
        try:
            for _ in fast_read_batches(p):
                pass
        except ParseError:
            # auto max_len widens for long records, so ValueError (the
            # explicit-max_len contract) must never escape here
            pass


def test_fuzz_agreement_python_vs_native(tmp_path):
    """Property: the fast batcher and the streaming reader agree on record
    count or raise the same error kind, for structured-random FASTQ."""
    if not native.available():
        pytest.skip("native framer not built")
    rng = np.random.default_rng(21)
    p = tmp_path / "agree.fq"
    for _ in range(80):
        records = []
        for _ in range(int(rng.integers(0, 6))):
            ln = int(rng.integers(0, 20))
            seq = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=ln).tobytes()
            qual = rng.choice(np.frombuffer(b"IJK!", dtype=np.uint8), size=ln).tobytes()
            records.append(b"@r\n" + seq + b"\n+\n" + qual + b"\n")
        blob = b"".join(records)
        if rng.random() < 0.4 and blob:
            blob = blob[: int(rng.integers(1, len(blob) + 1))]  # truncate
        if not blob.startswith(b"@"):
            continue
        p.write_bytes(blob)

        py_count, py_err = 0, None
        try:
            # through the dispatch layer, like the fast path (a <2-byte blob
            # is EmptyFile at dispatch, ref mod.rs:88-91)
            reader = parse_fastx_reader(blob)
            while reader.next() is not None:
                py_count += 1
        except ParseError as e:
            py_err = e.kind

        fast_count, fast_err = 0, None
        try:
            for b in fast_read_batches(p):
                fast_count += b.num_reads
        except ParseError as e:
            fast_err = e.kind

        assert (py_count, py_err) == (fast_count, fast_err), blob
