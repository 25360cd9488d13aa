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


def test_differential_mutation_fuzz():
    """Structured-mutation differential fuzz: random soups, mutated FASTQ,
    truncated wrapped/CRLF FASTA — the batched framers must deliver the
    same records AND the same error (kind, line, id) as the streaming
    readers.  (An 18k-case sweep of this property ran clean in round 2;
    this bounded version keeps it locked; ``tests/deep_fuzz.py`` runs it
    time-boxed with fresh seeds, the reference's 3-minute CI discipline.)"""
    run_differential_mutation_fuzz(np.random.default_rng(1234), 600)


def run_differential_mutation_fuzz(rng, trials):
    import io as _io

    from needletail_tpu.batch import BatchReader
    from needletail_tpu.io.fast_batch import (
        _FastaBatcher,
        _FastqBatcher,
        _StreamWindow,
    )
    from needletail_tpu.parser import parse_fastx_reader

    ALPH = np.frombuffer(b"ACGTNacgtn@>+\n\r\t xI!~", np.uint8)

    def stream_records(data):
        out = []
        try:
            r = parse_fastx_reader(_io.BytesIO(data))
            while (rec := r.next()) is not None:
                out.append(
                    (bytes(rec.id()), bytes(rec.seq()),
                     None if rec.qual() is None else bytes(rec.qual()))
                )
            return out, None
        except ParseError as e:
            return out, (e.kind, e.position.line, e.position.id)

    def batched_records(data, fastq):
        out = []
        try:
            if fastq:
                b = _FastqBatcher(_StreamWindow(_io.BytesIO(data)), 7, None, True, True)
            else:
                b = _FastaBatcher(_StreamWindow(_io.BytesIO(data)), 7, None, True)
            for batch in b:
                for j in range(batch.num_reads):
                    ln = int(batch.lengths[j])
                    out.append(
                        (bytes(batch.ids[j]), batch.seqs[j, :ln].tobytes(),
                         None if batch.quals is None else batch.quals[j, :ln].tobytes())
                    )
            return out, None
        except ParseError as e:
            return out, (e.kind, e.position.line, e.position.id)
        except ValueError:
            return out, "valueerror"

    for trial in range(trials):
        kind = trial % 4
        if kind == 0:
            data = rng.choice(ALPH, rng.integers(0, 400)).tobytes()
        elif kind == 1:
            recs = []
            for i in range(rng.integers(1, 8)):
                ln = int(rng.integers(0, 30))
                seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln).tobytes()
                recs.append(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * ln + b"\n")
            data = bytearray(b"".join(recs))
            for _ in range(rng.integers(0, 4)):
                if data:
                    data[rng.integers(0, len(data))] = rng.integers(0, 256)
            data = bytes(data)
        elif kind == 2:
            recs = []
            for i in range(rng.integers(1, 6)):
                ln = int(rng.integers(0, 80))
                seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), ln).tobytes()
                e = b"\r\n" if rng.random() < 0.3 else b"\n"
                wrapped = e.join(seq[k : k + 11] for k in range(0, max(ln, 1), 11))
                recs.append(b">s%d d\n" % i + wrapped + e)
            blob = b"".join(recs)
            data = blob[: rng.integers(0, len(blob) + 1)]
        else:
            head = rng.choice(np.frombuffer(b"@>", np.uint8), 1).tobytes()
            data = head + rng.choice(ALPH, rng.integers(0, 300)).tobytes()
        if len(data) < 2:
            continue  # the 2-byte dispatch sniff owns these (EmptyFile)
        s_out, s_err = stream_records(data)
        first = data[:1]
        if first not in (b"@", b">"):
            continue
        b_out, b_err = batched_records(data, first == b"@")
        assert b_out == s_out or b_err == "valueerror", (trial, data[:80])
        if s_err and b_err != "valueerror":
            assert b_err is not None and b_err == s_err, (trial, data[:80], s_err, b_err)


def test_fuzz_packed_transport_matches_ascii(tmp_path):
    """Property: for any valid corpus, the native framer's 2-bit packed
    planes equal PackedReadBatch.from_read_batch of the ASCII framing —
    across line-wrap widths and CRLF (which steer the C scanner's
    scalar-head / AVX2-bulk / pair-LUT split at every alignment), mixed
    case, U (normalized => T), N and IUPAC bytes (vbit 0).  Makes the
    round-3 review's ad-hoc probes permanent, covering the runtime-
    dispatched SIMD pack path."""
    from needletail_tpu.batch import PackedReadBatch
    from needletail_tpu.io.fast_batch import fast_read_batches

    rng = np.random.default_rng(20260818)
    alph = np.frombuffer(b"ACGTacgtUuNnRYKMn-", dtype=np.uint8)
    for trial in range(30):
        fastq = rng.random() < 0.5
        crlf = rng.random() < 0.3
        e = b"\r\n" if crlf else b"\n"
        recs = []
        for i in range(int(rng.integers(1, 12))):
            ln = int(rng.integers(1, 400))
            seq = rng.choice(alph, ln).tobytes()
            if fastq:
                qual = rng.integers(33, 74, ln, dtype=np.uint8).tobytes()
                recs.append(b"@r%d x\n" % i + seq + e + b"+" + e + qual + e)
            else:
                w = int(rng.integers(1, 97))  # wrap width incl. 32-multiples
                wrapped = e.join(seq[j : j + w] for j in range(0, ln, w))
                recs.append(b">r%d x\n" % i + wrapped + e)
        p = tmp_path / (f"t{trial}." + ("fq" if fastq else "fa"))
        p.write_bytes(b"".join(recs))
        bs = int(rng.integers(2, 9))
        for a, pk in zip(
            fast_read_batches(str(p), batch_size=bs),
            fast_read_batches(str(p), batch_size=bs, packed=True),
        ):
            oracle = PackedReadBatch.from_read_batch(a)
            assert np.array_equal(pk.lengths, a.lengths), (trial, bs)
            assert np.array_equal(pk.codes, oracle.codes), (trial, bs)
            # validity shape (clean / dense / lean) must match the oracle
            # exactly — both sides apply the same lean wire rule
            assert (pk.vbits is None) == (oracle.vbits is None), (trial, bs)
            assert (pk.vrows is None) == (oracle.vrows is None), (trial, bs)
            if pk.vbits is not None:
                assert np.array_equal(pk.vbits, oracle.vbits), (trial, bs)
            if pk.vrows is not None:
                assert np.array_equal(pk.vrow_idx, oracle.vrow_idx), (trial, bs)
                assert np.array_equal(pk.vrows, oracle.vrows), (trial, bs)
                # lean expands to the true dense plane on the in-length bits
                from needletail_tpu.encoding import pack_codes_host

                _, dense_true = pack_codes_host(a.seqs, a.lengths)
                l = pk.max_len
                got = np.unpackbits(
                    pk.dense_vbits(), axis=1, bitorder="little"
                )[:, :l]
                want = np.unpackbits(dense_true, axis=1, bitorder="little")[:, :l]
                in_len = np.arange(l)[None, :] < pk.lengths[:, None]
                assert np.array_equal(got & in_len, want & in_len), (trial, bs)
