#!/usr/bin/env python3
"""Host framing scaling: aggregate framer throughput vs worker count.

The deployment claim behind ``auto_host_workers`` is that byte-range
framing scales near-linearly with cores until the batch queue binds
(SURVEY section 7 hard part 3: the host must keep chips fed).  This sweep
backs that claim with numbers on whatever machine it runs on:

    python benchmarks/framing_scaling.py --copies 64 [--packed]

Prints one JSON line per worker count:
  {"workers": n, "bases_per_sec": r, "efficiency_vs_1": e}

On the 1-vCPU dev environment this degenerates to workers=1 (documented
in BENCH notes); run on a many-core host for the real curve.
"""

import argparse
import json
import os
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=64,
                    help="corpus = PRJNA271013_head.fq tiled this many times")
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--packed", action="store_true",
                    help="sweep the 2-bit packed transport fills")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from needletail_tpu.io.parallel_host import parallel_read_batches

    src = open("tests/data/PRJNA271013_head.fq", "rb").read()
    with tempfile.NamedTemporaryFile(suffix=".fq", delete=False) as tmp:
        for _ in range(args.copies):
            tmp.write(src)
        path = tmp.name
    try:
        cores = os.cpu_count() or 1
        sizes = [n for n in (1, 2, 4, 8, 16) if n <= max(cores, 1)]
        base = None
        for workers in sizes:
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                bases = 0
                for b in parallel_read_batches(
                    path, workers=workers, batch_size=args.batch_size,
                    max_len=args.max_len, with_quals=False,
                    packed=args.packed,
                ):
                    bases += b.num_bases
                best = min(best, time.perf_counter() - t0)
            assert bases == 250_000 * args.copies
            rate = bases / best
            if base is None:
                base = rate
            print(
                json.dumps(
                    {
                        "workers": workers,
                        "bases_per_sec": round(rate, 1),
                        "efficiency_vs_1": round(rate / base / workers, 3),
                        "packed": args.packed,
                    }
                )
            )
    finally:
        os.unlink(path)


if __name__ == "__main__":
    main()
