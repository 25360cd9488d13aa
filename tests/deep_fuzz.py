#!/usr/bin/env python3
"""Time-boxed deep fuzz (VERDICT r3 #8; the reference runs libfuzzer 3
minutes per parser on every push, ref .github/workflows/tests.yml fuzz job,
fuzz/fuzz_targets/parse_fasta.rs:8-14).

Runs the repo's fuzz properties in a loop with FRESH seeds until the time
budget expires:

  * random-byte robustness: arbitrary '>'/'@'-prefixed bytes must parse or
    raise ParseError — never crash, hang, or leak another exception type
  * dispatch robustness: fully random bytes through parse_fastx_reader
  * differential mutation fuzz: batched framers vs streaming readers must
    agree on records AND error (kind, line, id)

On failure the master seed + iteration is printed for exact reproduction.
With ``--atheris`` (pip install atheris; not in the baked image) the
random-byte targets run coverage-guided instead of purely random.

    python tests/deep_fuzz.py --minutes 3
    make fuzz MINUTES=3
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from needletail_tpu.errors import ParseError  # noqa: E402
from needletail_tpu.parser import (  # noqa: E402
    FastaReader,
    FastqReader,
    parse_fastx_reader,
)


def fuzz_parser_bytes(rng: np.random.Generator, cases: int) -> int:
    """Random structure-biased bytes through both streaming parsers."""
    alph = np.frombuffer(b">@+ACGTN\n\r\t xyz!0123~", dtype=np.uint8)
    done = 0
    for _ in range(cases):
        n = int(rng.integers(0, 500))
        blob = rng.choice(alph, size=n).tobytes()
        for prefix, cls in ((b">", FastaReader), (b"@", FastqReader)):
            reader = cls(prefix + blob)
            try:
                for _ in range(20_000):
                    if reader.next() is None:
                        break
                else:
                    raise AssertionError(
                        f"parser did not terminate on {prefix + blob[:60]!r}"
                    )
                # latched-finish contract: iterating again returns None
                assert reader.next() is None
            except ParseError:
                assert reader.next() is None  # errors latch finished too
            done += 1
    return done


def fuzz_dispatch(rng: np.random.Generator, cases: int) -> int:
    for _ in range(cases):
        blob = rng.integers(
            0, 256, size=int(rng.integers(0, 300)), dtype=np.uint8
        ).tobytes()
        try:
            reader = parse_fastx_reader(blob)
            while reader.next() is not None:
                pass
        except ParseError:
            pass
    return cases


def run_atheris(minutes: float) -> None:  # pragma: no cover - optional dep
    import atheris

    def target(data: bytes) -> None:
        if len(data) < 2:
            return
        try:
            reader = parse_fastx_reader(data)
            for _ in range(20_000):
                if reader.next() is None:
                    break
        except ParseError:
            pass

    atheris.Setup(
        [sys.argv[0], f"-max_total_time={int(minutes * 60)}"], target
    )
    atheris.Fuzz()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=None,
                    help="master seed (default: time-derived, printed)")
    ap.add_argument("--atheris", action="store_true",
                    help="coverage-guided via atheris (if installed)")
    args = ap.parse_args()

    if args.atheris:
        run_atheris(args.minutes)
        return

    from test_fuzz import run_differential_mutation_fuzz

    master = args.seed if args.seed is not None else int(time.time())
    print(f"deep fuzz: {args.minutes} min budget, master seed {master}")
    deadline = time.monotonic() + args.minutes * 60
    it = 0
    totals = {"parser_bytes": 0, "dispatch": 0, "differential": 0}
    while time.monotonic() < deadline:
        seed = master + it
        try:
            totals["parser_bytes"] += fuzz_parser_bytes(
                np.random.default_rng(seed), 150
            )
            totals["dispatch"] += fuzz_dispatch(
                np.random.default_rng(seed ^ 0x5EED), 150
            )
            run_differential_mutation_fuzz(
                np.random.default_rng(seed ^ 0xD1FF), 400
            )
            totals["differential"] += 400
        except Exception:
            print(
                f"FAILURE at iteration {it}: reproduce with "
                f"--seed {master} (iteration seed {seed})",
                file=sys.stderr,
            )
            raise
        it += 1
    print(
        f"deep fuzz clean: {it} iterations — "
        + ", ".join(f"{k}={v}" for k, v in totals.items())
    )


if __name__ == "__main__":
    main()
