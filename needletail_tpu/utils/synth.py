"""Deterministic synthetic corpora for benchmarks and tests.

BASELINE config #4 (whole-genome k=31 spectrum) needs a multi-Mbp FASTA
workload tracked round to round; vendoring a real bacterium would bloat the
repo, so the benchmark synthesizes one deterministically — same seed, same
bytes, everywhere — and asserts golden spectrum invariants computed once
from the host-oracle path (ref benches/benchmark.rs embeds its golden
counts the same way, e.g. 718,007 @ :43-44).
"""

from __future__ import annotations

import numpy as np

__all__ = ["synthetic_genome"]


def synthetic_genome(
    n_bases: int, seed: int = 31, line_width: int = 80, name: str = "synth"
) -> bytes:
    """A deterministic uniform-ACGT FASTA genome as one wrapped record.

    ``default_rng(seed)`` fixes the byte stream across platforms and
    rounds; the result is ~``n_bases * (1 + 1/line_width)`` file bytes.
    """
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, n_bases, dtype=np.uint8)
    seq = np.frombuffer(b"ACGT", dtype=np.uint8)[bases]
    # wrap at line_width with '\n' columns, vectorized
    full, rem = divmod(n_bases, line_width)
    body = np.full((full + (1 if rem else 0), line_width + 1), ord("\n"), np.uint8)
    body[:full, :line_width] = seq[: full * line_width].reshape(full, line_width)
    if rem:
        body[full, :rem] = seq[full * line_width :]
        tail = body[full, : rem + 1].tobytes()
        body = body[:full].tobytes() + tail
    else:
        body = body.tobytes()
    return b">" + name.encode() + b" synthetic uniform genome\n" + body
