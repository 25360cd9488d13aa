"""Experiment: is the exact-engine flush sort cheaper as batched row sorts?

PERF_NOTES.md pins the exact spectrum at ~5 ns/lane on the flat 2-key
(hi, lo) `lax.sort`.  XLA's TPU sort is bitonic-style (cost ~ log^2 n per
lane), so sorting R independent rows of C lanes each should cost
log^2(C) / log^2(N) of the flat sort -- IF the lowering actually prices
rows independently.  This measures that, plus the 1-key narrow variant and
a u64 single-key sort, on synthetic streams with a bench-like distinct
ratio (~200k distinct in 64M lanes).

Run on the real chip:  python benchmarks/exp_sort_shapes.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(fn, *args, trials=3):
    out = fn(*args)  # compile + warm
    _sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        out = fn(*args)  # chain two: shallow-queue guard (PERF_NOTES)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / 2)
    return best


def _sync(out):
    if isinstance(out, tuple):
        out = out[0]
    np.asarray(out.reshape(-1)[:1])


def main() -> None:
    import needletail_tpu  # noqa: F401  (compile cache setup)
    import jax
    import jax.numpy as jnp

    N = 1 << 26  # 67.1M lanes, the flush scale
    DISTINCT = 1 << 18  # ~262k distinct keys, bench-like ratio
    rng = np.random.default_rng(0)
    pool_hi = rng.integers(0, 1 << 10, DISTINCT, dtype=np.uint32)
    pool_lo = rng.integers(0, 1 << 32, DISTINCT, dtype=np.uint32)
    idx = rng.integers(0, DISTINCT, N)
    hi = jax.device_put(jnp.asarray(pool_hi[idx]))
    lo = jax.device_put(jnp.asarray(pool_lo[idx]))

    results = {}

    @jax.jit
    def flat2(hi, lo):
        return jax.lax.sort((hi.reshape(-1), lo.reshape(-1)), num_keys=2)

    @jax.jit
    def flat1(lo):
        return jax.lax.sort(lo.reshape(-1))

    def row2(rows):
        @jax.jit
        def f(hi, lo):
            return jax.lax.sort(
                (hi.reshape(rows, -1), lo.reshape(rows, -1)),
                dimension=1,
                num_keys=2,
            )

        return f

    def row1(rows):
        @jax.jit
        def f(lo):
            return jax.lax.sort(lo.reshape(rows, -1), dimension=1)

        return f

    t = bench(flat1, lo)
    results["flat 1-key 67M"] = t
    print(f"flat 1-key:              {t*1e3:8.1f} ms  {t/N*1e9:.2f} ns/lane", flush=True)

    t = bench(flat2, hi, lo)
    results["flat 2-key 67M"] = t
    print(f"flat 2-key:              {t*1e3:8.1f} ms  {t/N*1e9:.2f} ns/lane", flush=True)

    for rows in (64, 256, 1024):
        t = bench(row2(rows), hi, lo)
        results[f"row 2-key {rows}x{N//rows}"] = t
        print(
            f"row 2-key {rows:5d}x{N//rows:<8d}: {t*1e3:8.1f} ms  {t/N*1e9:.2f} ns/lane",
            flush=True,
        )
    for rows in (256, 1024):
        t = bench(row1(rows), lo)
        results[f"row 1-key {rows}x{N//rows}"] = t
        print(
            f"row 1-key {rows:5d}x{N//rows:<8d}: {t*1e3:8.1f} ms  {t/N*1e9:.2f} ns/lane",
            flush=True,
        )

    # u64 single-key: is one wide sort cheaper than a 2-key u32 sort?
    try:
        key64 = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)

        @jax.jit
        def flat64(k):
            return jax.lax.sort(k.reshape(-1))

        t = bench(flat64, key64)
        results["flat u64 67M"] = t
        print(f"flat u64 1-key:          {t*1e3:8.1f} ms  {t/N*1e9:.2f} ns/lane", flush=True)
    except Exception as exc:  # x64 disabled or unsupported
        print(f"u64 sort unavailable: {exc}", flush=True)

    print(results)


if __name__ == "__main__":
    main()
