"""Experiment 2: can the exact-engine flush sort get cheaper per lane?

Follow-up to exp_sort_shapes.py (which showed row sorts ~2x cheaper/lane
but the range-partition needed to exploit them costs a sort itself, and
whose "u64" row was bogus — with x64 disabled jnp silently downcasts to
u32).  Here, with x64 REALLY enabled:

  * one u64 single-key sort (keys packed from the (hi, lo) u32 planes
    inside the jit, unpacked after) vs the current 2-key u32 sort
  * sort + run-length boundary fused (the real unique_counts shape)
  * 1-key u32 sort with 1 and 2 u32 payloads (radix-pass building block)

Run on the real chip: python benchmarks/exp_sort_u64.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(fn, *args, trials=3):
    out = fn(*args)
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
    while isinstance(out, tuple):
        out = out[0]
    np.asarray(out.reshape(-1)[:1])


def main() -> None:
    import needletail_tpu  # noqa: F401

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    N = 55_296_000 // 1024 * 1024  # in-situ flush shape (k=21 bench)
    DISTINCT = 1 << 18
    rng = np.random.default_rng(0)
    pool_hi = rng.integers(0, 1 << 10, DISTINCT, dtype=np.uint32)  # k=21: 10-bit hi
    pool_lo = rng.integers(0, 1 << 32, DISTINCT, dtype=np.uint32)
    idx = rng.integers(0, DISTINCT, N)
    hi = jax.device_put(jnp.asarray(pool_hi[idx], dtype=jnp.uint32))
    lo = jax.device_put(jnp.asarray(pool_lo[idx], dtype=jnp.uint32))

    @jax.jit
    def sort2(hi, lo):
        return jax.lax.sort((hi, lo), num_keys=2)

    @jax.jit
    def sort2_runlength(hi, lo):
        hi_s, lo_s = jax.lax.sort((hi, lo), num_keys=2)
        boundary = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
        return hi_s, lo_s, boundary.sum()

    @jax.jit
    def sort_u64(hi, lo):
        key = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
        s = jax.lax.sort(key)
        return (s >> jnp.uint64(32)).astype(jnp.uint32), s.astype(jnp.uint32)

    @jax.jit
    def sort_u64_runlength(hi, lo):
        key = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
        s = jax.lax.sort(key)
        boundary = s[1:] != s[:-1]
        return s, boundary.sum()

    @jax.jit
    def sort1_payload1(lo, hi):
        return jax.lax.sort((lo, hi), num_keys=1, is_stable=True)

    @jax.jit
    def sort1_payload2(lo, hi):
        return jax.lax.sort((lo, hi, hi), num_keys=1, is_stable=True)

    for name, fn, args in [
        ("2-key u32 sort        ", sort2, (hi, lo)),
        ("2-key u32 + runlength ", sort2_runlength, (hi, lo)),
        ("u64 pack+sort+unpack  ", sort_u64, (hi, lo)),
        ("u64 pack+sort+runlen  ", sort_u64_runlength, (hi, lo)),
        ("1-key u32 + 1 payload ", sort1_payload1, (lo, hi)),
        ("1-key u32 + 2 payloads", sort1_payload2, (lo, hi)),
    ]:
        try:
            t = bench(fn, *args)
            print(f"{name}: {t*1e3:8.1f} ms  {t/N*1e9:.2f} ns/lane", flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", flush=True)


if __name__ == "__main__":
    main()
