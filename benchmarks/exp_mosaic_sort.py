"""VERDICT r4 #3: the one unattempted lever on the exact-flush sort floor —
a hand-written Mosaic (Pallas TPU) sort kernel, measured against XLA's
``lax.sort`` on the real chip.

Design under test: VMEM-resident bitonic sorting network over [R, 128]
blocks.  Every compare-exchange stage is expressed WITHOUT reshapes or
gathers — the butterfly partner (index XOR stride) is materialized with two
circular rolls + a select (``pltpu.roll`` along the sublane axis for
strides >= 128, along the lane axis for strides < 128), so the whole
network is VPU-only elementwise work on a tile that never leaves VMEM.
The u32 compares sidestep the known sub-32-bit vector-compare backend
crash (PERF_NOTES.md).

Stage cost model: a block of n = R*128 lanes takes log2(n)*(log2(n)+1)/2
stages; each stage is ~8 VPU ops (2 rolls, 3 iota-masks, compare, 2
selects).  XLA's flat sort costs ~3.0 ns/lane (1-key) / ~4.4 (2-key);
the block kernel wins only if its per-stage cost is low enough that
n*log^2(n) elementwise work beats XLA's network — this experiment
measures exactly that, block-local first (the full sort additionally
needs cross-block merge passes over HBM, which only make sense if the
local phase wins).

Run: PYTHONPATH=. python benchmarks/exp_mosaic_sort.py [--lanes 8388608]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic_kernel(x_ref, o_ref, *, lanes: int):
    """Sort one [R, 128] u32 block ascending in row-major flat order.

    Mosaic cannot legalize vector ``arith.minui`` (measured: "failed to
    legalize operation 'arith.minui'", this toolchain), so keys are biased
    into order-preserving int32 (bitcast + sign-bit XOR) once at entry and
    every compare-exchange is a signed compare + selects."""
    rows = lanes // 128
    bias = jnp.int32(-(2**31))
    x = jax.lax.bitcast_convert_type(x_ref[:], jnp.int32) ^ bias
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    i = r * 128 + c
    k = 2
    while k <= lanes:
        j = k // 2
        while j >= 1:
            if j >= 128:
                t = j // 128
                low = (r & t) == 0
                # roll shift must be non-negative: -t rides as rows - t
                part = jnp.where(
                    low,
                    pltpu.roll(x, rows - t, axis=0),
                    pltpu.roll(x, t, axis=0),
                )
            else:
                low = (c & j) == 0
                part = jnp.where(
                    low,
                    pltpu.roll(x, 128 - j, axis=1),
                    pltpu.roll(x, j, axis=1),
                )
            asc = (i & k) == 0
            take_min = asc == low
            p_less = part < x
            mn = jnp.where(p_less, part, x)
            mx = jnp.where(p_less, x, part)
            x = jnp.where(take_min, mn, mx)
            j //= 2
        k *= 2
    o_ref[:] = jax.lax.bitcast_convert_type(x ^ bias, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("block_lanes",))
def bitonic_block_sort(x: jax.Array, block_lanes: int) -> jax.Array:
    """Sort each consecutive ``block_lanes`` span of ``x`` (u32 [N])
    independently (N % block_lanes == 0)."""
    n = x.shape[0]
    rows = block_lanes // 128
    g = n // block_lanes
    y = pl.pallas_call(
        functools.partial(_bitonic_kernel, lanes=block_lanes),
        out_shape=jax.ShapeDtypeStruct((g * rows, 128), x.dtype),
        grid=(g,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
    )(x.reshape(g * rows, 128))
    return y.reshape(n)


def _sync(x):
    # dependent-scalar sync: block_until_ready alone can return early on
    # shallow queues (PERF_NOTES methodology)
    return float(jnp.sum(x[:: max(1, x.shape[0] // 999983)].astype(jnp.uint32)))


def _time_op(fn, *args, reps=3):
    fn(*args)  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=8 << 20)
    ap.add_argument("--blocks", type=int, nargs="*",
                    default=[1 << 14, 1 << 16, 1 << 17])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    host = rng.integers(0, 1 << 32, size=args.lanes, dtype=np.uint32)
    x = jnp.asarray(host)

    # correctness first (small case, all block sizes)
    small = jnp.asarray(host[: 1 << 18])
    for bl in args.blocks:
        got = np.asarray(bitonic_block_sort(small, bl))
        want = np.sort(
            np.asarray(small).reshape(-1, bl), axis=1, kind="stable"
        ).reshape(-1)
        assert np.array_equal(got, want), f"block sort wrong at {bl}"
    print("correctness: block sorts == np.sort per block")

    xla_sort = jax.jit(lambda a: jax.lax.sort(a))
    t = _time_op(xla_sort, x)
    print(f"lax.sort flat        {args.lanes} lanes: {t*1e3:8.2f} ms "
          f"({t/args.lanes*1e9:.2f} ns/lane)")

    for bl in args.blocks:
        t = _time_op(lambda a, b=bl: bitonic_block_sort(a, b), x)
        print(f"mosaic bitonic {bl:7d}-lane blocks: {t*1e3:8.2f} ms "
              f"({t/args.lanes*1e9:.2f} ns/lane)")

    # the XLA row-sort reference from exp_sort_shapes (same lane count)
    rows = jax.jit(lambda a: jax.lax.sort(a.reshape(-1, 1 << 16), dimension=1))
    t = _time_op(rows, x)
    print(f"lax.sort rows 65536  {args.lanes} lanes: {t*1e3:8.2f} ms "
          f"({t/args.lanes*1e9:.2f} ns/lane)")


if __name__ == "__main__":
    main()
