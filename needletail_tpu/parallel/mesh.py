"""Mesh construction helpers.

Axes:
  * ``data``  — read batches are sharded across this axis (the only
    semantically meaningful batch parallelism for FASTX work).
  * ``table`` — the count table's key space is sharded across this axis;
    each device owns a contiguous ``4^k / table`` slice of the spectrum.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "mesh_shape_for"]


def mesh_shape_for(n_devices: int) -> Tuple[int, int]:
    """Pick a (data, table) factorization: table gets the smaller power-of-two
    factor (<= 4 and never more than data) so most parallelism serves read
    throughput — table columns replicate extraction in the dense design."""
    table = 1
    remaining = n_devices
    while table < 4 and remaining % 2 == 0 and remaining // 2 >= table * 2:
        table *= 2
        remaining //= 2
    return remaining, table


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    table: Optional[int] = None,
) -> Mesh:
    """Create a ``(data, table)`` mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and table is None:
        data, table = mesh_shape_for(n)
    elif data is None:
        data = n // table
    elif table is None:
        table = n // data
    if data * table != n:
        raise ValueError(f"mesh {data}x{table} != {n} devices")
    arr = np.asarray(devices).reshape(data, table)
    return Mesh(arr, axis_names=("data", "table"))
