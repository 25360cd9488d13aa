"""Worker for the multi-process fused MULTI-K test (test_multiprocess.py).

Each process owns a disjoint byte range, frames it locally, participates
in the fused multi-k step over the global mesh, and dumps ITS process-
local results: the dense k=4 partial table (its chips' bin ranges) and
its sparse k=21 sorted spectrum.  The parent sums the dense partials and
merges the sparse runs, then compares against single-process oracles.
"""

import os
import sys


def main() -> None:
    path, out, port, pid_s, n_s, rows_s = sys.argv[1:7]
    pid, n, rows_local = int(pid_s), int(n_s), int(rows_s)

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from needletail_tpu.parallel.distributed import (
        initialize,
        read_range,
        split_fastx_ranges,
    )

    initialize(
        coordinator_address=f"localhost:{port}", num_processes=n, process_id=pid
    )

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from needletail_tpu.parallel import ShardedMultiKAccumulator, make_mesh

    devices = jax.devices()
    mesh = make_mesh(devices, data=len(devices), table=1)
    acc = ShardedMultiKAccumulator(mesh, (4, 21), shard_lanes=1 << 12)

    start, end = split_fastx_ranges(path, n)[pid]
    reader = read_range(path, start, end)
    max_len = 128
    seqs = np.zeros((rows_local, max_len), np.uint8)
    lengths = np.zeros((rows_local,), np.int32)
    i = 0
    while (rec := reader.next()) is not None:
        s = rec.seq()
        assert i < rows_local and len(s) <= max_len
        seqs[i, : len(s)] = np.frombuffer(s, np.uint8)
        lengths[i] = len(s)
        i += 1

    data_sharding = NamedSharding(mesh, P("data", None))
    len_sharding = NamedSharding(mesh, P("data"))
    gs = jax.make_array_from_process_local_data(data_sharding, seqs)
    gl = jax.make_array_from_process_local_data(len_sharding, lengths)

    acc.add(gs, gl)
    spec = acc.finish()  # process-local partials
    keys21, counts21 = spec[21]
    np.savez(
        f"{out}.p{pid}.npz",
        dense4=spec[4],
        keys=keys21,
        counts=counts21,
        local_records=i,
    )
    print(f"[p{pid}] records={i} k21_distinct={len(keys21)}", flush=True)


if __name__ == "__main__":
    main()
