"""Multi-process host framing: parallel byte-range workers feeding batches.

One framing core tops out around ~400 Mbases/s while a v5e chip counts at
~3.3 Gbases/s — the host is the deployment bottleneck (SURVEY.md §7 hard
part 3).  ``parallel_read_batches`` splits an uncompressed FASTX file into
record-aligned byte ranges (``parallel.distributed.split_fastx_ranges``)
and frames each range in its own worker process with the native scanner,
streaming ``ReadBatch``es back over a queue.

Batch arrival order interleaves across workers; every record is framed by
exactly one worker, so any order-independent consumer (all the counting
pipelines — integer adds commute) gets bit-identical results.
"""

from __future__ import annotations

import multiprocessing as mp
from pathlib import Path
from typing import Iterator, Optional, Union

from ..batch import ReadBatch
from ..errors import ParseError

__all__ = ["parallel_read_batches", "auto_host_workers"]


def auto_host_workers() -> int:
    """Default framing parallelism: all cores but one (the consumer thread
    runs device dispatch + merges), capped at 16 — beyond that the batch
    queue, not framing, binds.  Always >= 1."""
    import os

    return max(1, min((os.cpu_count() or 1) - 1, 16))

_DONE = "done"
_ERR = "err"
_BATCH = "batch"


def _worker(path, start, end, batch_size, max_len, with_quals, with_ids, q) -> None:
    import pickle

    from .fast_batch import fast_read_batches_range

    try:
        for b in fast_read_batches_range(
            path, start, end, batch_size=batch_size, max_len=max_len,
            with_quals=with_quals, with_ids=with_ids,
        ):
            q.put((_BATCH, (b.seqs, b.lengths, b.quals, b.ids)))
        q.put((_DONE, None))
    except BaseException as exc:  # propagate to the consumer
        # mp.Queue pickles in a feeder thread, so an unpicklable exception
        # would vanish silently — verify picklability here and degrade
        try:
            pickle.dumps(exc)
        except Exception:
            exc = ParseError.from_io(OSError(repr(exc)))
        # ship the range start so the consumer can re-base the error's
        # line number from range-relative to file-global (ref
        # errors.rs:10-24 position fidelity)
        q.put((_ERR, (exc, start)))


def _count_newlines_before(path, stop: int) -> int:
    """Newlines in file[0:stop] — only runs on the (rare) error path, so
    a plain chunked read + bytes.count is fine."""
    remaining = stop
    count = 0
    with open(path, "rb") as f:
        while remaining > 0:
            chunk = f.read(min(remaining, 8 << 20))
            if not chunk:
                break
            count += chunk.count(b"\n")
            remaining -= len(chunk)
    return count


def _rebase_error(path, exc, range_start: int):
    """Rewrite a worker ParseError's line number to be file-global."""
    if (
        not isinstance(exc, ParseError)
        or range_start <= 0
        or exc.position is None
        or exc.position.line is None
    ):
        return exc
    lines_before = _count_newlines_before(path, range_start)
    from ..errors import ErrorPosition

    return ParseError(
        exc.msg,
        exc.kind,
        ErrorPosition(
            line=exc.position.line + lines_before, id=exc.position.id
        ),
        exc.format,
    )


def parallel_read_batches(
    path: Union[str, Path],
    workers: int = 2,
    batch_size: int = 8192,
    max_len: Optional[int] = None,
    with_quals: bool = True,
    with_ids: bool = False,
) -> Iterator[ReadBatch]:
    """Frame an uncompressed FASTX file with ``workers`` processes.

    Falls back to the single-process fast path for ``workers <= 1``.
    Compressed inputs cannot be range-split; use ``fast_read_batches``
    (optionally with ``prefetch=True``) for those.  Errors surface with
    FILE-global line numbers and record ids, identical to the
    single-stream reader; ``with_ids=True`` ships record ids (as packed
    LazyIds) through the worker queue.
    """
    from .fast_batch import fast_read_batches

    if workers <= 1:
        yield from fast_read_batches(
            str(path), batch_size=batch_size, max_len=max_len,
            with_quals=with_quals, with_ids=with_ids,
        )
        return

    from .compression import sniff_compression

    with open(path, "rb") as f:
        magic = f.read(2)
    if len(magic) == 2 and sniff_compression(magic):
        raise ValueError(
            "byte-range framing needs an uncompressed file; use "
            "fast_read_batches(prefetch=True) for compressed input"
        )

    from ..parallel.distributed import split_fastx_ranges

    ranges = split_fastx_ranges(path, workers)
    # spawn, never fork: the consumer typically has JAX (multithreaded)
    # initialized, and forking a multithreaded process can deadlock
    ctx = mp.get_context("spawn")
    q = ctx.Queue(maxsize=4 * workers)
    procs = [
        ctx.Process(
            target=_worker,
            args=(str(path), start, end, batch_size, max_len, with_quals,
                  with_ids, q),
            daemon=True,
        )
        for start, end in ranges
    ]
    for p in procs:
        p.start()
    import queue as _queue

    live = len(procs)
    error = None
    try:
        while live:
            try:
                kind, payload = q.get(timeout=10.0)
            except _queue.Empty:
                # watchdog: a worker killed without its sentinel (OOM,
                # segfault in native code) must not wedge the consumer
                dead = [p for p in procs if p.exitcode not in (None, 0)]
                if dead:
                    error = RuntimeError(
                        f"framing worker died with exit code {dead[0].exitcode}"
                    )
                    break
                if all(p.exitcode is not None for p in procs) and q.empty():
                    break  # everyone exited cleanly; sentinels consumed
                continue
            if kind == _DONE:
                live -= 1
            elif kind == _ERR:
                exc, range_start = payload
                error = _rebase_error(str(path), exc, range_start)
                break
            else:
                seqs, lengths, quals, ids = payload
                yield ReadBatch(seqs=seqs, lengths=lengths, quals=quals, ids=ids)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join()
    if error is not None:
        raise error
