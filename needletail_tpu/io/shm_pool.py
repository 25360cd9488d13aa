"""Shared-memory batch transport for the multi-worker framing pool.

The mp.Queue path pickles every batch plane (two copies + pipe
syscalls per ~1 MiB batch) — fine for a couple of workers, a real
bottleneck when 8-16 framing processes feed ~GB/s aggregate.  This pool
pre-allocates ``segments`` shared-memory slots sized
``rows x max_len`` (+ optional quality plane + lengths); workers write
planes in place and ship only ``(segment_id, n_reads, num_bases)``
descriptors through the queue.

Lifetime contract: a yielded batch's arrays VIEW the segment; the
segment is recycled when the consumer asks for the NEXT batch, so
consumers must finish with (or copy, e.g. ``jax.device_put``) a batch
before advancing — exactly how every counting pipeline here behaves.

No reference equivalent (the reference is single-threaded); this is
plumbing for the BASELINE aggregate-ingest target.
"""

from __future__ import annotations

from multiprocessing import shared_memory
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["SharedBatchPool", "SharedBatchWriter"]


def _segment_layout(rows: int, max_len: int, with_quals: bool) -> int:
    plane = rows * max_len
    size = plane + 4 * rows  # seqs + int32 lengths
    if with_quals:
        size += plane
    return size


class SharedBatchPool:
    """Consumer-side owner of the shared segments."""

    def __init__(
        self, rows: int, max_len: int, with_quals: bool, segments: int
    ) -> None:
        self.rows = rows
        self.max_len = max_len
        self.with_quals = with_quals
        size = _segment_layout(rows, max_len, with_quals)
        self._shms: List[shared_memory.SharedMemory] = []
        try:
            for _ in range(segments):
                self._shms.append(
                    shared_memory.SharedMemory(create=True, size=size)
                )
        except BaseException:
            # mid-creation failure (e.g. /dev/shm ENOSPC): release what
            # was already created instead of leaking it until process exit
            self.close()
            raise
        self.names = [s.name for s in self._shms]

    def views(
        self, seg: int, n_reads: int
    ) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
        """(seqs, quals, lengths) views of the first ``n_reads`` rows."""
        buf = self._shms[seg].buf
        plane = self.rows * self.max_len
        seqs = np.frombuffer(buf, np.uint8, plane).reshape(
            self.rows, self.max_len
        )[:n_reads]
        off = plane
        quals = None
        if self.with_quals:
            quals = np.frombuffer(buf, np.uint8, plane, offset=off).reshape(
                self.rows, self.max_len
            )[:n_reads]
            off += plane
        lengths = np.frombuffer(buf, np.int32, self.rows, offset=off)[:n_reads]
        return seqs, quals, lengths

    def close(self) -> None:
        for s in self._shms:
            # close() raises BufferError while consumer-held views still
            # export the buffer — unlink regardless so the name is freed
            # (the mapping lives until the views are garbage-collected)
            try:
                s.close()
            except BufferError:
                pass
            try:
                s.unlink()
            except FileNotFoundError:  # pragma: no cover
                pass


class SharedBatchWriter:
    """Worker-side view over the pool's segments (attached by name)."""

    def __init__(
        self, names: List[str], rows: int, max_len: int, with_quals: bool
    ) -> None:
        self.rows = rows
        self.max_len = max_len
        self.with_quals = with_quals
        self._shms = [shared_memory.SharedMemory(name=n) for n in names]

    def write(self, seg: int, batch) -> int:
        """Copy a ReadBatch's planes into segment ``seg``; returns n_reads."""
        n = batch.num_reads
        buf = self._shms[seg].buf
        plane = self.rows * self.max_len
        seqs = np.frombuffer(buf, np.uint8, plane).reshape(
            self.rows, self.max_len
        )
        seqs[:n, : batch.max_len] = batch.seqs
        if batch.max_len < self.max_len:
            seqs[:n, batch.max_len :] = 0
        off = plane
        if self.with_quals and batch.quals is not None:
            quals = np.frombuffer(buf, np.uint8, plane, offset=off).reshape(
                self.rows, self.max_len
            )
            quals[:n, : batch.max_len] = batch.quals
            if batch.max_len < self.max_len:
                quals[:n, batch.max_len :] = 0
        if self.with_quals:
            off += plane
        lengths = np.frombuffer(buf, np.int32, self.rows, offset=off)
        lengths[:n] = batch.lengths
        return n

    def close(self) -> None:
        for s in self._shms:
            try:
                s.close()
            except BufferError:  # pragma: no cover
                pass
