"""Regression tests for IO-layer robustness fixes (round-2 advisor items)."""

import io
import threading
import time

import pytest

from needletail_tpu.io.prefetch import PrefetchReader


class _SlowStream(io.RawIOBase):
    """Tiny stream that never reaches EOF quickly."""

    def readable(self):
        return True

    def read(self, n=-1):
        time.sleep(0.01)
        return b"A" * min(n if n and n > 0 else 64, 64)


def test_prefetch_read_after_close_raises():
    r = PrefetchReader(_SlowStream(), chunk=64, depth=2)
    assert r.read(16) == b"A" * 16
    r.close()
    with pytest.raises(ValueError):
        r.read(1 << 20)


def test_prefetch_concurrent_close_unblocks_reader():
    r = PrefetchReader(_SlowStream(), chunk=64, depth=2)
    errs = []

    def reader():
        try:
            # Request far more than buffered so the call blocks in _pull.
            while True:
                r.read(1 << 30)
        except ValueError:
            errs.append("ok")
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    time.sleep(0.05)
    r.close()
    t.join(timeout=5.0)
    assert not t.is_alive(), "reader thread stuck after close()"
    assert errs == ["ok"]


def test_count_file_rejects_bucketed_with_workers(tmp_path):
    from needletail_tpu.device.pipeline import count_file

    p = tmp_path / "a.fa"
    p.write_bytes(b">r\nACGTACGT\n")
    with pytest.raises(ValueError, match="mutually exclusive"):
        count_file(str(p), k=4, bucketed=True, host_workers=2)


def test_lazy_ids_pickle_roundtrip():
    """LazyIds travels worker->consumer queues as its packed blob."""
    import pickle

    from needletail_tpu.batch import LazyIds

    ids = LazyIds(b"alpha x\nbeta\n\ngamma\n")
    clone = pickle.loads(pickle.dumps(ids))
    assert list(clone) == [b"alpha x", b"beta", b"", b"gamma"]
    assert clone == ids
    empty = pickle.loads(pickle.dumps(LazyIds(b"")))
    assert len(empty) == 0 and empty == []
