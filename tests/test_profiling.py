"""utils.profiling: the per-stage throughput meter and the jax.profiler
trace context (the SURVEY §5 tracing subsystem — the reference has none)."""

import time

from needletail_tpu.utils.profiling import ThroughputMeter, trace


class TestThroughputMeter:
    def test_stage_accumulates_time_bytes_items(self):
        m = ThroughputMeter()
        with m.stage("frame", nbytes=1000, items=10):
            time.sleep(0.01)
        with m.stage("frame", nbytes=500, items=5):
            pass
        st = m.stages["frame"]
        assert st.bytes == 1500 and st.items == 15
        assert st.seconds >= 0.01

    def test_stage_records_on_exception(self):
        m = ThroughputMeter()
        try:
            with m.stage("boom", nbytes=7):
                raise RuntimeError("x")
        except RuntimeError:
            pass
        assert m.stages["boom"].bytes == 7
        assert m.stages["boom"].seconds >= 0

    def test_add_and_report(self):
        m = ThroughputMeter()
        m.add("device", seconds=2.0, nbytes=200_000_000, items=4)
        rep = m.report()
        assert "device" in rep and "100.0 MB/s" in rep and "2 items/s" in rep

    def test_report_zero_division_safe(self):
        m = ThroughputMeter()
        m.add("idle", seconds=0.0, nbytes=0, items=0)
        assert "idle" in m.report()


class TestTrace:
    def test_noop_without_log_dir(self):
        with trace():
            x = 1
        assert x == 1

    def test_real_trace_writes_events(self, tmp_path):
        import jax
        import jax.numpy as jnp

        with trace(str(tmp_path)):
            jnp.arange(8).sum().block_until_ready()
        # jax.profiler writes a plugins/profile tree under the log dir
        produced = list(tmp_path.rglob("*"))
        assert produced, "trace produced no files"
