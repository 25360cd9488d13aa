"""ThroughputMeter / trace utility tests."""

import time

from needletail_tpu.utils.profiling import ThroughputMeter


def test_meter_accumulates():
    m = ThroughputMeter()
    with m.stage("frame", nbytes=1000, items=10):
        time.sleep(0.01)
    with m.stage("frame", nbytes=500, items=5):
        pass
    st = m.stages["frame"]
    assert st.bytes == 1500 and st.items == 15 and st.seconds > 0
    report = m.report() if hasattr(m, "report") else None
    # report (when present) must mention the stage
    if isinstance(report, str):
        assert "frame" in report
