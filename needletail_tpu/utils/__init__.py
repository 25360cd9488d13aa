"""Cross-cutting utilities: throughput metering and profiling hooks."""

from .profiling import ThroughputMeter, trace

__all__ = ["ThroughputMeter", "trace"]
