"""Per-stage timing and optional device profiling.

The reference only records a wall-clock ``processing_time_ms``
(service.py:41-50). Here every query carries a stage breakdown
(encode / lexical / dense / fuse / rerank), and a jax.profiler trace can be
captured around any region for xprof analysis.
"""

import contextlib
import logging
import time
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)


@dataclass
class StageTimings:
    """Millisecond wall-clock per named stage."""

    stages: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed_ms = (time.perf_counter() - start) * 1000.0
            self.stages[name] = self.stages.get(name, 0.0) + elapsed_ms

    def total_ms(self) -> float:
        return sum(self.stages.values())

    def as_dict(self) -> dict[str, float]:
        return dict(self.stages)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler trace into log_dir when set; no-op otherwise.

    View with xprof/tensorboard. Usage:
        with device_trace("/tmp/trace"):
            engine.search_batch(...)
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Device trace written to %s", log_dir)
