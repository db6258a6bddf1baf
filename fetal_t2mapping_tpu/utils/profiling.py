"""Tracing & profiling: per-stage timers + JAX device profiler hooks.

The reference's only observability is ``time.time()`` around the fit pool
and progress prints (reference run_t2mapping.py:429,439-445). Here every
pipeline stage runs under a :class:`StageTimer` that accumulates wall time,
call counts, and stage-specific throughput (voxel-fits/sec/chip for the
solver), and `trace()` wraps a block in ``jax.profiler`` so a TensorBoard-
loadable device trace can be captured on demand.

Usage::

    from fetal_t2mapping_tpu.utils.profiling import profiler, trace

    with profiler.stage("fit", items=n_voxels):
        result = fit_fused(...)
    print(profiler.report())

    with trace("/tmp/t2map_trace"):     # XLA device trace for TensorBoard
        fit_fused(...)
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import threading
import time
from typing import Dict, Iterator, Optional

log = logging.getLogger("fetal_t2mapping_tpu.profiling")


@dataclasses.dataclass
class StageStats:
    calls: int = 0
    seconds: float = 0.0
    items: int = 0

    @property
    def items_per_sec(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0


class Profiler:
    """Thread-safe accumulator of per-stage wall time and throughput."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._stages: Dict[str, StageStats] = {}
        self.enabled = True

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0) -> Iterator[None]:
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                s = self._stages.setdefault(name, StageStats())
                s.calls += 1
                s.seconds += dt
                s.items += items
            log.debug("stage %s: %.3f s (%d items)", name, dt, items)

    def add(self, name: str, seconds: float, items: int = 0) -> None:
        with self._lock:
            s = self._stages.setdefault(name, StageStats())
            s.calls += 1
            s.seconds += seconds
            s.items += items

    def stats(self, name: str) -> Optional[StageStats]:
        with self._lock:
            return self._stages.get(name)

    def reset(self) -> None:
        with self._lock:
            self._stages.clear()

    def report(self) -> str:
        """Human-readable per-stage table (sorted by total time)."""
        with self._lock:
            rows = sorted(self._stages.items(), key=lambda kv: -kv[1].seconds)
        lines = [f"{'stage':<28} {'calls':>6} {'total_s':>9} {'items':>10} {'items/s':>12}"]
        for name, s in rows:
            ips = f"{s.items_per_sec:,.0f}" if s.items else "-"
            items = f"{s.items:,}" if s.items else "-"
            lines.append(f"{name:<28} {s.calls:>6} {s.seconds:>9.3f} {items:>10} {ips:>12}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {k: {"calls": v.calls, "seconds": v.seconds, "items": v.items,
                        "items_per_sec": v.items_per_sec}
                    for k, v in self._stages.items()}


#: process-global profiler used by the pipelines
profiler = Profiler()


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA device trace (TensorBoard format) around a block.

    Degrades to a no-op if the backend's profiler is unsupported (e.g. some
    remote/tunneled configurations)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # noqa: BLE001 - profiler support varies by backend
        log.warning("jax profiler unavailable (%s); trace skipped", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # noqa: BLE001
                log.warning("stop_trace failed: %s", e)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
