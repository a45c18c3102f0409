"""Profiling helpers: jax.profiler traces + per-view report hooks.

TPU replacement for the reference's ad-hoc instrumentation (wall-clock prints
at ``train.py:105-108`` / ``inference.py:52-56`` and the nvidia-smi probe in
``utils/memory.py``): a context manager producing TensorBoard-viewable traces
and a lightweight timer that also snapshots device-memory high-water marks —
the ``do_report`` notion from ``core/raft.py:34`` as a first-class utility.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

from cermvs_tpu.utils.memory import device_memory_stats


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """Capture a jax.profiler trace (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ViewTimer:
    """Per-item latency + HBM peak reporter (inference ``do_report``)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.records = []

    @contextlib.contextmanager
    def view(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        peak = max(
            (s["peak_bytes_in_use_mb"] for s in device_memory_stats().values()),
            default=0.0)
        self.records.append({"name": name, "seconds": dt, "peak_hbm_mb": peak})
        print(f"per view time: {dt:.3f}s  peak HBM: {peak:.0f} MB  ({name})")

    def summary(self) -> Dict[str, float]:
        if not self.records:
            return {}
        secs = [r["seconds"] for r in self.records]
        return {
            "views": len(secs),
            "mean_seconds": sum(secs) / len(secs),
            "max_peak_hbm_mb": max(r["peak_hbm_mb"] for r in self.records),
        }
