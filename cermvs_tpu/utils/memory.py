"""Device-memory reporting.

Replaces the reference's ``nvidia-smi``-parsing probe
(``/root/reference/utils/memory.py``) with JAX's device memory stats —
queried at the cost-volume high-water mark or anywhere a ``do_report`` hook
fires.
"""

from __future__ import annotations

from typing import Dict


def device_memory_stats() -> Dict[str, float]:
    import jax

    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        stats[str(d)] = {
            "bytes_in_use_mb": s.get("bytes_in_use", 0) / 2**20,
            "peak_bytes_in_use_mb": s.get("peak_bytes_in_use", 0) / 2**20,
            "bytes_limit_mb": s.get("bytes_limit", 0) / 2**20,
        }
    return stats


def report() -> None:
    for dev, s in device_memory_stats().items():
        print(f"{dev}: in_use={s['bytes_in_use_mb']:.0f}MB "
              f"peak={s['peak_bytes_in_use_mb']:.0f}MB "
              f"limit={s['bytes_limit_mb']:.0f}MB")
