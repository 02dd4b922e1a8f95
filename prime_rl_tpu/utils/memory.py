"""Memory observability + GC gating.

- ``device_memory_stats``: per-device HBM usage (bytes in use / limit).
- ``dump_memory_profile``: jax device-memory profile (pprof format) — the
  TPU analogue of the reference's CUDA snapshot dumper
  (reference: trainer/utils.py:635 MemoryProfiler).
- ``GarbageCollection``: interval-gated manual gc (reference:
  trainer/utils.py:268) — Python GC pauses inside the train loop cause
  device bubbles; disable the automatic collector and collect on a step
  interval instead.
"""

from __future__ import annotations

import gc
from pathlib import Path

import jax


def device_memory_stats() -> dict[str, float]:
    out: dict[str, float] = {}
    for i, d in enumerate(jax.local_devices()):
        stats = getattr(d, "memory_stats", lambda: None)() or {}
        if stats:
            out[f"device{i}/bytes_in_use_gb"] = stats.get("bytes_in_use", 0) / 1e9
            out[f"device{i}/bytes_limit_gb"] = stats.get("bytes_limit", 0) / 1e9
            out[f"device{i}/peak_bytes_gb"] = stats.get("peak_bytes_in_use", 0) / 1e9
    return out


def dump_memory_profile(path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    jax.profiler.save_device_memory_profile(str(path))
    return path


class GarbageCollection:
    """Disable automatic gc; collect every ``interval`` steps."""

    def __init__(self, interval: int = 50, enable: bool = True):
        self.interval = interval
        self.enable = enable
        if enable:
            gc.disable()
            gc.collect()

    def maybe_collect(self, step: int) -> None:
        if self.enable and self.interval and step % self.interval == 0:
            gc.collect()

    def restore(self) -> None:
        if self.enable:
            gc.enable()
