"""Throughput/MFU accounting (reference: trainer/perf.py:13-245).

FLOPs/token comes from the model spec; peak chip FLOPs are detected from the
device kind with a conservative fallback so MFU is comparable across TPU
generations.
"""

from __future__ import annotations

import time

import jax

# bf16 peak matmul FLOPs per chip (public spec sheets). Device kinds vary
# ("TPU v5 lite" = v5e, "TPU v5p", ...), so match the most specific first.
_PEAK_FLOPS = {
    "v5 lite": 197e12,
    "v5lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
    "v6 lite": 918e12,
    "v4": 275e12,
    "cpu": 1e12,  # nominal, keeps MFU finite in tests
}


def device_peak_flops(device: jax.Device | None = None) -> float:
    if device is None:
        device = jax.devices()[0]
    kind = (getattr(device, "device_kind", "") or "").lower()
    for key, flops in _PEAK_FLOPS.items():
        if key in kind:
            return flops
    if device.platform == "cpu":
        return _PEAK_FLOPS["cpu"]
    return 459e12  # default: v5p-class


class PerfCounter:
    """Rolling tokens/s + MFU over a window of recorded steps."""

    def __init__(self, flops_per_token: float, n_devices: int = 1, window: int = 32):
        self.flops_per_token = flops_per_token
        self.n_devices = n_devices
        self.window = window
        self.samples: list[tuple[float, int]] = []  # (duration_s, tokens)

    def record(self, duration_s: float, tokens: int) -> None:
        self.samples.append((duration_s, tokens))
        if len(self.samples) > self.window:
            self.samples.pop(0)

    @property
    def tokens_per_sec(self) -> float:
        total_t = sum(d for d, _ in self.samples)
        total_tok = sum(n for _, n in self.samples)
        return total_tok / total_t if total_t else 0.0

    def mfu(self, peak_flops: float | None = None) -> float:
        peak = (peak_flops or device_peak_flops()) * self.n_devices
        return self.tokens_per_sec * self.flops_per_token / peak


class StepTimer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self.start
