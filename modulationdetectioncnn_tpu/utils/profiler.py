"""Profiling hooks + roofline accounting (SURVEY.md §5 tracing row).

The reference archetype has no in-repo profiling (vendor SignalTap at best);
here: ``trace()`` wraps a region in a jax.profiler trace viewable in
Perfetto/XProf, and ``roofline()`` turns a measured runtime into %-of-peak
numbers against the v5e ceilings (SURVEY.md §6: 197 TFLOP/s bf16,
394 TOP/s int8, 819 GB/s HBM).
"""
from __future__ import annotations

import contextlib
import os
from dataclasses import dataclass

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_INT8_OPS = 394e12
V5E_HBM_BYTES_PER_S = 819e9

# VT-CNN2 per-frame MAC count (SURVEY.md §6 roofline): conv1 0.39M (2 rows),
# conv2 15.2M (dominant), dense1 2.54M, dense2 2.8K.
MACS_PER_FRAME = 18_127_696
SAMPLES_PER_FRAME = 128


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """``with trace('/tmp/tb'):`` -> Perfetto/XProf trace of the region."""
    import jax

    logdir = logdir or os.environ.get("AMC_TRACE_DIR")
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


@dataclass
class Roofline:
    samples_per_sec: float
    ops_per_sec: float
    pct_of_bf16_peak: float
    pct_of_int8_peak: float

    def as_dict(self):
        return {
            "samples_per_sec": round(self.samples_per_sec),
            "tops_per_sec": round(self.ops_per_sec / 1e12, 2),
            "pct_of_bf16_peak": round(self.pct_of_bf16_peak, 1),
            "pct_of_int8_peak": round(self.pct_of_int8_peak, 1),
        }


def roofline(samples_per_sec: float) -> Roofline:
    ops = samples_per_sec / SAMPLES_PER_FRAME * MACS_PER_FRAME * 2
    return Roofline(
        samples_per_sec=samples_per_sec,
        ops_per_sec=ops,
        pct_of_bf16_peak=100 * ops / V5E_PEAK_BF16_FLOPS,
        pct_of_int8_peak=100 * ops / V5E_PEAK_INT8_OPS,
    )
