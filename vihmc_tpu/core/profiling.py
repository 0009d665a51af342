"""Tracing/profiling utilities.

The reference's only instrumentation is ad-hoc wall-clock prints and a
hand-rolled progress bar with items/sec and rejection counts
(/root/reference/Neural_network/VI_HMC/util.py:27-103; SURVEY.md section 5).
TPU equivalents here: ``jax.profiler`` trace capture, phase timers, and
sampler throughput counters (samples/s, leapfrog grad-evals/s, ESS/s).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class Timer:
    """Phase wall-clock timer: ``with Timer() as t: ...; t.elapsed``."""

    def __enter__(self):
        self.start = time.perf_counter()
        self.elapsed = None
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sampler_throughput(result, elapsed_s: float, num_leapfrog: int,
                       ess=None) -> dict:
    """Throughput counters from a SampleResult (+ optional precomputed ESS)."""
    import numpy as np

    samples = np.asarray(result.samples)
    if samples.ndim == 2:
        samples = samples[None]
    c, s, _ = samples.shape
    out = {
        "chains": c,
        "draws_per_chain": s,
        "samples_per_s": c * s / elapsed_s,
        "leapfrog_grads_per_s": c * s * (num_leapfrog + 1) / elapsed_s,
        "acceptance_rate": float(np.asarray(result.acceptance_rate)),
        "divergences": int(np.asarray(result.num_divergent)),
        "elapsed_s": elapsed_s,
    }
    if ess is not None:
        out["ess_median"] = float(np.median(np.asarray(ess)))
        out["ess_per_s"] = out["ess_median"] / elapsed_s
    return out


class ProgressPrinter:
    """Segment-level progress line: draws done, draws/s, rejection count
    (the reference progress bar's columns, util.py:35-103). Pass as the
    ``progress`` callback of ``sample_chains_resumable``."""

    def __init__(self, total_draws: int, every: int = 1, stream=None):
        import sys

        self.total = total_draws
        self.every = every
        self.stream = stream or sys.stderr
        self.t0 = time.perf_counter()

    def __call__(self, seg_done: int, n_segments: int, state):
        if seg_done % self.every and seg_done != n_segments:
            return
        frac = seg_done / n_segments
        done = int(self.total * frac)
        rate = done / max(time.perf_counter() - self.t0, 1e-9)
        self.stream.write(
            f"\r[sample] {done}/{self.total} draws  {rate:8.1f} draws/s  "
            f"segment {seg_done}/{n_segments}")
        if seg_done == n_segments:
            self.stream.write("\n")
        self.stream.flush()
