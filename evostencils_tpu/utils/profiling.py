"""Tracing / profiling utilities (SURVEY §5.1).

The reference's observability was wall-clock accounting scraped from
subprocess stdout plus ExaStencils HTML build logs (reference
optimization/program.py:102-103,405-412; exastencils.py:449-457).  Here:

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable XPlane trace of everything executed inside
    (device kernels, transfers, host callbacks).  Degrades to a no-op
    with a warning when the backend doesn't support tracing (the
    development tunnel's remote devices may not).
  * `evaluation_report(generator)` — structured counters from a
    JaxProgramGenerator: compile/run seconds, cycle-VM hit rates, cache
    sizes — the per-generation numbers the EA logbook stream prints.
  * `bandwidth_utilization(expression, measured_seconds)` — modeled HBM
    bytes per cycle application (models/roofline.estimate_traffic, an
    unfused upper bound) against the chip's peak bandwidth.
"""

from __future__ import annotations

import contextlib
import warnings


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # tunnel backends may not support tracing
        warnings.warn(f"jax.profiler unavailable on this backend: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                warnings.warn(f"stop_trace failed: {e}")


def evaluation_report(generator) -> dict:
    report = {
        "compile_time_s": round(generator.compile_time_total, 3),
        "run_time_s": round(generator.run_time_total, 3),
        "solver_cache_entries": len(generator._solver_cache),
        "device_failures": generator._consecutive_device_failures,
    }
    report.update(generator.vm_stats())
    return report


def bandwidth_utilization(expression, measured_seconds: float) -> dict:
    from evostencils_tpu.models.roofline import (
        TPU_V5E_HBM_BANDWIDTH,
        PerformanceEvaluator,
    )

    perf = PerformanceEvaluator()
    traffic = perf.estimate_traffic(expression)
    bw = traffic / max(measured_seconds, 1e-12)
    return {
        "modeled_bytes": int(traffic),
        "achieved_GBps": round(bw / 1e9, 1),
        "utilization_pct_upper_bound": round(
            100.0 * bw / TPU_V5E_HBM_BANDWIDTH, 1
        ),
    }
