"""Profiling & observability: XLA cost analysis, roofline report, tracing.

The reference's profiling story is a per-op-type wall-clock dict accumulated
inside the interpreter (net.py:55,66-77) — which on an async backend measures
launch time, not kernel time (their own commented-out deviceSynchronize,
net.py:66).  Under jit that model is meaningless, so this module provides the
TPU-native equivalents:

  * interpreter timing is still available (``Net.forward(engine='numpy')``
    fills ``net.timer`` exactly like the reference);
  * ``cost_report`` — FLOPs / bytes / arithmetic intensity of the *compiled*
    program from XLA cost analysis, plus the roofline bound;
  * ``trace`` — a ``jax.profiler`` trace context writing xprof/tensorboard
    dumps; IR layer names appear as named scopes (tracer emits
    ``jax.named_scope`` per layer);
  * ``op_histogram`` — static per-opcode counts of a graph.
"""
from __future__ import annotations

import contextlib
from collections import Counter

import numpy as np

import jax

from ..ir import Graph

__all__ = ["cost_report", "trace", "op_histogram", "CHIP_SPECS"]

# peak (bf16 matmul FLOP/s, HBM bytes/s) per chip generation
CHIP_SPECS = {
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
}


def op_histogram(graph: Graph) -> dict[str, int]:
    return dict(Counter(l.op for l in graph.layers))


def cost_report(net, *inputs, chip: str = "v5e") -> dict:
    """Roofline analysis of the jitted program for the given input shapes."""
    ca = net.program.cost_analysis(*inputs)
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    peak_flops, peak_bw = CHIP_SPECS.get(chip, CHIP_SPECS["v5e"])
    intensity = flops / max(bytes_accessed, 1.0)
    ridge = peak_flops / peak_bw
    t_compute = flops / peak_flops
    t_memory = bytes_accessed / peak_bw
    bound = "compute" if t_compute >= t_memory else "memory"
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "arithmetic_intensity": intensity,
        "ridge_intensity": ridge,
        "bound": bound,
        "ideal_time_s": max(t_compute, t_memory),
        "peak_flops": peak_flops,
        "peak_bandwidth": peak_bw,
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context — view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
