"""NumPy graph interpreter.

Faithful re-implementation of the reference interpreter semantics
(/root/reference/planer/net.py:37-72): straight-line evaluation of the flow
program in a name->array environment, layer chains threading through the edge
dst, eager freeing of dead tensors, optional per-op-type wall timer and debug
shape tracing.

Two roles:
  1. correctness oracle for the jitted XLA path (tests diff against this), and
  2. host-side executor for the data-dependent graph tail after the tracer's
     cut point (YOLO postprocessing etc.) — hence ``run_range``.
"""
from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np

from ..ir import Graph
from ..registry import get_op

__all__ = ["NumpyExecutor"]


class NumpyExecutor:
    def __init__(self, graph: Graph, weights: list[np.ndarray]):
        self.graph = graph
        self.weights = weights
        self.life = graph.liveness()
        self.timer: dict[str, float] = {}
        self._layers = graph.layer_map()

    # ------------------------------------------------------------------ API
    def run(self, *inputs, debug: bool = False,
            trace_cb: Callable | None = None):
        env = self.initial_env(*inputs)
        self.run_range(env, 0, len(self.graph.flow), debug=debug,
                       trace_cb=trace_cb)
        last = self.graph.flow[-1]
        if last.dst_scalar:
            out = env[last.dst[0]]
            if isinstance(out, tuple) and len(out) == 1:
                return out[0]
            return out
        out = [env[n] for n in last.dst]
        return out[0] if len(out) == 1 else tuple(out)

    def initial_env(self, *inputs) -> dict[str, Any]:
        env: dict[str, Any] = {"None": None}
        for name, w in zip(self.graph.init_names(), self.weights):
            env[name] = w
        for name, x in zip(self.graph.inputs, inputs):
            env[name] = np.asarray(x)
        return env

    # ------------------------------------------------------------- internals
    def run_range(self, env: dict[str, Any], start: int, stop: int,
                  debug: bool = False, free: bool = True,
                  trace_cb: Callable | None = None) -> dict[str, Any]:
        """Execute flow edges [start, stop) in-place on ``env``."""
        flow = self.graph.flow
        for i in range(start, stop):
            edge = flow[i]
            for li, lname in enumerate(edge.layers):
                layer = self._layers[lname]
                spec = get_op(layer.op)
                # chain semantics: first layer reads edge.src, the rest read
                # the edge dst written by their predecessor (net.py:46-47)
                src = edge.src if li == 0 else edge.dst
                args = [env.get(s) for s in src]
                if free and li == len(edge.layers) - 1:
                    for s in set(edge.src):
                        if s in env and self.life.get(s, -1) <= i:
                            del env[s]
                t0 = time.perf_counter()
                out = spec.numpy_fn(*args, **layer.kwargs)
                dt = time.perf_counter() - t0
                self.timer[layer.op] = self.timer.get(layer.op, 0.0) + dt
                if debug:
                    ish = [getattr(a, "shape", a) for a in args]
                    osh = (tuple(getattr(o, "shape", o) for o in out)
                           if isinstance(out, tuple)
                           else getattr(out, "shape", out))
                    print(f"{lname} [{layer.op}] {layer.kwargs} "
                          f"in={ish} out={osh}")
                if trace_cb is not None:
                    trace_cb(i, lname, layer, args, out)
                # reference net.py:60: a bare-string dst stores the WHOLE
                # result (even a tuple, e.g. the synthetic 'return' node)
                if edge.dst_scalar or not isinstance(out, tuple):
                    env[edge.dst[0]] = out
                else:
                    for name, v in zip(edge.dst, out):
                        env[name] = v
        return env

    def timeit(self, status: str = "start"):
        """Reference-compatible per-op-type timer (net.py:74-77)."""
        if status == "start":
            self.timer = {}
        if status == "end":
            for k, v in self.timer.items():
                print(k, v)
