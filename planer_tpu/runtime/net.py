"""``Net`` — the user-facing graph container.

API-compatible with the reference Net (/root/reference/planer/net.py):
``load_json``, ``load_weights``, ``forward``, ``__call__``, ``run`` (the
onnxruntime-style alias), ``half``, ``timeit``, ``show`` — plus the TPU-native
extensions: transparent jit compilation (the default execution engine),
``quantize`` (weight-only INT8/FP8), ``engine='numpy'`` oracle execution, and
profiling hooks backed by XLA cost analysis instead of wall-clock per-op
timers.
"""
from __future__ import annotations

from typing import Any

import numpy as np

from ..ir import Graph, Layer, FlowEdge, unpack_weights
from .executor import NumpyExecutor
from .tracer import TracedProgram

__all__ = ["Net"]


class Net:
    def __init__(self, graph: Graph | None = None,
                 weights: list[np.ndarray] | None = None,
                 compute_dtype: str | None = None):
        self.graph = graph
        self.weights: list[np.ndarray] = weights if weights is not None else []
        self.compute_dtype = compute_dtype   # e.g. 'bfloat16' for TPU serving
        self._program: TracedProgram | None = None
        self._oracle: NumpyExecutor | None = None
        self.timer: dict[str, float] = {}

    # ------------------------------------------------------------- building
    def load_json(self, inputs, inits, body, flow, debug: bool = False):
        """Reference-compatible graph loading (net.py:10-24)."""
        g = Graph(
            inputs=list(inputs),
            inits=[(i[0], tuple(i[1]), i[2]) for i in inits],
            layers=[Layer.from_json(list(b)) for b in body],
            flow=[FlowEdge.from_json(list(f)) for f in flow],
        )
        if debug:
            for b in body:
                print(b)
        g.validate()
        self.graph = g
        # zero-filled weights until load_weights (net.py:20-21)
        self.weights = [np.zeros(s, dtype=d) for _, s, d in g.inits]
        self._invalidate()
        return self

    def load_weights(self, blob):
        """Copy the contiguous uint8 blob into per-init arrays
        (wire-compatible with net.py:83-88)."""
        self.weights = unpack_weights(self.graph, np.asarray(blob))
        self._invalidate()

    def load_state(self, state: dict, strict: bool = False) -> int:
        """Load real (e.g. pretrained) weights from a name->array dict —
        the hook that upgrades the synthetic-weight accuracy proxy to real
        numbers the moment a checkpoint is available (models.eval.
        load_real_weights finds one in the zoo cache dir).  Call BEFORE
        quantize(): entries must match the fp32 init shapes.  Returns the
        number of weights loaded; ``strict`` errors on unknown names."""
        idx = self.graph.init_index()
        n = 0
        for name, arr in state.items():
            i = idx.get(name)
            if i is None:
                if strict:
                    raise KeyError(f"unknown init {name!r}")
                continue
            arr = np.asarray(arr)
            want = self.weights[i]
            if tuple(arr.shape) != tuple(want.shape):
                raise ValueError(
                    f"{name}: shape {arr.shape} != init {want.shape}")
            self.weights[i] = np.ascontiguousarray(arr, dtype=want.dtype)
            n += 1
        self._invalidate()
        return n

    # ------------------------------------------------------------ precision
    def half(self, dtype: str = "float16"):
        """Cast fp32 weights down (reference net.py:26-29).  On TPU prefer
        ``dtype='bfloat16'``; INT8 via :meth:`quantize`."""
        for i, w in enumerate(self.weights):
            if w.dtype == np.float32:
                self.weights[i] = w.astype(dtype)
        self._invalidate()

    def optimize(self):
        """Run IR-level optimization passes (BN-into-conv folding, ...).
        Call before quantize() so per-channel scales absorb folded gains."""
        from ..optimize import optimize as _opt
        return _opt(self)

    def quantize(self, mode: str = "int8", skip: tuple = (),
                 activations: str | None = None, fuse: bool | None = None):
        """Weight quantization with per-output-channel scales.
        ``activations='dynamic'`` also runs W8A8 convs on profitable layers
        (s8 MXU path, 2x bf16 peak).  With ``activations='static'`` (scales
        from a prior calibrate_act_scales run) the ResNet entry stage is also
        fused into the Pallas kernel chain (``fuse=False`` to disable;
        ``fuse='all'`` additionally fuses body stages via optimize.fuse_stagen
        — measured SLOWER end-to-end on ResNet-18/50 than XLA's W8A8 convs,
        experiments/fuse_ab_*.json, so it is opt-in)."""
        from ..quant import quantize_net
        quantize_net(self, mode=mode, skip=skip, activations=activations)
        if fuse is None:
            fuse = activations == "static" and mode == "int8"
        if fuse:
            from ..optimize import (annotate_output_quant,
                                    fuse_stage64, fuse_stagen)
            fuse_stage64(self)
            if fuse == "all":
                fuse_stagen(self)
            # conv-relu-conv chains whose consumers are C>=128 quantized
            # convs emit int8 codes directly (consumers skip their
            # quantize pass and the bf16 activation round-trip)
            annotate_output_quant(self)
        self._invalidate()
        return self

    # ------------------------------------------------------------ execution
    def _invalidate(self):
        self._program = None
        self._oracle = None

    def astype_compute(self, dtype: str | None):
        """Set the in-graph compute dtype ('bfloat16' recommended on TPU);
        weights/outputs stay fp32 at the API boundary."""
        self.compute_dtype = dtype
        self._invalidate()
        return self

    @property
    def program(self) -> TracedProgram:
        if self._program is None:
            if self.graph.quant:
                from ..quant import make_quant_program
                self._program = make_quant_program(
                    self.graph, self.weights,
                    compute_dtype=self.compute_dtype)
            else:
                self._program = TracedProgram(
                    self.graph, self.weights,
                    compute_dtype=self.compute_dtype)
        return self._program

    @property
    def oracle(self) -> NumpyExecutor:
        if self._oracle is None:
            ws = self.weights
            if self.graph.quant:
                from ..quant import dequant_weights
                ws = dequant_weights(self.graph, ws)
            self._oracle = NumpyExecutor(self.graph, ws)
        return self._oracle

    def forward(self, *x, debug: bool = False, engine: str | None = None):
        if debug or engine == "numpy":
            out = self.oracle.run(*x, debug=debug)
            self.timer = self.oracle.timer
            return out
        return self.program(*x)

    def __call__(self, *x, **kw):
        if x and isinstance(x[0], dict):
            x = [x[0][i] for i in self.graph.inputs]
        rst = self.forward(*x, **kw)
        if isinstance(rst, tuple) and len(rst) == 1:
            return np.asarray(rst[0])
        if isinstance(rst, tuple):
            return tuple(np.asarray(r) for r in rst)
        return np.asarray(rst)

    def run(self, output=None, input={}, **kw):
        """onnxruntime-style entry point (reference net.py:79-81)."""
        rst = self(input, **kw)
        return rst if isinstance(rst, tuple) else (rst,)

    # ----------------------------------------------------------- inspection
    @property
    def input(self):
        return self.graph.inputs

    @property
    def inits(self):
        return self.graph.init_names()

    def info(self, obj):
        if isinstance(obj, (list, tuple)):
            return [self.info(i) for i in obj]
        if hasattr(obj, "shape"):
            return obj.shape
        return obj

    def timeit(self, status: str = "start"):
        if status == "start":
            self.timer = {}
            if self._oracle is not None:
                self._oracle.timer = {}
        if status == "end":
            for k, v in self.timer.items():
                print(k, v)

    def cost_analysis(self, *x):
        """XLA cost analysis (flops / bytes accessed) of the jitted program."""
        return self.program.cost_analysis(*x)

    def show(self, path: str | None = None):
        """Render the graph.  Writes graphviz DOT (and prints a summary);
        the reference delegated to a missing plot.py (net.py:90-92)."""
        from ..utils.plot import plot_net
        return plot_net(self.graph, path)

    def __repr__(self):
        g = self.graph
        if g is None:
            return "Net(empty)"
        return (f"Net({len(g.layers)} layers, {len(g.inits)} weights, "
                f"{len(g.flow)} flow edges, inputs={g.inputs})")
