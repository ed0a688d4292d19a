"""IR -> XLA compiler: trace the flow program once into a pure jax function.

This replaces the reference's per-op Python interpreter loop
(/root/reference/planer/net.py:37-72) with a single jit-compiled XLA program.
Three-stage design:

1. **Staticness analysis** (`analyze`): classify every op application as
   *static* (all inputs derivable from weights/shapes alone — shape chains,
   resize scales, slice bounds) or *dynamic* (depends on graph inputs).
   Static applications are evaluated with numpy at trace time and vanish from
   the compiled program — the TPU never sees a Shape/Gather/Unsqueeze chain.
   The analysis is per-application (not per-name): flow programs may rebind a
   tensor name with different staticness.

2. **Cut-point detection**: the first flow edge that cannot be traced under
   XLA's static-shape discipline (NonZero with dynamic input, Reshape with a
   dynamic target, ...) splits the graph.  The dense prefix is jitted; the
   tail (e.g. YOLO box postprocessing) runs on host via the numpy oracle,
   exactly as the reference runs everything (SURVEY §7 "hard parts" #1).

3. **Mixed-value trace** (`_build_fn`): run the flow once with jax tracers
   for dynamic tensors and numpy arrays for static ones; weights consumed
   dynamically become leaves of the params pytree (so re-quantized /
   re-sharded weights don't retrace), derived statics fold into the XLA
   constant pool.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..ir import Graph
from ..registry import get_op
from .executor import NumpyExecutor

__all__ = ["TracedProgram", "analyze", "GraphPlan"]


@dataclasses.dataclass(frozen=True)
class AppRecord:
    """Decision for one (edge, chain-position) op application."""

    edge: int
    li: int
    kind: str                      # 'shape' | 'static' | 'dyn'
    arg_static: tuple[bool, ...]   # per positional input: read from static env?


@dataclasses.dataclass
class GraphPlan:
    """Result of staticness analysis over a Graph."""

    records: list[AppRecord]
    dyn_weights: set[str]          # inits consumed as runtime data -> params
    cut: int                       # first non-traceable flow index
    cut_reason: str | None = None


def analyze(graph: Graph) -> GraphPlan:
    layers = graph.layer_map()
    static: set[str] = set(graph.init_names()) | {"None"}
    inits = set(graph.init_names())
    dyn_weights: set[str] = set()
    records: list[AppRecord] = []
    cut = len(graph.flow)
    reason = None

    for i, edge in enumerate(graph.flow):
        stop = False
        for li, lname in enumerate(edge.layers):
            layer = layers[lname]
            spec = get_op(layer.op)
            src = edge.src if li == 0 else edge.dst
            in_static = tuple(s in static for s in src)
            if layer.op == "shape":
                records.append(AppRecord(i, li, "shape", in_static))
                static.update(edge.dst)
                continue
            if all(in_static):
                records.append(AppRecord(i, li, "static", in_static))
                static.update(edge.dst)
                continue
            # dynamic application: check traceability
            if spec.data_dependent:
                stop = True
                reason = f"{lname}[{layer.op}] is data-dependent"
                break
            bad = [p for p in spec.static_args
                   if p < len(src) and not in_static[p]]
            if bad:
                stop = True
                reason = (f"{lname}[{layer.op}] needs static operand(s) "
                          f"{bad} but they are input-dependent")
                break
            records.append(AppRecord(i, li, "dyn", in_static))
            for p, s in enumerate(src):
                if in_static[p] and s in inits and p not in spec.static_args:
                    dyn_weights.add(s)
            for d in edge.dst:
                static.discard(d)
        if stop:
            cut = i
            break

    return GraphPlan(records, dyn_weights, cut, reason)


def _store(env_tgt, env_other, edge, out):
    """Write an op result to the destination env, honoring the reference's
    scalar-dst convention (a bare-string dst holds the WHOLE result, even a
    tuple — net.py:60)."""
    if edge.dst_scalar:
        env_tgt[edge.dst[0]] = out
        env_other.pop(edge.dst[0], None)
    elif isinstance(out, tuple):
        for n, v in zip(edge.dst, out):
            env_tgt[n] = v
            env_other.pop(n, None)
    else:
        env_tgt[edge.dst[0]] = out
        env_other.pop(edge.dst[0], None)


class TracedProgram:
    """Compiled execution of a Graph: jitted XLA prefix + numpy host tail.

    ``weight_materializer(name, leaf)`` lets the quantization layer override
    how a params leaf is turned into the array an op consumes (e.g. fused
    int8 dequant); default is identity.
    """

    def __init__(self, graph: Graph, weights: list[np.ndarray],
                 weight_materializer: Callable | None = None,
                 param_transform: Callable | None = None,
                 jit_kwargs: dict | None = None,
                 device_params: bool = True,
                 compute_dtype: str | None = None):
        graph.validate()
        self.graph = graph
        self.weights = weights
        self.compute_dtype = compute_dtype  # e.g. 'bfloat16' for TPU serving
        # per-opcode kwarg injection at trace time, e.g.
        # {"stage64": {"force_decomposed": True}} — set by parallel.sharding
        # so fused Pallas ops lower to their op-chain under GSPMD (pallas_call
        # does not GSPMD-partition); clear _cache after changing.
        self.op_overrides: dict[str, dict] = {}
        self.plan = analyze(graph)
        self._layers = graph.layer_map()
        self._materialize = weight_materializer
        self._oracle = NumpyExecutor(graph, weights)
        self._jit_kwargs = dict(jit_kwargs or {})
        self._cache: dict[tuple, dict] = {}

        name_to_w = dict(zip(graph.init_names(), weights))
        params = {n: name_to_w[n] for n in sorted(self.plan.dyn_weights)}
        if param_transform is not None:
            params = param_transform(params)
        if device_params:
            params = jax.tree.map(jnp.asarray, params)
        self.params = params

    # ---------------------------------------------------------------- trace
    def _suffix_needs(self) -> list[str]:
        """Names read by the host tail (or final outputs if no tail)."""
        flow = self.graph.flow
        if self.plan.cut >= len(flow):
            return list(flow[-1].dst)
        produced: set[str] = set()
        needs: list[str] = []
        seen: set[str] = set()
        for e in flow[self.plan.cut:]:
            for s in e.src:
                if s not in produced and s not in seen:
                    needs.append(s)
                    seen.add(s)
            produced.update(e.dst)
        for s in flow[-1].dst:
            if s not in produced and s not in seen:
                needs.append(s)
                seen.add(s)
        return needs

    def _build_fn(self, static_sink: dict, mask_sink: list):
        graph, plan, layers = self.graph, self.plan, self._layers
        name_to_w = dict(zip(graph.init_names(), self.weights))
        needs = self._suffix_needs()
        materialize = self._materialize
        overrides = self.op_overrides
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if cdt is not None:
            # ops whose quantized fast paths cannot infer the program compute
            # dtype from their (int8) inputs get it injected as a kwarg
            overrides = dict(overrides)
            for op in ("conv", "add"):
                overrides[op] = {**overrides.get(op, {}),
                                 "compute_dtype": self.compute_dtype}

        def cast_in(v):
            if cdt is not None and hasattr(v, "dtype") \
                    and jnp.issubdtype(v.dtype, jnp.floating):
                return v.astype(cdt)
            return v

        # int8 GRAPH INPUTS are user values, never activation codes: in a
        # quantized program the pre-quantized s8 conv gate (jax_ops._conv2d)
        # keys on dtype alone, so genuine int8 data must be lifted to float
        # at the boundary (params/weights are NOT lifted — fused kernels
        # stream raw int8 payloads)
        quantized = bool(graph.quant)

        def cast_graph_in(v):
            if quantized and hasattr(v, "dtype") and v.dtype == jnp.int8:
                return v.astype(cdt or jnp.float32)
            return cast_in(v)

        def fn(params, *xs):
            env: dict[str, Any] = {}                 # dynamic values (jax)
            senv: dict[str, Any] = {"None": None}    # static values (numpy)
            senv.update(name_to_w)
            for n, x in zip(graph.inputs, xs):
                env[n] = cast_graph_in(x)

            for rec in plan.records:
                edge = graph.flow[rec.edge]
                lname = edge.layers[rec.li]
                layer = layers[lname]
                spec = get_op(layer.op)
                src = edge.src if rec.li == 0 else edge.dst

                if rec.kind == "shape":
                    v = env.get(src[0], None)
                    if v is None:
                        v = senv[src[0]]
                    out = np.asarray(np.shape(v), dtype=np.int64)
                    _store(senv, env, edge, out)
                    continue

                if rec.kind == "static":
                    args = [senv[s] for s in src]
                    out = spec.numpy_fn(*args, **layer.kwargs)
                    _store(senv, env, edge, out)
                    continue

                # dynamic
                args = []
                for p, s in enumerate(src):
                    if rec.arg_static[p]:
                        if p not in spec.static_args and s in params:
                            leaf = params[s]
                            if materialize is not None:
                                leaf = materialize(s, leaf, layer.op)
                            args.append(cast_in(leaf))
                        else:
                            args.append(senv[s])
                    else:
                        args.append(env[s])
                # named_scope: IR layer names show up in profiler traces and
                # HLO metadata (profiling parity with net.py:56-65 debug)
                kw = layer.kwargs
                ov = overrides.get(layer.op)
                if ov:
                    kw = {**kw, **ov}
                with jax.named_scope(lname):
                    out = spec.jax_fn(*args, **kw)
                _store(env, senv, edge, out)

            # side channels captured at trace time
            static_sink.clear()
            static_sink.update(senv)
            def cast_out(v):
                # serve fp32 at the boundary regardless of compute dtype
                if cdt is not None and hasattr(v, "dtype") \
                        and v.dtype == cdt:
                    return v.astype(jnp.float32)
                return v

            outs, mask = [], []
            for n in needs:
                if n in env:
                    outs.append(jax.tree.map(cast_out, env[n]))
                    mask.append(True)
                else:
                    outs.append(np.zeros((), np.float32))  # host side has it
                    mask.append(False)
            mask_sink[:] = mask
            return tuple(outs)

        return fn, needs

    def _compile(self, input_specs):
        static_sink: dict[str, Any] = {}
        mask_sink: list = []
        fn, needs = self._build_fn(static_sink, mask_sink)
        jitted = jax.jit(fn, **self._jit_kwargs)
        abstract = [jax.ShapeDtypeStruct(s, d) for s, d in input_specs]
        compiled = jitted.lower(self.params, *abstract).compile()
        return {
            "jitted": jitted,
            "compiled": compiled,
            "needs": needs,
            "statics": dict(static_sink),
            "dyn_mask": list(mask_sink),
        }

    def _entry(self, *inputs):
        specs = tuple((tuple(np.shape(x)), np.result_type(x)) for x in inputs)
        if specs not in self._cache:
            self._cache[specs] = self._compile(specs)
        return self._cache[specs]

    # ------------------------------------------------------------------ run
    def __call__(self, *inputs):
        if len(inputs) != len(self.graph.inputs):
            raise TypeError(
                f"model expects {len(self.graph.inputs)} input(s) "
                f"{self.graph.inputs}, got {len(inputs)}")
        inputs = [jnp.asarray(x) for x in inputs]
        entry = self._entry(*inputs)
        outs = entry["compiled"](self.params, *inputs)
        needs, mask = entry["needs"], entry["dyn_mask"]
        lookup = {n: (outs[i] if mask[i] else entry["statics"].get(n))
                  for i, n in enumerate(needs)}

        if self.plan.cut >= len(self.graph.flow):
            final = self.graph.flow[-1].dst
            res = [jax.tree.map(np.asarray, lookup[n]) for n in final]
            if self.graph.flow[-1].dst_scalar:
                out = res[0]
                if isinstance(out, tuple) and len(out) == 1:
                    return out[0]
                return out
            return res[0] if len(res) == 1 else tuple(res)

        # host tail: seed env with prefix outputs + statics, run numpy ops
        env: dict[str, Any] = {"None": None}
        env.update(entry["statics"])
        for n, w in zip(self.graph.init_names(), self.weights):
            env.setdefault(n, w)
        for i, n in enumerate(needs):
            if mask[i]:
                env[n] = jax.tree.map(np.asarray, outs[i])
        self._oracle.run_range(env, self.plan.cut, len(self.graph.flow),
                               free=False)
        final_edge = self.graph.flow[-1]
        final = [env[n] for n in final_edge.dst]
        if final_edge.dst_scalar:
            out = final[0]
            if isinstance(out, tuple) and len(out) == 1:
                return out[0]
            return out
        return final[0] if len(final) == 1 else tuple(final)

    # ------------------------------------------------------------ profiling
    def cost_analysis(self, *inputs):
        entry = self._entry(*[jnp.asarray(x) for x in inputs])
        return entry["compiled"].cost_analysis()

    def lowered_text(self, *inputs):
        inputs = [jnp.asarray(x) for x in inputs]
        entry = self._entry(*inputs)
        specs = [jax.ShapeDtypeStruct(tuple(np.shape(x)), np.result_type(x))
                 for x in inputs]
        return entry["jitted"].lower(self.params, *specs).as_text()
