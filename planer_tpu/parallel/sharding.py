"""Multi-device execution: mesh construction + DP/TP sharding plans.

The reference has NO distributed support (SURVEY §2 #26: its "multi-device"
story is swapping numpy for cupy on one GPU).  Here scaling is TPU-native:

  * a 2-D ``Mesh`` (``data`` x ``model``) over ICI,
  * data parallelism: the batch axis of inputs sharded over ``data``,
  * tensor parallelism: conv/dense weights sharded over output channels on
    ``model``; XLA GSPMD propagates activations shardings and inserts the
    all-gather/reduce-scatter collectives,
  * spatial parallelism for big images lives in ``shard_map``-based halo
    exchange (parallel.spatial).

Plans are computed from the IR: each params leaf is mapped to a
``NamedSharding`` by the op that consumes it.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ir import Graph
from ..ops.qtypes import QTensor

__all__ = ["make_mesh", "param_shardings", "input_sharding", "shard_program"]

# fused Pallas ops that must lower to their decomposed op chain inside a
# GSPMD-partitioned program (pallas_call cannot be auto-partitioned); the
# tracer injects this kwarg per application (TracedProgram.op_overrides)
FUSED_OPS = ("stage64", "stagen")
FUSED_OVERRIDES = {op: {"force_decomposed": True} for op in FUSED_OPS}


def make_mesh(shape=None, axis_names=("data", "model"), devices=None) -> Mesh:
    """Build a device mesh.  ``shape=None`` puts all devices on ``data``."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def _spec_for(name: str, leaf, op: str, pos: int, tp_axis: str) -> P:
    """Output-channel TP spec for one weight leaf."""
    shape = leaf.shape
    nd = len(shape)
    none = (None,) * nd

    def axis_spec(axis):
        s = [None] * nd
        s[axis] = tp_axis
        return P(*s)

    if op == "conv":
        if pos == 1 and nd == 4:        # OIHW kernel
            return axis_spec(0)
        if pos == 2 and nd == 1:        # bias (O,)
            return axis_spec(0)
    elif op == "convtranspose":
        if pos == 1 and nd == 4:        # (I, O/g, kh, kw)
            return axis_spec(1)
        if pos == 2 and nd == 1:
            return axis_spec(0)
    elif op == "dense":
        if pos == 1 and nd == 2:        # (O, I)
            return axis_spec(0)
        if pos == 2 and nd == 1:
            return axis_spec(0)
    elif op == "batchnorm":
        # folded affine (1, C, 1, 1): channel axis follows conv output
        if nd == 4 and shape[0] == 1:
            return axis_spec(1)
    elif op in FUSED_OPS:
        # fused-stage operands: [x, Ws, Bs, (W1, B1, W2, B2) x blocks] —
        # every weight is an OIHW conv kernel (shard axis 0) and every bias
        # a (O,)/(1,O,1,1)-shaped vector following the conv's output channels
        if pos >= 1:
            if nd == 4 and shape[0] > 1:
                return axis_spec(0)
            if nd == 4 and shape[0] == 1:
                return axis_spec(1)
            if nd == 1:
                return axis_spec(0)
    return P(*none)


def param_shardings(graph: Graph, params: dict, mesh: Mesh,
                    tp_axis: str = "model"):
    """NamedSharding pytree matching a TracedProgram params dict."""
    consumers = {n: u[0] for n, u in graph.weight_users().items()}

    def leaf_sharding(name, leaf):
        op, pos = consumers.get(name, (None, -1))
        spec = _spec_for(name, leaf, op, pos, tp_axis)
        # sharded dim must divide the axis size; fall back to replication
        for ax, s in enumerate(spec):
            if s is not None and leaf.shape[ax] % mesh.shape[tp_axis]:
                spec = P(*((None,) * len(leaf.shape)))
                break
        return NamedSharding(mesh, spec)

    out = {}
    for name, leaf in params.items():
        if isinstance(leaf, QTensor):
            qs = leaf_sharding(name, leaf.q)
            # scales follow the quantized payload's spec on shared dims
            sspec = [None] * leaf.scale.ndim
            for ax in range(min(leaf.scale.ndim, leaf.q.ndim)):
                if (qs.spec[ax] is not None
                        and leaf.scale.shape[ax] == leaf.q.shape[ax]):
                    sspec[ax] = qs.spec[ax]
            out[name] = QTensor(qs, NamedSharding(mesh, P(*sspec)),
                                act_dynamic=leaf.act_dynamic,
                                act_scale=leaf.act_scale)
        else:
            out[name] = leaf_sharding(name, leaf)
    return out


def input_sharding(mesh: Mesh, batch_axis: str = "data"):
    """Batch-dim DP sharding (leading axis; trailing dims replicated)."""
    return NamedSharding(mesh, P(batch_axis))


def shard_program(net, mesh: Mesh, tp_axis: str = "model",
                  batch_axis: str = "data"):
    """Rebuild a Net's TracedProgram with DP/TP shardings installed.

    Weights are placed with their NamedSharding (device_put once); the jitted
    program constrains inputs to batch sharding and lets GSPMD propagate.
    """
    from ..runtime.tracer import TracedProgram
    from ..quant import make_quant_program

    if net.graph.quant:
        prog = make_quant_program(net.graph, net.weights)
    else:
        prog = TracedProgram(net.graph, net.weights)
    pshard = param_shardings(net.graph, prog.params, mesh, tp_axis)

    def put(leaf, sh):
        if isinstance(leaf, QTensor):
            return QTensor(jax.device_put(leaf.q, sh.q),
                           jax.device_put(leaf.scale, sh.scale),
                           act_dynamic=leaf.act_dynamic,
                           act_scale=leaf.act_scale)
        return jax.device_put(leaf, sh)

    prog.params = {n: put(l, pshard[n]) for n, l in prog.params.items()}
    xshs = tuple(input_sharding(mesh, batch_axis=batch_axis)
                 for _ in net.graph.inputs)
    prog._jit_kwargs = dict(prog._jit_kwargs,
                            in_shardings=(pshard, *xshs))
    prog.op_overrides.update(FUSED_OVERRIDES)
    prog._cache.clear()
    net._program = prog
    return prog
