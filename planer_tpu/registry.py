"""Opcode registry: IR opcode -> numpy oracle fn + jax fn + trace metadata.

This is the framework's analog of the reference's ``layer_map``
(/root/reference/planer/layer.py:262-281), extended with the metadata the
tracer needs to partition a graph between the jit-compiled XLA prefix and the
host-side numpy tail:

  * ``static_args`` — positional input indices that must be trace-time
    constants for the op to be XLA-traceable (shape operands: reshape targets,
    slice bounds, resize scales, ...).  If such an operand is dynamic at trace
    time, the tracer cuts the graph there and the rest runs on host.
  * ``data_dependent`` — output *shape* depends on input *values*
    (NonZero); never traceable.
  * ``multi_output`` — op returns a tuple (split/topk/lstm/return).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

from .ops import numpy_ops as nops
from .ops import jax_ops as jops

__all__ = ["OpSpec", "OPS", "get_op"]


@dataclasses.dataclass(frozen=True)
class OpSpec:
    name: str
    numpy_fn: Callable
    jax_fn: Callable
    static_args: tuple[int, ...] = ()
    data_dependent: bool = False
    multi_output: bool = False


def _spec(name, nf, jf, static_args=(), data_dependent=False,
          multi_output=False):
    return OpSpec(name, nf, jf, tuple(static_args), data_dependent,
                  multi_output)


OPS: dict[str, OpSpec] = {}


def _reg(name, nf, jf, **kw):
    OPS[name] = _spec(name, nf, jf, **kw)


# compute
_reg("conv", nops.conv2d, jops.conv2d)
_reg("convtranspose", nops.conv_transpose2d, jops.conv_transpose2d)
_reg("dense", nops.dense, jops.dense)
_reg("matmul", nops.matmul, jops.matmul)
_reg("maxpool", nops.maxpool, jops.maxpool)
_reg("averagepool", nops.averagepool, jops.averagepool)
_reg("gap", nops.global_average_pool, jops.global_average_pool)
_reg("lstm", nops.lstm, jops.lstm, multi_output=True)
_reg("gru", nops.gru, jops.gru, multi_output=True)
# fused ResNet entry stage (emitted by optimize.fuse_stage64, never by the
# ONNX frontend) — stem conv+relu+maxpool + N basic blocks in one op so the
# TPU path can run the whole stage in fused Pallas kernels
_reg("stage64", nops.stage64, jops.stage64)
# fused ResNet body stage (optimize.fuse_stagen): basic/bottleneck blocks
# at constant width, incl. strided/projected entry blocks
_reg("stagen", nops.stagen, jops.stagen)

# activations / elementwise
_reg("relu", nops.relu, jops.relu)
_reg("leakyrelu", nops.leakyrelu, jops.leakyrelu)
_reg("sigmoid", nops.sigmoid, jops.sigmoid)
_reg("hardsigmoid", nops.hardsigmoid, jops.hardsigmoid)
_reg("tanh", nops.tanh, jops.tanh)
_reg("softmax", nops.softmax, jops.softmax)
_reg("logsoftmax", nops.logsoftmax, jops.logsoftmax)
_reg("clip", nops.clip, jops.clip)
_reg("erf", nops.erf, jops.erf)
_reg("sqrt", nops.sqrt, jops.sqrt)
_reg("exp", nops.exp, jops.exp)
_reg("log", nops.log, jops.log)
_reg("reciprocal", nops.reciprocal, jops.reciprocal)
_reg("pow", nops.power, jops.power)
_reg("add", nops.add, jops.add)
_reg("sub", nops.sub, jops.sub)
_reg("mul", nops.mul, jops.mul)
_reg("div", nops.div, jops.div)
_reg("equal", nops.equal, jops.equal)
_reg("greater", nops.greater, jops.greater)
_reg("greaterorequal", nops.greater_or_equal, jops.greater_or_equal)
_reg("where", nops.where, jops.where)
_reg("identity", nops.identity, jops.identity)

# normalization
_reg("batchnorm", nops.batchnorm, jops.batchnorm)
_reg("instancenormalization", nops.instance_normalization,
     jops.instance_normalization)

# shape / index / tensor
_reg("reshape", nops.reshape, jops.reshape, static_args=(1,))
_reg("flatten", nops.flatten, jops.flatten)
_reg("transpose", nops.transpose, jops.transpose)
_reg("concat", nops.concat, jops.concat)
_reg("split", nops.split, jops.split, static_args=(1,), multi_output=True)
_reg("gather", nops.gather, jops.gather)
_reg("slice", nops.slice_, jops.slice_, static_args=(1, 2, 3, 4))
_reg("expand", nops.expand, jops.expand, static_args=(1,))
_reg("tile", nops.tile, jops.tile, static_args=(1,))
_reg("pad", nops.pad, jops.pad, static_args=(1,))
# axes arrive as positional inputs in opset >= 13 (the torch.onnx default) —
# they are shape operands, so the tracer must read them from the static env
# (or cut the graph if input-dependent), never trace them
_reg("squeeze", nops.squeeze, jops.squeeze, static_args=(1,))
_reg("unsqueeze", nops.unsqueeze, jops.unsqueeze, static_args=(1,))
_reg("shape", nops.shape_of, jops.shape_of)
_reg("cast", nops.cast, jops.cast)
_reg("const", nops.const, jops.const)
_reg("constantofshape", nops.constant_of_shape, jops.constant_of_shape,
     static_args=(0,))
_reg("range", nops.arange, jops.arange, static_args=(0, 1, 2))
_reg("scatternd", nops.scatternd, jops.scatternd)
_reg("nonzero", nops.nonzero, jops.nonzero, data_dependent=True)
_reg("topk", nops.topk, jops.topk, static_args=(1,), multi_output=True)

# reductions
_reg("reducesum", nops.reduce_sum, jops.reduce_sum)
_reg("reducemean", nops.reduce_mean, jops.reduce_mean)
_reg("reducemax", nops.reduce_max, jops.reduce_max)
_reg("reducemin", nops.reduce_min, jops.reduce_min)

# resize / upsample
_reg("upsample", nops.upsample, jops.upsample, static_args=(1,))
_reg("resize", nops.resize_op, jops.resize_op, static_args=(1, 2, 3))

# extended set (beyond the reference layer_map; modern ONNX exporters)
_reg("abs", nops.absolute, jops.absolute)
_reg("neg", nops.negative, jops.negative)
_reg("min", nops.minimum, jops.minimum)
_reg("max", nops.maximum, jops.maximum)
_reg("floor", nops.floor, jops.floor)
_reg("ceil", nops.ceil, jops.ceil)
_reg("round", nops.round_, jops.round_)
_reg("sign", nops.sign, jops.sign)
_reg("prelu", nops.prelu, jops.prelu)
_reg("elu", nops.elu, jops.elu)
_reg("softplus", nops.softplus, jops.softplus)
_reg("gelu", nops.gelu, jops.gelu)
_reg("argmax", nops.argmax, jops.argmax)
_reg("argmin", nops.argmin, jops.argmin)
_reg("reduceprod", nops.reduce_prod, jops.reduce_prod)
_reg("gmp", nops.global_max_pool, jops.global_max_pool)
_reg("spacetodepth", nops.space_to_depth, jops.space_to_depth)
_reg("depthtospace", nops.depth_to_space, jops.depth_to_space)
_reg("mean", nops.mean_variadic, jops.mean_variadic)
_reg("sum", nops.sum_variadic, jops.sum_variadic)

# control
_reg("return", nops.return_, jops.return_, multi_output=True)


def get_op(name: str) -> OpSpec:
    try:
        return OPS[name]
    except KeyError:
        raise KeyError(f"unknown opcode {name!r}; known: {sorted(OPS)}") from None
