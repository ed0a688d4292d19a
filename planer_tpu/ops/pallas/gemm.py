"""Pallas fused dequant+GEMM kernels (TPU MXU).

``dense_q(x, K_q, B)`` — y = x @ dequant(K_q).T + B with int8 weights
streamed HBM->VMEM at quantized width (1 byte/elem — the point of weight-only
quantization on a bandwidth-bound chip) and dequantized in VMEM right before
the MXU dot.  The dot runs bf16 x bf16 -> f32: int8 payloads are exactly
representable in bf16, per-channel scales are applied to the f32 accumulator.

This is the centerpiece kernel replacing the reference's im2col+BLAS
conv/dense path (util.py:17-64) for quantized weights; dense layers and
1x1 convs route here, KxK convs use XLA's implicit-GEMM conv with a fused
dequant producer.

Falls back to a plain XLA dequant+matmul for shapes that don't tile cleanly,
problems too big for VMEM, or non-TPU backends.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..qtypes import QTensor

__all__ = ["dense_q", "matmul_q"]

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16MB/core


def _fallback_dense(x, K: QTensor, B):
    y = jnp.matmul(x, K.dequant(x.dtype).T,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if B is not None:
        y = y + B.reshape(1, -1).astype(y.dtype)
    return y


def _tile_plan(M: int, N: int, Kd: int):
    """Choose (bm, bn) or None if the problem shouldn't use the kernel."""
    if N % 128 or Kd % 128:
        return None
    if M < 8:  # tiny-M GEMMs (batch-1 heads) are better on the XLA path
        return None
    bm = 256 if M >= 256 else max(8, 1 << int(np.floor(np.log2(max(M, 1)))))
    bn = min(256, N)
    # VMEM: x tile (bm, Kd) f32 + q tile (Kd, bn) i8 + out (bm, bn) f32
    vmem = bm * Kd * 4 + Kd * bn + bm * bn * 4
    if vmem > _VMEM_BUDGET:
        return None
    return bm, bn


def _dense_q_kernel(x_ref, q_ref, s_ref, o_ref):
    """One (bm, bn) output tile: bf16 MXU dot of dequantized int8 weights."""
    x = x_ref[...].astype(jnp.bfloat16)
    w = q_ref[...].astype(jnp.bfloat16)       # int8 -> bf16 exact
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[...]


def _dense_q_pallas(x2d, qT, scale_row, bm, bn, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, Kd = x2d.shape
    _, N = qT.shape
    pad_m = (-M) % bm
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
    Mp = M + pad_m

    grid = (Mp // bm, N // bn)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    out = pl.pallas_call(
        _dense_q_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, Kd), lambda i, j: (i, 0)),
            pl.BlockSpec((Kd, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * Kd,
            bytes_accessed=Mp * Kd * 4 + Kd * N + Mp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
        **kwargs,
    )(x2d, qT, scale_row)
    if pad_m:
        out = out[:M]
    return out


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def dense_q(x, K: QTensor, B=None, *, interpret=None):
    """y = x @ dequant(K).T + B;  K.q is (N, Kdim) int8, scales (N, 1)."""
    N, Kdim = K.q.shape
    x2d = x.reshape(-1, Kdim)
    M = x2d.shape[0]
    if interpret is None:
        interpret = False
        if not _on_tpu():
            y = _fallback_dense(x2d, K, B)
            return y.reshape(x.shape[:-1] + (N,))
    plan = _tile_plan(M, N, Kdim)
    if plan is None:
        y = _fallback_dense(x2d, K, B)
        return y.reshape(x.shape[:-1] + (N,))
    qT = K.q.T  # (Kdim, N) int8
    scale_row = K.scale.reshape(1, N).astype(jnp.float32)
    y = _dense_q_pallas(x2d, qT, scale_row, *plan,
                        interpret=interpret).astype(x.dtype)
    if B is not None:
        y = y + B.reshape(1, -1).astype(y.dtype)
    return y.reshape(x.shape[:-1] + (N,))


def matmul_q(x, K: QTensor, *, interpret=None):
    """x @ dequant(K) for (Kdim, N)-layout quantized weights."""
    q = QTensor(K.q.T, K.scale.reshape(-1, 1))
    return dense_q(x, q, None, interpret=interpret)
