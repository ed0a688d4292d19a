"""Pallas fused dequant+GEMM kernels (TPU MXU).

``dense_q(x, K_q, B)`` — y = x @ dequant(K_q).T + B with int8 weights
streamed HBM->VMEM at quantized width and dequantized in-registers right
before the MXU dot.  This is the centerpiece kernel replacing the
reference's im2col+BLAS conv/dense path (util.py:17-64) for quantized
weights; 1x1 convs and dense layers route here, KxK convs use XLA's
implicit-GEMM conv with a fused dequant producer.

Falls back to a plain XLA dequant+matmul for shapes too small to tile
(or on non-TPU backends where Mosaic is unavailable).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..qtypes import QTensor

__all__ = ["dense_q", "matmul_q"]


def _fallback_dense(x, K: QTensor, B):
    y = jnp.matmul(x, K.dequant(x.dtype).T,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if B is not None:
        y = y + B.reshape(1, -1).astype(y.dtype)
    return y


def _use_pallas(M: int, N: int, Kdim: int) -> bool:
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    if platform != "tpu":
        return False
    # tiling wants lane-aligned N/K; tiny problems aren't worth a kernel
    return N % 128 == 0 and Kdim % 128 == 0 and M >= 8


def _dense_q_kernel(x_ref, q_ref, s_ref, o_ref, *, block_k: int, n_k: int):
    """One (TILE_M, TILE_N) output tile: accumulate over K in block_k steps.

    q_ref holds the int8 weight tile transposed to (K, N) layout; s_ref the
    per-N scales.  Dequant happens after the int8 load, in VMEM, so HBM
    traffic for weights is 1 byte/elem.
    """
    from jax.experimental import pallas as pl  # noqa: F401

    acc = jnp.zeros(o_ref.shape, jnp.float32)
    x = x_ref[...]
    q = q_ref[...]
    for k in range(n_k):
        xs = jax.lax.dynamic_slice_in_dim(x, k * block_k, block_k, 1)
        qs = jax.lax.dynamic_slice_in_dim(q, k * block_k, block_k, 0)
        acc += jnp.dot(xs, qs.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[...]


def _dense_q_pallas(x2d, qT, scale_row, block_m=256, block_n=256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, Kd = x2d.shape
    Kd2, N = qT.shape
    assert Kd == Kd2
    bm = min(block_m, max(8, M))
    # round M up to a multiple of bm via padding
    pad_m = (-M) % bm
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    bn = min(block_n, N)
    block_k = min(512, Kd)
    n_k = Kd // block_k if Kd % block_k == 0 else 1
    if Kd % block_k != 0:
        block_k = Kd

    grid = (Mp // bm, N // bn)
    out = pl.pallas_call(
        partial(_dense_q_kernel, block_k=block_k, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, Kd), lambda i, j: (i, 0)),
            pl.BlockSpec((Kd, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * Kd,
            bytes_accessed=Mp * Kd * x2d.dtype.itemsize + Kd * N + Mp * N * 4,
            transcendentals=0,
        ),
    )(x2d, qT, scale_row)
    if pad_m:
        out = out[:M]
    return out


def dense_q(x, K: QTensor, B=None):
    """y = x @ dequant(K).T + B;  K.q is (N, Kdim) int8, scales (N, 1)."""
    N, Kdim = K.q.shape
    x2d = x.reshape(-1, Kdim)
    M = x2d.shape[0]
    if not _use_pallas(M, N, Kdim):
        y = _fallback_dense(x2d, K, B)
        return y.reshape(x.shape[:-1] + (N,))
    qT = K.q.T  # (Kdim, N) int8
    scale_row = K.scale.reshape(1, N).astype(jnp.float32)
    y = _dense_q_pallas(x2d, qT, scale_row).astype(x.dtype)
    if B is not None:
        y = y + B.reshape(1, -1).astype(y.dtype)
    return y.reshape(x.shape[:-1] + (N,))


def matmul_q(x, K: QTensor):
    return dense_q(x, QTensor(K.q.T, K.scale.reshape(1, -1)), None)
