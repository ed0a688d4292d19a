"""Pallas fused 3x3 stride-1 conv for MXU-starved channel counts (NHWC).

The problem (experiments/RESULTS.md): 3x3 convs with O=C=64 run at ~21% MXU
because the GEMM's N dimension (output channels) fills only half the MXU's
128 lanes, and XLA-level row-stacking pays an extra HBM round trip for the
row interleave.  This kernel solves both on-chip:

  * **tap packing**: the 3x3x C contraction is laid out as one K=12*C GEMM
    over 4-input-row patches (rows r..r+3), K = 768 for C=64 — lane-aligned;
  * **dual row banks**: the B matrix holds TWO filter banks (output rows 2t
    and 2t+1 of the patch), N = 2*O = 128 — full lane occupancy.  The
    un-interleave happens in VMEM on the way to the output ref (free),
    unlike the XLA formulation which materializes a transpose in HBM;
  * **int8-resident weights**: the packed (12C, 2O) int8 bank lives in VMEM,
    dequantized to bf16 once per grid program; per-channel scales + bias +
    optional ReLU fuse into the epilogue.

MAC overhead vs the plain conv: 12/9 = 1.33x, for 2x lane use (same math as
the XLA stacking, minus its HBM cost).

Layout contract: x (N, H, W, C) bf16/f32 NHWC, pre-padding handled inside
(pad=1 same-conv); weights OIHW logical, packed here.  Grid: (N, H/BR)
row-blocks; the H+2-padded input is re-blocked with overlapping rows via a
manual HBM->VMEM DMA (BlockSpec tiles cannot overlap).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_dual", "pack_weights_dual", "supports"]


def pack_weights_dual(K_oihw: np.ndarray):
    """(O, C, 3, 3) -> packed (12*C, 2*O) matrix for the dual-row kernel.

    Column bank 0 (cols 0..O-1): output row 2t  — taps occupy patch rows 0-2.
    Column bank 1 (cols O..2O-1): output row 2t+1 — taps occupy patch rows 1-3.
    K index layout: (patch_row dr, tap_col dc, channel c) -> (dr*3+dc)*C + c.
    """
    K = np.asarray(K_oihw)
    O, C, kh, kw = K.shape
    assert (kh, kw) == (3, 3)
    W = np.zeros((12 * C, 2 * O), K.dtype)
    for bank, row_off in ((0, 0), (1, 1)):
        for dr in range(3):
            for dc in range(3):
                blk = (row_off + dr) * 3 + dc
                W[blk * C:(blk + 1) * C, bank * O:(bank + 1) * O] = \
                    K[:, :, dr, dc].T
    return W


def _kernel(x_hbm, w_ref, s_ref, b_ref, o_ref, slab, A_scratch, sem, *, BR,
            Wd, C, O, relu, Hp):
    """One program: output rows [r*BR, r*BR+BR) of one image."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pl.program_id(0)
    r = pl.program_id(1)
    # DMA the (BR+2)-row input slab (overlapping blocks -> manual copy;
    # the full array stays in ANY/HBM, indexed per program)
    cp = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(r * BR, BR + 2)], slab, sem)
    cp.start()
    wq = w_ref[...].astype(jnp.bfloat16)          # (12C, 2O) dequant once
    cp.wait()

    # build the patch matrix A: (BR/2 * Wd, 12C).  Mosaic forbids stride-2
    # slices, so view the slab as row PAIRS and pick parity by unit index:
    # patch row dr over patches t: slab rows {2t + dr} = pairs[t + dr//2,
    # dr%2].
    xs = slab[...].astype(jnp.bfloat16)           # (BR+2, Wd+2, C)
    pairs = xs.reshape((BR + 2) // 2, 2, Wd + 2, C)
    M = (BR // 2) * Wd
    # stage pieces through VMEM scratch: stores perform the relayout that a
    # direct lane-dim concatenate of offset-mismatched vectors cannot
    idx = 0
    for dr in range(4):
        o, e = dr // 2, dr % 2
        rows = jax.lax.slice_in_dim(pairs, o, o + BR // 2, axis=0)
        rows = jax.lax.index_in_dim(rows, e, axis=1, keepdims=False)
        # rows: (BR/2, Wd+2, C) -> 3 column taps
        for dc in range(3):
            piece = jax.lax.slice_in_dim(rows, dc, dc + Wd, axis=1)
            A_scratch[:, idx * C:(idx + 1) * C] = piece.reshape(M, C)
            idx += 1

    acc = jnp.dot(A_scratch[...], wq,
                  preferred_element_type=jnp.float32)  # (M, 2O)
    acc = acc * s_ref[...] + b_ref[...]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    # split banks via lane slices (Mosaic cannot reshape-split the lane dim);
    # the caller's (N, H/2, 2, W, O) -> (N, H, W, O) interleave is then a
    # metadata-only reshape outside the kernel
    b0 = acc[:, :O].reshape(BR // 2, Wd, O)
    b1 = acc[:, O:].reshape(BR // 2, Wd, O)
    o_ref[0, :, 0] = b0.astype(o_ref.dtype)
    o_ref[0, :, 1] = b1.astype(o_ref.dtype)


def supports(O, C, H, W):
    return (C % 8 == 0 and O % 8 == 0 and H % 2 == 0
            and (12 * C) % 128 == 0 and (2 * O) % 128 == 0)


def conv3x3_dual(x, K_packed, scale2, bias2, relu=False, interpret=False,
                 block_rows=16):
    """x: (N, H, W, C) NHWC; K_packed: (12C, 2O) (int8 or float);
    scale2/bias2: (1, 2O) f32 (scale duplicated per bank; use ones/zeros
    when folded elsewhere).  Returns (N, H, W, O) same-pad 3x3 s1 conv."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, Wd, C = x.shape
    O = K_packed.shape[1] // 2
    BR = min(block_rows, H)
    while H % BR:
        BR //= 2
    assert BR % 2 == 0 and H % BR == 0

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))   # (N, H+2, W+2, C)
    grid = (N, H // BR)

    out = pl.pallas_call(
        partial(_kernel, BR=BR, Wd=Wd, C=C, O=O, relu=relu, Hp=H + 2),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BR // 2, 2, Wd, O),
                               lambda n, r: (n, r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H // 2, 2, Wd, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((BR + 2, Wd + 2, C), x.dtype),
            pltpu.VMEM(((BR // 2) * Wd, 12 * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * Wd * O * C * 12,
            bytes_accessed=(N * H * Wd * C * x.dtype.itemsize
                            + K_packed.size + N * H * Wd * O * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, K_packed, scale2, bias2)
    # (t, parity) are adjacent row-major dims: merging them IS the interleave
    return out.reshape(N, H, Wd, O)
