"""Pallas fused ResNet entry stage: stem conv + maxpool + C=64 basic blocks.

Why this exists (experiments/prefix_profile_b64.json): at batch 64 the stem
(7x7/2 conv + 3x3/2 maxpool) costs ~0.95 ms and the two C=64 residual blocks
~1.85 ms — together ~88% of the 3.17 ms ResNet-18 step — because convs whose
GEMM lane dimension is O=64 output channels fill half the MXU's 128 lanes and
every XLA-level reshaping fix pays an extra HBM round trip.  These kernels
restructure the whole stage on-chip:

  * **layout**: activations live as (C, flat) int8 with the FLATTENED spatial
    dim on lanes — rows padded to a 64-col stride (56 data + 8 zeros) plus
    128-lane halos, so every 3x3 tap is a *lane-offset slice* of one buffer
    and the zero padding doubles as the conv's `same` border (mask-free);
  * **im2col in VMEM**: the 9 taps are staged into a (576, S) B matrix by 9
    sublane-block copies (the scratch-staging pattern that round-1 validated
    against Mosaic's lane-offset rules), then ONE s8 x s8 -> s32 MXU dot per
    conv with K=576 contraction and N=S=3584 lanes — no 64-lane starvation;
  * **whole-block fusion**: conv1 + bias + ReLU + requant + conv2 + bias +
    residual add + ReLU + requant run per grid step with everything in VMEM;
    HBM sees one int8 read and one int8 write per block per image;
  * **stem**: the input is 4x4 space-to-depth'd by XLA (cheap: the image is
    the smallest tensor in the net), so the 7x7/2 conv becomes FOUR stride-1
    phase GEMMs (one per output-pixel parity) sharing one B matrix, computed
    as a single M=256 dot; the 3x3/2 maxpool then reads the phases at lane
    offsets {0,-1}x{0,-64} — the pool fuses into the stem kernel for free.

Between the stem kernel and the block kernels, activations stay int8 in the
padded-flat layout (halo+pad pre-zeroed), so consecutive pallas_calls chain
with ~245 KB of HBM traffic per image per hop.

The reference computes this stage as threaded im2col + BLAS matmul per conv
(/root/reference/planer/util.py:17-44) with a shift-and-reduce pool
(util.py:79-100); this module is the TPU-native replacement at speed.

Every entry point falls back to a decomposed jnp path (identical op
semantics; see :func:`decomposed`) off-TPU, under sharding, or for shapes
other than the ResNet @224 stage geometry.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..qtypes import QTensor

__all__ = ["stage64", "decomposed", "PALLAS"]

# module switch: "auto" = pallas on TPU, decomposed elsewhere; False = always
# decomposed; True = force (interpret off-TPU is handled by the caller).
# Sharded programs do NOT rely on this global: parallel.sharding injects
# force_decomposed=True per-program via TracedProgram.op_overrides.
PALLAS = "auto"

# stage geometry (ResNet @224): pool/block grid R x R, rows padded to RS cols
R = 56            # rows/cols of the 56x56 stage
RS = 64           # row stride (56 data + 8 zero cols)
S = R * RS        # flattened spatial extent = 3584 (28 lane-tiles)
HALO = 128        # left halo of the block layout (>= 65, lane-tile aligned)
BUF = HALO + S + HALO          # 3840 = 30 lane-tiles
SBUF = 60 * RS                 # stem input buffer: 58 rows used + 2 pad


def _colmask(rows, dtype=jnp.float32):
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, S), 1)
    return (lane % RS < R).astype(dtype)


# --------------------------------------------------------------------------
# weight packing (all static host-side index math; applied with one gather)
# --------------------------------------------------------------------------

def _pack_block_A(wq):
    """(64, 64, 3, 3) -> (64, 576): A[o, (dy*3+dx)*64 + c] = w[o, c, dy, dx]."""
    return wq.transpose(0, 2, 3, 1).reshape(64, 576)


def _stem_gather_idx():
    """(4, 576) gather map: packed stem A column -> flat 7x7x3 weight index
    (147 = missing -> zero column).  Phase p = 2*py + px; B row layout is
    t*64 + c48 with t = tr*3 + tc and c48 = (c*4 + sy)*4 + sx, matching the
    4x4 space-to-depth done by the XLA prologue."""
    idx = np.full((4, 576), 147, np.int32)
    for py in range(2):
        for px in range(2):
            p = 2 * py + px
            for c in range(3):
                for dy in range(7):
                    for dx in range(7):
                        tr, sy = divmod(2 * py + dy, 4)
                        tc, sx = divmod(2 * px + dx, 4)
                        c48 = (c * 4 + sy) * 4 + sx
                        col = (tr * 3 + tc) * 64 + c48
                        idx[p, col] = (c * 7 + dy) * 7 + dx
    return idx


_STEM_IDX = _stem_gather_idx()


def _pack_stem_A(wq):
    """(64, 3, 7, 7) int8 -> (256, 576): 4 phase banks of 64 output chans."""
    flat = jnp.concatenate(
        [wq.reshape(64, 147), jnp.zeros((64, 1), wq.dtype)], axis=1)
    banks = [flat[:, _STEM_IDX[p]] for p in range(4)]     # each (64, 576)
    return jnp.concatenate(banks, axis=0)                  # (256, 576)


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

_BLOCK_TAPS = [(dy - 1) * RS + (dx - 1) for dy in range(3) for dx in range(3)]
_STEM_TAPS = [tr * RS + tc for tr in range(3) for tc in range(3)]


def _build_B(B_ref, src, base, taps, nc):
    """Stage the 9 tap slices into the (576, S) B matrix (sublane blocks of
    64; stem uses 48 of each 64 — the unused rows pair with zero A columns,
    so their stale content is never observed)."""
    for t, off in enumerate(taps):
        B_ref[t * 64:t * 64 + nc, :] = src[:, base + off:base + off + S]


def _stem_kernel(x_ref, A_ref, f_ref, b_ref, o_ref, B_ref, ph_ref, *,
                 inv_out):
    x = x_ref[0]
    _build_B(B_ref, x, 0, _STEM_TAPS, 48)
    acc = jnp.dot(A_ref[...], B_ref[...],
                  preferred_element_type=jnp.int32)         # (256, S)
    mask = _colmask(64)
    ph_ref[:, :HALO] = jnp.zeros((64, HALO), jnp.float32)
    pooled = None
    # maxpool(3, stride 2, pad 1) via phase shifts; ReLU output makes the
    # zero halo/pad a harmless identity for max
    shifts = [(HALO,), (HALO, HALO - 1), (HALO, HALO - RS),
              (HALO, HALO - 1, HALO - RS, HALO - RS - 1)]
    for p in range(4):
        v = acc[p * 64:(p + 1) * 64].astype(jnp.float32)
        v = jnp.maximum(v * f_ref[p * 64:(p + 1) * 64] +
                        b_ref[p * 64:(p + 1) * 64], 0.0) * mask
        offs = shifts[p]
        if offs == (HALO,):
            pooled = v if pooled is None else jnp.maximum(pooled, v)
            continue
        ph_ref[:, HALO:HALO + S] = v
        for off in offs:
            pooled = jnp.maximum(pooled, ph_ref[:, off:off + S])
    q = jnp.clip(jnp.round(pooled * inv_out), -127, 127) * mask
    zero = jnp.zeros((64, HALO), jnp.int8)
    o_ref[0, :, :HALO] = zero
    o_ref[0, :, HALO:HALO + S] = q.astype(jnp.int8)
    o_ref[0, :, HALO + S:] = zero


def _block_kernel(x_ref, A1_ref, f1_ref, b1_ref, A2_ref, f2_ref, b2_ref,
                  o_ref, B_ref, y1_ref, *, inv_mid, sx_in, inv_out):
    x = x_ref[0]
    mask = _colmask(64)
    _build_B(B_ref, x, HALO, _BLOCK_TAPS, 64)
    acc = jnp.dot(A1_ref[...], B_ref[...],
                  preferred_element_type=jnp.int32)         # (64, S)
    v = jnp.maximum(acc.astype(jnp.float32) * f1_ref[...] + b1_ref[...], 0.0)
    q = jnp.clip(jnp.round(v * inv_mid), -127, 127) * mask
    zero = jnp.zeros((64, HALO), jnp.int8)
    y1_ref[:, :HALO] = zero
    y1_ref[:, HALO:HALO + S] = q.astype(jnp.int8)
    y1_ref[:, HALO + S:] = zero
    _build_B(B_ref, y1_ref[...], HALO, _BLOCK_TAPS, 64)
    acc2 = jnp.dot(A2_ref[...], B_ref[...], preferred_element_type=jnp.int32)
    z = (acc2.astype(jnp.float32) * f2_ref[...] + b2_ref[...]
         + x[:, HALO:HALO + S].astype(jnp.float32) * sx_in)
    z = jnp.maximum(z, 0.0)
    if inv_out is not None:
        out = (jnp.clip(jnp.round(z * inv_out), -127, 127) * mask
               ).astype(jnp.int8)
        zo = zero
    else:
        out = (z * mask).astype(o_ref.dtype)
        zo = jnp.zeros((64, HALO), o_ref.dtype)
    o_ref[0, :, :HALO] = zo
    o_ref[0, :, HALO:HALO + S] = out
    o_ref[0, :, HALO + S:] = zo


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------

def _call_stem(x48, A, f, b, inv_out, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = x48.shape[0]
    return pl.pallas_call(
        partial(_stem_kernel, inv_out=inv_out),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 48, SBUF), lambda n: (n, 0, 0)),
            pl.BlockSpec((256, 576), lambda n: (0, 0)),
            pl.BlockSpec((256, 1), lambda n: (0, 0)),
            pl.BlockSpec((256, 1), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 64, BUF), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((576, S), jnp.int8),
            pltpu.VMEM((64, HALO + S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * 256 * 576 * S,
            bytes_accessed=N * (48 * SBUF + 64 * BUF) + 256 * 576,
            transcendentals=0),
        interpret=interpret,
    )(x48, A, f, b)


def _call_block(xp, A1, f1, b1, A2, f2, b2, inv_mid, sx_in, inv_out,
                interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = xp.shape[0]
    out_dtype = jnp.int8 if inv_out is not None else jnp.bfloat16
    wspec = pl.BlockSpec((64, 576), lambda n: (0, 0))
    sspec = pl.BlockSpec((64, 1), lambda n: (0, 0))
    return pl.pallas_call(
        partial(_block_kernel, inv_mid=inv_mid, sx_in=sx_in, inv_out=inv_out),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)),
                  wspec, sspec, sspec, wspec, sspec, sspec],
        out_specs=pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 64, BUF), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((576, S), jnp.int8),
            pltpu.VMEM((64, BUF), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * 2 * 64 * 576 * S,
            bytes_accessed=N * (64 * BUF * 2) + 2 * 64 * 576,
            transcendentals=0),
        interpret=interpret,
    )(xp, A1, f1, b1, A2, f2, b2)


# --------------------------------------------------------------------------
# XLA prologue / epilogue around the kernel chain
# --------------------------------------------------------------------------

def _stem_prologue(x, s_in):
    """(N, 3, 224, 224) float -> (N, 48, SBUF) int8: quantize + pad(3, 5) +
    4x4 space-to-depth + pad rows 58->60, cols 58->64, flatten."""
    n = x.shape[0]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127
                  ).astype(jnp.int8)
    xp = jnp.pad(xq, ((0, 0), (0, 0), (3, 5), (3, 5)))
    xp = xp.reshape(n, 3, 58, 4, 58, 4).transpose(0, 1, 3, 5, 2, 4)
    xp = xp.reshape(n, 48, 58, 58)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 2), (0, 6)))
    return xp.reshape(n, 48, SBUF)


def _unpad(y, dtype):
    """(N, 64, BUF) kernel layout -> (N, 64, 56, 56) standard."""
    n = y.shape[0]
    y = y[:, :, HALO:HALO + S].reshape(n, 64, R, RS)[:, :, :, :R]
    return y.astype(dtype)


def _pallas_stage(x, Ws, Bs, blocks, interpret):
    """The fused TPU path.  Ws/W1/W2 are int8 QTensors with calibrated
    act_scales; biases are float arrays (or None)."""
    def bias(Bw, rep=1):
        v = jnp.zeros((64,), jnp.float32) if Bw is None \
            else Bw.reshape(-1).astype(jnp.float32)
        return jnp.tile(v.reshape(64, 1), (rep, 1))

    s_in = float(Ws.act_scale)
    out_scale0 = float(blocks[0][0].act_scale)       # pooled -> block1 conv1
    x48 = _stem_prologue(x, s_in)
    A_s = _pack_stem_A(Ws.q)
    f_s = jnp.tile(Ws.scale.reshape(64, 1).astype(jnp.float32) * s_in, (4, 1))
    y = _call_stem(x48, A_s, f_s, bias(Bs, 4), 1.0 / out_scale0, interpret)

    for bi, (W1, B1, W2, B2) in enumerate(blocks):
        sx_in = float(W1.act_scale)
        s_mid = float(W2.act_scale)
        last = bi == len(blocks) - 1
        inv_out = None if last else 1.0 / float(blocks[bi + 1][0].act_scale)
        A1 = _pack_block_A(W1.q)
        A2 = _pack_block_A(W2.q)
        f1 = W1.scale.reshape(64, 1).astype(jnp.float32) * sx_in
        f2 = W2.scale.reshape(64, 1).astype(jnp.float32) * s_mid
        y = _call_block(y, A1, f1, bias(B1), A2, f2, bias(B2),
                        1.0 / s_mid, sx_in, inv_out, interpret)
    return _unpad(y, x.dtype)


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------

def decomposed(x, Ws, Bs, *bw, jops=None):
    """Reference semantics: exactly the op chain the fusion pass replaced
    (conv7x7/2 + relu + maxpool3/2 + N x [conv-relu-conv-add-relu])."""
    if jops is None:
        from .. import jax_ops as jops
    y = jops.conv2d(x, Ws, Bs, strides=(2, 2), pads=(3, 3, 3, 3))
    y = jops.relu(y)
    y = jops.maxpool(y, w=(3, 3), pads=(1, 1, 1, 1), strides=(2, 2))
    for i in range(0, len(bw), 4):
        W1, B1, W2, B2 = bw[i:i + 4]
        r = y
        y = jops.relu(jops.conv2d(y, W1, B1, strides=(1, 1),
                                  pads=(1, 1, 1, 1)))
        y = jops.conv2d(y, W2, B2, strides=(1, 1), pads=(1, 1, 1, 1))
        y = jops.relu(jops.add(y, r))
    return y


def _eligible(x, Ws, bw):
    if not (isinstance(Ws, QTensor) and Ws.act_scale is not None
            and Ws.q.dtype == jnp.int8 and Ws.q.shape == (64, 3, 7, 7)):
        return False
    if x.ndim != 4 or x.shape[1:] != (3, 224, 224):
        return False
    if len(bw) % 4 or not bw:
        return False
    for i in range(0, len(bw), 4):
        W = bw[i]
        W2 = bw[i + 2]
        for w in (W, W2):
            if not (isinstance(w, QTensor) and w.act_scale is not None
                    and w.q.dtype == jnp.int8 and w.q.shape == (64, 64, 3, 3)):
                return False
    return True


def stage64(x, Ws, Bs, *bw, blocks=None, interpret=None,
            force_decomposed=False):
    """Fused ResNet entry stage (stem + pool + C=64 basic blocks).

    Positional inputs: x, stem W, stem B, then (W1, B1, W2, B2) per block.
    ``blocks`` (IR kwarg) is informational; the weight count is the truth.
    ``force_decomposed`` is how parallel.sharding keeps the pallas_call out
    of GSPMD-partitioned programs (it cannot be auto-partitioned).
    """
    if force_decomposed:
        return decomposed(x, Ws, Bs, *bw)
    use = PALLAS
    if use == "auto":
        try:
            use = jax.default_backend() == "tpu"
        except Exception:
            use = False
    if interpret is not None:       # explicit test hook
        use = True
    if use and _eligible(x, Ws, bw):
        bws = [tuple(bw[i:i + 4]) for i in range(0, len(bw), 4)]
        return _pallas_stage(x, Ws, Bs, bws, bool(interpret))
    return decomposed(x, Ws, Bs, *bw)
