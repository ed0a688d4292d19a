"""JAX/XLA op library — the compiled compute path.

Each IR opcode gets a trace-friendly jnp/lax implementation with static
shapes; XLA owns fusion and scheduling.  Shape-like operands (reshape targets,
slice bounds, resize scales, ...) arrive as *numpy* arrays hoisted to trace
time by the tracer (runtime/tracer.py) — implementations accept numpy for
those and traced arrays for data.

Parity contract: every function here matches the numpy oracle
(:mod:`.numpy_ops`) to fp32 tolerance; resize/upsample share the exact same
index plans (:mod:`.resize`) so they are bit-identical in index selection.

Reference capability map: /root/reference/planer/layer.py (op set),
/root/reference/planer/util.py (kernels).  Nothing here is a translation —
conv is ``lax.conv_general_dilated`` (XLA's implicit-GEMM on the MXU), pooling
is ``lax.reduce_window``, LSTM is a ``lax.scan`` over a fused cell.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import resize as _rs
from . import modes as _modes
from .padding import resolve_conv_pads, resolve_pool_pads
from .qtypes import QTensor

# --------------------------------------------------------------------------
# conv / pool / matmul
# --------------------------------------------------------------------------

_DIMNUMS = ("NCHW", "OIHW", "NCHW")

# Output-row stacking (see experiments/conv_tricks.py: 2.46x measured on the
# 64-channel 56x56 ResNet layers): a 3x3 s1 same-pad conv with O <= 64 output
# channels wastes >= half of the MXU's 128 lanes.  Reformulate as a 4x3
# s(2,1) conv computing TWO adjacent output rows as 2*O channels (kernels
# zero-padded per row shift), then interleave rows back.  1.33x MACs, 2x lane
# occupancy — numerically exact.
_STACK_CONV = True

# opt-in: route quantized 1x1 convs to the Pallas GEMM (off: XLA conv wins
# through fusion — see experiments/RESULTS.md ResNet-50 A/B)
_PALLAS_CONV1X1 = False


def _stacked_conv3x3(x, K, B, prec):
    n, C, H, W = x.shape
    O = K.shape[0]
    Kp = jnp.zeros((2 * O, K.shape[1], 4, 3), K.dtype)
    Kp = Kp.at[:O, :, 0:3, :].set(K)
    Kp = Kp.at[O:, :, 1:4, :].set(K)
    z = lax.conv_general_dilated(
        x, Kp, (2, 1), ((1, 1), (1, 1)), dimension_numbers=_DIMNUMS,
        preferred_element_type=prec)
    T = z.shape[2]
    z = z.reshape(n, 2, O, T, W).transpose(0, 2, 3, 1, 4)
    out = z.reshape(n, O, 2 * T, W).astype(x.dtype)
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def _act_quant(x, K):
    """Per-tensor activation quantization: baked calibration constant when
    available, else a dynamic absmax reduction."""
    if K.act_scale is not None:
        sx = jnp.float32(K.act_scale)
    else:
        sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6).astype(jnp.float32) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                 ).astype(jnp.int8)
    return q, sx


def _stacked_conv3x3_q(x, K, B):
    """Output-row-stacked s8 x s8 -> s32 conv for O <= 64 3x3 layers: the
    stacked formulation fills all 128 output lanes, which unlocks the int8
    MXU path on layers where plain W8A8 is lane-starved (measured 1.16x over
    stacked bf16, experiments/RESULTS.md + probe_r2)."""
    n, C, H, W = x.shape
    O = K.q.shape[0]
    q, sx = _act_quant(x, K)
    Kp = jnp.zeros((2 * O, C, 4, 3), jnp.int8)
    Kp = Kp.at[:O, :, 0:3, :].set(K.q)
    Kp = Kp.at[O:, :, 1:4, :].set(K.q)
    acc = lax.conv_general_dilated(
        q, Kp, (2, 1), ((1, 1), (1, 1)), dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32)
    T = acc.shape[2]
    s2 = jnp.concatenate([K.scale.reshape(-1), K.scale.reshape(-1)])
    z = acc.astype(jnp.float32) * (sx * s2.reshape(1, -1, 1, 1))
    z = z.reshape(n, 2, O, T, W).transpose(0, 2, 3, 1, 4)
    out = z.reshape(n, O, 2 * T, W).astype(x.dtype)
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def _conv_w8a8(x, K, B, strides, dilations, pads, pre_quantized=False,
               compute_dtype=None):
    """Per-tensor activation quant + s8 x s8 -> s32 conv + dequant.  The
    scale is a baked calibration constant when available (no reduction pass),
    else computed dynamically per call.

    ``pre_quantized``: x already holds int8 activation CODES at K.act_scale
    (emitted by a fused stage64 with out_scale == this conv's calibrated
    scale — optimize.annotate_stage_output_quant): skip the quantize pass
    and emit the program compute dtype (the tracer injects it; bf16 on the
    TPU serving path, fp32 when the surrounding program is fp32)."""
    pt, pl, pb, pr = pads
    if pre_quantized:
        odt = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32
        q, sx = x, jnp.float32(K.act_scale)
    else:
        (q, sx), odt = _act_quant(x, K), x.dtype
    acc = lax.conv_general_dilated(
        q, K.q, window_strides=strides, padding=((pt, pb), (pl, pr)),
        rhs_dilation=dilations, dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32)
    w_scale = K.scale.reshape(1, -1, 1, 1)
    out = (acc.astype(jnp.float32) * (sx * w_scale)).astype(odt)
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def conv2d(x, K, B=None, group=1, strides=(1, 1), dilations=(1, 1),
           pads=(0, 0, 0, 0), auto_pad=None, out_scale=None,
           compute_dtype=None):
    """2-D convolution with optional int8 activation-code emission.

    ``out_scale`` (set by optimize.annotate_output_quant when every
    transitive-through-relu consumer is an int8-quantized conv calibrated at
    that scale) re-emits the output as int8 CODES — XLA fuses the
    quantize into the conv epilogue, the in-between relu runs on int8, and
    the consumer conv takes the pre-quantized s8 path: the separate
    quantize pass and the bf16 activation round-trip both disappear.

    ``compute_dtype`` (tracer-injected program compute dtype) only matters
    on the pre-quantized path, whose int8 input carries no float dtype."""
    out = _conv2d(x, K, B, group=group, strides=strides, dilations=dilations,
                  pads=pads, auto_pad=auto_pad, compute_dtype=compute_dtype)
    if out_scale is None:
        return out
    return jnp.clip(jnp.round(out.astype(jnp.float32) / out_scale),
                    -127, 127).astype(jnp.int8)


def _conv2d(x, K, B=None, group=1, strides=(1, 1), dilations=(1, 1),
            pads=(0, 0, 0, 0), auto_pad=None, compute_dtype=None):
    kshape = K.q.shape if isinstance(K, QTensor) else K.shape
    strides = (1, 1) if strides is None else tuple(int(s) for s in strides)
    dilations = (1, 1) if dilations is None else tuple(int(d) for d in dilations)
    if auto_pad:
        pads = resolve_conv_pads(x.shape[2:], kshape[2:], strides, dilations,
                                 pads, auto_pad)
    pads = (0, 0, 0, 0) if pads is None else tuple(int(p) for p in pads)
    stackable = (
        _STACK_CONV and len(kshape) == 4 and tuple(kshape[2:]) == (3, 3)
        and kshape[0] <= 64 and int(group) == 1
        and strides == (1, 1) and dilations == (1, 1)
        and pads == (1, 1, 1, 1) and x.ndim == 4
        and x.shape[2] % 2 == 0 and x.shape[2] >= 4
        # the row-interleave transpose only amortizes on big GEMMs
        # (measured: +15% at batch>=32 on 56^2, -30% at batch<=8)
        and x.shape[0] * x.shape[2] * x.shape[3] >= 100_000
        # single-lane-tile W only: at W > 128 the interleave layout
        # pessimizes the surrounding program — YOLO-v3 b16 measured
        # 11.58 -> 9.05 ms with stacking off at its 208-416-wide layers
        # while the isolated stacked convs were neutral-to-better
        # (experiments/yolo_entry_probe.json, yolo_stack_ab.json); the
        # ResNet win was always measured at W = 56
        and x.shape[3] <= 128)
    if isinstance(K, QTensor):
        # pre-quantized input: int8 activations are by contract CODES at
        # K.act_scale (only ever produced by an annotated producer whose
        # out_scale matched this conv's calibrated scale)
        if (x.dtype == jnp.int8 and K.q.dtype == jnp.int8
                and K.act_scale is not None and x.ndim == 4
                and int(group) == 1):
            # C >= 128: take the s8 MXU path, no quantize pass
            if x.shape[1] >= 128:
                return _conv_w8a8(x, K, B, strides, dilations, pads,
                                  pre_quantized=True,
                                  compute_dtype=compute_dtype)
            # C < 128: the forced s8 path measured slower (lane-starved,
            # experiments/elide_ab r2) — DECODE the codes to the compute
            # dtype and fall through to the float/stacked paths; the int8
            # tensor still halved the producer->consumer HBM traffic and
            # the producer's quantize fused into its epilogue
            odt = jnp.dtype(compute_dtype) if compute_dtype \
                else jnp.float32
            x = x.astype(odt) * jnp.asarray(K.act_scale, odt)
        # W8A8: on layers with C_in >= 128 the s8 x s8 -> s32 MXU path is
        # 1.3-1.8x faster than bf16 (measured, experiments/RESULTS.md);
        # activations quantize per-tensor dynamically. C=64 layers measured
        # SLOWER (lane-bound + quant overhead) and keep bf16 + stacking.
        if ((K.act_dynamic or K.act_scale is not None)
                and K.q.dtype == jnp.int8 and x.ndim == 4
                and x.shape[1] >= 128 and int(group) == 1
                # quant/dequant overhead needs GEMM volume to amortize:
                # keep small-batch latency configs on the bf16 path
                and x.shape[0] * x.shape[2] * x.shape[3] >= 4096
                and jnp.issubdtype(x.dtype, jnp.floating)):
            return _conv_w8a8(x, K, B, strides, dilations, pads)
        # C<128 3x3: the STACKED formulation fills all 128 output lanes,
        # unlocking the s8 MXU even on lane-starved layers (probe_r2: 0.051
        # vs 0.059 ms stacked-bf16 at batch 32)
        if (stackable and (K.act_dynamic or K.act_scale is not None)
                and K.q.dtype == jnp.int8
                and jnp.issubdtype(x.dtype, jnp.floating)):
            return _stacked_conv3x3_q(x, K, B)
        # 1x1 stride-1 ungrouped conv IS a GEMM over (N*H*W, C) and CAN
        # route to the Pallas dequant+GEMM kernel — but measured on ResNet-50
        # (experiments/resnet50_bench.py) XLA's fused conv is 13% faster
        # (the pallas call breaks producer/consumer fusion and adds NHWC
        # flatten transposes), so the routing is opt-in
        if (_PALLAS_CONV1X1 and K.q.ndim == 4
                and K.q.shape[2] == K.q.shape[3] == 1
                and int(group) == 1
                and tuple(int(s) for s in (strides or (1, 1))) == (1, 1)
                and all(int(p) == 0 for p in (pads or (0, 0, 0, 0)))):
            from .pallas import gemm as _pgemm
            n, c, h, w = x.shape
            o = K.q.shape[0]
            xm = jnp.transpose(x, (0, 2, 3, 1)).reshape(-1, c)  # (NHW, C)
            kq = QTensor(K.q.reshape(o, c), K.scale.reshape(o, 1))
            y = _pgemm.dense_q(xm, kq, B)
            return jnp.transpose(y.reshape(n, h, w, o), (0, 3, 1, 2))
        K = K.dequant(x.dtype)
    pt, pl, pb, pr = pads
    prec = jnp.float32 if x.dtype != jnp.float64 else None
    if stackable:
        return _stacked_conv3x3(x, K, B, prec)
    out = lax.conv_general_dilated(
        x, K,
        window_strides=strides,
        padding=((pt, pb), (pl, pr)),
        rhs_dilation=dilations,
        dimension_numbers=_DIMNUMS,
        feature_group_count=int(group),
        preferred_element_type=jnp.float32 if x.dtype != jnp.float64 else None,
    ).astype(x.dtype)
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def conv_transpose2d(x, K, B=None, strides=(2, 2), dilations=(1, 1),
                     pads=(0, 0, 0, 0), output_padding=(0, 0), group=1):
    """ONNX ConvTranspose as an input-dilated conv (lhs_dilation = stride)
    with the IO-transposed, spatially-flipped kernel — one XLA conv, no
    explicit zero-stuffing buffer (cf. reference layer.py:28-34)."""
    strides = (2, 2) if strides is None else tuple(int(s) for s in strides)
    dilations = (1, 1) if dilations is None else tuple(int(d) for d in dilations)
    pads = (0, 0, 0, 0) if pads is None else tuple(int(p) for p in pads)
    output_padding = (0, 0) if output_padding is None else tuple(
        int(p) for p in output_padding)
    sh, sw = strides
    dh, dw = dilations
    pt, pl, pb, pr = pads
    oph, opw = output_padding
    g = int(group)
    if isinstance(K, QTensor):
        K = K.dequant(x.dtype)
    C = x.shape[1]
    _, Og, kh, kw = K.shape
    Kg = K.reshape(g, C // g, Og, kh, kw)
    Kt = Kg.transpose(0, 2, 1, 3, 4)[:, :, :, ::-1, ::-1]
    Kt = Kt.reshape(g * Og, C // g, kh, kw)
    out = lax.conv_general_dilated(
        x, Kt,
        window_strides=(1, 1),
        padding=((dh * (kh - 1) - pt, dh * (kh - 1) - pb + oph),
                 (dw * (kw - 1) - pl, dw * (kw - 1) - pr + opw)),
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMNUMS,
        feature_group_count=g,
        preferred_element_type=jnp.float32 if x.dtype != jnp.float64 else None,
    ).astype(x.dtype)
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def dense(x, K, B=None, shp=None):
    if isinstance(K, QTensor):
        from .pallas import gemm as _pgemm
        return _pgemm.dense_q(x, K, B)
    y = jnp.matmul(x, K.T, preferred_element_type=jnp.float32).astype(x.dtype)
    if B is not None:
        y = y + B.reshape(1, -1).astype(y.dtype)
    return y


def matmul(x, y):
    if isinstance(y, QTensor):
        y = y.dequant(x.dtype)
    if isinstance(x, QTensor):
        x = x.dequant(y.dtype)
    return jnp.matmul(x, y, preferred_element_type=jnp.float32).astype(x.dtype)


def _pool_dims(w, pads, strides):
    w = (2, 2) if w is None else tuple(int(v) for v in w)
    pads = (0, 0, 0, 0) if pads is None else tuple(int(p) for p in pads)
    strides = (2, 2) if strides is None else tuple(int(s) for s in strides)
    pt, pl, pb, pr = pads
    return w, ((0, 0), (0, 0), (pt, pb), (pl, pr)), strides


def _pairmax_1d(x, axis, k, p0, p1, fill):
    """Max-pool one spatial axis with stride 2 via pair-reshape: stride-2
    window selection lowers to strided gathers on TPU (reduce_window on the
    lane dim measured ~10x bandwidth-bound time, experiments/probe_r2) —
    splitting even/odd by a free row-major reshape + shifted maxes avoids
    every strided access.  Requires (size + p0 + p1 - k) even and >= 0."""
    size = x.shape[axis]
    out = (size + p0 + p1 - k) // 2 + 1
    # slice even/odd phases via reshape (free in row-major layout)
    lead = x.shape[:axis]
    tail = x.shape[axis + 1:]
    # align the first window start to input index -p0: work on index
    # j = 2*r - p0 + t for t in range(k)
    cols = []
    for t in range(k):
        start = t - p0                      # input index of tap t at r=0
        # gather x[start + 2*r] for r in [0, out): one parity slice
        s0 = start % 2
        base = (start - s0) // 2            # pair index offset (may be -1)
        pairs = size // 2
        ph = x.reshape(lead + (pairs, 2) + tail)
        ph = lax.index_in_dim(ph, s0, axis=axis + 1, keepdims=False)
        # ph: phase slice of length `pairs`; need ph[base : base + out]
        lo, hi = base, base + out
        padl, padr = max(-lo, 0), max(hi - pairs, 0)
        if padl or padr:
            cfg = [(0, 0, 0)] * ph.ndim
            cfg[axis] = (padl, padr, 0)
            ph = lax.pad(ph, jnp.asarray(fill, ph.dtype), cfg)
        ph = lax.slice_in_dim(ph, lo + padl, lo + padl + out, axis=axis)
        cols.append(ph)
    y = cols[0]
    for c in cols[1:]:
        y = jnp.maximum(y, c)
    return y


def maxpool(x, w=(2, 2), pads=(0, 0, 0, 0), strides=(2, 2), auto_pad=None,
            ceil_mode=0, impl=None):
    """MaxPool with two TPU lowerings, chosen per-layer by the IR optimizer
    (optimize.annotate_pool_impl):

      * default ``reduce_window`` — fuses into a producing conv's epilogue
        (measured: +0.14 ms after the ResNet stem vs +0.65 for the shift
        form, experiments/probe_r2);
      * ``impl="shift"`` — pair-reshape + shifted maxes, for pools whose
        input is NOT a fusable conv epilogue: stride-2 window selection in
        reduce_window lowers to strided lane gathers (measured 4-16x slower
        standalone: 1.05 ms vs 0.26 ms at 112^2 x64, batch 32).
    """
    w = (2, 2) if w is None else w
    (pt, pl, pb, pr), (eh, ew) = resolve_pool_pads(
        x.shape[2:], w, strides, pads, auto_pad, ceil_mode)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    kh, kw = (int(v) for v in w)
    sh, sw = (2, 2) if strides is None else (int(strides[0]), int(strides[1]))
    if (impl == "shift" and x.ndim == 4 and (sh, sw) == (2, 2)
            and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0
            and x.shape[2] + pt + pb + eh >= kh
            and x.shape[3] + pl + pr + ew >= kw):
        y = _pairmax_1d(x, 2, kh, pt, pb + eh, init)
        return _pairmax_1d(y, 3, kw, pl, pr + ew, init)
    (kh, kw), pad4, (sh, sw) = _pool_dims(
        w, (pt, pl, pb + eh, pr + ew), strides)
    return lax.reduce_window(x, init, lax.max, (1, 1, kh, kw), (1, 1, sh, sw),
                             pad4)


def averagepool(x, w=(2, 2), pads=(0, 0, 0, 0), strides=(2, 2),
                count_include_pad=1, auto_pad=None, ceil_mode=0):
    w = (2, 2) if w is None else w
    (pt, pl, pb, pr), (eh, ew) = resolve_pool_pads(
        x.shape[2:], w, strides, pads, auto_pad, ceil_mode)
    (kh, kw), pad4, (sh, sw) = _pool_dims(
        w, (pt, pl, pb + eh, pr + ew), strides)
    s = lax.reduce_window(x, jnp.array(0, x.dtype), lax.add,
                          (1, 1, kh, kw), (1, 1, sh, sw), pad4)
    if count_include_pad and (eh, ew) == (0, 0):
        return s / (kh * kw)
    # divisor counts window overlap with the (padded iff count_include_pad)
    # extent; ceil_mode's virtual extension never enters the divisor
    if count_include_pad:
        ones = jnp.ones((1, 1, x.shape[2] + pt + pb, x.shape[3] + pl + pr),
                        x.dtype)
        cpad = ((0, 0), (0, 0), (0, eh), (0, ew))
    else:
        ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
        cpad = pad4
    cnt = lax.reduce_window(ones, jnp.array(0, x.dtype), lax.add,
                            (1, 1, kh, kw), (1, 1, sh, sw), cpad)
    return s / cnt


def global_average_pool(x):
    return jnp.mean(x, axis=(-2, -1), keepdims=True)


# --------------------------------------------------------------------------
# recurrent
# --------------------------------------------------------------------------

def _seq_plan(L, d, sequence_lens):
    """Per-direction ragged-sequence plan (ONNX ``sequence_lens`` semantics:
    state frozen past each sequence's length, padded outputs zero, reverse
    direction reversed WITHIN each sequence's valid region).

    Returns ``(reorder, mask)``: ``reorder(xs)`` maps the padded batch into
    scan order (an involution gather for reverse — apply it again to restore
    output order), ``mask`` is the (L, N) validity of each scan step.
    Reference accepts-and-ignores this input (planer/layer.py:36-42); here
    it is honored."""
    if sequence_lens is None:
        if d == 1:
            return (lambda a: a), None
        return (lambda a: a[::-1]), None
    lens = jnp.asarray(sequence_lens, jnp.int32).reshape(-1)   # (N,)
    steps = jnp.arange(L, dtype=jnp.int32)
    mask = steps[:, None] < lens[None, :]                       # (L, N)
    if d == 1:
        return (lambda a: a), mask
    idx = jnp.clip(lens[None, :] - 1 - steps[:, None], 0)       # (L, N)

    def reorder(a):
        return jnp.take_along_axis(a, idx[:, :, None], axis=0)
    return reorder, mask


def lstm(X, W, R, B=None, sequence_lens=None, initial_h=None, initial_c=None,
         hidden_size=None, direction="forward"):
    """ONNX LSTM via lax.scan over a fused cell (iofc gate order).

    The per-timestep GEMMs (X@W^T precomputed for the whole sequence; h@R^T
    in the scan body) hit the MXU; the reference loops timesteps in Python
    (util.py:102-119).  ``sequence_lens`` is honored via a mask in the scan
    (the reference ignores it, planer/layer.py:36-42)."""
    dirs = {"forward": [1], "reverse": [-1], "bidirectional": [1, -1]}[direction]
    L, N, D = X.shape
    H = R.shape[-1]

    def run_dir(di, d):
        w, r = W[di], R[di]
        b = (B[di][: 4 * H] + B[di][4 * H:]) if B is not None else 0.0
        h0 = initial_h[di] if initial_h is not None else jnp.zeros((N, H), X.dtype)
        c0 = initial_c[di] if initial_c is not None else jnp.zeros((N, H), X.dtype)
        # hoist the input projection out of the scan: one big MXU matmul
        xw = jnp.einsum("lnd,gd->lng", X, w,
                        preferred_element_type=jnp.float32).astype(X.dtype)
        reorder, mask = _seq_plan(L, d, sequence_lens)
        xs = reorder(xw)

        def cell(carry, step):
            ht, ct = carry
            xt, m = step
            gates = xt + jnp.matmul(ht, r.T,
                                    preferred_element_type=jnp.float32
                                    ).astype(X.dtype) + b
            i, o, f, c = jnp.split(gates, 4, axis=-1)
            i, o, f = jax.nn.sigmoid(i), jax.nn.sigmoid(o), jax.nn.sigmoid(f)
            c = jnp.tanh(c)
            cn = f * ct + i * c
            hn = o * jnp.tanh(cn)
            if m is not None:      # freeze state past each sequence's length
                hn = jnp.where(m[:, None], hn, ht)
                cn = jnp.where(m[:, None], cn, ct)
            return (hn, cn), hn

        (hT, cT), ys = lax.scan(cell, (h0, c0), (xs, mask))
        ys = reorder(ys)
        if mask is not None:       # padded steps emit zeros (ONNX semantics)
            _, valid = _seq_plan(L, 1, sequence_lens)
            ys = jnp.where(valid[:, :, None], ys, jnp.zeros((), ys.dtype))
        return ys, hT, cT

    outs = [run_dir(di, d) for di, d in enumerate(dirs)]
    Y = jnp.stack([o[0] for o in outs], axis=1)  # (L, dirs, N, H)
    Yh = jnp.stack([o[1] for o in outs], axis=0)
    Yc = jnp.stack([o[2] for o in outs], axis=0)
    return Y, Yh, Yc


# --------------------------------------------------------------------------
# activations / elementwise
# --------------------------------------------------------------------------

def relu(x):
    return jnp.maximum(x, 0)


def leakyrelu(x, alpha=0.2):
    return jnp.where(x > 0, x, x * jnp.asarray(alpha, x.dtype))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def hardsigmoid(x, alpha=0.2, beta=0.5):
    return jnp.clip(x * alpha + beta, 0, 1).astype(x.dtype)


def tanh(x):
    return jnp.tanh(x)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


def logsoftmax(x, axis=-1):
    return jax.nn.log_softmax(x, axis=axis)


def clip(x, min_t=None, max_t=None, min=None, max=None):
    lo = min if min is not None else min_t
    hi = max if max is not None else max_t
    if lo is None and hi is None:  # legal ONNX Clip — identity
        return x
    return jnp.clip(x, lo, hi)


def erf(x):
    if _modes.get_erf_mode() == "lut":
        idx = _modes.lut_index_f(x.astype(jnp.float32)).astype(jnp.int16)
        return jnp.asarray(_modes.ERF_LUT, x.dtype)[idx]
    return lax.erf(x)


def sqrt(x):
    return jnp.sqrt(x)


def exp(x):
    return jnp.exp(x)


def log(x):
    return jnp.log(x)


def reciprocal(x):
    return 1.0 / x


def power(x, p):
    return jnp.power(x, p)


def add(a, b, qadd=None, compute_dtype=None):
    """Elementwise add, optionally in the quantized-activation domain.

    ``qadd = (sa, sb, so)`` (optimize.annotate_output_quant, the residual
    extension): operands whose scale is non-None arrive as int8 activation
    CODES at that scale (their producers were annotated to emit codes);
    ``so`` non-None re-emits the sum as codes at that scale for
    pre-quantized consumer convs.  This turns a ResNet block boundary
    (bf16 add + relu + consumer quantize pass) into one int8-in/int8-out
    fused elementwise pass — the bf16 activation round-trip disappears.
    The numpy oracle ignores ``qadd`` and stays fp32 end to end: the elided
    quantization is part of the quantized program's accuracy budget (same
    policy as conv2d's ``out_scale``).

    Dtype gate (ADVICE r4): an operand is treated as codes only when its
    RUNTIME dtype is int8, mirroring conv2d's pre-quantized gate — the
    stage64 fallback contract is "every fallback path ignores out_scale
    and emits float", so an annotation whose producer fell back must
    degrade to a plain float operand here, not be mis-scaled as codes."""
    if qadd is None:
        return a + b
    sa, sb, so = qadd
    sa = sa if (sa is not None and a.dtype == jnp.int8) else None
    sb = sb if (sb is not None and b.dtype == jnp.int8) else None
    if so is not None:
        # scale ratios fold host-side; a same-scale residual (the common
        # ResNet case) contributes its codes exactly (ratio == 1.0)
        def term(x, s):
            r = (1.0 / so) if s is None else (s / so)
            x = x.astype(jnp.float32)
            return x if r == 1.0 else x * jnp.float32(r)
        v = term(a, sa) + term(b, sb)
        return jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)
    # float output (decode-add): codes operands dequant into the sum
    af = a.astype(jnp.float32) if sa is None \
        else a.astype(jnp.float32) * jnp.float32(sa)
    bf = b.astype(jnp.float32) if sb is None \
        else b.astype(jnp.float32) * jnp.float32(sb)
    v = af + bf
    # out dtype: the non-code operand's, else the program compute dtype
    for x, s in ((a, sa), (b, sb)):
        if s is None:
            return v.astype(x.dtype)
    return v.astype(jnp.dtype(compute_dtype) if compute_dtype
                    else jnp.float32)


def sub(a, b):
    return a - b


def mul(a, b):
    return a * b


def div(a, b):
    return a / b


def equal(a, b):
    return jnp.equal(a, b)


def greater(a, b):
    return jnp.greater(a, b)


def greater_or_equal(a, b):
    return jnp.greater_equal(a, b)


def where(mask, a, b):
    return jnp.where(mask, a, b)


def identity(x):
    return x


# --------------------------------------------------------------------------
# normalization
# --------------------------------------------------------------------------

def batchnorm(x, K, B):
    return x * K + B


def instance_normalization(x, s, bias, epsilon=1e-5):
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    shp = (1, -1) + (1,) * (x.ndim - 2)
    inv = lax.rsqrt(var + epsilon)
    return (x - mean) * inv * s.reshape(shp) + bias.reshape(shp)


# --------------------------------------------------------------------------
# shape / index / tensor ops (shape operands are trace-time numpy)
# --------------------------------------------------------------------------

def reshape(x, shp):
    shp = np.asarray(shp).astype(np.int64).tolist()
    for i, v in enumerate(shp):
        if v == 0:
            shp[i] = x.shape[i]
    return jnp.reshape(x, shp)


def flatten(x, axis=1):
    lead = int(np.prod(x.shape[:axis], dtype=np.int64)) if axis else 1
    return jnp.reshape(x, (lead, -1))


def transpose(x, axis=None):
    return jnp.transpose(x, axis)


def concat(*xs, axis=0):
    dt = jnp.result_type(*[x.dtype for x in xs])
    return jnp.concatenate([x.astype(dt) for x in xs], axis=axis)


def split(x, split=None, axis=0):
    segs = np.cumsum(np.asarray(split)).tolist()
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, segs[-1])
    return tuple(jnp.split(x[tuple(idx)], segs[:-1], axis))


def gather(x, idx, axis=0):
    if isinstance(idx, np.ndarray) or np.isscalar(idx):
        idx = np.asarray(idx).astype(np.int64)
    return jnp.take(x, idx, axis=axis)


def slice_(x, starts, ends, axes=None, steps=None):
    starts = np.asarray(starts).astype(np.int64).tolist()
    ends = np.asarray(ends).astype(np.int64).tolist()
    axes = (list(range(len(starts))) if axes is None
            else np.asarray(axes).astype(np.int64).tolist())
    steps = ([1] * len(starts) if steps is None
             else np.asarray(steps).astype(np.int64).tolist())
    sl = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        sl[a] = slice(s, e, st)
    return x[tuple(sl)]


def expand(x, shp):
    shp = tuple(np.asarray(shp).astype(np.int64).tolist())
    out_shape = np.broadcast_shapes(x.shape, shp)
    return jnp.broadcast_to(x, out_shape)


def tile(x, repeats):
    return jnp.tile(x, np.asarray(repeats).astype(np.int64).tolist())


def pad(x, pads, constant_value=0.0, mode="constant"):
    p = np.asarray(pads).astype(np.int64).reshape(2, -1).T.tolist()
    if mode == "constant":
        return jnp.pad(x, p, mode="constant", constant_values=constant_value)
    return jnp.pad(x, p, mode={"reflect": "reflect", "edge": "edge"}[mode])


def squeeze(x, axes=None):
    if axes is None:
        return jnp.squeeze(x)
    axes = [int(a) for a in np.atleast_1d(np.asarray(axes))]
    return jnp.squeeze(x, axis=tuple(axes))


def unsqueeze(x, axes=None):
    axes = [int(a) for a in np.atleast_1d(np.asarray(axes))]
    return jnp.expand_dims(x, tuple(axes))


def shape_of(x):
    # handled specially by the tracer (always static); kept for completeness
    return np.asarray(x.shape, dtype=np.int64)


def cast(x, dtype="float32"):
    if dtype == "flaot32":
        dtype = "float32"
    return jnp.asarray(x).astype(dtype)


def const(value=0, dtype="float32"):
    return np.asarray(value, dtype=dtype)


def constant_of_shape(x, value=0, dtype="float32"):
    shp = tuple(np.asarray(x).astype(np.int64).ravel().tolist())
    return jnp.full(shp, value, dtype=dtype)


def arange(start, end, delta):
    return np.arange(int(np.asarray(start)), int(np.asarray(end)),
                     int(np.asarray(delta)))


def scatternd(data, indices, updates):
    data = jnp.asarray(data)
    r = indices.shape[-1]
    idx = jnp.reshape(indices, (-1, r)).astype(jnp.int32)
    upd = jnp.reshape(updates, (-1,) + data.shape[r:])
    return data.at[tuple(idx[:, i] for i in range(r))].set(upd)


def nonzero(x):  # data-dependent output shape — host-tail only
    raise NotImplementedError("nonzero is data-dependent; runs on host tail")


def topk(x, k, axis=-1, largest=1, sorted=1):
    k = int(np.asarray(k).ravel()[0])
    axis = axis % x.ndim
    moved = jnp.moveaxis(x, axis, -1)
    if largest:
        vals, idx = lax.top_k(moved, k)
    else:
        vals, idx = lax.top_k(-moved, k)
        vals = -vals
    return (jnp.moveaxis(vals, -1, axis),
            jnp.moveaxis(idx.astype(jnp.int64), -1, axis))


# --------------------------------------------------------------------------
# reductions
# --------------------------------------------------------------------------

def _norm_axes(axes, ndim):
    if axes is None:
        return tuple(range(ndim))
    return tuple(int(a) for a in np.atleast_1d(np.asarray(axes)))


def reduce_sum(x, axes=None, keepdims=1):
    return jnp.sum(x, axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


def reduce_mean(x, axes=None, keepdims=1):
    return jnp.mean(x, axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


def reduce_max(x, axes=None, keepdims=1):
    return jnp.max(x, axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


def reduce_min(x, axes=None, keepdims=1):
    return jnp.min(x, axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


# --------------------------------------------------------------------------
# resize / upsample
# --------------------------------------------------------------------------

def _is_repeat(idx: np.ndarray, in_size: int) -> int:
    """If idx == repeat(arange(in_size), k) return k else 0 (fast-path)."""
    if idx.size % max(in_size, 1):
        return 0
    k = idx.size // in_size
    if k and np.array_equal(idx, np.repeat(np.arange(in_size), k)):
        return k
    return 0


def _resize_nchw(x, out_hw, scales, mode, coord_mode, nearest_mode):
    h, w = x.shape[-2:]
    oh, ow = out_hw
    kh, kw = scales
    if mode == "nearest":
        ri = _rs.nearest_plan(h, oh, kh, coord_mode, nearest_mode)
        ci = _rs.nearest_plan(w, ow, kw, coord_mode, nearest_mode)
        rk, ck = _is_repeat(ri, h), _is_repeat(ci, w)
        if rk and ck:  # integer-factor stamping: broadcast, no gather
            n, c = x.shape[:2]
            y = x[:, :, :, None, :, None]
            y = jnp.broadcast_to(y, (n, c, h, rk, w, ck))
            return y.reshape(n, c, oh, ow)
        return x[..., ri[:, None], ci[None, :]]
    if mode in ("linear", "bilinear"):
        rlo, rhi, rf = _rs.linear_plan(h, oh, kh, coord_mode)
        clo, chi, cf = _rs.linear_plan(w, ow, kw, coord_mode)
        rf = jnp.asarray(rf.reshape(-1, 1), x.dtype)
        cf = jnp.asarray(cf, x.dtype)
        rows = x[..., rlo, :] * (1 - rf) + x[..., rhi, :] * rf
        return rows[..., clo] * (1 - cf) + rows[..., chi] * cf
    raise ValueError(f"unsupported resize mode {mode!r}")


def upsample(x, k, mode="nearest", size=None):
    k = np.asarray(k, dtype=np.float64).ravel()
    if k.size == 0:  # empty scales: explicit size (reference crashes here)
        if size is None or np.size(size) == 0:
            raise ValueError("Upsample with empty scales needs a size")
        ss = np.asarray(size).astype(np.int64).ravel()
        out_hw, sc = _rs.resize_shape(x.shape[-2:],
                                      sizes=(int(ss[-2]), int(ss[-1])))
        return _resize_nchw(x, out_hw, sc, mode, "asymmetric", "floor")
    kh, kw = float(k[-2]), float(k[-1])
    (oh, ow), sc = _rs.resize_shape(x.shape[-2:], scales=(kh, kw))
    return _resize_nchw(x, (oh, ow), sc, mode, "asymmetric", "floor")


def resize_op(x, roi=None, k=None, size=None, mode="nearest",
              coordinate_transformation_mode="half_pixel",
              nearest_mode="round_prefer_floor"):
    scales = None
    if k is not None and np.size(k) > 0:
        kk = np.asarray(k, dtype=np.float64).ravel()
        scales = (float(kk[-2]), float(kk[-1]))
    sizes = None
    if size is not None and np.size(size) > 0:
        ss = np.asarray(size).astype(np.int64).ravel()
        sizes = (int(ss[-2]), int(ss[-1]))
    out_hw, sc = _rs.resize_shape(x.shape[-2:], scales=scales, sizes=sizes)
    return _resize_nchw(x, out_hw, sc, mode, coordinate_transformation_mode,
                        nearest_mode)


def return_(*xs):
    return xs


# --------------------------------------------------------------------------
# extended op set (beyond the reference's layer_map — modern ONNX exporters)
# --------------------------------------------------------------------------

def absolute(x):
    return jnp.abs(x)


def negative(x):
    return -x


def minimum(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.minimum(out, x)
    return out


def maximum(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.maximum(out, x)
    return out


def floor(x):
    return jnp.floor(x)


def ceil(x):
    return jnp.ceil(x)


def round_(x):
    return jnp.rint(x)


def sign(x):
    return jnp.sign(x)


def prelu(x, slope):
    if hasattr(slope, "ndim") and slope.ndim == 1 and x.ndim == 4:
        slope = slope.reshape(1, -1, 1, 1)
    return jnp.where(x > 0, x, x * slope)


def elu(x, alpha=1.0):
    return jax.nn.elu(x, alpha=alpha)


def softplus(x):
    return jax.nn.softplus(x)


def gelu(x, approximate="none"):
    return jax.nn.gelu(x, approximate=(approximate == "tanh"))


def _arg_reduce(x, axis, keepdims, select_last_index, fn):
    if select_last_index:
        n = x.shape[axis]
        out = (n - 1 - fn(jnp.flip(x, axis=axis), axis=axis)).astype(jnp.int64)
    else:
        out = fn(x, axis=axis).astype(jnp.int64)
    if keepdims:
        out = jnp.expand_dims(out, axis)
    return out


def argmax(x, axis=0, keepdims=1, select_last_index=0):
    return _arg_reduce(x, axis, keepdims, select_last_index, jnp.argmax)


def argmin(x, axis=0, keepdims=1, select_last_index=0):
    return _arg_reduce(x, axis, keepdims, select_last_index, jnp.argmin)


def reduce_prod(x, axes=None, keepdims=1):
    return jnp.prod(x, axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


def global_max_pool(x):
    return jnp.max(x, axis=(-2, -1), keepdims=True)


def space_to_depth(x, blocksize=2):
    n, c, h, w = x.shape
    b = int(blocksize)
    x = x.reshape(n, c, h // b, b, w // b, b)
    return x.transpose(0, 3, 5, 1, 2, 4).reshape(n, c * b * b, h // b, w // b)


def depth_to_space(x, blocksize=2, mode="DCR"):
    n, c, h, w = x.shape
    b = int(blocksize)
    if mode == "DCR":
        x = x.reshape(n, b, b, c // (b * b), h, w)
        x = x.transpose(0, 3, 4, 1, 5, 2)
    else:  # CRD
        x = x.reshape(n, c // (b * b), b, b, h, w)
        x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, c // (b * b), h * b, w * b)


def mean_variadic(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out / len(xs)


def sum_variadic(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out


def gru(X, W, R, B=None, sequence_lens=None, initial_h=None,
        hidden_size=None, direction="forward", linear_before_reset=0):
    """ONNX GRU via lax.scan (zrh gate order); input projections hoisted to
    one MXU matmul over the whole sequence.  ``sequence_lens`` honored via a
    scan mask (see :func:`_seq_plan`)."""
    dirs = {"forward": [1], "reverse": [-1], "bidirectional": [1, -1]}[direction]
    L, N, D = X.shape
    H = R.shape[-1]

    def run_dir(di, d):
        w, r = W[di], R[di]
        wb = B[di][:3 * H] if B is not None else jnp.zeros(3 * H, X.dtype)
        rb = B[di][3 * H:] if B is not None else jnp.zeros(3 * H, X.dtype)
        h0 = initial_h[di] if initial_h is not None else jnp.zeros((N, H), X.dtype)
        xw = (jnp.einsum("lnd,gd->lng", X, w,
                         preferred_element_type=jnp.float32).astype(X.dtype)
              + wb)
        reorder, mask = _seq_plan(L, d, sequence_lens)
        xs = reorder(xw)
        rz, rr, rh = jnp.split(r, 3)
        rbz, rbr, rbh = jnp.split(rb, 3)

        def cell(ht, step):
            xt, m = step
            xz, xr, xh = jnp.split(xt, 3, axis=-1)
            z = jax.nn.sigmoid(xz + jnp.matmul(
                ht, rz.T, preferred_element_type=jnp.float32
            ).astype(X.dtype) + rbz)
            rg = jax.nn.sigmoid(xr + jnp.matmul(
                ht, rr.T, preferred_element_type=jnp.float32
            ).astype(X.dtype) + rbr)
            if linear_before_reset:
                h = jnp.tanh(xh + rg * (jnp.matmul(
                    ht, rh.T, preferred_element_type=jnp.float32
                ).astype(X.dtype) + rbh))
            else:
                h = jnp.tanh(xh + jnp.matmul(
                    rg * ht, rh.T, preferred_element_type=jnp.float32
                ).astype(X.dtype) + rbh)
            hn = (1 - z) * h + z * ht
            if m is not None:
                hn = jnp.where(m[:, None], hn, ht)
            return hn, hn

        hT, ys = lax.scan(cell, h0, (xs, mask))
        ys = reorder(ys)
        if mask is not None:
            _, valid = _seq_plan(L, 1, sequence_lens)
            ys = jnp.where(valid[:, :, None], ys, jnp.zeros((), ys.dtype))
        return ys, hT

    outs = [run_dir(di, d) for di, d in enumerate(dirs)]
    Y = jnp.stack([o[0] for o in outs], axis=1)
    Yh = jnp.stack([o[1] for o in outs], axis=0)
    return Y, Yh


def stage64(x, Ws, Bs, *bw, blocks=None, out_scale=None,
            force_decomposed=False, interpret=None):
    """Fused ResNet entry stage (stem + maxpool + C=64 basic blocks) — the
    hot 88% of the ResNet-18 step (experiments/prefix_profile_b64.json).
    Routes to the Pallas kernel chain on TPU with int8 weights + calibrated
    activation scales; decomposes to the exact replaced op chain elsewhere
    (see ops/pallas/stage64.py).  ``out_scale`` makes the fused kernel emit
    int8 codes for pre-quantized consumer convs (conv2d's s8 fast path);
    ``force_decomposed`` (injected by parallel.sharding via
    TracedProgram.op_overrides) keeps the op out of Pallas under GSPMD,
    which cannot partition a pallas_call."""
    from .pallas import stage64 as _st
    return _st.stage64(x, Ws, Bs, *bw, blocks=blocks, out_scale=out_scale,
                       force_decomposed=force_decomposed, interpret=interpret)


def stagen(x, *w, blocks=None, force_decomposed=False):
    """Fused ResNet body stage (basic/bottleneck residual blocks) — the
    TPU-native replacement for the reference's per-conv im2col+BLAS path
    (/root/reference/planer/util.py:17-44) over whole stages.  Routes to
    the Pallas whole-stage kernel on TPU with int8 weights + calibrated
    activation scales; decomposes to the exact replaced op chain elsewhere
    (see ops/pallas/stagen.py).  ``force_decomposed`` (injected by
    parallel.sharding via TracedProgram.op_overrides) keeps the op out of
    Pallas under GSPMD."""
    from .pallas import stagen as _st
    return _st.stagen(x, *w, blocks=blocks, force_decomposed=force_decomposed)
