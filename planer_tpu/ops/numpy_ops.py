"""NumPy oracle op library.

Every IR opcode (reference layer_map, /root/reference/planer/layer.py:262-281)
has a clean vectorized numpy implementation here.  This module is the
framework's correctness oracle: the jitted XLA path (:mod:`.jax_ops`) is
parity-tested against it, and it doubles as the host-side executor for the
data-dependent graph tail (NonZero/TopK postprocessing, see runtime.tracer).

Implementations follow ONNX semantics (the reference's occasional deviations —
``-1e4`` maxpool seed, 0-padding participating in max, LUT erf — are fixed to
the spec; see docstrings).  Signatures follow the IR contract: positional
tensor inputs (possibly None for optional), IR kwargs as keyword arguments.
"""
from __future__ import annotations

import math

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from . import resize as _rs
from . import modes as _modes
from .padding import resolve_conv_pads, resolve_pool_pads

# --------------------------------------------------------------------------
# conv / pool / matmul
# --------------------------------------------------------------------------

def conv2d(x, K, B=None, group=1, strides=(1, 1), dilations=(1, 1),
           pads=(0, 0, 0, 0), auto_pad=None, out_scale=None):
    """2-D convolution, NCHW x OIHW.

    ``pads`` uses the ONNX layout (h_begin, w_begin, h_end, w_end) — the same
    contract the reference converter emits (io.py:97) and its kernels consume
    (util.py:23).  ``auto_pad`` (SAME_UPPER/SAME_LOWER) resolves to explicit
    pads from the input shape (the reference ignores the attribute,
    io.py:92-116).  ``out_scale`` (optimize.annotate_output_quant, the jax
    path's int8 activation-code emission) is ignored: the oracle emits fp32,
    and the elided quantization is part of the quantized program's accuracy
    budget, not the oracle's.
    """
    if strides is None:
        strides = (1, 1)
    if dilations is None:
        dilations = (1, 1)
    sh, sw = int(strides[0]), int(strides[1])
    dh, dw = int(dilations[0]), int(dilations[1])
    pt, pl, pb, pr = resolve_conv_pads(x.shape[2:], K.shape[2:], strides,
                                       dilations, pads, auto_pad)
    N, C, H, W = x.shape
    O, Cg, kh, kw = K.shape
    g = int(group)
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    dkh, dkw = (kh - 1) * dh + 1, (kw - 1) * dw + 1
    v = sliding_window_view(xp, (dkh, dkw), axis=(2, 3))
    v = v[:, :, ::sh, ::sw, ::dh, ::dw]  # (N, C, Ho, Wo, kh, kw)
    Ho, Wo = v.shape[2], v.shape[3]
    v = v.reshape(N, g, C // g, Ho, Wo, kh, kw)
    Kk = K.reshape(g, O // g, Cg, kh, kw)
    out = np.einsum("ngchwij,gocij->ngohw", v, Kk, optimize=True)
    out = out.reshape(N, O, Ho, Wo).astype(x.dtype, copy=False)
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1)
    return out


def conv_transpose2d(x, K, B=None, strides=(2, 2), dilations=(1, 1),
                     pads=(0, 0, 0, 0), output_padding=(0, 0), group=1):
    """ONNX ConvTranspose: zero-stuff by stride, then stride-1 conv with the
    spatially-flipped, IO-transposed kernel (K is (C, O//g, kh, kw))."""
    if strides is None:
        strides = (2, 2)
    if dilations is None:
        dilations = (1, 1)
    if pads is None:
        pads = (0, 0, 0, 0)
    if output_padding is None:
        output_padding = (0, 0)
    sh, sw = int(strides[0]), int(strides[1])
    dh, dw = int(dilations[0]), int(dilations[1])
    pt, pl, pb, pr = (int(p) for p in pads)
    oph, opw = int(output_padding[0]), int(output_padding[1])
    N, C, H, W = x.shape
    g = int(group)
    _, Og, kh, kw = K.shape
    # insert (stride-1) zeros between input pixels
    up = np.zeros((N, C, (H - 1) * sh + 1, (W - 1) * sw + 1), dtype=x.dtype)
    up[:, :, ::sh, ::sw] = x
    # equivalent stride-1 conv padding
    ph0, ph1 = dh * (kh - 1) - pt, dh * (kh - 1) - pb + oph
    pw0, pw1 = dw * (kw - 1) - pl, dw * (kw - 1) - pr + opw
    # flipped kernel, grouped IO transpose: (C, O//g, kh, kw) -> (O, C//g, kh, kw)
    Kg = K.reshape(g, C // g, Og, kh, kw)
    Kt = Kg.transpose(0, 2, 1, 3, 4)[:, :, :, ::-1, ::-1]
    Kt = Kt.reshape(g * Og, C // g, kh, kw)
    return conv2d(up, np.ascontiguousarray(Kt), B, group=g, strides=(1, 1),
                  dilations=(dh, dw), pads=(ph0, pw0, ph1, pw1))


def dense(x, K, B=None, shp=None):
    """Gemm: y = x @ K.T + B (K stored transposed by the converter,
    reference io.py:110-111)."""
    y = np.matmul(x, K.T)
    if B is not None:
        y = y + B.reshape(1, -1)
    return y


def matmul(x, y):
    return np.matmul(x, y)


def _pool2d(x, w, pads, strides, reducer, pad_value, extra=(0, 0)):
    if w is None:
        w = (2, 2)
    if pads is None:
        pads = (0, 0, 0, 0)
    if strides is None:
        strides = (2, 2)
    kh, kw = int(w[0]), int(w[1])
    sh, sw = int(strides[0]), int(strides[1])
    pt, pl, pb, pr = (int(p) for p in pads)
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb + extra[0]), (pl, pr + extra[1])),
                constant_values=pad_value)
    v = sliding_window_view(xp, (kh, kw), axis=(2, 3))
    v = v[:, :, ::sh, ::sw]
    return reducer(v, axis=(-2, -1))


def maxpool(x, w=(2, 2), pads=(0, 0, 0, 0), strides=(2, 2), auto_pad=None,
            ceil_mode=0, impl=None):
    """MaxPool with -inf padding (ONNX spec; the reference seeds -1e4 and lets
    0-padding participate, util.py:87-95 — a latent bug we do not reproduce).

    ``ceil_mode=1`` extends the bottom/right virtual padding so the output
    size rounds up (last window clamped to start within input+pads).
    ``impl`` is a lowering hint for the jax path; numerics are identical."""
    del impl
    w = (2, 2) if w is None else w
    pads, extra = resolve_pool_pads(x.shape[2:], w, strides, pads, auto_pad,
                                    ceil_mode)
    if np.issubdtype(x.dtype, np.floating):
        fill = -np.inf
    else:
        fill = np.iinfo(x.dtype).min
    return _pool2d(x, w, pads, strides, np.max, fill,
                   extra).astype(x.dtype, copy=False)


def averagepool(x, w=(2, 2), pads=(0, 0, 0, 0), strides=(2, 2),
                count_include_pad=1, auto_pad=None, ceil_mode=0):
    """AveragePool.  ``count_include_pad`` defaults to 1 for wire-parity with
    the reference (util.py:97-100 divides by kernel size unconditionally).
    ceil_mode's virtual extension never enters the divisor (ORT semantics)."""
    w = (2, 2) if w is None else w
    pads, extra = resolve_pool_pads(x.shape[2:], w, strides, pads, auto_pad,
                                    ceil_mode)
    out = _pool2d(x, w, pads, strides, np.sum, 0.0, extra)
    if count_include_pad and extra == (0, 0):
        kh, kw = int(w[0]), int(w[1])
        return (out / (kh * kw)).astype(x.dtype, copy=False)
    # divisor = window overlap with (padded iff count_include_pad) extent
    ext = x.shape[2:] if not count_include_pad else \
        (x.shape[2] + pads[0] + pads[2], x.shape[3] + pads[1] + pads[3])
    ones = np.ones((1, 1) + tuple(ext), dtype=np.float32)
    cpads = pads if not count_include_pad else (0, 0, 0, 0)
    cnt = _pool2d(ones, w, cpads, strides, np.sum, 0.0, extra)
    return (out / cnt).astype(x.dtype, copy=False)


def global_average_pool(x):
    return x.mean(axis=(-2, -1), keepdims=True)


# --------------------------------------------------------------------------
# recurrent
# --------------------------------------------------------------------------

def _seq_steps(L, N, d, sequence_lens):
    """Ragged-sequence iteration plan (ONNX ``sequence_lens``): yields
    (emit_t, read_t, valid) per scan step — ``read_t``/``emit_t`` are (N,)
    per-sequence time indices (reverse runs WITHIN each valid region),
    ``valid`` the (N,) bool mask of live sequences.  Mirrors jax_ops._seq_plan
    exactly (CLAUDE.md lockstep invariant)."""
    if sequence_lens is None:
        order = range(L) if d == 1 else range(L - 1, -1, -1)
        for t in order:
            ts = np.full(N, t)
            yield ts, ts, np.ones(N, bool)
        return
    lens = np.asarray(sequence_lens, np.int64).reshape(-1)
    for s in range(L):
        valid = s < lens
        t = np.full(N, s) if d == 1 else np.clip(lens - 1 - s, 0, None)
        yield t, t, valid


def lstm(X, W, R, B=None, sequence_lens=None, initial_h=None, initial_c=None,
         hidden_size=None, direction="forward"):
    """ONNX LSTM (iofc gate order).  X: (L, N, D); W: (dirs, 4H, D);
    R: (dirs, 4H, H); B: (dirs, 8H).  Returns (Y, Y_h, Y_c) with
    Y: (L, dirs, N, H).  ``sequence_lens`` honored (state frozen past each
    length, padded outputs zero; the reference ignores it, layer.py:36-42)."""
    dirs = {"forward": [1], "reverse": [-1], "bidirectional": [1, -1]}[direction]
    L, N, D = X.shape
    H = R.shape[-1]
    nd = len(dirs)
    Y = np.zeros((L, nd, N, H), dtype=X.dtype)
    Yh = np.zeros((nd, N, H), dtype=X.dtype)
    Yc = np.zeros((nd, N, H), dtype=X.dtype)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    rows = np.arange(N)
    for di, d in enumerate(dirs):
        w, r = W[di], R[di]
        b = (B[di][: 4 * H] + B[di][4 * H:]) if B is not None else 0.0
        ht = initial_h[di] if initial_h is not None else np.zeros((N, H), X.dtype)
        ct = initial_c[di] if initial_c is not None else np.zeros((N, H), X.dtype)
        for emit_t, read_t, valid in _seq_steps(L, N, d, sequence_lens):
            xt = X[read_t, rows]
            gates = xt @ w.T + ht @ r.T + b
            i, o, f, c = np.split(gates, 4, axis=-1)
            i, o, f, c = sigmoid(i), sigmoid(o), sigmoid(f), np.tanh(c)
            cn = f * ct + i * c
            hn = o * np.tanh(cn)
            ht = np.where(valid[:, None], hn, ht)
            ct = np.where(valid[:, None], cn, ct)
            Y[emit_t[valid], di, rows[valid]] = ht[valid]
        Yh[di], Yc[di] = ht, ct
    return Y, Yh, Yc


# --------------------------------------------------------------------------
# activations / elementwise
# --------------------------------------------------------------------------

def relu(x):
    return np.maximum(x, 0)


def leakyrelu(x, alpha=0.2):
    return np.where(x > 0, x, x * np.asarray(alpha, dtype=x.dtype))


def sigmoid(x):
    return (1.0 / (1.0 + np.exp(-x.astype(np.float32)))).astype(x.dtype)


def hardsigmoid(x, alpha=0.2, beta=0.5):
    return np.clip(x * alpha + beta, 0, 1).astype(x.dtype)


def tanh(x):
    return np.tanh(x)


def softmax(x, axis=-1):
    y = x - np.max(x, axis=axis, keepdims=True)
    ey = np.exp(y)
    return ey / np.sum(ey, axis=axis, keepdims=True)


def logsoftmax(x, axis=-1):
    y = x - np.max(x, axis=axis, keepdims=True)
    return y - np.log(np.sum(np.exp(y), axis=axis, keepdims=True))


def clip(x, min_t=None, max_t=None, min=None, max=None):
    lo = min if min is not None else min_t
    hi = max if max is not None else max_t
    if lo is None and hi is None:  # legal ONNX Clip — identity
        return x
    return np.clip(x, lo, hi)


_erf = np.vectorize(math.erf, otypes=[np.float64])


def erf(x):
    """Exact erf by default; ``modes.set_erf_mode('lut')`` reproduces the
    reference's 1025-entry LUT over [-2,2] bit-for-bit (layer.py:253-258)."""
    if _modes.get_erf_mode() == "lut":
        idx = _modes.lut_index_f(np.asarray(x, np.float32)).astype(np.int16)
        dt = x.dtype if hasattr(x, "dtype") else np.float32
        return _modes.ERF_LUT.astype(dt)[idx]
    return _erf(x).astype(x.dtype if hasattr(x, "dtype") else np.float32)


def sqrt(x):
    return np.sqrt(x)


def exp(x):
    return np.exp(x)


def log(x):
    return np.log(x)


def reciprocal(x):
    return 1.0 / x


def power(x, p):
    return np.power(x, p)


def add(a, b, qadd=None, compute_dtype=None):
    """Elementwise add.  ``qadd``/``compute_dtype`` (the jax path's int8
    residual-domain form, jax_ops.add) are ignored: the oracle emits fp32,
    and the elided quantization is part of the quantized program's accuracy
    budget, not the oracle's (same policy as conv2d's ``out_scale``)."""
    return a + b


def sub(a, b):
    return a - b


def mul(a, b):
    return a * b


def div(a, b):
    return a / b


def equal(a, b):
    return np.equal(a, b)


def greater(a, b):
    return np.greater(a, b)


def greater_or_equal(a, b):
    return np.greater_equal(a, b)


def where(mask, a, b):
    return np.where(mask, a, b)


def identity(x):
    return x


# --------------------------------------------------------------------------
# normalization
# --------------------------------------------------------------------------

def batchnorm(x, K, B):
    """Folded BatchNorm: the converter pre-computes K=k/sqrt(var+eps) and
    B=b-k*m/sqrt(var+eps) (reference io.py:76-91), so at run time this is a
    pure affine."""
    return x * K + B


def instance_normalization(x, s, bias, epsilon=1e-5):
    axes = tuple(range(2, x.ndim))
    mean = np.mean(x, axis=axes, keepdims=True)
    var = np.mean((x - mean) ** 2, axis=axes, keepdims=True)
    shp = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean) / np.sqrt(var + epsilon)) * s.reshape(shp) + bias.reshape(shp)


# --------------------------------------------------------------------------
# shape / index / tensor ops
# --------------------------------------------------------------------------

def reshape(x, shp):
    shp = np.asarray(shp).astype(np.int64).tolist()
    for i, v in enumerate(shp):
        if v == 0:
            shp[i] = x.shape[i]
    return x.reshape(shp)


def flatten(x, axis=1):
    lead = int(np.prod(x.shape[:axis], dtype=np.int64)) if axis else 1
    return x.reshape(lead, -1)


def transpose(x, axis=None):
    return x.transpose(axis)


def concat(*xs, axis=0):
    return np.concatenate(xs, axis=axis)


def split(x, split=None, axis=0):
    if split is None:
        raise ValueError("split sizes required")
    segs = np.cumsum(np.asarray(split)).tolist()
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, segs[-1])
    return tuple(np.split(x[tuple(idx)], segs[:-1], axis))


def gather(x, idx, axis=0):
    return np.take(x, np.asarray(idx).astype(np.int64), axis=axis)


def slice_(x, starts, ends, axes=None, steps=None):
    starts = np.asarray(starts).astype(np.int64).tolist()
    ends = np.asarray(ends).astype(np.int64).tolist()
    if axes is None:
        axes = list(range(len(starts)))
    else:
        axes = np.asarray(axes).astype(np.int64).tolist()
    if steps is None:
        steps = [1] * len(starts)
    else:
        steps = np.asarray(steps).astype(np.int64).tolist()
    sl = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        sl[a] = slice(s, e, st)
    return x[tuple(sl)]


def expand(x, shp):
    shp = tuple(np.asarray(shp).astype(np.int64).tolist())
    out_shape = np.broadcast_shapes(x.shape, shp)
    return np.broadcast_to(x, out_shape).copy()


def tile(x, repeats):
    return np.tile(x, np.asarray(repeats).astype(np.int64).tolist())


def pad(x, pads, constant_value=0.0, mode="constant"):
    p = np.asarray(pads).astype(np.int64).reshape(2, -1).T.tolist()
    if mode == "constant":
        return np.pad(x, p, mode="constant", constant_values=constant_value)
    return np.pad(x, p, mode={"reflect": "reflect", "edge": "edge"}[mode])


def squeeze(x, axes=None):
    if axes is None:
        return np.squeeze(x)
    axes = [int(a) for a in np.atleast_1d(np.asarray(axes))]
    return np.squeeze(x, axis=tuple(axes))


def unsqueeze(x, axes=None):
    axes = [int(a) for a in np.atleast_1d(np.asarray(axes))]
    return np.expand_dims(x, tuple(axes))


def shape_of(x):
    return np.asarray(x.shape, dtype=np.int64)


def cast(x, dtype="float32"):
    if dtype == "flaot32":  # reference layer.py:202 typo, kept readable
        dtype = "float32"
    return np.asarray(x).astype(dtype)


def const(value=0, dtype="float32"):
    return np.asarray(value, dtype=dtype)


def constant_of_shape(x, value=0, dtype="float32"):
    shp = tuple(np.asarray(x).astype(np.int64).ravel().tolist())
    return np.full(shp, value, dtype=dtype)


def arange(start, end, delta):
    return np.arange(int(np.asarray(start)), int(np.asarray(end)),
                     int(np.asarray(delta)))


def scatternd(data, indices, updates):
    out = np.copy(data)
    indices = np.asarray(indices).astype(np.int64)
    r = indices.shape[-1]
    idx = indices.reshape(-1, r)
    upd = np.asarray(updates).reshape((-1,) + data.shape[r:])
    out[tuple(idx.T)] = upd
    return out


def nonzero(x):
    return np.array(np.nonzero(x), dtype=np.int64)


def topk(x, k, axis=-1, largest=1, sorted=1):
    k = int(np.asarray(k).ravel()[0])
    if largest:
        idx = np.argsort(-x, axis=axis, kind="stable")
    else:
        idx = np.argsort(x, axis=axis, kind="stable")
    idx = np.take(idx, np.arange(k), axis=axis)
    vals = np.take_along_axis(x, idx, axis=axis)
    return vals, idx.astype(np.int64)


# --------------------------------------------------------------------------
# reductions
# --------------------------------------------------------------------------

def _norm_axes(axes, ndim):
    if axes is None:
        return tuple(range(ndim))
    return tuple(int(a) for a in np.atleast_1d(np.asarray(axes)))


def reduce_sum(x, axes=None, keepdims=1):
    return x.sum(axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


def reduce_mean(x, axes=None, keepdims=1):
    return x.mean(axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


def reduce_max(x, axes=None, keepdims=1):
    return x.max(axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


def reduce_min(x, axes=None, keepdims=1):
    return x.min(axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


# --------------------------------------------------------------------------
# resize / upsample
# --------------------------------------------------------------------------

def _resize_nchw(x, out_hw, scales, mode, coord_mode, nearest_mode):
    h, w = x.shape[-2:]
    oh, ow = out_hw
    kh, kw = scales
    if mode == "nearest":
        ri = _rs.nearest_plan(h, oh, kh, coord_mode, nearest_mode)
        ci = _rs.nearest_plan(w, ow, kw, coord_mode, nearest_mode)
        return x[..., ri[:, None], ci[None, :]]
    if mode in ("linear", "bilinear"):
        rlo, rhi, rf = _rs.linear_plan(h, oh, kh, coord_mode)
        clo, chi, cf = _rs.linear_plan(w, ow, kw, coord_mode)
        rf = rf.reshape(-1, 1).astype(x.dtype)   # (oh, 1) — bcast over W
        cf = cf.astype(x.dtype)                  # (ow,)  — bcast on last axis
        rows = x[..., rlo, :] * (1 - rf) + x[..., rhi, :] * rf
        return rows[..., clo] * (1 - cf) + rows[..., chi] * cf
    raise ValueError(f"unsupported resize mode {mode!r}")


def upsample(x, k, mode="nearest", size=None):
    """ONNX Upsample (deprecated op): scales tensor k, NCHW.  An empty k
    falls back to an explicit output ``size`` via the shared resize plan (the
    reference crashes on this input — undefined ``size``, layer.py:80-82)."""
    k = np.asarray(k, dtype=np.float64).ravel()
    if k.size == 0:
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
    """ONNX Resize: scales-or-sizes, full coordinate-mode support."""
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
    return np.abs(x)


def negative(x):
    return -x


def minimum(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = np.minimum(out, x)
    return out


def maximum(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = np.maximum(out, x)
    return out


def floor(x):
    return np.floor(x)


def ceil(x):
    return np.ceil(x)


def round_(x):
    # ONNX Round: banker's rounding (round-half-to-even), == np.rint
    return np.rint(x)


def sign(x):
    return np.sign(x)


def prelu(x, slope):
    slope = np.asarray(slope)
    if slope.ndim == 1 and x.ndim == 4:  # per-channel on NCHW
        slope = slope.reshape(1, -1, 1, 1)
    return np.where(x > 0, x, x * slope)


def elu(x, alpha=1.0):
    return np.where(x > 0, x, alpha * (np.exp(np.minimum(x, 0)) - 1))


def softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def gelu(x, approximate="none"):
    if approximate == "tanh":
        c = np.sqrt(2.0 / np.pi)
        return 0.5 * x * (1 + np.tanh(c * (x + 0.044715 * x**3)))
    return 0.5 * x * (1 + _erf(x / np.sqrt(2.0)).astype(x.dtype))


def _arg_reduce(x, axis, keepdims, select_last_index, fn):
    if select_last_index:
        n = x.shape[axis]
        out = (n - 1 - fn(np.flip(x, axis=axis), axis=axis)).astype(np.int64)
    else:
        out = fn(x, axis=axis).astype(np.int64)
    if keepdims:
        out = np.expand_dims(out, axis)
    return out


def argmax(x, axis=0, keepdims=1, select_last_index=0):
    return _arg_reduce(x, axis, keepdims, select_last_index, np.argmax)


def argmin(x, axis=0, keepdims=1, select_last_index=0):
    return _arg_reduce(x, axis, keepdims, select_last_index, np.argmin)


def reduce_prod(x, axes=None, keepdims=1):
    return x.prod(axis=_norm_axes(axes, x.ndim), keepdims=bool(keepdims))


def global_max_pool(x):
    return x.max(axis=(-2, -1), keepdims=True)


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
    return sum(xs) / len(xs)


def sum_variadic(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out


def gru(X, W, R, B=None, sequence_lens=None, initial_h=None,
        hidden_size=None, direction="forward", linear_before_reset=0):
    """ONNX GRU (zrh gate order).  X: (L, N, D); W: (dirs, 3H, D);
    R: (dirs, 3H, H); B: (dirs, 6H).  Returns (Y, Y_h).  ``sequence_lens``
    honored (see :func:`_seq_steps`)."""
    dirs = {"forward": [1], "reverse": [-1], "bidirectional": [1, -1]}[direction]
    L, N, D = X.shape
    H = R.shape[-1]
    nd = len(dirs)
    Y = np.zeros((L, nd, N, H), dtype=X.dtype)
    Yh = np.zeros((nd, N, H), dtype=X.dtype)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    rows = np.arange(N)
    for di, d in enumerate(dirs):
        w, r = W[di], R[di]
        wb = B[di][:3 * H] if B is not None else np.zeros(3 * H, X.dtype)
        rb = B[di][3 * H:] if B is not None else np.zeros(3 * H, X.dtype)
        ht = initial_h[di] if initial_h is not None else np.zeros((N, H), X.dtype)
        wz, wr_, wh = np.split(w, 3)
        rz, rr, rh = np.split(r, 3)
        wbz, wbr, wbh = np.split(wb, 3)
        rbz, rbr, rbh = np.split(rb, 3)
        for emit_t, read_t, valid in _seq_steps(L, N, d, sequence_lens):
            xt = X[read_t, rows]
            z = sigmoid(xt @ wz.T + ht @ rz.T + wbz + rbz)
            rg = sigmoid(xt @ wr_.T + ht @ rr.T + wbr + rbr)
            if linear_before_reset:
                h = np.tanh(xt @ wh.T + wbh + rg * (ht @ rh.T + rbh))
            else:
                h = np.tanh(xt @ wh.T + wbh + (rg * ht) @ rh.T + rbh)
            hn = (1 - z) * h + z * ht
            ht = np.where(valid[:, None], hn, ht)
            Y[emit_t[valid], di, rows[valid]] = ht[valid]
        Yh[di] = ht
    return Y, Yh


def stage64(x, Ws, Bs, *bw, blocks=None, out_scale=None):
    """Oracle for the fused ResNet entry stage (optimize.fuse_stage64):
    exactly the op chain the fusion replaced — stem conv 7x7/2 + relu +
    maxpool 3x3/2 + N x [conv3x3-relu-conv3x3-add-relu] at C=64.  Weights
    arrive as the fp32 dequant view (quant.dequant_weights).  ``out_scale``
    (the Pallas kernel's int8-emission annotation) is ignored: the oracle
    emits fp32, and the activation quantization it elides on the TPU path
    is part of the quantized program's accuracy budget, not the oracle's."""
    y = conv2d(x, Ws, Bs, strides=(2, 2), pads=(3, 3, 3, 3))
    y = relu(y)
    y = maxpool(y, w=(3, 3), pads=(1, 1, 1, 1), strides=(2, 2))
    for i in range(0, len(bw), 4):
        W1, B1, W2, B2 = bw[i:i + 4]
        r = y
        y = relu(conv2d(y, W1, B1, strides=(1, 1), pads=(1, 1, 1, 1)))
        y = conv2d(y, W2, B2, strides=(1, 1), pads=(1, 1, 1, 1))
        y = relu(add(y, r))
    return y


def stagen(x, *w, blocks=None):
    """Oracle for a fused ResNet body stage (optimize.fuse_stagen): exactly
    the basic/bottleneck block chain the fusion replaced (structure in the
    ``blocks`` kwarg; see ops/pallas/stagen.parse_blocks).  Weights arrive
    as the fp32 dequant view (quant.dequant_weights)."""
    import sys
    from .pallas.stagen import decomposed
    return decomposed(x, *w, blocks=blocks, jops=sys.modules[__name__])
