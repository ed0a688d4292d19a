"""Graph-level optimization passes over the flow IR.

The reference has no graph optimizer (the converter's BN pre-fold,
io.py:76-91, turns BatchNormalization into a runtime affine — but the affine
still executes every forward).  Passes here rewrite the IR itself:

  * :func:`fold_bn_into_conv` — a ``conv -> batchnorm`` pair (the affine
    form) folds completely into the conv weights/bias: W'[o] = W[o] * K[o],
    B' = B * K + B_bn.  Removes the elementwise pass AND the affine weight
    streams; applies to every conv/bn in ResNet/YOLO-style nets.
Run :func:`optimize` (or ``Net.optimize()``) BEFORE ``Net.quantize()`` so the
quantizer sees the folded weights (per-channel scales then absorb the BN
gain exactly).
"""
from __future__ import annotations

import numpy as np

from .ir import Graph, FlowEdge

__all__ = ["optimize", "fold_bn_into_conv"]


def _consumer_count(graph: Graph) -> dict[str, int]:
    cnt: dict[str, int] = {}
    for e in graph.flow:
        for li in range(len(e.layers)):
            src = e.src if li == 0 else e.dst
            for s in src:
                cnt[s] = cnt.get(s, 0) + 1
    for s in graph.flow[-1].dst:
        cnt[s] = cnt.get(s, 0) + 1  # graph outputs count as consumed
    return cnt


def fold_bn_into_conv(net) -> int:
    """Fold ``conv(x, W, B?) -> batchnorm(y, K, B)`` pairs into the conv.

    Requirements: single-layer edges, conv output consumed ONLY by the bn,
    conv weight/bias and bn affines are inits not shared with other layers,
    group handled (per-output-channel scaling is group-agnostic).  Returns
    the number of pairs folded.
    """
    graph: Graph = net.graph
    layers = graph.layer_map()
    idx = graph.init_index()
    inits = set(graph.init_names())
    users = graph.weight_users()
    consumers = _consumer_count(graph)

    # producer edge index for each tensor (single-assignment assumed; bail
    # on rebinds)
    produced: dict[str, int] = {}
    rebound: set[str] = set()
    for i, e in enumerate(graph.flow):
        for d in e.dst:
            if d in produced:
                rebound.add(d)
            produced[d] = i

    folded = 0
    drop_edges: set[int] = set()
    for j, bn_edge in enumerate(graph.flow):
        if len(bn_edge.layers) != 1 or j in drop_edges:
            continue
        if layers[bn_edge.layers[0]].op != "batchnorm":
            continue
        if len(bn_edge.src) != 3:
            continue
        y, kname, bname = bn_edge.src
        if kname not in inits or bname not in inits:
            continue
        if y in rebound or y not in produced:
            continue
        i = produced[y]
        conv_edge = graph.flow[i]
        if i in drop_edges or len(conv_edge.layers) != 1:
            continue
        if layers[conv_edge.layers[0]].op != "conv":
            continue
        if consumers.get(y, 0) != 1:
            continue  # conv output used elsewhere too
        srcs = conv_edge.src
        if len(srcs) < 2 or srcs[1] not in inits:
            continue
        wname = srcs[1]
        bias_name = srcs[2] if len(srcs) > 2 and srcs[2] != "None" else None
        # weights shared with other ops must not be rewritten
        if len(users.get(wname, [])) > 1:
            continue
        if bias_name and len(users.get(bias_name, [])) > 1:
            continue
        if len(users.get(kname, [])) > 1 or len(users.get(bname, [])) > 1:
            continue
        W = net.weights[idx[wname]]
        if W.dtype != np.float32 or W.ndim != 4:
            continue
        K = net.weights[idx[kname]].reshape(-1)   # (C,)
        Bn = net.weights[idx[bname]].reshape(-1)
        if K.shape[0] != W.shape[0]:
            continue
        # fold
        net.weights[idx[wname]] = (W * K.reshape(-1, 1, 1, 1)).astype(W.dtype)
        if bias_name is not None:
            Bc = net.weights[idx[bias_name]]
            net.weights[idx[bias_name]] = (Bc * K + Bn).astype(Bc.dtype)
        else:
            # conv had no bias: reuse the bn shift init as the conv bias
            net.weights[idx[bname]] = Bn.astype(np.float32)
            graph.inits[idx[bname]] = (bname, Bn.shape, "float32")
            if conv_edge.src_scalar:
                conv_edge.src_scalar = False
            conv_edge.src = [srcs[0], wname, bname]
        # conv now writes the bn's output directly
        conv_edge.dst = list(bn_edge.dst)
        conv_edge.dst_scalar = bn_edge.dst_scalar
        drop_edges.add(j)
        folded += 1

    if folded:
        keep = [e for i, e in enumerate(graph.flow) if i not in drop_edges]
        dropped_layers = {graph.flow[i].layers[0] for i in drop_edges}
        graph.flow = keep
        graph.layers = [l for l in graph.layers if l.name not in dropped_layers]
        # drop inits no longer referenced by any flow edge (dead BN affines)
        still_used = set(graph.weight_users())
        keep_iw = [(i, w) for (i, w) in zip(graph.inits, net.weights)
                   if i[0] in still_used]
        graph.inits = [i for i, _ in keep_iw]
        net.weights = [w for _, w in keep_iw]
        graph.validate()
        net._invalidate()
    return folded


# producers whose epilogue XLA fuses a reduce_window into (measured,
# experiments/probe_r2): pooling directly after these is nearly free, while a
# standalone reduce_window maxpool lowers to strided lane gathers (4-16x
# slower than the shift form)
_FUSABLE_PRODUCERS = {"conv", "convtranspose", "dense", "matmul"}
# elementwise ops the fusion sees through (conv -> bn -> relu -> pool fuses)
_TRANSPARENT = {"batchnorm", "relu", "leakyrelu", "sigmoid", "tanh", "clip",
                "add", "sub", "mul", "div", "identity", "prelu", "elu",
                "hardsigmoid", "cast"}


def annotate_pool_impl(net) -> int:
    """Annotate maxpool layers whose input is NOT a fusable conv epilogue
    with ``impl="shift"`` (the pair-reshape lowering).  Returns the number of
    pools annotated."""
    graph: Graph = net.graph
    layers = graph.layer_map()
    # tensor -> (producing op, that op's first data input); chain layers
    # rebind the edge dst, so later chain members see the previous member
    producer: dict[str, tuple[str, str | None]] = {}
    annotated = 0

    def fusable_upstream(name: str) -> bool:
        seen: set[str] = set()
        while name in producer and name not in seen:
            seen.add(name)
            op, inp = producer[name]
            if op in _FUSABLE_PRODUCERS:
                return True
            if op in _TRANSPARENT:
                name = inp
                continue
            return False
        return False  # graph input / init / unknown: standalone

    for e in graph.flow:
        for li, lname in enumerate(e.layers):
            op = layers[lname].op
            src = e.src if li == 0 else e.dst
            inp = src[0] if src else None
            if op == "maxpool" and inp is not None \
                    and not fusable_upstream(inp):
                if layers[lname].kwargs.get("impl") != "shift":
                    layers[lname].kwargs["impl"] = "shift"
                    annotated += 1
            for d in e.dst:
                producer[d] = (op, inp)
    if annotated:
        net._invalidate()
    return annotated


def optimize(net) -> dict:
    """Run all IR optimization passes; returns per-pass counts."""
    report = {"fold_bn_into_conv": fold_bn_into_conv(net),
              "annotate_pool_impl": annotate_pool_impl(net)}
    return report
