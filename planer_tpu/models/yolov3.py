"""YOLO-v3 (Darknet-53 + FPN heads) built natively in the flow IR.

The reference's detection milestone (readme.md:110-113).  The graph outputs
the three raw multi-scale head tensors (stride 32/16/8) — exercising the
leakyrelu / upsample / concat routes of the op library — and
:mod:`.yolo_post` decodes boxes + NMS on host (the data-dependent tail, kept
off-device by design: SURVEY §7 hard-part #1).
"""
from __future__ import annotations

import numpy as np

from .builder import GraphBuilder

__all__ = ["yolov3", "YOLO_ANCHORS"]

# canonical COCO anchors, grouped [large, medium, small] to match head order
YOLO_ANCHORS = {
    32: [(116, 90), (156, 198), (373, 326)],
    16: [(30, 61), (62, 45), (59, 119)],
    8: [(10, 13), (16, 30), (33, 23)],
}


def yolov3(num_classes: int = 80, seed: int = 0):
    rng = np.random.default_rng(seed)
    b = GraphBuilder(["x"])

    def conv_w(o, i, k):
        return (rng.standard_normal((o, i, k, k))
                * np.sqrt(2.0 / (i * k * k))).astype(np.float32)

    def cbl(x, cin, cout, k, stride, name):
        """conv + folded-BN + LeakyReLU(0.1) — the darknet building unit."""
        pad = k // 2
        W = b.weight(f"{name}.w", conv_w(cout, cin, k))
        y = b.conv(x, W, None, group=1, strides=[stride, stride],
                   dilations=[1, 1], pads=[pad, pad, pad, pad], name=name)
        K = b.weight(f"{name}.bn.k",
                     (1 + 0.05 * rng.standard_normal((1, cout, 1, 1))
                      ).astype(np.float32))
        Bb = b.weight(f"{name}.bn.b",
                      (0.05 * rng.standard_normal((1, cout, 1, 1))
                       ).astype(np.float32))
        y = b.batchnorm(y, K, Bb, name=f"{name}.bn")
        return b.leakyrelu(y, alpha=0.1, name=f"{name}.act")

    def residual(x, c, name):
        y = cbl(x, c, c // 2, 1, 1, f"{name}.1")
        y = cbl(y, c // 2, c, 3, 1, f"{name}.2")
        return b.add(y, x, name=f"{name}.add")

    # ---------------------------------------------------- darknet-53 backbone
    y = cbl("x", 3, 32, 3, 1, "d0")
    y = cbl(y, 32, 64, 3, 2, "d1")
    y = residual(y, 64, "r1.0")
    y = cbl(y, 64, 128, 3, 2, "d2")
    for i in range(2):
        y = residual(y, 128, f"r2.{i}")
    y = cbl(y, 128, 256, 3, 2, "d3")
    for i in range(8):
        y = residual(y, 256, f"r3.{i}")
    c3 = y                                      # stride 8, 256ch
    y = cbl(y, 256, 512, 3, 2, "d4")
    for i in range(8):
        y = residual(y, 512, f"r4.{i}")
    c4 = y                                      # stride 16, 512ch
    y = cbl(y, 512, 1024, 3, 2, "d5")
    for i in range(4):
        y = residual(y, 1024, f"r5.{i}")
    c5 = y                                      # stride 32, 1024ch

    out_ch = 3 * (5 + num_classes)

    def convset(x, cin, cmid, name):
        x = cbl(x, cin, cmid, 1, 1, f"{name}.0")
        x = cbl(x, cmid, cmid * 2, 3, 1, f"{name}.1")
        x = cbl(x, cmid * 2, cmid, 1, 1, f"{name}.2")
        x = cbl(x, cmid, cmid * 2, 3, 1, f"{name}.3")
        x = cbl(x, cmid * 2, cmid, 1, 1, f"{name}.4")
        return x

    def detect(x, cmid, name):
        y = cbl(x, cmid, cmid * 2, 3, 1, f"{name}.conv")
        W = b.weight(f"{name}.out.w", conv_w(out_ch, cmid * 2, 1))
        Bv = b.weight(f"{name}.out.b", np.zeros(out_ch, np.float32))
        return b.conv(y, W, Bv, group=1, strides=[1, 1], dilations=[1, 1],
                      pads=[0, 0, 0, 0], name=f"{name}.out")

    # ------------------------------------------------------------- FPN heads
    h5 = convset(c5, 1024, 512, "h5")
    out_l = detect(h5, 512, "det32")            # stride 32

    r4 = cbl(h5, 512, 256, 1, 1, "route4")
    k4 = b.weight("route4.k", np.array([1, 1, 2, 2], np.float32))
    r4 = b.upsample(r4, k4, mode="nearest", name="route4.up")
    h4 = b.concat(r4, c4, axis=1, name="route4.cat")
    h4 = convset(h4, 256 + 512, 256, "h4")
    out_m = detect(h4, 256, "det16")            # stride 16

    r3 = cbl(h4, 256, 128, 1, 1, "route3")
    k3 = b.weight("route3.k", np.array([1, 1, 2, 2], np.float32))
    r3 = b.upsample(r3, k3, mode="nearest", name="route3.up")
    h3 = b.concat(r3, c3, axis=1, name="route3.cat")
    h3 = convset(h3, 128 + 256, 128, "h3")
    out_s = detect(h3, 128, "det8")             # stride 8

    b.ret([out_l, out_m, out_s])
    return b.build_net()
