"""Tiled big-image inference with overlap blending.

Semantics parity with the reference ``tile()`` decorator (util.py:291-348):
optional resampling to ``sample`` size, padding/rounding to a ``glob``
multiple, overlapping ``window`` slices with ``margin`` overlap, per-window
forward passes, and triangular edge-ramp weighted blending of overlaps —
output-scale aware (segmentation k=1 and super-resolution k>1 both work).

This is the host-side path for arbitrary image sizes; the pod-scale analog
(spatial sharding with conv-halo exchange over ICI) lives in
planer_tpu.parallel.spatial.
"""
from __future__ import annotations

import itertools
import math

import numpy as np

from .image import resize

__all__ = ["tile", "grid_slice", "make_slice"]


def make_slice(length: int, window: int, margin: int) -> list[slice]:
    """Window start positions covering [0, length) with >= margin overlap."""
    n = max(1, math.ceil((length - margin) / max(window - margin, 1)))
    starts = np.linspace(0, length - window, n)
    return [slice(int(s), int(s) + window) for s in starts]


def grid_slice(H: int, W: int, h: int, w: int, margin: int):
    return list(itertools.product(make_slice(H, h, margin),
                                  make_slice(W, w, margin)))


def _ramp_weights(h: int, w: int, mar: int) -> np.ndarray:
    """Triangular edge ramp: weight 1..mar+1 rising from each border."""
    wt = np.full((h, w), mar + 1, dtype=np.uint16)
    for i in range(mar, 0, -1):
        wt[i - 1, :] = np.minimum(wt[i - 1, :], i)
        wt[-i, :] = np.minimum(wt[-i, :], i)
        wt[:, i - 1] = np.minimum(wt[:, i - 1], i)
        wt[:, -i] = np.minimum(wt[:, -i], i)
    return wt


def tile(sample=1, glob=1, window=1024, margin=0.1, astype="float32",
         progress=None):
    """Decorator: make ``f(img2d_or_hwc) -> img`` work on arbitrarily large
    inputs by running it on overlapping windows and blending the seams."""

    def wrapf(f):
        def wrapped(img, *args, **key):
            tps = {"sample", "window", "glob", "margin", "progress"}
            fp = {k: v for k, v in key.items() if k not in tps}
            tp = {k: v for k, v in key.items() if k in tps}
            ssz = tp.get("sample", sample)
            wsz = tp.get("window", window)
            gsz = tp.get("glob", glob)
            mar = tp.get("margin", margin)
            info = tp.get("progress", progress)

            img = np.asarray(img)
            h, w = img.shape[:2]
            work = img.astype(astype, copy=False)
            if isinstance(ssz, tuple):
                ssz = list(ssz)
            else:
                ssz = [int(h * ssz), int(w * ssz)]
            wsh = wsw = wsz
            # smaller than the window: round up to a glob multiple instead
            if wsh > ssz[0]:
                wsh = ssz[0] = math.ceil(ssz[0] / gsz) * gsz
            if wsw > ssz[1]:
                wsw = ssz[1] = math.ceil(ssz[1] / gsz) * gsz
            if ssz != [h, w]:
                work = resize(work, ssz)
            if isinstance(mar, float):
                mar = int(wsz * mar)

            rcs = grid_slice(ssz[0], ssz[1], wsh, wsw, mar)
            if info and len(rcs) > 1:
                info(1, len(rcs))
            first = f(work[rcs[0]], *args, **fp)
            first = np.asarray(first)
            k = first.shape[0] / (rcs[0][0].stop - rcs[0][0].start)
            if len(rcs) == 1:
                if ssz != [h, w]:
                    return resize(first, (int(h * k), int(w * k))
                                  ).astype(first.dtype)
                return first

            def sk(ss):
                return (slice(int(ss[0].start * k), int(ss[0].stop * k)),
                        slice(int(ss[1].start * k), int(ss[1].stop * k)))

            out_hw = int(work.shape[0] * k), int(work.shape[1] * k)
            wt = _ramp_weights(first.shape[0], first.shape[1],
                               int(mar * k)).astype(np.float32)
            if first.ndim == 3:
                wt = wt[:, :, None]
            buf = np.zeros(out_hw + first.shape[2:], dtype=np.float32)
            cnt = np.zeros(out_hw + (1,) * (first.ndim - 2), dtype=np.float32)
            buf[sk(rcs[0])] += first * wt
            cnt[sk(rcs[0])] += wt
            for i in range(1, len(rcs)):
                if info:
                    info(i + 1, len(rcs))
                rst = np.asarray(f(work[rcs[i]], *args, **fp))
                buf[sk(rcs[i])] += rst * wt
                cnt[sk(rcs[i])] += wt
            buf /= cnt
            if ssz != [h, w]:
                buf = resize(buf, (int(h * k), int(w * k)))
            return buf.astype(first.dtype)

        return wrapped

    return wrapf
