"""Isolated op timings at the YOLO-v3 entry shapes (b16, the 9 ms mystery:
yolo_prefix_b16.json shows d0..d3 = 78% of the step at 9% MXU).

Times each entry conv + candidate formulations in isolation on the real
TPU, so the slow op is identified by measurement, not hypothesis.

Usage: python experiments/yolo_entry_probe.py [names...]
Writes/merges experiments/yolo_entry_probe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from planer_tpu.ops import jax_ops
from planer_tpu.ops.qtypes import QTensor

B = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, x, n1=10, n2=110, reps=3):
    @jax.jit
    def loop(x, n):
        def step(i, x):
            o = fn(x)
            return x + (jnp.sum(o.astype(jnp.float32)) * 1e-30).astype(x.dtype)
        return lax.fori_loop(0, n, step, x)

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            o = loop(x, jnp.int32(n))
            o.block_until_ready()
            float(np.asarray(o[(0,) * o.ndim]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(n1)
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9)


def qt(o, c, k, rng, act=0.05):
    w = rng.integers(-90, 90, (o, c, k, k), dtype=np.int8)
    scale = (0.002 + 0.001 * rng.random((o, 1, 1, 1))).astype(np.float32)
    return QTensor(jnp.asarray(w), jnp.asarray(scale), act_scale=act)


def s2d_conv(x, K, B=None):
    """3x3/2 conv as: pad -> 2x2 space-to-depth -> 2x2 s1 conv over 4C.

    out(y,x) = sum_dy,dx w[dy,dx] in[2y+dy-1, 2x+dx-1]; with a (1,1) pad
    the tap index 2y+dy maps to s2d phase (ty, py): dy=0 -> (0,0),
    dy=1 -> (0,1), dy=2 -> (1,0).  The conv then runs at C_eff=4C,
    kernel 2x2, stride 1 — MXU-friendly shapes instead of the measured
    8 TF/s NCHW s2 lowering."""
    n, C, H, W = x.shape
    O = K.shape[0]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    t = (H + 2) // 2
    xs = xp.reshape(n, C, t, 2, t, 2).transpose(0, 1, 3, 5, 2, 4)
    xs = xs.reshape(n, 4 * C, t, t)
    W2 = jnp.zeros((O, 4 * C, 2, 2), K.dtype)
    for dy in range(3):
        ty, py = divmod(dy, 2)
        for dx in range(3):
            tx, px = divmod(dx, 2)
            W2 = W2.at[:, py * 2 + px::4, ty, tx].set(K[:, :, dy, dx])
    out = lax.conv_general_dilated(
        xs, W2, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    out = out[:, :, :H // 2, :W // 2]
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def main():
    want = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    log(f"backend: {jax.default_backend()}")

    # entry tensors (bf16, NCHW)
    mk = lambda c, h: jnp.asarray(
        rng.standard_normal((B, c, h, h)).astype(np.float32), jnp.bfloat16)

    cases = {
        # name: (input, conv kwargs builder)
        "d0_32x416_stacked": (mk(3, 416), qt(32, 3, 3, rng), dict()),
        "d1_s2_64x208": (mk(32, 416), qt(64, 32, 3, rng),
                         dict(strides=(2, 2))),
        "r1_1x1_32": (mk(64, 208), qt(32, 64, 1, rng), dict(pads=(0,) * 4)),
        "r1_3x3_64_stacked": (mk(32, 208), qt(64, 32, 3, rng), dict()),
        "d2_s2_128x104": (mk(64, 208), qt(128, 64, 3, rng),
                          dict(strides=(2, 2))),
        "r2_1x1_64": (mk(128, 104), qt(64, 128, 1, rng), dict(pads=(0,) * 4)),
        "r2_3x3_128_stacked": (mk(64, 104), qt(128, 64, 3, rng), dict()),
        "d3_s2_256x52_w8a8": (mk(128, 104), qt(256, 128, 3, rng),
                              dict(strides=(2, 2))),
        # reference fast stage: one r3 residual 1x1+3x3 at 52^2
        "r3_1x1_128": (mk(256, 52), qt(128, 256, 1, rng), dict(pads=(0,) * 4)),
        "r3_3x3_256": (mk(128, 52), qt(256, 128, 3, rng), dict()),
    }
    results = {}
    if os.path.exists("experiments/yolo_entry_probe.json"):
        results = json.load(open("experiments/yolo_entry_probe.json"))

    # candidate formulations for the measured-pathological entry convs
    extra = {}
    for nm, (x, K, kw) in (("d1", cases["d1_s2_64x208"]),
                           ("d2", cases["d2_s2_128x104"])):
        Kf = K.dequant(jnp.bfloat16)
        extra[f"{nm}_s2d2x2"] = (
            lambda x_, Kf=Kf: s2d_conv(x_, Kf), x)
        q8 = K
        extra[f"{nm}_w8a8_forced"] = (
            lambda x_, q8=q8, kw=kw: jax_ops._conv_w8a8(
                x_, q8, None, kw.get("strides", (1, 1)), (1, 1),
                (1, 1, 1, 1), compute_dtype="bfloat16"), x)
        xn = jnp.transpose(x, (0, 2, 3, 1))
        Kn = jnp.transpose(Kf, (2, 3, 1, 0))
        def nhwc(x_, Kn=Kn, kw=kw):
            return lax.conv_general_dilated(
                x_, Kn, kw.get("strides", (1, 1)), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(x_.dtype)
        extra[f"{nm}_nhwc"] = (nhwc, xn)
    # 1x1 64->32 208^2 in NHWC (a (NHW, C) GEMM shape)
    x11, K11, _ = cases["r1_1x1_32"]
    xn11 = jnp.transpose(x11, (0, 2, 3, 1))
    Kn11 = jnp.transpose(K11.dequant(jnp.bfloat16), (2, 3, 1, 0))
    extra["r1_1x1_nhwc"] = (
        lambda x_, Kn=Kn11: lax.conv_general_dilated(
            x_, Kn, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x_.dtype), xn11)

    for name, (fn, x) in extra.items():
        if want and not any(w in name for w in want):
            continue
        dt = timed(fn, x)
        us = dt * 1e6 / B
        results[name] = round(us, 3)
        log(f"{name:<28} {dt*1e3:7.3f} ms  {us:7.2f} us/img")

    for name, (x, K, kw) in cases.items():
        if want and not any(w in name for w in want):
            continue
        kw.setdefault("pads", (1, 1, 1, 1))
        kw.setdefault("strides", (1, 1))
        for variant in ("default", "nostack"):
            if variant == "nostack" and "stacked" not in name:
                continue
            jax_ops._STACK_CONV = variant == "default"
            fn = lambda x_, K=K, kw=kw: jax_ops.conv2d(
                x_, K, None, compute_dtype="bfloat16", **kw)
            dt = timed(fn, x)
            o, c, k, _ = np.asarray(K.q.shape)
            h = x.shape[2] // kw["strides"][0]
            gflop = 2 * o * c * k * k * h * h * B / 1e9
            key = name + ("" if variant == "default" else ":nostack")
            us = dt * 1e6 / B
            results[key] = round(us, 3)
            log(f"{key:<28} {dt*1e3:7.3f} ms  {us:7.2f} us/img  "
                f"{gflop/dt/1e3:6.1f} TF/s")
    jax_ops._STACK_CONV = True
    with open("experiments/yolo_entry_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    log("wrote experiments/yolo_entry_probe.json")


if __name__ == "__main__":
    main()
