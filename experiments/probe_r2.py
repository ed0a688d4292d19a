"""Round-2 isolated kernel probes on the real TPU.

Answers, with on-device fori_loop timings:
  A. does the W8A8 requant chain (dequant+bias+relu+quantize) cost an extra
     HBM pass, or does XLA fuse it into the conv epilogue?
  B. stacked-conv variants on the C=64 56^2 layers: bf16 vs int8, plain
     vs stacked, incl. epilogue-fused requant
  C. stem 7x7/2 options: bf16 NCHW (current), NHWC, W8A8, fp32-in
  D. maxpool / residual-glue costs
  E. Pallas conv3x3_dual compile attempt (Mosaic-blocked in round 1)

Usage: python experiments/probe_r2.py [batch] [probe...]
"""
import functools
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ONLY = set(sys.argv[2:])
DN = ("NCHW", "OIHW", "NCHW")
RESULTS = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(f, *args, n1=10, n2=210, reps=4):
    """On-device step time of f(*args) via fori_loop difference quotient."""
    @jax.jit
    def loop(n, *args):
        x0 = args[0]
        def step(i, x):
            y = jax.tree.leaves(f(x, *args[1:]))[0]
            return x + (jnp.sum(y) * 1e-30).astype(x.dtype)
        return lax.fori_loop(0, n, step, x0)

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(jnp.int32(n), *args)
            out.block_until_ready()
            float(np.asarray(out.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(n1)
    return max((t(n2) - t(n1)) / (n2 - n1), 1e-9)


def report(name, dt, gflop=None):
    tf = (gflop / dt / 1e3) if gflop else None
    log(f"{name:<44} {dt*1e3:8.4f} ms" +
        (f"  {tf:7.1f} TF/s ({100*tf/197:5.1f}% bf16-peak)" if tf else ""))
    RESULTS[name] = {"ms": dt * 1e3, "tflops": tf}


def want(tag):
    return not ONLY or tag in ONLY


# ---------------------------------------------------------------- A: requant
def probe_requant():
    C = O = 128
    H = 28
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, C, H, H)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 127, (O, C, 3, 3)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.001, 0.01, (O,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
    sx = jnp.float32(0.02)

    def conv_core(q):
        return lax.conv_general_dilated(
            q, wq, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
            preferred_element_type=jnp.int32)

    def deq_epilogue(acc):
        y = acc.astype(jnp.float32) * (sx * ws.reshape(1, -1, 1, 1))
        y = y + b.reshape(1, -1, 1, 1)
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    def quantize(y):
        return jnp.clip(jnp.round(y.astype(jnp.float32) / sx),
                        -127, 127).astype(jnp.int8)

    gf = 2 * BATCH * O * C * 9 * H * H / 1e9

    # bf16 output (what the current code materializes between convs)
    report("A conv_s8 + deq/bias/relu -> bf16 out",
           time_fn(lambda x: deq_epilogue(conv_core(quantize(x))), x), gf)
    # int8 output (requant fused into the epilogue -> half the write traffic)
    report("A conv_s8 + deq/bias/relu + requant -> s8",
           time_fn(lambda x: quantize(deq_epilogue(conv_core(quantize(x)))),
                   x), gf)
    # two chained convs, bf16 intermediate (current program shape)
    def two_bf16(x):
        y = deq_epilogue(conv_core(quantize(x)))
        return deq_epilogue(conv_core(quantize(y)))
    report("A two convs, bf16 intermediate", time_fn(two_bf16, x), 2 * gf)
    # two chained convs, int8 intermediate (direct requant epilogue)
    def two_s8(x):
        q1 = quantize(deq_epilogue(conv_core(quantize(x))))
        return deq_epilogue(conv_core(q1))
    report("A two convs, s8 intermediate", time_fn(two_s8, x), 2 * gf)


# ---------------------------------------------------------------- B: stacked
def probe_stacked():
    C = O = 64
    H = 56
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, C, H, H)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((O, C, 3, 3)) * 0.05, jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 127, (O, C, 3, 3)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.001, 0.01, (O,)), jnp.float32)
    sx = jnp.float32(0.02)
    gf = 2 * BATCH * O * C * 9 * H * H / 1e9

    def plain(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
            preferred_element_type=jnp.float32).astype(x.dtype)

    def stacked(x, K, prec, interleave=True):
        n = x.shape[0]
        Kp = jnp.zeros((2 * O, C, 4, 3), K.dtype)
        Kp = Kp.at[:O, :, 0:3, :].set(K)
        Kp = Kp.at[O:, :, 1:4, :].set(K)
        z = lax.conv_general_dilated(
            x, Kp, (2, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
            preferred_element_type=prec)
        T = z.shape[2]
        if not interleave:
            return z
        z = z.reshape(n, 2, O, T, H).transpose(0, 2, 3, 1, 4)
        return z.reshape(n, O, 2 * T, H)

    def quantize(y):
        return jnp.clip(jnp.round(y.astype(jnp.float32) / sx),
                        -127, 127).astype(jnp.int8)

    report("B plain bf16 3x3 C=64", time_fn(plain, x), gf)
    report("B stacked bf16 (w/ interleave)",
           time_fn(lambda x: stacked(x, w, jnp.float32).astype(jnp.bfloat16),
                   x), gf)
    report("B stacked bf16 (no interleave)",
           time_fn(lambda x: stacked(x, w, jnp.float32,
                                     False).astype(jnp.bfloat16), x), gf)
    def stacked_s8(x, interleave=True):
        q = quantize(x)
        z = stacked(q, wq, jnp.int32, interleave)
        return (z.astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)
    report("B stacked s8 (w/ interleave)", time_fn(stacked_s8, x), gf)
    report("B stacked s8 (no interleave)",
           time_fn(lambda x: stacked_s8(x, False), x), gf)
    # W8A8 plain (lane-starved s8): the round-1 negative, for reference
    def plain_s8(x):
        q = quantize(x)
        acc = lax.conv_general_dilated(
            q, wq, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)
    report("B plain s8 C=64", time_fn(plain_s8, x), gf)


# ------------------------------------------------------------------- C: stem
def probe_stem():
    rng = np.random.default_rng(0)
    O = 64
    xf = jnp.asarray(rng.standard_normal((BATCH, 3, 224, 224)), jnp.float32)
    xb = xf.astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((O, 3, 7, 7)) * 0.05, jnp.bfloat16)
    gf = 2 * BATCH * O * 3 * 49 * 112 * 112 / 1e9

    def stem_nchw(x):
        return lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=DN,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    report("C stem bf16 NCHW (current)", time_fn(stem_nchw, xb), gf)
    report("C stem bf16 NCHW fp32-in",
           time_fn(lambda x: stem_nchw(x.astype(jnp.bfloat16)), xf), gf)

    xh = jnp.asarray(np.moveaxis(np.asarray(xb, np.float32), 1, -1),
                     jnp.bfloat16)
    wh = jnp.asarray(np.moveaxis(np.asarray(w, np.float32), 1, -1),
                     jnp.bfloat16)  # OHWI

    def stem_nhwc(x):
        return lax.conv_general_dilated(
            x, wh, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "OHWI", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    report("C stem bf16 NHWC in/out", time_fn(stem_nhwc, xh), gf)

    wq = jnp.asarray(rng.integers(-127, 127, (O, 3, 7, 7)), jnp.int8)
    def stem_s8(x):
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.02),
                     -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            q, wq, (2, 2), ((3, 3), (3, 3)), dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)
    report("C stem W8A8 NCHW", time_fn(stem_s8, xb), gf)

    # fused stem+pool (does XLA fuse reduce_window into conv consumer?)
    def stem_pool(x):
        y = stem_nchw(x)
        return lax.reduce_window(y, -jnp.inf, lax.max, (1, 1, 3, 3),
                                 (1, 1, 2, 2), ((0, 0), (0, 0), (1, 1), (1, 1)))
    report("C stem + maxpool", time_fn(stem_pool, xb), gf)


# ------------------------------------------------------------------- D: glue
def probe_glue():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((BATCH, 64, 112, 112)), jnp.bfloat16)
    def pool(x):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3),
                                 (1, 1, 2, 2), ((0, 0), (0, 0), (1, 1), (1, 1)))
    report("D maxpool 3x3/2 @112^2x64", time_fn(pool, y))
    a = jnp.asarray(rng.standard_normal((BATCH, 64, 56, 56)), jnp.bfloat16)
    report("D residual add+relu @56^2x64",
           time_fn(lambda x: jnp.maximum(x + a, 0), a))


# ----------------------------------------------------------------- E: pallas
def probe_pallas():
    from planer_tpu.ops.pallas import conv3x3
    rng = np.random.default_rng(0)
    C = O = 64
    H = 56
    x = jnp.asarray(rng.standard_normal((BATCH, H, H, C)), jnp.bfloat16)
    Kp = jnp.asarray(conv3x3.pack_weights_dual(
        rng.integers(-127, 127, (O, C, 3, 3)).astype(np.int8)))
    s2 = jnp.ones((1, 2 * O), jnp.float32) * 1e-3
    b2 = jnp.zeros((1, 2 * O), jnp.float32)
    gf = 2 * BATCH * O * C * 9 * H * H / 1e9
    try:
        f = jax.jit(lambda x: conv3x3.conv3x3_dual(x, Kp, s2, b2, relu=True))
        np.asarray(f(x))
        report("E pallas conv3x3_dual s8", time_fn(f, x), gf)
    except Exception as e:
        log(f"E pallas conv3x3_dual FAILED: {type(e).__name__}: "
            f"{str(e)[:500]}")
        RESULTS["E pallas conv3x3_dual s8"] = {"error": str(e)[:500]}


def main():
    log(f"batch={BATCH} devices={jax.devices()}")
    if want("A"):
        probe_requant()
    if want("B"):
        probe_stacked()
    if want("C"):
        probe_stem()
    if want("D"):
        probe_glue()
    if want("E"):
        probe_pallas()
    if want("F"):
        probe_stem_gemm()
    path = f"experiments/probe_r2_b{BATCH}.json"
    with open(path, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log("wrote", path)




# ------------------------------------------------------------ F: stem as GEMM
def probe_stem_gemm():
    """Stem 7x7/2 reformulated as im2col patches + one dual-row-bank GEMM
    (output rows 2t/2t+1 share a 9x7x3=189-tap patch -> K=189, N=128 lanes;
    1.29x MAC overhead for full lane occupancy).  Plus the new pair-reshape
    maxpool, isolated and fused after the stem."""
    rng = np.random.default_rng(0)
    O = 64
    x = jnp.asarray(rng.standard_normal((BATCH, 3, 224, 224)), jnp.bfloat16)
    Wk = (rng.standard_normal((O, 3, 7, 7)) * 0.05).astype(np.float32)
    w = jnp.asarray(Wk, jnp.bfloat16)
    gf = 2 * BATCH * O * 3 * 49 * 112 * 112 / 1e9

    def stem_ref(x):
        return lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=DN,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # dual-row B matrix: feature index = c*63 + pr*7 + dc (patches order
    # (c, kh, kw)); bank0 = rows pr 0..6, bank1 = rows pr 2..8
    B = np.zeros((3 * 9 * 7, 2 * O), np.float32)
    for c in range(3):
        for pr in range(9):
            for dc in range(7):
                k = c * 63 + pr * 7 + dc
                if pr <= 6:
                    B[k, :O] = Wk[:, c, pr, dc]
                if pr >= 2:
                    B[k, O:] = Wk[:, c, pr - 2, dc]
    Bb = jnp.asarray(B, jnp.bfloat16)

    def patches_dual(x):
        return lax.conv_general_dilated_patches(
            x, (9, 7), (4, 2), ((3, 2), (3, 3)))  # (N, 189, 56, 112)

    def stem_dual(x):
        p = patches_dual(x)                       # (N, 189, 56, 112)
        n = p.shape[0]
        pm = p.transpose(0, 2, 3, 1).reshape(-1, 189)
        y = jnp.dot(pm, Bb, preferred_element_type=jnp.float32)
        y = y.reshape(n, 56, 112, 2, O)           # (N, t, w, parity, O)
        y = y.transpose(0, 4, 1, 3, 2).reshape(n, O, 112, 112)
        return y.astype(jnp.bfloat16)

    # correctness vs XLA conv
    ref = np.asarray(stem_ref(x[:1]))
    got = np.asarray(jax.jit(stem_dual)(x[:1]))
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    log(f"F stem_dual rel err vs conv: {err:.5f}")

    report("F stem GEMM dual-row bf16", time_fn(stem_dual, x), gf)

    def stem_dual_s8(x):
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.02),
                     -127, 127).astype(jnp.int8)
        p = lax.conv_general_dilated_patches(q, (9, 7), (4, 2),
                                             ((3, 2), (3, 3)))
        n = p.shape[0]
        pm = p.transpose(0, 2, 3, 1).reshape(-1, 189)
        Bq = jnp.clip(jnp.round(Bb.astype(jnp.float32) / 0.01),
                      -127, 127).astype(jnp.int8)
        y = lax.dot_general(pm, Bq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * 2e-4).reshape(n, 56, 112, 2, O)
        y = y.transpose(0, 4, 1, 3, 2).reshape(n, O, 112, 112)
        return y.astype(jnp.bfloat16)

    report("F stem GEMM dual-row s8", time_fn(stem_dual_s8, x), gf)

    # patch extraction alone (is conv_general_dilated_patches bw-efficient?)
    report("F patches (9,7)/(4,2) extract only", time_fn(patches_dual, x))

    # new pair-reshape maxpool, isolated and fused after the stem
    from planer_tpu.ops import jax_ops as jops
    y0 = jnp.asarray(rng.standard_normal((BATCH, 64, 112, 112)), jnp.bfloat16)
    report("F pairmax maxpool @112^2x64",
           time_fn(lambda v: jops.maxpool(v, w=(3, 3), pads=(1, 1, 1, 1),
                                          strides=(2, 2)), y0))
    report("F stem conv + pairmax pool",
           time_fn(lambda v: jops.maxpool(stem_ref(v), w=(3, 3),
                                          pads=(1, 1, 1, 1),
                                          strides=(2, 2)), x), gf)
    report("F stem GEMM dual s8 + pairmax pool",
           time_fn(lambda v: jops.maxpool(stem_dual_s8(v), w=(3, 3),
                                          pads=(1, 1, 1, 1),
                                          strides=(2, 2)), x), gf)


if __name__ == "__main__":
    main()
