"""Pallas conv3x3_dual vs XLA variants on the real TPU (l1 shape)."""
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

from planer_tpu.ops.pallas import conv3x3  # noqa: E402

B, H, W, C, O = 64, 56, 56, 64, 64
DT = jnp.bfloat16


def time_loop(f, x, n1=10, n2=410, reps=4):
    @jax.jit
    def loop(x, n):
        def step(i, x):
            y = f(x)
            return x + jnp.sum(y).astype(x.dtype) * 1e-30
        return lax.fori_loop(0, n, step, x)

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(n1)
    return max((t(n2) - t(n1)) / (n2 - n1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    Kf = (rng.standard_normal((O, C, 3, 3)) * 0.2).astype(np.float32)
    absmax = np.abs(Kf).max(axis=(1, 2, 3), keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(Kf / scale), -127, 127).astype(np.int8)

    # correctness on-device first (small)
    xs = rng.standard_normal((1, 8, 8, C)).astype(np.float32)
    Kp = jnp.asarray(conv3x3.pack_weights_dual(q))
    s2 = jnp.asarray(np.tile(scale.reshape(1, O), (1, 2)))
    b2 = jnp.zeros((1, 2 * O), jnp.float32)
    out = np.asarray(conv3x3.conv3x3_dual(jnp.asarray(xs), Kp, s2, b2))
    deq = q.astype(np.float32) * scale
    from planer_tpu.ops import numpy_ops as nops
    ref = nops.conv2d(xs.transpose(0, 3, 1, 2), deq, None,
                      pads=(1, 1, 1, 1)).transpose(0, 2, 3, 1)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"on-device correctness: rel err {err:.4f}", flush=True)

    xb = jnp.zeros((B, H, W, C), DT)
    xb_nchw = jnp.zeros((B, C, H, W), DT)
    Kb = jnp.asarray(deq, DT)

    t_xla_nchw = time_loop(
        lambda v: lax.conv_general_dilated(
            v, Kb, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(DT), xb_nchw)
    Kb_hwio = jnp.asarray(deq.transpose(2, 3, 1, 0), DT)
    t_xla_nhwc = time_loop(
        lambda v: lax.conv_general_dilated(
            v, Kb_hwio, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(DT), xb)

    for br in (8, 16, 28):
        if H % br:
            continue
        t_pl = time_loop(
            lambda v, br=br: conv3x3.conv3x3_dual(
                v, Kp, s2, b2, relu=True, block_rows=br).astype(DT), xb)
        print(f"pallas dual BR={br}: {t_pl*1e3:.3f} ms", flush=True)
    print(f"xla NCHW plain   : {t_xla_nchw*1e3:.3f} ms")
    print(f"xla NHWC plain   : {t_xla_nhwc*1e3:.3f} ms")


if __name__ == "__main__":
    main()
