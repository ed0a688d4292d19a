"""Time the XLA glue around the fused stage kernel on real TPU (batch 64):
prologue (quantize + 4x4 s2d + pads), unpad, and a conv-based s2d
alternative (space-to-depth as a stride-4 identity conv -> im2col DMA on
the MXU path instead of a minor-dim-4 transpose).
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

from planer_tpu.ops.pallas import stage64 as st

N = 64
g = st._geometry(224)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prologue_current(x):
    return st._stem_prologue(x, 0.01, g)


def _s2d_conv_kernel():
    """(64, 3, 4, 4) int8 identity gather kernel: out channel c48 =
    (c*4+sy)*4+sx picks input (c, sy, sx)."""
    k = np.zeros((64, 3, 4, 4), np.int8)
    for c in range(3):
        for sy in range(4):
            for sx in range(4):
                k[(c * 4 + sy) * 4 + sx, c, sy, sx] = 1
    return jnp.asarray(k)


_K = _s2d_conv_kernel()


def prologue_conv(x):
    """quantize -> pad -> stride-4 identity conv (s2d on the conv unit) ->
    pad rows/cols -> flat."""
    n = x.shape[0]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.01), -127, 127
                  ).astype(jnp.int8)
    xp = jnp.pad(xq, ((0, 0), (0, 0), (3, 5), (3, 5)))
    y = lax.conv_general_dilated(
        xp, _K, (4, 4), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.int32).astype(jnp.int8)   # (n,64,58,58)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, 2), (0, g.RS - 58)))
    return y.reshape(n, 64, g.SBUF)


def unpad(y):
    return st._unpad(y, jnp.bfloat16, g)


def timed(fn, x, n1=20, n2=220, reps=4):
    @jax.jit
    def loop(x, n):
        def step(i, x):
            out = fn(x)
            bit = (jnp.sum(out[0, 0, :128].astype(jnp.float32)) % 2)
            return x + bit.astype(x.dtype) * 1e-30 if x.dtype in (
                jnp.float32, jnp.bfloat16) else x ^ bit.astype(x.dtype)
        return lax.fori_loop(0, n, step, x)

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out[(0,) * out.ndim]))
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = time.perf_counter()
    t(n1)
    cs = time.perf_counter() - t0
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9), cs


def main():
    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 3, 224, 224)).astype(np.float32))
    yb = jnp.asarray(rng.standard_normal((N, 64, g.BUF)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    # equivalence check
    a = np.asarray(prologue_current(x))
    b = np.asarray(prologue_conv(x))
    log(f"conv-s2d equivalence: {(a == b).mean():.6f}")

    results = {}
    for name, fn, arg in (("prologue_transpose", prologue_current, x),
                          ("prologue_conv", prologue_conv, x),
                          ("unpad", unpad, yb)):
        dt, cs = timed(fn, arg)
        per = dt / N * 1e6
        results[name] = {"pass_ms": dt * 1e3, "us_per_img": per}
        log(f"{name:<20} {dt*1e3:8.3f} ms  {per:7.3f} us/img (compile "
            f"{cs:.0f}s)")
    with open("experiments/stage_glue_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
