"""Probe: can the stage64 unpad's column-slice copy be folded into the
layer2-entry convs by letting them consume the wide (R, RS) kernel layout?

  A (current): unpad = halo-slice + reshape + col-slice [:, :R] (a real
     copy: rows become non-contiguous) -> conv1 3x3/2 + downsample 1x1/2
  B (wide):    halo-slice + reshape ONLY (wide (R, RS), zero pad cols) ->
     convs on W=RS (+14% W MACs) -> slice the (28, 32) outputs to 28

Both compute identical valid outputs (pad cols are zero, garbage output
cols sliced).  If B wins, a fuse_stage_wide graph pass pays.
Real-TPU timing, robust 1000-step quotient.
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

G = st._geometry(224)
R, RS, S, BUF, HALO = G.R, G.RS, G.S, G.BUF, st.HALO
N = 64
DN = ("NCHW", "OIHW", "NCHW")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def convs_on(x, w1, wd, pads_w):
    """conv1 3x3/2 (pads (1,1,1,pw)) + downsample 1x1/2 on the same x."""
    y1 = lax.conv_general_dilated(
        x, w1, (2, 2), ((1, 1), (1, pads_w)), dimension_numbers=DN,
        preferred_element_type=jnp.float32)
    yd = lax.conv_general_dilated(
        x, wd, (2, 2), ((0, 0), (0, 0)), dimension_numbers=DN,
        preferred_element_type=jnp.float32)
    return y1, yd


def variant_a(y, w1, wd):
    x = y[:, :, HALO:HALO + S].reshape(N, 64, R, RS)[:, :, :, :R]
    y1, yd = convs_on(x, w1, wd, 1)
    return (y1 + yd[:, :, :, :y1.shape[3]]).astype(jnp.bfloat16)


def variant_b(y, w1, wd):
    x = y[:, :, HALO:HALO + S].reshape(N, 64, R, RS)
    y1, yd = convs_on(x, w1, wd, 1)
    Wo = (R + 1) // 2
    y1 = y1[:, :, :, :Wo]
    yd = yd[:, :, :, :Wo]
    return (y1 + yd).astype(jnp.bfloat16)


def timed(fn, y, w1, wd, n1=10, n2=1010):
    @jax.jit
    def loop(y, n):
        def step(i, y):
            out = fn(y, w1, wd)
            return y + (jnp.sum(out[:, :1, :1, :1].astype(jnp.float32))
                        * 1e-30).astype(y.dtype)
        return lax.fori_loop(0, n, step, y)

    def t(n, reps=4):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(y, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(n1, 1)
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9)


def main():
    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(3)
    y = np.zeros((N, 64, BUF), np.float32)
    data = rng.standard_normal((N, 64, R, RS)) * 0.1
    data[:, :, :, R:] = 0.0                    # kernel-guaranteed zero pads
    y[:, :, HALO:HALO + S] = data.reshape(N, 64, S)
    y = jnp.asarray(y, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((128, 64, 3, 3)) * 0.05,
                     jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((128, 64, 1, 1)) * 0.05,
                     jnp.bfloat16)

    # exactness: valid cols agree
    ya = np.asarray(variant_a(y, w1, wd), np.float32)
    yb = np.asarray(variant_b(y, w1, wd), np.float32)
    d = np.abs(ya - yb).max()
    log(f"agree: max|A-B| = {d}")
    assert d == 0.0, d

    results = {}
    for name, fn in (("unpad_then_conv", variant_a),
                     ("wide_conv_slice", variant_b)):
        dt = timed(fn, y, w1, wd)
        us = dt / N * 1e6
        results[name] = {"pass_ms": dt * 1e3, "us_per_img": us}
        log(f"{name:<16} pass {dt*1e3:8.3f} ms  {us:6.3f} us/img")
    with open("experiments/wide_consume_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    log("wrote experiments/wide_consume_probe.json")


if __name__ == "__main__":
    main()
