"""E2E A/B of the r5 stage64 flags (PIPE x DENSE_OUT) on the bench config.

Usage: python experiments/flag_ab_r5.py [batch]
Writes experiments/flag_ab_r5.json.
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

from planer_tpu import models
from planer_tpu.quant import calibrate_act_scales
from planer_tpu.models import eval as ev
from planer_tpu.ops.pallas import stage64 as st

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    net = models.resnet18()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(4, (3, 224, 224), seed=11,
                                                  batch=2))
    net.quantize("int8", activations="static")
    net.astype_compute("bfloat16")
    return net


def step_time(net):
    prog = net.program
    fn_, _ = prog._build_fn({}, [])
    params = prog.params

    @jax.jit
    def loop(x, n):
        def step(i, x):
            out = jax.tree.leaves(fn_(params, x))[0]
            return x + jnp.sum(out).astype(x.dtype) * 1e-30
        return lax.fori_loop(0, n, step, x)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, 3, 224, 224)).astype(np.float32))

    def t(n):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = loop(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out[0, 0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(10)
    a, b = t(10), t(1010)
    return max((b - a) / 1000, 1e-9)


def main():
    results = {}
    path = "experiments/flag_ab_r5.json"
    if os.path.exists(path):
        results = json.load(open(path))
    net = build()
    import itertools
    cfgs = [("none", False, "single"), ("none", True, "single"),
            ("half", False, "single"), ("half", True, "single"),
            ("none", False, "pair"), ("half", False, "pair")]
    for pipe, dense, chain in cfgs:
        key = f"pipe={pipe},dense={dense},chain={chain}"
        if key in results:
            continue
        st.PIPE, st.DENSE_OUT, st.CHAIN = pipe, dense, chain
        net._invalidate()
        t0 = time.perf_counter()
        dt = step_time(net)
        log(f"{key:<24} step {dt*1e3:7.3f} ms  {BATCH/dt:8.0f} img/s  "
            f"(total {time.perf_counter()-t0:.0f}s)")
        results[key] = {"step_ms": dt * 1e3, "img_s": BATCH / dt}
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
