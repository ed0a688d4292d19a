"""End-to-end A/B of stage64 (PACK, REQUANT) on the DEFAULT build config
(quantize static + fuse + output-quant chaining — the bench.py recipe),
ResNet-18 @224 real TPU.

Probe context (kernel_probe_r4.json, isolated block kernels b64/img):
none/trunc 4.77 us, none/fxp 3.93, tri/fxp 3.77, pair/fxp 4.42.

Usage: python experiments/pack_ab.py [batch] [config ...]
Writes/merges experiments/pack_ab_b{batch}.json.
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

CONFIGS = {
    "none_trunc": ("none", "trunc"),
    "none_fxp": ("none", "fxp"),
    "tri_fxp": ("tri", "fxp"),
    "pair_fxp": ("pair", "fxp"),
    "tri_trunc": ("tri", "trunc"),
    "nine_fxp": ("nine", "fxp"),
    "dpair_fxp": ("dpair", "fxp"),
    "nine_trunc": ("nine", "trunc"),
}


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


def step_time(net, batch):
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
        (batch, 3, 224, 224)).astype(np.float32))

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
    a, b = t(10), t(510)
    return max((b - a) / 500, 1e-9)


def main():
    which = [a for a in sys.argv[2:]] or list(CONFIGS)
    path = f"experiments/pack_ab_b{BATCH}.json"
    results = {}
    if os.path.exists(path):
        results = json.load(open(path))
    old = (st.PACK, st.REQUANT)
    try:
        for name in which:
            st.PACK, st.REQUANT = CONFIGS[name]
            t0 = time.perf_counter()
            net = build()
            dt = step_time(net, BATCH)
            log(f"{name:<12} step {dt*1e3:7.3f} ms  {BATCH/dt:8.0f} img/s"
                f"   (total {time.perf_counter()-t0:.0f}s)")
            results[name] = {"step_ms": dt * 1e3, "img_s": BATCH / dt}
            with open(path, "w") as f:
                json.dump(results, f, indent=1)
    finally:
        st.PACK, st.REQUANT = old
    log("wrote", path)


if __name__ == "__main__":
    main()
