"""A/B the fusion variants end-to-end on real TPU (one number each):

  unfused | stage64-only | stage64+l2-stagen | full-fuse

Usage: python experiments/fuse_ab.py [batch] [model] [variant...]
Writes experiments/fuse_ab_{model}_b{batch}.json (merging entries).
r50 variants: unfused | stem | l1 (stem+layer1) | l12 | full.
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
from planer_tpu.optimize import (annotate_output_quant, fuse_stage64,
                                 fuse_stagen)
from planer_tpu.quant import calibrate_act_scales
from planer_tpu.models import eval as ev

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODEL = sys.argv[2] if len(sys.argv) > 2 else "resnet18"
ONLY = sys.argv[3:]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(variant):
    net = getattr(models, MODEL)()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(4, (3, 224, 224), seed=11,
                                                  batch=2))
    net.quantize("int8", activations="static", fuse=False)
    if variant != "unfused":
        fuse_stage64(net)
    cout = {"s64": None, "stem": None, "s64_l2": 128, "l1": 256,
            "l12": 512, "full": 10 ** 9}.get(variant)
    if cout:
        fuse_stagen(net, max_cout=cout)
    # r4 default: int8 residual-add chaining on BOTH sides of the A/B
    # (VERDICT r4 item 3 — the r3 A/B predates qadd and flattered neither)
    annotate_output_quant(net)
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
    # robust 1000-step quotient (the 100-step form recorded a 13%-low step
    # during a relay-jitter episode — RESULTS.md "qadd correction")
    a, b = t(10), t(1010)
    return max((b - a) / 1000, 1e-9)


def main():
    path = f"experiments/fuse_ab_{MODEL}_b{BATCH}.json"
    results = {}
    if os.path.exists(path):
        results = json.load(open(path))
    default = ("unfused", "s64", "s64_l2", "full") if MODEL == "resnet18" \
        else ("unfused", "stem", "l1", "l12", "full")
    for variant in default:
        if ONLY and variant not in ONLY:
            continue
        t0 = time.perf_counter()
        net = build(variant)
        dt = step_time(net, BATCH)
        log(f"{variant:<8} step {dt*1e3:7.3f} ms  "
            f"{BATCH/dt:8.0f} img/s   (total {time.perf_counter()-t0:.0f}s)")
        results[variant] = {"step_ms": dt * 1e3, "img_s": BATCH / dt}
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
