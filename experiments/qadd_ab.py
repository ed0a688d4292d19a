"""A/B the int8 residual-add chaining (optimize.ANNOTATE_QADD) end-to-end
on the real TPU with the ROBUST 1000-step difference quotient (the first
qadd measurement, bench_r4_qadd.log's 1.595 ms, was a jitter artifact of
the old 100-step quotient — see bench.py N1/N2 comment).

Usage: python experiments/qadd_ab.py [batch ...]     (default: 64 1)
Writes/merges experiments/qadd_ab.json.
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
from planer_tpu import optimize as opt
from planer_tpu.quant import calibrate_act_scales
from planer_tpu.models import eval as ev

BATCHES = [int(a) for a in sys.argv[1:]] or [64, 1]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(qadd):
    old = opt.ANNOTATE_QADD
    opt.ANNOTATE_QADD = qadd
    try:
        net = models.resnet18()
        net.optimize()
        calibrate_act_scales(net, ev.synthetic_images(
            4, (3, 224, 224), seed=11, batch=2))
        net.quantize("int8", activations="static")
        net.astype_compute("bfloat16")
    finally:
        opt.ANNOTATE_QADD = old
    return net


def step_time(net, batch, n1=10, n2=1010):
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

    t(n1)
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9)


def main():
    path = "experiments/qadd_ab.json"
    results = json.load(open(path)) if os.path.exists(path) else {}
    for qadd in (True, False):
        net = build(qadd)
        nq = sum(1 for l in net.graph.layers
                 if l.op == "add" and "qadd" in l.kwargs)
        for batch in BATCHES:
            name = f"{'qadd' if qadd else 'noqadd'}_b{batch}"
            dt = step_time(net, batch)
            log(f"{name:<12} step {dt*1e3:7.3f} ms  {batch/dt:8.0f} img/s"
                f"  (qadd layers: {nq})")
            results[name] = {"step_ms": dt * 1e3, "img_s": batch / dt}
            with open(path, "w") as f:
                json.dump(results, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
