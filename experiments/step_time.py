"""Minimal b64 step timer on the EXACT bench.py build path (net.program,
astype_compute bf16) — for cross-checking bench/profile discrepancies.

Usage: python experiments/step_time.py [batch] [reps]
"""
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"backend: {jax.default_backend()}")
    net = models.resnet18()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(4, (3, 224, 224), seed=11,
                                                  batch=2))
    net.quantize("int8", activations="static")
    net.astype_compute("bfloat16")
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
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = loop(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out[0, 0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(10)
    for trial in range(3):
        a, b = t(10), t(1010)
        dt = max((b - a) / 1000, 1e-9)
        log(f"trial {trial}: step {dt*1e3:7.3f} ms  {BATCH/dt:8.0f} img/s"
            f"  [t10={a*1e3:.1f}ms t110={b*1e3:.1f}ms]")


if __name__ == "__main__":
    main()
