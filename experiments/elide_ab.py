"""A/B the r3 stage64-edge optimizations end-to-end on real TPU, ResNet-18:

  base      : stage64 fusion, bf16 out, staged stem dot (r3 baseline)
  elide     : + out_scale annotation (int8 codes out, consumers take the
              pre-quantized s8 path — optimize.annotate_stage_output_quant)
  elide+taps: + STEM="taps" (9 per-tap M=256 K=64 stem dots, no _build_B)

Usage: python experiments/elide_ab.py [batch ...]
Writes experiments/elide_ab.json (merging).
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
from planer_tpu.optimize import fuse_stage64
from planer_tpu.quant import calibrate_act_scales
from planer_tpu.models import eval as ev
from planer_tpu.ops.pallas import stage64 as st

BATCHES = [int(a) for a in sys.argv[1:]] or [64]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(elide):
    net = models.resnet18()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(4, (3, 224, 224), seed=11,
                                                  batch=2))
    if elide:
        net.quantize("int8", activations="static")   # auto-fuse + annotate
    else:
        net.quantize("int8", activations="static", fuse=False)
        fuse_stage64(net)
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
    a, b = t(10), t(110)
    return max((b - a) / 100, 1e-9)


def main():
    path = "experiments/elide_ab.json"
    results = json.load(open(path)) if os.path.exists(path) else {}
    for name, elide, stem in (("chain", True, "staged"),):
        st.STEM = stem
        net = build(elide)
        ann = [l.name for l in net.graph.layers
               if l.kwargs.get("out_scale")]
        log(f"{name}: annotated={ann}")
        for batch in BATCHES:
            t0 = time.perf_counter()
            dt = step_time(net, batch)
            key = f"{name}_b{batch}"
            log(f"{key:<20} step {dt*1e3:7.3f} ms  {batch/dt:8.0f} img/s "
                f"(total {time.perf_counter()-t0:.0f}s)")
            results[key] = {"step_ms": dt * 1e3, "img_s": batch / dt}
            with open(path, "w") as f:
                json.dump(results, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
