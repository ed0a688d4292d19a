"""A/B stage64->l2 code emission (optimize.ANNOTATE_MIN_CIN 1 vs 128)
end-to-end on the real TPU with the robust 1000-step quotient.  r3
measured IPR neutral on the pre-pack trunc kernels; tri+fxp moved the
MXU/VPU balance, so retry whether image-B dots overlap image-A epilogues.

Usage: python experiments/ipr_ab.py [batch ...]     (default: 64 1)
Writes/merges experiments/ipr_ab.json.
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
from planer_tpu.ops.pallas import stage64 as st
from planer_tpu.quant import calibrate_act_scales
from planer_tpu.models import eval as ev

BATCHES = [int(a) for a in sys.argv[1:]] or [64, 1]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(ipr):
    # IPR is read at TRACE time (first program call), not at graph build:
    # the flag must stay set through step_time (the r3 stagen measurement
    # bug was exactly this class) — main() sets/restores it around BOTH.
    net = models.resnet18()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(
        4, (3, 224, 224), seed=11, batch=2))
    net.quantize("int8", activations="static")
    net.astype_compute("bfloat16")
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
    path = "experiments/ipr_ab.json"
    results = json.load(open(path)) if os.path.exists(path) else {}
    old = st.IPR
    for ipr in (2, 1):
        st.IPR = ipr
        net = build(ipr)
        nq = st.IPR
        for batch in BATCHES:
            name = f"ipr{ipr}_b{batch}"
            dt = step_time(net, batch)
            log(f"{name:<12} step {dt*1e3:7.3f} ms  {batch/dt:8.0f} img/s"
                f"  (IPR set: {nq})")
            results[name] = {"step_ms": dt * 1e3, "img_s": batch / dt}
            with open(path, "w") as f:
                json.dump(results, f, indent=1)
    st.IPR = old
    log("wrote", path)


if __name__ == "__main__":
    main()
