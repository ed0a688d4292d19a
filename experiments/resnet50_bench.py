"""ResNet-50 int8+bf16 on-device bench, A/B: Pallas 1x1 GEMM vs XLA conv."""
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

from planer_tpu import models  # noqa: E402
from planer_tpu.ops.pallas import gemm  # noqa: E402


def bench(net, batch, n1=10, n2=110):
    prog = net.program
    fn_, _ = prog._build_fn({}, [])
    params = prog.params

    @jax.jit
    def loop(x, n):
        def step(i, x):
            out = jax.tree.leaves(fn_(params, x))[0]
            return x + jnp.sum(out).astype(x.dtype) * 1e-30
        return lax.fori_loop(0, n, step, x)

    x = jnp.zeros((batch, 3, 224, 224), jnp.float32)

    def t(n, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = time.perf_counter()
    t(n1, reps=1)
    print(f"  compile+warm {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)
    return max((t(n2) - t(n1)) / (n2 - n1), 1e-9)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    for use_pallas in (False,):
        if not use_pallas:
            gemm._tile_plan_orig = gemm._tile_plan
            gemm._tile_plan = lambda *a: None   # force XLA path for 1x1/dense
        net = models.resnet50()
        net.optimize()
        net.quantize("int8", activations="dynamic")
        net.astype_compute("bfloat16")
        dt = bench(net, batch)
        tag = "pallas 1x1" if use_pallas else "xla only  "
        print(f"resnet50 int8+bf16 b{batch} [{tag}]: {dt*1e3:.3f} ms "
              f"({batch/dt:.1f} img/s)", flush=True)
        if not use_pallas:
            gemm._tile_plan = gemm._tile_plan_orig


if __name__ == "__main__":
    main()
