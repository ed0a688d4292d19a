"""One-off UNet / YOLO-v3 on-device benchmarks (BASELINE.md configs)."""
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


def bench_net(net, x, n1=5, n2=55):
    prog = net.program
    fn_, _ = prog._build_fn({}, [])
    params = prog.params

    @jax.jit
    def loop(x, n):
        def step(i, x):
            out = jax.tree.leaves(fn_(params, x))[0]
            return x + jnp.sum(out).astype(x.dtype) * 1e-30
        return lax.fori_loop(0, n, step, x)

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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("unet", "all"):
        net = models.unet(in_ch=1, out_ch=1, base=32, depth=4)
        net.quantize("int8")
        net.astype_compute("bfloat16")
        x = jnp.zeros((1, 1, 512, 512), jnp.float32)
        dt = bench_net(net, x)
        print(f"UNet-512 int8+bf16 batch1: {dt*1e3:.2f} ms/img "
              f"({1/dt:.1f} img/s)")

    if which in ("yolo", "all"):
        net = models.yolov3()
        net.quantize("int8")
        net.astype_compute("bfloat16")
        x = jnp.zeros((8, 3, 416, 416), jnp.float32)
        dt = bench_net(net, x)
        print(f"YOLOv3-416 int8+bf16 batch8: {dt*1e3:.2f} ms/batch "
              f"({8/dt:.1f} img/s)")


if __name__ == "__main__":
    main()
