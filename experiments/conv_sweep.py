"""Per-layer conv timing sweep on the real TPU: where does the ResNet-18
step time go?  Times each distinct conv shape with the on-device fori_loop
difference-quotient method (same as bench.py) and prints a roofline table.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

PEAK = 197e12

# (name, Cin, Cout, k, stride, H, count_in_resnet18)
LAYERS = [
    ("stem 7x7/2", 3, 64, 7, 2, 224, 1),
    ("l1 3x3", 64, 64, 3, 1, 56, 4),
    ("l2 down 3x3/2", 64, 128, 3, 2, 56, 1),
    ("l2 3x3", 128, 128, 3, 1, 28, 3),
    ("l2 1x1/2", 64, 128, 1, 2, 56, 1),
    ("l3 down 3x3/2", 128, 256, 3, 2, 28, 1),
    ("l3 3x3", 256, 256, 3, 1, 14, 3),
    ("l3 1x1/2", 128, 256, 1, 2, 28, 1),
    ("l4 down 3x3/2", 256, 512, 3, 2, 14, 1),
    ("l4 3x3", 512, 512, 3, 1, 7, 3),
    ("l4 1x1/2", 256, 512, 1, 2, 14, 1),
]

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DTYPE = jnp.bfloat16


def time_loop(f, x, n1=10, n2=210, reps=3):
    @jax.jit
    def loop(x, n):
        def step(i, x):
            y = f(x)
            return x + jnp.sum(y).astype(x.dtype) * 1e-30
        return lax.fori_loop(0, n, step, x)

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(n1)  # compile+warm
    return max((t(n2) - t(n1)) / (n2 - n1), 1e-9)


def main():
    total = 0.0
    print(f"batch={BATCH} dtype={DTYPE.__name__}", file=sys.stderr)
    print(f"{'layer':<16}{'ms':>9}{'GFLOP':>9}{'TF/s':>8}{'MXU%':>7}{'xN':>4}")
    for name, ci, co, k, s, h, cnt in LAYERS:
        pad = k // 2
        x = jnp.zeros((BATCH, ci, h, h), DTYPE)
        w = jnp.zeros((co, ci, k, k), DTYPE)

        def f(x, w=w, s=s, pad=pad):
            return lax.conv_general_dilated(
                x, w, (s, s), ((pad, pad), (pad, pad)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32).astype(DTYPE)

        dt = time_loop(f, x)
        ho = h // s
        fl = 2 * BATCH * co * ci * k * k * ho * ho
        tf = fl / dt / 1e12
        print(f"{name:<16}{dt*1e3:>9.3f}{fl/1e9:>9.2f}{tf:>8.1f}"
              f"{100*tf/ (PEAK/1e12):>6.1f}%{cnt:>4}")
        total += dt * cnt
    print(f"sum of conv steps: {total*1e3:.3f} ms "
          f"(bench measured full net ~3.4ms at batch 64)")


if __name__ == "__main__":
    main()
