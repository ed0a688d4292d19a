"""Isolate where the whole-stage v2 kernel spends time on real TPU.

Times _call_stage at batch 64 for: ipr 1 vs 2, nblocks 1 vs 2 (difference =
per-block cost; extrapolated stem = full - nblocks*block).  Writes
experiments/stage_v2_probe.json.
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

from planer_tpu.ops.pallas import stage64 as st

INTERP = bool(int(os.environ.get("PROBE_INTERP", "0")))
if INTERP:
    jax.config.update("jax_platforms", "cpu")

N = 4 if INTERP else 64
g = st._geometry(224)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_args(rng, nblocks):
    x64 = jnp.asarray(rng.integers(-80, 80, (N, 64, g.SBUF), dtype=np.int8))
    mask = st._colmask(g)
    A_s = jnp.asarray(rng.integers(-90, 90, (256, 576), dtype=np.int8))
    f_s = jnp.full((64, 1), 0.001, jnp.float32)
    b_s = jnp.zeros((64, 1), jnp.float32)
    bw, sxs = [], []
    for b in range(nblocks):
        A = jnp.asarray(rng.integers(-90, 90, (64, 576), dtype=np.int8))
        f = jnp.full((64, 1), 0.002, jnp.float32)
        bb = jnp.zeros((64, 1), jnp.float32)
        bw += [A, f, bb, A, f, bb]
        sxs.append(0.5)
    return x64, mask, A_s, f_s, b_s, bw, tuple(sxs)


def timed_loop(fn, x, n1=20, n2=220, reps=4):
    if INTERP:
        n1, n2, reps = 1, 2, 1

    @jax.jit
    def loop(x, n):
        def step(i, x):
            out = fn(x)
            bit = (jnp.sum(out[0, 0, st.HALO:st.HALO + 128]
                           .astype(jnp.float32)) % 2).astype(jnp.int8)
            return x ^ bit
        return lax.fori_loop(0, n, step, x)

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out[0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = time.perf_counter()
    t(n1)
    compile_s = time.perf_counter() - t0
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9), compile_s


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    results = {}
    for nblocks in (1, 2):
        x64, mask, A_s, f_s, b_s, bw, sxs = make_args(rng, nblocks)
        for ipr in (1, 2):
            name = f"stage_b{nblocks}_ipr{ipr}"
            try:
                call = lambda x_: st._call_stage(
                    x_, mask, A_s, f_s, b_s, bw, sxs, g, nblocks, ipr,
                    INTERP)
                dt, cs = timed_loop(call, x64)
                per = dt / N * 1e6
                results[name] = {"pass_ms": dt * 1e3, "us_per_img": per}
                log(f"{name:<18} {dt*1e3:8.3f} ms  {per:7.3f} us/img "
                    f"(compile {cs:.0f}s)")
            except Exception as e:
                results[name] = {"error": str(e)[:400]}
                log(f"{name:<18} FAILED: {str(e)[:200]}")
    for ipr in (1, 2):
        a = results.get(f"stage_b1_ipr{ipr}", {}).get("us_per_img")
        b = results.get(f"stage_b2_ipr{ipr}", {}).get("us_per_img")
        if a and b:
            blk = b - a
            log(f"ipr{ipr}: per-block {blk:.2f} us, stem+pool "
                f"{a - blk:.2f} us")
            results[f"derived_ipr{ipr}"] = {"block_us": blk,
                                            "stem_us": a - blk}
    with open("experiments/stage_v2_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    log("wrote experiments/stage_v2_probe.json")


if __name__ == "__main__":
    main()
