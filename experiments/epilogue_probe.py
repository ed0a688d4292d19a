"""Isolate the conv-epilogue VPU cost on real TPU and test cheaper forms.

The block kernel is VPU-bound (kernel_probe_r3: ~80% epilogue).  Each
variant below processes the same (64, S) int32 accumulator -> int8 plane,
timed standalone at batch 64.  Questions:

  1. cost of the current 8-op f32 epilogue (convert/mul/add/clip2/round/
     mask-mul/convert)
  2. trunc-fold: +0.5 folded into bias, truncation instead of round,
     int8 bitwise mask — 6-7 ops
  3. int32 fixed-point: (acc * m) >> s, clamp, convert — no f32 at all
  4. raw elementwise throughput by dtype: are int8/int16 ops packed
     (2-4 elems/lane) or 1x like f32?

Writes experiments/epilogue_probe.json.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

INTERP = bool(int(os.environ.get("PROBE_INTERP", "0")))
if INTERP:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planer_tpu.ops.pallas import stage64 as st

g = st._geometry(224)
S = g.S
N = 4 if INTERP else 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ------------------------------------------------------------------ kernels

def k_epi_f32(x_ref, f_ref, b_ref, m_ref, o_ref):
    """Current v2 epilogue: 8 f32 ops."""
    acc = x_ref[0]
    m = m_ref[...]
    v = acc.astype(jnp.float32) * f_ref[...] + b_ref[...]
    q = jnp.round(jnp.clip(v, 0.0, 127.0)) * m
    o_ref[0] = q.astype(jnp.int8)


def k_epi_trunc(x_ref, f_ref, b_ref, m8_ref, o_ref):
    """trunc-fold: bias carries +0.5, truncation == round-half-up for v>=0,
    mask as int8 bitwise AND."""
    acc = x_ref[0]
    v = acc.astype(jnp.float32) * f_ref[...] + b_ref[...]   # b includes +.5
    v = jnp.clip(v, 0.0, 127.99)
    o_ref[0] = v.astype(jnp.int8) & m8_ref[...]


def k_epi_int(x_ref, mi_ref, bi_ref, m8_ref, o_ref):
    """int32 fixed-point: (acc * m) >> 15, +bias, clamp, trunc convert."""
    acc = x_ref[0]
    v = ((acc * mi_ref[...]) >> 15) + bi_ref[...]
    v = jnp.minimum(jnp.maximum(v, 0), 127)
    o_ref[0] = v.astype(jnp.int8) & m8_ref[...]


def k_epi_fxp_v(x_ref, mi_ref, bi_ref, s_ref, m8_ref, o_ref):
    """int32 fixed-point with PER-CHANNEL shift: clamp((acc*m + B) >> s).
    B pre-folded with (b + 0.5) * 2^s so the floor == round-half-up; the
    variable shift tests whether Mosaic's vector-shift costs like >>const."""
    acc = x_ref[0]
    v = (acc * mi_ref[...] + bi_ref[...]) >> s_ref[...]
    v = jnp.minimum(jnp.maximum(v, 0), 127)
    o_ref[0] = v.astype(jnp.int8) & m8_ref[...]


def k_epi_fxp_res(x_ref, r_ref, mi_ref, mr_ref, bi_ref, s_ref, m8_ref,
                  o_ref):
    """fixed-point epilogue with the residual add fused in the int domain:
    clamp((acc*m + res*mr + B) >> s) — the block conv2 plane."""
    acc = x_ref[0]
    res = r_ref[0].astype(jnp.int32)
    v = (acc * mi_ref[...] + res * mr_ref[...] + bi_ref[...]) >> s_ref[...]
    v = jnp.minimum(jnp.maximum(v, 0), 127)
    o_ref[0] = v.astype(jnp.int8) & m8_ref[...]


def k_ops_dtype(x_ref, o_ref, *, dt, nops_):
    """nops_ chained adds on a (64, S)-shaped buffer of dtype dt."""
    v = x_ref[0]
    for _ in range(nops_):
        v = v + v
    o_ref[0] = v


# ------------------------------------------------------------------- timing

def timed(fn, args, n1=20, n2=420, reps=4):
    if INTERP:
        n1, n2, reps = 1, 2, 1

    @jax.jit
    def loop(x, rest, n):
        def step(i, x):
            out = fn(x, *rest)
            bit = (jnp.sum(out[0, 0, :128].astype(jnp.int32)) & 1)
            return x ^ bit.astype(x.dtype)
        return lax.fori_loop(0, n, step, x)

    x, rest = args[0], list(args[1:])

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(x, rest, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out[(0,) * out.ndim]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(n1)
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9)


def call(kernel, x, extras, out_dtype):
    specs = [pl.BlockSpec((1,) + x.shape[1:], lambda n: (n, 0, 0))]
    specs += [pl.BlockSpec((1,) + e.shape[1:], lambda n: (n, 0, 0))
              if e.ndim == 3 else
              pl.BlockSpec(e.shape, lambda n: (0,) * e.ndim)
              for e in extras]
    return pl.pallas_call(
        kernel, grid=(x.shape[0],),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 64, S), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 64, S), out_dtype),
        interpret=INTERP,
    )(x, *extras)


def main():
    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(-2 ** 20, 2 ** 20, (N, 64, S),
                                   dtype=np.int32))
    f = jnp.full((64, 1), 1.3e-4, jnp.float32)
    b = jnp.full((64, 1), 0.7, jnp.float32)
    m = st._colmask(g)
    m8 = jnp.asarray((np.arange(S) % g.RS < g.R).reshape(1, S)
                     .astype(np.int8) * -1)         # 0xff at data cols
    mi = jnp.full((64, 1), 1311, jnp.int32)
    bi = jnp.full((64, 1), 1, jnp.int32)

    results = {}

    def run(name, fn, args, out_dtype=jnp.int8):
        try:
            dt = timed(lambda x, *r: call(fn, x, list(r), out_dtype), args)
            per = dt / N * 1e6
            results[name] = {"pass_ms": dt * 1e3, "us_per_img": per}
            log(f"{name:<22} {dt*1e3:8.3f} ms  {per:7.3f} us/img")
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            log(f"{name:<22} FAILED: {str(e)[:160]}")

    run("epi_f32", k_epi_f32, (acc, f, b, m))
    run("epi_trunc", k_epi_trunc, (acc, f, b + 0.5, m8))
    run("epi_int", k_epi_int, (acc, mi, bi, m8))
    sv = jnp.asarray(rng.integers(14, 21, (64, 1), dtype=np.int32))
    res8 = jnp.asarray(rng.integers(0, 127, (N, 64, S), dtype=np.int8))
    mr = jnp.full((64, 1), 97, jnp.int32)
    run("epi_fxp_vshift", k_epi_fxp_v, (acc, mi, bi, sv, m8))
    run("epi_fxp_res", k_epi_fxp_res, (acc, res8, mi, mr, bi, sv, m8))

    # dtype packing probe: 8 chained adds per dtype
    for dt_ in ("int8", "int16", "int32", "float32", "bfloat16"):
        d = jnp.dtype(dt_)
        x = jnp.asarray(rng.integers(0, 3, (N, 64, S)).astype(d)) \
            if d != jnp.bfloat16 else \
            jnp.asarray(rng.standard_normal((N, 64, S)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        run(f"adds8_{dt_}", partial(k_ops_dtype, dt=d, nops_=8), (x,),
            out_dtype=d)

    with open("experiments/epilogue_probe.json", "w") as fjs:
        json.dump(results, fjs, indent=1)
    log("wrote experiments/epilogue_probe.json")


if __name__ == "__main__":
    main()
