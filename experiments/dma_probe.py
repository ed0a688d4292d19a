"""Why is the split block kernel ~3.5-4 us/img when MXU+VPU+DMA each model
out to ~1.3-1.7 us — and why do fxp epilogues and ipr interleaving not move
the E2E number?  Isolates, on real TPU at batch 64 (fori_loop timing):

  1. the pure HBM->VMEM->HBM stream cost of a (64, BUF) int8 block
     (copy_small / copy_full), its scaling with images-per-step
     (copy_full_ipr4), and whether PARALLEL grid semantics unlock double
     buffering (copy_full_par);
  2. the 2-conv per-tap dot chain without real epilogues (dots_only);
  3. the library block kernel (full_fxp) and a variant with per-step halo
     zeroing + PARALLEL semantics (full_fxp_par — the step-0-init scratch
     pattern forces ARBITRARY, maybe serializing the pipeline).

Writes experiments/dma_probe.json.
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
S, BUF, HALO = g.S, g.BUF, st.HALO
N = 4 if INTERP else 64
TAPS = [(dy - 1) * g.RS + (dx - 1) for dy in range(3) for dx in range(3)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def k_copy_small(x_ref, o_ref):
    o_ref[0] = x_ref[0][:, :128].astype(jnp.int32)


def k_copy_full(x_ref, o_ref, *, ipr=1):
    for p in range(ipr):
        o_ref[p] = x_ref[p]


def _conv(A_ref, src):
    acc = None
    for t, off in enumerate(TAPS):
        d = jnp.dot(A_ref[:, t * 64:(t + 1) * 64],
                    src[:, HALO + off:HALO + off + S],
                    preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    return acc


def k_dots_only(x_ref, A1, A2, o_ref, y1_ref):
    """2 per-tap convs, 1-op pseudo epilogues: isolates MXU + stream."""
    a1 = _conv(A1, x_ref[0])
    y1_ref[:, HALO:HALO + S] = (a1 & 127).astype(jnp.int8)
    a2 = _conv(A2, y1_ref)
    o_ref[0, :, HALO:HALO + S] = (a2 & 127).astype(jnp.int8)


def k_full_fxp_par(mask_ref, x_ref, A1, q1, A2, q2, o_ref, y1_ref):
    """Library fxp block but: halos zeroed EVERY step (no step-0 init, no
    cross-step scratch dependency) so the grid can be declared PARALLEL."""
    m8 = mask_ref[...]
    zero = jnp.zeros((64, HALO), jnp.int8)
    y1_ref[:, :HALO] = zero
    y1_ref[:, HALO + S:] = zero
    a1 = _conv(A1, x_ref[0])
    y1_ref[:, HALO:HALO + S] = st._fxp_q(a1, q1, m8)
    a2 = _conv(A2, y1_ref)
    res8 = x_ref[0][:, HALO:HALO + S]
    o_ref[0, :, :HALO] = zero
    o_ref[0, :, HALO + S:] = zero
    o_ref[0, :, HALO:HALO + S] = st._fxp_q(a2, q2, m8, res=res8)


def timed(call, x, n1=20, n2=220, reps=4):
    if INTERP:
        n1, n2, reps = 1, 2, 1

    @jax.jit
    def loop(x, n):
        def step(i, x):
            out = call(x)
            bit = (jnp.sum(out[0, :1, :128].astype(jnp.int32)) & 1
                   ).astype(jnp.int8)
            return x ^ bit
        return lax.fori_loop(0, n, step, x)

    def t(n):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(x, jnp.int32(n))
            out.block_until_ready()
            float(np.asarray(out[(0,) * out.ndim]))
            best = min(best, time.perf_counter() - t0)
        return best

    t(n1)
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9)


def main():
    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-80, 80, (N, 64, BUF), dtype=np.int8))
    A = jnp.asarray(rng.integers(-90, 90, (64, 576), dtype=np.int8))
    mask = st._colmask(g)
    f = np.full((64, 1), 1.3e-4, np.float32)
    b = np.full((64, 1), 0.7, np.float32)
    q1 = st._fxp_pack(f, b)
    q2 = st._fxp_pack(f, b, sx=0.04)

    xspec = lambda ipr: pl.BlockSpec((ipr, 64, BUF), lambda n: (n, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda n: (0,) * len(shape))
    cp = lambda par: pltpu.CompilerParams(
        dimension_semantics=[pltpu.PARALLEL if par else pltpu.ARBITRARY])

    def copy_small(x_):
        return pl.pallas_call(
            k_copy_small, grid=(N,), in_specs=[xspec(1)],
            out_specs=pl.BlockSpec((1, 64, 128), lambda n: (n, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, 64, 128), jnp.int32),
            interpret=INTERP)(x_)

    def copy_full(x_, ipr=1, par=False):
        return pl.pallas_call(
            partial(k_copy_full, ipr=ipr), grid=(N // ipr,),
            in_specs=[xspec(ipr)], out_specs=xspec(ipr),
            out_shape=jax.ShapeDtypeStruct((N, 64, BUF), jnp.int8),
            compiler_params=cp(par),
            interpret=INTERP)(x_)

    def dots_only(x_):
        return pl.pallas_call(
            k_dots_only, grid=(N,),
            in_specs=[xspec(1), const((64, 576)), const((64, 576))],
            out_specs=xspec(1),
            out_shape=jax.ShapeDtypeStruct((N, 64, BUF), jnp.int8),
            scratch_shapes=[pltpu.VMEM((64, BUF), jnp.int8)],
            interpret=INTERP)(x_, A, A)

    def full_fxp(x_):
        return st._call_block(x_, mask, A, (q1,), A, (q2,), 0.04, g,
                              False, INTERP, True, ipr=1)

    def full_fxp_par(x_, par=True):
        return pl.pallas_call(
            k_full_fxp_par, grid=(N,),
            in_specs=[const((1, g.S)), xspec(1), const((64, 576)),
                      const((64, 4)), const((64, 576)), const((64, 4))],
            out_specs=xspec(1),
            out_shape=jax.ShapeDtypeStruct((N, 64, BUF), jnp.int8),
            scratch_shapes=[pltpu.VMEM((64, BUF), jnp.int8)],
            compiler_params=cp(par),
            interpret=INTERP)(mask, x_, A, q1, A, q2)

    probes = {
        "copy_small": copy_small,
        "copy_full": copy_full,
        "copy_full_par": partial(copy_full, par=True),
        "copy_full_ipr4": partial(copy_full, ipr=4),
        "dots_only": dots_only,
        "full_fxp": full_fxp,
        "full_fxp_par": full_fxp_par,
        "full_fxp_arb_zero": partial(full_fxp_par, par=False),
    }
    results = {}
    for name, call in probes.items():
        try:
            dt = timed(call, x)
            per = dt / N * 1e6
            results[name] = {"pass_ms": dt * 1e3, "us_per_img": per}
            log(f"{name:<18} {dt*1e3:8.3f} ms  {per:7.3f} us/img")
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            log(f"{name:<18} FAILED: {str(e)[:200]}")

    with open("experiments/dma_probe.json", "w") as fjs:
        json.dump(results, fjs, indent=1)
    log("wrote experiments/dma_probe.json")


if __name__ == "__main__":
    main()
