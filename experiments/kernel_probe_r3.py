"""Round-3 stage64 kernel design probe (real TPU).

Times isolated Pallas kernel variants at batch 64 with the on-device
fori_loop difference-quotient method (bench.py) to answer, empirically:

  1. Is the M=64 MXU padding penalty real?     (dot_m64 vs dot_m128/m256)
  2. per-tap K=64 dots vs staged K=576 dot?    (dot_k64x9 vs dot_m64)
  3. What do the 9 _build_B staging copies cost? (staged_dot vs dot_m64)
  4. Do lane-offset B slices cost extra vs aligned scratch reads?
     (pertap_dot vs dot_k64x9)
  5. int8 vs bf16 MXU rate on this shape        (dot_m64 vs dot_m64_bf16)
  6. Full current block kernel vs per-tap rewrite (staged_full/pertap_full)

Writes experiments/kernel_probe_r3.json.
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

R, RS, S, HALO, BUF = st.R, st.RS, st.S, st.HALO, st.BUF
N = 4 if INTERP else 64  # batch

# local copies of round-2 kernel helpers (the library kernel was rewritten
# after this probe's data informed the redesign; keep the probe runnable)
if not hasattr(st, "_BLOCK_TAPS"):
    st._BLOCK_TAPS = [(dy - 1) * RS + (dx - 1)
                      for dy in range(3) for dx in range(3)]
if not hasattr(st, "_colmask"):
    def _colmask(rows, dtype=jnp.float32):
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, S), 1)
        return (lane % RS < R).astype(dtype)
    st._colmask = _colmask


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- variants

def _store_small(o_ref, acc):
    o_ref[0] = acc[:, :128].astype(jnp.int32)


def k_copy_only(x_ref, A_ref, o_ref):
    o_ref[0] = x_ref[0][:, :128].astype(jnp.int32)


def k_dot_mX(x_ref, A_ref, o_ref, B_ref):
    """Stage B once (step 0), then pure dot + small store per step."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        st._build_B(B_ref, x_ref[0], HALO, st._BLOCK_TAPS, 64)
    acc = jnp.dot(A_ref[...], B_ref[...], preferred_element_type=jnp.int32)
    _store_small(o_ref, acc)


def k_dot_bf16(x_ref, A_ref, o_ref, B_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for t, off in enumerate(st._BLOCK_TAPS):
            B_ref[t * 64:(t + 1) * 64, :] = (
                x_ref[0][:, HALO + off:HALO + off + S].astype(jnp.bfloat16))
    acc = jnp.dot(A_ref[...], B_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = acc[:, :128].astype(jnp.int32)


def k_dot_k64x9(x_ref, A_ref, o_ref, B_ref):
    """9 K=64 dots from ALIGNED pre-staged scratch (no lane-offset reads)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        st._build_B(B_ref, x_ref[0], HALO, st._BLOCK_TAPS, 64)
    acc = jnp.dot(A_ref[:, 0:64], B_ref[0:64, :],
                  preferred_element_type=jnp.int32)
    for t in range(1, 9):
        acc = acc + jnp.dot(A_ref[:, t * 64:(t + 1) * 64],
                            B_ref[t * 64:(t + 1) * 64, :],
                            preferred_element_type=jnp.int32)
    _store_small(o_ref, acc)


def k_staged_dot(x_ref, A_ref, o_ref, B_ref):
    """build_B every step + dot: staging cost = this minus dot_m64."""
    st._build_B(B_ref, x_ref[0], HALO, st._BLOCK_TAPS, 64)
    acc = jnp.dot(A_ref[...], B_ref[...], preferred_element_type=jnp.int32)
    _store_small(o_ref, acc)


def k_pertap_dot(x_ref, A_ref, o_ref):
    """9 K=64 dots with lane-offset B slices straight from the input."""
    x = x_ref[0]
    acc = None
    for t, off in enumerate(st._BLOCK_TAPS):
        d = jnp.dot(A_ref[:, t * 64:(t + 1) * 64],
                    x[:, HALO + off:HALO + off + S],
                    preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    _store_small(o_ref, acc)


def k_pertap_full(x_ref, A1_ref, f1_ref, b1_ref, A2_ref, f2_ref, b2_ref,
                  o_ref, y1_ref, *, inv_mid, sx_in, inv_out):
    """Full block (conv1+relu+rq+conv2+res+relu+rq), per-tap dots."""
    x = x_ref[0]
    mask = st._colmask(64)

    def conv(A_ref, src, base):
        acc = None
        for t, off in enumerate(st._BLOCK_TAPS):
            d = jnp.dot(A_ref[:, t * 64:(t + 1) * 64],
                        src[:, base + off:base + off + S],
                        preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        return acc

    acc = conv(A1_ref, x, HALO)
    v = jnp.maximum(acc.astype(jnp.float32) * f1_ref[...] + b1_ref[...], 0.0)
    q = jnp.clip(jnp.round(v * inv_mid), -127, 127) * mask
    zero = jnp.zeros((64, HALO), jnp.int8)
    y1_ref[:, :HALO] = zero
    y1_ref[:, HALO:HALO + S] = q.astype(jnp.int8)
    y1_ref[:, HALO + S:] = zero
    acc2 = conv(A2_ref, y1_ref[...], HALO)
    z = (acc2.astype(jnp.float32) * f2_ref[...] + b2_ref[...]
         + x[:, HALO:HALO + S].astype(jnp.float32) * sx_in)
    z = jnp.maximum(z, 0.0)
    out = (jnp.clip(jnp.round(z * inv_out), -127, 127) * mask).astype(jnp.int8)
    o_ref[0, :, :HALO] = zero
    o_ref[0, :, HALO:HALO + S] = out
    o_ref[0, :, HALO + S:] = zero


# ------------------------------------------------------------- call helpers

def xspec():
    return pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0))


def call_probe(kernel, x, A, scratch=None, m=64, grid=None):
    grid = grid or x.shape[0]
    specs = [xspec(), pl.BlockSpec((m, 576), lambda n: (0, 0))]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, m, 128), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, m, 128), jnp.int32),
        scratch_shapes=scratch or [],
        interpret=INTERP,
    )(x, A)


def call_full_pertap(x, A1, f1, b1, A2, f2, b2):
    wspec = pl.BlockSpec((64, 576), lambda n: (0, 0))
    sspec = pl.BlockSpec((64, 1), lambda n: (0, 0))
    return pl.pallas_call(
        partial(k_pertap_full, inv_mid=0.21, sx_in=0.04, inv_out=0.19),
        grid=(x.shape[0],),
        in_specs=[xspec(), wspec, sspec, sspec, wspec, sspec, sspec],
        out_specs=pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 64, BUF), jnp.int8),
        scratch_shapes=[pltpu.VMEM((64, BUF), jnp.int8)],
        interpret=INTERP,
    )(x, A1, f1, b1, A2, f2, b2)


# ------------------------------------------------------------------ timing

def timed_loop(fn, args, n1=20, n2=220, reps=4):
    if INTERP:
        n1, n2, reps = 1, 2, 1
    """fn(*args) -> array; data-dependence chained via int8 xor on arg0."""
    @jax.jit
    def loop(x, rest, n):
        def step(i, x):
            out = fn(x, *rest)
            bit = (jnp.sum(out[0].astype(jnp.int32)) & 1).astype(jnp.int8)
            return x ^ bit
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

    t0 = time.perf_counter()
    t(n1)   # compile
    compile_s = time.perf_counter() - t0
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9), compile_s


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-80, 80, (N, 64, BUF), dtype=np.int8))
    A64 = jnp.asarray(rng.integers(-90, 90, (64, 576), dtype=np.int8))
    A128 = jnp.asarray(rng.integers(-90, 90, (128, 576), dtype=np.int8))
    A256 = jnp.asarray(rng.integers(-90, 90, (256, 576), dtype=np.int8))
    A64b = (A64.astype(jnp.bfloat16) * 0.01)
    f = jnp.full((64, 1), 0.02, jnp.float32)
    b = jnp.zeros((64, 1), jnp.float32)

    Bq = lambda: [pltpu.VMEM((576, S), jnp.int8)]
    Bb = lambda: [pltpu.VMEM((576, S), jnp.bfloat16)]

    probes = {
        "copy_only": lambda x_: call_probe(k_copy_only, x_, A64),
        "dot_m64": lambda x_: call_probe(k_dot_mX, x_, A64, Bq()),
        "dot_m128": lambda x_: call_probe(k_dot_mX, x_, A128, Bq(), m=128),
        "dot_m256": lambda x_: call_probe(k_dot_mX, x_, A256, Bq(), m=256),
        "dot_m64_bf16": lambda x_: call_probe(k_dot_bf16, x_, A64b, Bb()),
        "dot_k64x9": lambda x_: call_probe(k_dot_k64x9, x_, A64, Bq()),
        "staged_dot": lambda x_: call_probe(k_staged_dot, x_, A64, Bq()),
        "pertap_dot": lambda x_: call_probe(k_pertap_dot, x_, A64),
        "pertap_full": lambda x_: call_full_pertap(x_, A64, f, b, A64, f, b),
    }
    if hasattr(st, "_call_block"):   # round-2 library kernel, since removed
        probes["staged_full"] = lambda x_: st._call_block(
            x_, A64, f, b, A64, f, b, 0.21, 0.04, 0.19, INTERP)

    results = {}
    if "staged_full" in probes:
        # numeric agreement: the per-tap rewrite must match the staged kernel
        ys = np.asarray(probes["staged_full"](x))
        yp = np.asarray(probes["pertap_full"](x))
        agree = float((ys == yp).mean())
        log(f"pertap_full vs staged_full exact-agreement: {agree:.6f}")
        results["pertap_vs_staged_agreement"] = agree
    for name, call in probes.items():
        try:
            dt, compile_s = timed_loop(call, (x,))
            per_img = dt / N * 1e6
            results[name] = {"pass_ms": dt * 1e3, "us_per_step": per_img}
            log(f"{name:<14} pass {dt*1e3:8.3f} ms   {per_img:7.3f} us/img  "
                f"(compile {compile_s:.0f}s)")
        except Exception as e:
            results[name] = {"error": str(e)[:500]}
            log(f"{name:<14} FAILED: {str(e)[:200]}")

    with open("experiments/kernel_probe_r3.json", "w") as fjs:
        json.dump(results, fjs, indent=1)
    log("wrote experiments/kernel_probe_r3.json")


if __name__ == "__main__":
    main()
