"""Round-5 stage64 kernel probes (real TPU): where the edge time hides.

VERDICT r4: the stage64 edge runs 19.5 us/img vs a ~5.9 roofline share and
is 69% of the step; the named untested avenues are (a) overlapping the
prologue/unpad glue and staging with MXU compute, and (c) requantizing in
the MXU's shadow by splitting epilogue planes across the next conv's dot
issue.  These probes establish, with exact-agreement gates:

  1. mstem256: forced-full-compute M=256 K=576 dot from a staged B — the
     stem dot's achievable int8 rate at FULL M (the r4 kgran curve was all
     M=64, which wastes half the MXU's 128 rows; kgran576 measured
     215 TF/s = 55% of the 394 TOPS s8 peak).
  2. block_dotmin / block_vpumin: the library tri/fxp block with the VPU
     epilogues reduced to a cast (dotmin) vs the dots replaced by a cheap
     slice-cast (vpumin) — the in-situ MXU/VPU split and how much Mosaic
     already overlaps (full - dotmin - vpumin = overlap deficit).
  3. block_halfpipe: tri/fxp with epilogues SPLIT per column half and
     emitted between the next conv's dot issues (avenue c literally): conv2
     cols [0, S/2-128) depend only on y1's first half, so epi1's second
     half can run in the MXU's shadow.
  4. lastblock_dense vs lastblock_unpad: the last block storing a dense
     (64, R, R) output from the kernel vs the current padded store + XLA
     unpad pass (the 1.9 us/img glue item) — measured INCLUDING the XLA
     consumer slice so the comparison is end-to-end-equivalent.

Usage: python experiments/kernel_probe_r5.py [names...]
PROBE_INTERP=1 runs correctness gates on CPU interpret mode only.
Writes/merges experiments/kernel_probe_r5.json.
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

G = st._geometry(224)
R, RS, S, BUF, SBUF, HALO = G.R, G.RS, G.S, G.BUF, G.SBUF, st.HALO
N = 2 if INTERP else 64
SA = S // 2                      # column split point (128-aligned)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------- stem M=256 dot

def k_mstem(x_ref, A_ref, o_ref, B_ref):
    """Staged K=576 B + ONE M=256 dot, forced full compute."""
    stem_taps = [tr * RS + tc for tr in range(3) for tc in range(3)]
    st._build_B(B_ref, x_ref[0], 0, stem_taps, 64, S)
    acc = jnp.dot(A_ref[...], B_ref[...], preferred_element_type=jnp.int32)
    red = acc[:, 0:128]
    for j in range(1, S // 128):
        red = red + acc[:, j * 128:(j + 1) * 128]
    o_ref[0] = red


def call_mstem(x64, A):
    return pl.pallas_call(
        k_mstem,
        grid=(x64.shape[0],),
        in_specs=[pl.BlockSpec((1, 64, SBUF), lambda n: (n, 0, 0)),
                  pl.BlockSpec((256, 576), lambda n: (0, 0))],
        out_specs=pl.BlockSpec((1, 256, 128), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x64.shape[0], 256, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((576, S), jnp.int8)],
        interpret=INTERP,
    )(x64, A)


# ------------------------------------------------- parameterized tri block
#
# mode:
#   "lib"      — emission order of the library kernel (dup, a1, epi1, a2,
#                epi2), reimplemented here so dotmin/vpumin/halfpipe are
#                measured against an identical baseline
#   "dotmin"   — epilogues reduced to (acc >> 7) cast int8 (keeps stores)
#   "vpumin"   — dots replaced by a slice-cast of the input (keeps epis)
#   "halfpipe" — column-split epilogues interleaved with the next dots
# last: bf16 padded out (f32 epilogue) when True, else int8 padded out
# dense: (64, R, R) out stores (last=True only)

def _tri_cols(A_ref, src_ref, c0, c1):
    acc = None
    for dy in range(3):
        o = HALO + (dy - 1) * RS - 1
        d = jnp.dot(A_ref[:, dy * 192:(dy + 1) * 192],
                    src_ref[0:192, o + c0:o + c1],
                    preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    return acc


def k_block5(mask_ref, x_ref, A1_ref, q1_ref, A2_ref, q2f_ref, q2b_ref,
             o_ref, xd_ref, y1_ref, *, mode, last, dense, sx):
    def mslice(c0, c1):
        # ref-load the mask slice: value-slicing the loaded (1, S) mask at
        # a lane offset miscompiles the broadcast ("Invalid input layout")
        return mask_ref[:, c0:c1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        zero = jnp.zeros((192, HALO), jnp.int8)
        y1_ref[:, :HALO] = zero
        y1_ref[:, HALO + S:] = zero
        y1_ref[:, HALO + S - 2:HALO + S] = jnp.zeros((192, 2), jnp.int8)
        xd_ref[:, HALO + S:] = zero

    def dup(dst, src):
        dst[0:64, :] = src
        dst[64:128, 0:BUF - 1] = src[:, 1:BUF]
        dst[128:192, 0:BUF - 2] = src[:, 2:BUF]

    def store_mid_cols(q, c0):
        c1 = c0 + q.shape[1]
        y1_ref[0:64, HALO + c0:HALO + c1] = q
        y1_ref[64:128, HALO - 1 + c0:HALO - 1 + c1] = q
        y1_ref[128:192, HALO - 2 + c0:HALO - 2 + c1] = q

    def epi1(acc, c0, c1):
        if mode == "dotmin":
            return (jnp.minimum(jnp.maximum(acc >> 7, 0), 127)
                    .astype(jnp.int8) & mslice(c0, c1))
        return st._fxp_q(acc, q1_ref, mslice(c0, c1))

    def epi2(acc, res8, c0, c1):
        if mode == "dotmin":
            return (jnp.minimum(jnp.maximum(acc >> 7, 0), 127)
                    .astype(jnp.int8) & mslice(c0, c1))
        if last:
            v2 = (acc.astype(jnp.float32) * q2f_ref[...] + q2b_ref[...]
                  + res8.astype(jnp.float32) * sx)
            return jnp.where(mslice(c0, c1) != 0, jnp.maximum(v2, 0.0), 0.0
                             ).astype(o_ref.dtype)
        return st._fxp_q(acc, q2f_ref, mslice(c0, c1), res=res8)

    def conv(A_ref, src_ref, c0, c1):
        if mode == "vpumin":
            # stand-in for the dots: one cheap widened slice (the probe
            # measures the VPU/stores path, not this)
            return src_ref[0:64, HALO + c0:HALO + c1].astype(jnp.int32) * 7
        return _tri_cols(A_ref, src_ref, c0, c1)

    def store_out(v, c0):
        c1 = c0 + v.shape[1]
        if dense:
            # dense (64, R*R) stores — identical memory to NCHW
            # (64, R, R), so the XLA-side reshape is a free bitcast;
            # a 4-D block would need an unsupported (64,56)->(1,64,1,56)
            # shape cast in the store
            r0, r1 = c0 // RS, (c1 + RS - 1) // RS
            for r in range(r0, min(r1, R)):
                o_ref[0, :, r * R:(r + 1) * R] = \
                    v[:, r * RS - c0:r * RS - c0 + R]
            return
        o_ref[0, :, HALO + c0:HALO + c1] = v

    dup(xd_ref, x_ref[0])
    if mode == "halfpipe":
        a1A = conv(A1_ref, xd_ref, 0, SA)
        a1B = conv(A1_ref, xd_ref, SA, S)
        store_mid_cols(epi1(a1A, 0, SA), 0)
        # conv2 cols [0, SA-128) read y1 lanes < SA - 128 + RS + 2 < SA:
        # only the stored first half — epi1's second half is independent
        # and can run in these dots' shadow
        a2A = conv(A2_ref, y1_ref, 0, SA - 128)
        store_mid_cols(epi1(a1B, SA, S), SA)
        a2B = conv(A2_ref, y1_ref, SA - 128, S)
        resA = x_ref[0][:, HALO:HALO + SA - 128]
        store_out(epi2(a2A, resA, 0, SA - 128), 0)
        resB = x_ref[0][:, HALO + SA - 128:HALO + S]
        store_out(epi2(a2B, resB, SA - 128, S), SA - 128)
    else:
        a1 = conv(A1_ref, xd_ref, 0, S)
        store_mid_cols(epi1(a1, 0, S), 0)
        a2 = conv(A2_ref, y1_ref, 0, S)
        res8 = x_ref[0][:, HALO:HALO + S]
        store_out(epi2(a2, res8, 0, S), 0)
    if not (last and dense):
        zero = jnp.zeros((64, HALO), o_ref.dtype)
        o_ref[0, :, :HALO] = zero
        o_ref[0, :, HALO + S:] = zero


def call_block5(x, mask, W1, E1, W2, E2f, E2b, mode="lib", last=False,
                dense=False, sx=0.21):
    A1, = st._pack_block_tri(jnp.asarray(W1))
    A2, = st._pack_block_tri(jnp.asarray(W2))
    n = x.shape[0]
    const = lambda a: pl.BlockSpec(tuple(a.shape), lambda i: (0,) * a.ndim)
    if dense:
        out_spec = pl.BlockSpec((1, 64, R * R), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((n, 64, R * R), jnp.bfloat16)
    else:
        out_spec = pl.BlockSpec((1, 64, BUF), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct(
            (n, 64, BUF), jnp.bfloat16 if last else jnp.int8)
    return pl.pallas_call(
        partial(k_block5, mode=mode, last=last, dense=dense, sx=sx),
        grid=(n,),
        in_specs=[const(mask), pl.BlockSpec((1, 64, BUF), lambda i: (i, 0, 0)),
                  const(A1), const(E1), const(A2), const(E2f), const(E2b)],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((192, BUF), jnp.int8),
                        pltpu.VMEM((192, BUF), jnp.int8)],
        interpret=INTERP,
    )(mask, x, A1, E1, A2, E2f, E2b)


# ------------------------------------------------------------------ timing

def timed_loop(fn, args, n1=20, n2=220, reps=4):
    if INTERP:
        n1, n2, reps = 1, 2, 1

    @jax.jit
    def loop(x, rest, n):
        def step(i, x):
            out = fn(x, *rest)
            bit = (jnp.sum(out.reshape(-1)[:128].astype(jnp.float32))
                   * 1e-30).astype(jnp.float32)
            return x + bit.astype(x.dtype)
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
    t(n1)
    compile_s = time.perf_counter() - t0
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9), compile_s


def main():
    want = set(sys.argv[1:])
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # realistic block input (zero halos, zero pad columns)
    x = rng.integers(-80, 80, (N, 64, BUF), dtype=np.int8)
    x[:, :, :HALO] = 0
    x[:, :, HALO + S:] = 0
    x[:, :, HALO:HALO + S] *= (np.arange(S) % RS < R)
    x = jnp.asarray(x)
    mask = st._colmask(G)

    W1 = rng.integers(-90, 90, (64, 64, 3, 3), dtype=np.int8)
    W2 = rng.integers(-90, 90, (64, 64, 3, 3), dtype=np.int8)
    f1 = jnp.asarray(0.002 + 0.001 * rng.random((64, 1)), jnp.float32)
    b1 = jnp.asarray(rng.random((64, 1)) + 0.5, jnp.float32)
    f2 = jnp.asarray(0.002 + 0.001 * rng.random((64, 1)), jnp.float32)
    b2 = jnp.asarray(rng.random((64, 1)) + 0.5, jnp.float32)
    sx = 0.21
    q1 = st._fxp_pack(f1, b1)
    q2 = st._fxp_pack(f2, b2, sx=sx)

    probes = {}

    # stem M=256 rate (vs r4 kgran576's M=64 215 TF/s)
    img = rng.standard_normal((N, 3, 224, 224)).astype(np.float32)
    x64 = st._stem_prologue(jnp.asarray(img), 0.02, G)
    Ws = rng.integers(-90, 90, (64, 3, 7, 7), dtype=np.int8)
    A_s = st._pack_stem_A(jnp.asarray(Ws))
    probes["mstem256"] = (lambda x_: call_mstem(x_, A_s), (x64,))

    # library-order baseline + component splits + halfpipe (interior block)
    for mode in ("lib", "dotmin", "vpumin", "halfpipe"):
        probes[f"block_{mode}"] = (
            lambda x_, m=mode: call_block5(x_, mask, W1, (q1,)[0], W2,
                                           (q2,)[0], b2, mode=m), (x,))

    # last block: padded store + XLA unpad vs dense in-kernel stores
    probes["lastblock_unpad"] = (
        lambda x_: st._unpad(call_block5(
            x_, mask, W1, q1, W2, f2, b2, mode="lib", last=True),
            jnp.bfloat16, G), (x,))
    probes["lastblock_dense"] = (
        lambda x_: call_block5(x_, mask, W1, q1, W2, f2, b2, mode="lib",
                               last=True, dense=True
                               ).reshape(x_.shape[0], 64, R, R), (x,))

    # ---- correctness gates (exact integer math -> exact agreement),
    # reduced on device (full outputs through the relay cost minutes)
    dev_agree = jax.jit(lambda a, b: jnp.mean((a == b).astype(jnp.float32)))
    results = {}

    lib_ref = st._call_block(x, mask, st._pack_A(jnp.asarray(W1), "tri"),
                             (q1,), st._pack_A(jnp.asarray(W2), "tri"),
                             (q2,), sx, G, False, INTERP,
                             True, ipr=1, pack="tri")
    if not want or {"block_lib", "block_halfpipe"} & want:
        for name in ("block_lib", "block_halfpipe"):
            agree = float(dev_agree(probes[name][0](x), lib_ref))
            results[f"{name}_agreement"] = agree
            log(f"{name} vs library tri/fxp agreement: {agree:.6f}")
            assert agree == 1.0, f"{name} mismatch"
    if not want or {"lastblock_unpad", "lastblock_dense"} & want:
        ref = st._unpad(st._call_block(
            x, mask, st._pack_A(jnp.asarray(W1), "tri"), (q1,),
            st._pack_A(jnp.asarray(W2), "tri"), (f2, b2), sx, G, True,
            INTERP, True, ipr=1, pack="tri"), jnp.bfloat16, G)
        for name in ("lastblock_unpad", "lastblock_dense"):
            got = probes[name][0](x)
            agree = float(dev_agree(got.astype(jnp.float32),
                                    ref.astype(jnp.float32)))
            results[f"{name}_agreement"] = agree
            log(f"{name} vs library last-block agreement: {agree:.6f}")
            assert agree == 1.0, f"{name} mismatch"

    if INTERP:
        log("interpret-mode gates passed")
        print(json.dumps(results))
        return

    for name, (fn, args) in probes.items():
        if want and name not in want:
            continue
        dt, cs = timed_loop(fn, args)
        us = dt / N * 1e6
        results[name] = us
        log(f"{name:<18} {us:7.3f} us/img   (compile {cs:.0f}s)")

    path = "experiments/kernel_probe_r5.json"
    data = json.load(open(path)) if os.path.exists(path) else {}
    data.update(results)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
