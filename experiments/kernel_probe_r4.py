"""Round-4 stage64 kernel probes (real TPU): contraction-lane packing.

VERDICT r3 attribution: block kernels ~4.65 us/img (2 convs) vs a 1.34 us
MXU-dense model, stem ~5 us with K=576 staged where only 147..243 tap
columns are live.  Hypothesis: the s8 MXU contracts K in 128-lane passes,
so 9 per-tap K=64 dots pay 2x and the stem's K=576 pays 576/256 = 2.25x
over a packed union.  These probes measure, with FORCED full compute
(lane-reduced stores — the r3 probe's acc[:, :128] stores let Mosaic slice
the dot, so its absolute numbers were optimistic):

  1. kgranK: one M=64 (K, S) dot from aligned scratch, K in {64..576}
     -> the MXU K-granularity curve.
  2. block_cur / block_pair / block_tri: the library block kernel vs
     tap-PAIR packing (dup-shifted (128, BUF) activations, 3 K=128 + 3
     K=64 dots) vs tap-TRIPLE packing ((192, BUF), 3 K=192 dots), trunc
     and fxp epilogues.  Exact int8 agreement asserted vs the library.
  3. stem_cur / stem_union: the library stem+pool (staged K=576) vs a
     packed union-B (243 live rows -> K=256) with (sy, sx, c) channel
     order.  Exact agreement via matching prologue/A packing.

Usage: python experiments/kernel_probe_r4.py [names...]
PROBE_INTERP=1 runs the correctness gates on CPU interpret mode only.
Writes/merges experiments/kernel_probe_r4.json.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _reduce_store(o_ref, acc):
    """Lane-tile sum: forces EVERY output column of the dot to be computed
    (a plain [:, :128] store lets Mosaic narrow the contraction)."""
    red = acc[:, 0:128]
    for j in range(1, S // 128):
        red = red + acc[:, j * 128:(j + 1) * 128]
    o_ref[0] = red


# ---------------------------------------------------------------- K granularity

def k_gran(x_ref, A_ref, o_ref, B_ref, *, K):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for t in range(K // 64):
            B_ref[t * 64:(t + 1) * 64, :] = x_ref[0][:, HALO + t:HALO + t + S]
    acc = jnp.dot(A_ref[...], B_ref[...], preferred_element_type=jnp.int32)
    _reduce_store(o_ref, acc)


def call_kgran(x, K, rng):
    A = jnp.asarray(rng.integers(-90, 90, (64, K), dtype=np.int8))
    return pl.pallas_call(
        partial(k_gran, K=K),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)),
                  pl.BlockSpec((64, K), lambda n: (0, 0))],
        out_specs=pl.BlockSpec((1, 64, 128), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 64, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((K, S), jnp.int8)],
        interpret=INTERP,
    )(x, A)


# ------------------------------------------------------------- paired blocks

def _dup2(dst_ref, src):
    """(64, BUF) -> (128, BUF) with bottom = top shifted left one lane."""
    dst_ref[0:64, :] = src
    dst_ref[64:128, 0:BUF - 1] = src[:, 1:BUF]


def _dup3(dst_ref, src):
    _dup2(dst_ref, src)
    dst_ref[128:192, 0:BUF - 2] = src[:, 2:BUF]


def _conv_pair(Ap_ref, As_ref, dup_ref):
    """3 K=128 pair dots + 3 K=64 single dots == the 9-tap 3x3 conv."""
    acc = None
    for dy in range(3):
        o = HALO + (dy - 1) * RS - 1
        d = jnp.dot(Ap_ref[:, dy * 128:(dy + 1) * 128],
                    dup_ref[:, o:o + S], preferred_element_type=jnp.int32)
        s = jnp.dot(As_ref[:, dy * 64:(dy + 1) * 64],
                    dup_ref[0:64, o + 2:o + 2 + S],
                    preferred_element_type=jnp.int32)
        d = d + s
        acc = d if acc is None else acc + d
    return acc


def _conv_tri(At_ref, dup_ref):
    """3 K=192 dots (taps dx=0,1,2 lane-packed via the triple-dup)."""
    acc = None
    for dy in range(3):
        o = HALO + (dy - 1) * RS - 1
        d = jnp.dot(At_ref[:, dy * 192:(dy + 1) * 192],
                    dup_ref[0:192, o:o + S], preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    return acc


def _pack_pair(w):
    """(64, 64, 3, 3) -> Ap (64, 384), As (64, 192)."""
    w = np.asarray(w)
    Ap = np.zeros((64, 384), np.int8)
    As = np.zeros((64, 192), np.int8)
    for dy in range(3):
        Ap[:, dy * 128:dy * 128 + 64] = w[:, :, dy, 0]
        Ap[:, dy * 128 + 64:dy * 128 + 128] = w[:, :, dy, 1]
        As[:, dy * 64:(dy + 1) * 64] = w[:, :, dy, 2]
    return jnp.asarray(Ap), jnp.asarray(As)


def _pack_tri(w):
    w = np.asarray(w)
    At = np.zeros((64, 576), np.int8)
    for dy in range(3):
        for dx in range(3):
            At[:, dy * 192 + dx * 64:dy * 192 + dx * 64 + 64] = w[:, :, dy, dx]
    return jnp.asarray(At)


def k_block_packed(*refs, pack, sx, fxp):
    """Library-_block_kernel semantics (interior block: int8 in -> int8 out,
    zeroed halos) with lane-packed dots."""
    mask_ref, x_ref = refs[0], refs[1]
    if pack == "pair":
        A1p, A1s = refs[2], refs[3]
        E1 = refs[4:5] if fxp else refs[4:6]
        i2 = 5 if fxp else 6
        A2p, A2s = refs[i2], refs[i2 + 1]
        E2 = refs[i2 + 2:i2 + 3] if fxp else refs[i2 + 2:i2 + 4]
        o_ref = refs[i2 + 3] if fxp else refs[i2 + 4]
        xd_ref, y1d_ref = refs[-2:]
        conv1 = lambda: _conv_pair(A1p, A1s, xd_ref)
        conv2 = lambda: _conv_pair(A2p, A2s, y1d_ref)
        dup = _dup2
    else:
        A1t = refs[2]
        E1 = refs[3:4] if fxp else refs[3:5]
        i2 = 4 if fxp else 5
        A2t = refs[i2]
        E2 = refs[i2 + 1:i2 + 2] if fxp else refs[i2 + 1:i2 + 3]
        o_ref = refs[i2 + 2] if fxp else refs[i2 + 3]
        xd_ref, y1d_ref = refs[-2:]
        conv1 = lambda: _conv_tri(A1t, xd_ref)
        conv2 = lambda: _conv_tri(A2t, y1d_ref)
        dup = _dup3

    rows = 128 if pack == "pair" else 192

    @pl.when(pl.program_id(0) == 0)
    def _init():
        zero = jnp.zeros((rows, HALO), jnp.int8)
        y1d_ref[:, :HALO] = zero
        y1d_ref[:, HALO + S:] = zero
        # the shifted per-step stores end before HALO+S-1: the dup rows'
        # last data lanes (= top halo zeros shifted left) need one-time zeros
        y1d_ref[:, HALO + S - 2:HALO + S] = jnp.zeros((rows, 2), jnp.int8)
        xd_ref[:, HALO + S:] = zero       # dup tail lanes past src width

    m8 = mask_ref[...]
    cond = m8 != 0
    dup(xd_ref, x_ref[0])

    a1 = conv1()
    if fxp:
        q1 = st._fxp_q(a1, E1[0], m8)
    else:
        v1 = a1.astype(jnp.float32) * E1[0][...] + E1[1][...]
        q1 = jnp.clip(v1, 0.0, 127.99).astype(jnp.int8) & m8
    y1d_ref[0:64, HALO:HALO + S] = q1
    y1d_ref[64:128, HALO - 1:HALO + S - 1] = q1
    if rows == 192:
        y1d_ref[128:192, HALO - 2:HALO + S - 2] = q1

    a2 = conv2()
    res8 = x_ref[0][:, HALO:HALO + S]
    zero = jnp.zeros((64, HALO), jnp.int8)
    o_ref[0, :, :HALO] = zero
    o_ref[0, :, HALO + S:] = zero
    if fxp:
        o_ref[0, :, HALO:HALO + S] = st._fxp_q(a2, E2[0], m8, res=res8)
    else:
        v2 = (a2.astype(jnp.float32) * E2[0][...] + E2[1][...]
              + res8.astype(jnp.float32) * sx)
        o_ref[0, :, HALO:HALO + S] = \
            jnp.clip(v2, 0.0, 127.99).astype(jnp.int8) & m8


def call_block_packed(y, mask, W1, E1, W2, E2, sx, pack, fxp):
    rows = 128 if pack == "pair" else 192
    const = lambda shape: pl.BlockSpec(shape, lambda n: (0,) * len(shape))
    espec = lambda es: [const(tuple(e.shape)) for e in es]
    if pack == "pair":
        A1p, A1s = _pack_pair(W1)
        A2p, A2s = _pack_pair(W2)
        wargs = [A1p, A1s, *E1, A2p, A2s, *E2]
        wspecs = [const((64, 384)), const((64, 192)), *espec(E1),
                  const((64, 384)), const((64, 192)), *espec(E2)]
    else:
        A1t, A2t = _pack_tri(W1), _pack_tri(W2)
        wargs = [A1t, *E1, A2t, *E2]
        wspecs = [const((64, 576)), *espec(E1), const((64, 576)), *espec(E2)]
    return pl.pallas_call(
        partial(k_block_packed, pack=pack, sx=sx, fxp=fxp),
        grid=(y.shape[0],),
        in_specs=[const((1, S)),
                  pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)), *wspecs],
        out_specs=pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((y.shape[0], 64, BUF), jnp.int8),
        scratch_shapes=[pltpu.VMEM((rows, BUF), jnp.int8),
                        pltpu.VMEM((rows, BUF), jnp.int8)],
        interpret=INTERP,
    )(mask, y, *wargs)


# ---------------------------------------------------------------- stem union

def _union_copies():
    """(dr, tc, nsx) copy list + source channel base for the union-B build."""
    out = []
    for dr in range(9):
        tr, sy = dr // 4, dr % 4
        for tc in range(3):
            dc0 = 4 * tc
            nsx = min(4, 9 - dc0)
            if nsx <= 0:
                continue
            out.append((dr, dc0, nsx, sy * 12, tr * RS + tc))
    return out


_UNION_COPIES = _union_copies()


def _pack_stem_A_union(wq):
    """(64, 3, 7, 7) int8 -> (256, 256): phase banks over the 243-row union
    B whose row (dr*9+dc)*3+c reads input-channel sy*12+sx*3+c at lane
    offset (dr//4)*RS + dc//4 ... (see _union_copies)."""
    wq = np.asarray(wq)
    A = np.zeros((4, 64, 256), np.int8)
    for py in range(2):
        for px in range(2):
            p = 2 * py + px
            for dr in range(9):
                dy = dr - 2 * py
                if not (0 <= dy < 7):
                    continue
                for dc in range(9):
                    dx = dc - 2 * px
                    if not (0 <= dx < 7):
                        continue
                    for c in range(3):
                        A[p, :, (dr * 9 + dc) * 3 + c] = wq[:, c, dy, dx]
    return jnp.asarray(A.reshape(256, 256))


def _stem_prologue_union(x, s_in):
    """Like st._stem_prologue but with (sy, sx, c) channel order."""
    n, H = x.shape[0], x.shape[-1]
    t = (H + 8) // 4
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127
                  ).astype(jnp.int8)
    xp = jnp.pad(xq, ((0, 0), (0, 0), (3, 5), (3, 5)))
    xp = xp.reshape(n, 3, t, 4, t, 4).transpose(0, 3, 5, 1, 2, 4)
    xp = xp.reshape(n, 48, t, t)
    xp = jnp.pad(xp, ((0, 0), (0, 16), (0, SBUF // RS - t), (0, RS - t)))
    return xp.reshape(n, 64, SBUF)


def k_stem_union(mask_ref, x_ref, A_ref, f_ref, b_ref, o_ref, B_ref, ph_ref):
    """Union-B stem + int32 maxpool + int8 requant (library epilogue)."""
    pool_shifts = ((0,), (0, -1), (0, -RS), (0, -1, -RS, -RS - 1))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        B_ref[243:256, :] = jnp.zeros((13, S), jnp.int8)
        ph_ref[:, :HALO] = jnp.full((64, HALO), st._NEG, jnp.int32)

    m8 = mask_ref[...]
    cond = m8 != 0
    for dr, dc0, nsx, cb, off in _UNION_COPIES:
        B_ref[(dr * 9 + dc0) * 3:(dr * 9 + dc0 + nsx) * 3, :] = \
            x_ref[0][cb:cb + 3 * nsx, off:off + S]
    acc = jnp.dot(A_ref[...], B_ref[...], preferred_element_type=jnp.int32)
    pooled = None
    for ph in range(4):
        v = jnp.where(cond, acc[ph * 64:(ph + 1) * 64], st._NEG)
        offs = pool_shifts[ph]
        if len(offs) > 1:
            ph_ref[:, HALO:HALO + S] = v
        for off in offs:
            pv = v if off == 0 else ph_ref[:, HALO + off:HALO + off + S]
            pooled = pv if pooled is None else jnp.maximum(pooled, pv)
    zero = jnp.zeros((64, HALO), jnp.int8)
    o_ref[0, :, :HALO] = zero
    o_ref[0, :, HALO + S:] = zero
    vv = pooled.astype(jnp.float32) * f_ref[...] + b_ref[...]
    o_ref[0, :, HALO:HALO + S] = jnp.clip(vv, 0.0, 127.99
                                          ).astype(jnp.int8) & m8


def call_stem_union(x64, mask, A_u, f_s, b_s):
    const = lambda shape: pl.BlockSpec(shape, lambda n: (0,) * len(shape))
    return pl.pallas_call(
        k_stem_union,
        grid=(x64.shape[0],),
        in_specs=[const((1, S)),
                  pl.BlockSpec((1, 64, SBUF), lambda n: (n, 0, 0)),
                  const((256, 256)), const((64, 1)), const((64, 1))],
        out_specs=pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x64.shape[0], 64, BUF), jnp.int8),
        scratch_shapes=[pltpu.VMEM((256, S), jnp.int8),
                        pltpu.VMEM((64, HALO + S), jnp.int32)],
        interpret=INTERP,
    )(mask, x64, A_u, f_s, b_s)


# ------------------------------------------------------------------ timing

def timed_loop(fn, args, n1=20, n2=220, reps=4):
    if INTERP:
        n1, n2, reps = 1, 2, 1

    @jax.jit
    def loop(x, rest, n):
        def step(i, x):
            out = fn(x, *rest)
            bit = (jnp.sum(out[0, :, :1].astype(jnp.int32)) & 1).astype(
                jnp.int8)
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
    t(n1)
    compile_s = time.perf_counter() - t0
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9), compile_s


def main():
    want = set(sys.argv[1:])
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # block input: realistic layout (zero halos, zero pad columns)
    x = rng.integers(-80, 80, (N, 64, BUF), dtype=np.int8)
    x[:, :, :HALO] = 0
    x[:, :, HALO + S:] = 0
    lanemask = (np.arange(S) % RS < R)
    x[:, :, HALO:HALO + S] *= lanemask
    x = jnp.asarray(x)
    mask = st._colmask(G)

    W1 = rng.integers(-90, 90, (64, 64, 3, 3), dtype=np.int8)
    W2 = rng.integers(-90, 90, (64, 64, 3, 3), dtype=np.int8)
    f1 = jnp.asarray(0.002 + 0.001 * rng.random((64, 1)), jnp.float32)
    b1 = jnp.asarray(rng.random((64, 1)) + 0.5, jnp.float32)
    f2 = jnp.asarray(0.002 + 0.001 * rng.random((64, 1)), jnp.float32)
    b2 = jnp.asarray(rng.random((64, 1)) + 0.5, jnp.float32)
    sx = 0.21

    A1 = st._pack_block_A(jnp.asarray(W1))
    A2 = st._pack_block_A(jnp.asarray(W2))

    probes = {}
    for K in (64, 128, 192, 256, 384, 576):
        probes[f"kgran{K}"] = (lambda x_, K=K: call_kgran(x_, K, rng), (x,))

    probes["block_cur"] = (
        lambda x_: st._call_block(x_, mask, A1, (f1, b1), A2, (f2, b2),
                                  sx, G, False, INTERP, False), (x,))
    probes["block_pair"] = (
        lambda x_: call_block_packed(x_, mask, W1, (f1, b1), W2, (f2, b2),
                                     sx, "pair", False), (x,))
    probes["block_tri"] = (
        lambda x_: call_block_packed(x_, mask, W1, (f1, b1), W2, (f2, b2),
                                     sx, "tri", False), (x,))
    q1 = st._fxp_pack(f1, b1)
    q2 = st._fxp_pack(f2, b2, sx=sx)
    probes["block_cur_fxp"] = (
        lambda x_: st._call_block(x_, mask, A1, (q1,), A2, (q2,),
                                  sx, G, False, INTERP, True), (x,))
    probes["block_pair_fxp"] = (
        lambda x_: call_block_packed(x_, mask, W1, (q1,), W2, (q2,),
                                     sx, "pair", True), (x,))
    probes["block_tri_fxp"] = (
        lambda x_: call_block_packed(x_, mask, W1, (q1,), W2, (q2,),
                                     sx, "tri", True), (x,))

    # stem: library vs union packing, same image through both prologues
    img = rng.standard_normal((N, 3, 224, 224)).astype(np.float32)
    s_in = 0.02
    x64c = st._stem_prologue(jnp.asarray(img), s_in, G)
    x64u = _stem_prologue_union(jnp.asarray(img), s_in)
    Ws = rng.integers(-90, 90, (64, 3, 7, 7), dtype=np.int8)
    A_s = st._pack_stem_A(jnp.asarray(Ws))
    A_u = _pack_stem_A_union(Ws)
    fs = jnp.asarray(0.0005 + 0.0002 * rng.random((64, 1)), jnp.float32)
    bs = jnp.asarray(rng.random((64, 1)) + 0.5, jnp.float32)

    def stem_cur(x64_):
        return st._call_stage(x64_, mask, A_s, fs, bs, [], (), G, 0, 1,
                              INTERP, emit="int8", fxp=False)

    probes["stem_cur"] = (stem_cur, (x64c,))
    probes["stem_union"] = (lambda x_: call_stem_union(x_, mask, A_u, fs, bs),
                            (x64u,))

    # ---- correctness gates (exact integer math -> exact agreement)
    # agreement is reduced ON DEVICE: fetching full (64, 64, 3840) outputs
    # through the ~28 MB/s relay costs ~10 min each
    dev_agree = jax.jit(lambda a, b: jnp.mean((a == b).astype(jnp.float32)))

    results = {}
    if not want or {"block_pair", "block_tri", "block_cur"} & want:
        y_cur = probes["block_cur"][0](x)
        for name in ("block_pair", "block_tri"):
            agree = float(dev_agree(probes[name][0](x), y_cur))
            results[f"{name}_agreement"] = agree
            log(f"{name} vs block_cur agreement: {agree:.6f}")
            assert agree == 1.0, f"{name} mismatch"
        y_curf = probes["block_cur_fxp"][0](x)
        for name in ("block_pair_fxp", "block_tri_fxp"):
            agree = float(dev_agree(probes[name][0](x), y_curf))
            results[f"{name}_agreement"] = agree
            log(f"{name} vs block_cur_fxp agreement: {agree:.6f}")
            assert agree == 1.0, f"{name} mismatch"
    if not want or {"stem_union", "stem_cur"} & want:
        agree = float(dev_agree(probes["stem_union"][0](x64u),
                                probes["stem_cur"][0](x64c)))
        results["stem_union_agreement"] = agree
        log(f"stem_union vs stem_cur agreement: {agree:.6f}")
        if agree != 1.0:
            log("stem_union MISCOMPILES on this backend — timing it anyway "
                "(perf signal still valid; do NOT ship without a fix)")

    if INTERP:
        log("interpret mode: correctness gates only")
        print(json.dumps(results, indent=1))
        return

    for name, (call, args) in probes.items():
        if want and name not in want:
            continue
        try:
            dt, compile_s = timed_loop(call, args)
            per_img = dt / N * 1e6
            results[name] = {"pass_ms": dt * 1e3, "us_per_img": per_img}
            log(f"{name:<16} pass {dt*1e3:8.3f} ms   {per_img:7.3f} us/img"
                f"  (compile {compile_s:.0f}s)")
        except Exception as e:
            results[name] = {"error": str(e)[:500]}
            log(f"{name:<16} FAILED: {str(e)[:300]}")

    path = "experiments/kernel_probe_r4.json"
    merged = {}
    if os.path.exists(path):
        merged = json.load(open(path))
    merged.update(results)
    with open(path, "w") as fjs:
        json.dump(merged, fjs, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
