"""l3/l4 small-R W8A8 layout probe (VERDICT r4 item 2).

prefix_profile_b64: l3 (C=256, R=14) 0.254 ms + l4 (C=512, R=7) 0.310 ms at
~56% MXU efficiency under the current NCHW lax.conv W8A8 lowering.  Probe
LAYOUT-level fixes before kernels:

  * nchw:        current in-net form (jax_ops._conv_w8a8 chain, NCHW)
  * nhwc:        same math, NHWC dimension_numbers, activations carried NHWC
                 (boundary transposes amortized across the whole stage)
  * nhwc_codes:  NHWC with int8 codes carried through relu (the annotated
                 in-net form)
  * gemm_tap:    9-tap flat GEMM over (N*(R+2)^2, C) zero-margin NHWC rows —
                 every dot MXU-dense (M k-aligned, K=C, lanes=O)

Each variant runs a 2-block residual chain (conv-relu-conv-add-relu x2) at
batch 64 and is timed with the on-device fori_loop difference quotient.
Writes experiments/smallr_probe.json.
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

N = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_loop(fn, x, n1=20, n2=220, reps=4):
    @jax.jit
    def loop(x, n):
        def step(i, x):
            out = fn(x)
            bump = (jnp.sum(out[0, :1].astype(jnp.float32))
                    * 1e-30).astype(x.dtype)
            return x + bump
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

    t0 = time.perf_counter()
    t(n1)
    compile_s = time.perf_counter() - t0
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9), compile_s


def make_weights(rng, C, O):
    q = rng.integers(-90, 90, (O, C, 3, 3), dtype=np.int8)
    ws = (0.002 + 0.001 * rng.random((O,))).astype(np.float32)
    b = rng.standard_normal(O).astype(np.float32) * 0.1
    return q, ws, b


def chain_nchw(x, blocks, s_act):
    """Current in-net form: bf16 NCHW, quantize inline per conv (static
    scale), s8xs8->s32 conv, dequant bf16 epilogue (jax_ops._conv_w8a8)."""
    dn = ("NCHW", "OIHW", "NCHW")
    for (q1, s1, b1), (q2, s2, b2) in blocks:
        r = x
        for q, ws, b, act in ((q1, s1, b1, True), (q2, s2, b2, False)):
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                          -127, 127).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                xi, q, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32)
                 * (s_act * ws.reshape(1, -1, 1, 1))).astype(jnp.bfloat16)
            y = y + b.reshape(1, -1, 1, 1).astype(jnp.bfloat16)
            x = jnp.maximum(y, 0) if act else y
        x = jnp.maximum(x + r, 0)
    return x


def chain_nchw_wide(x, blocks, s_act, R):
    """chain_nchw on a WIDE layout (W = R padded up to a power-of-two-ish
    stride, pad columns zero): if this costs the same as the exact layout,
    XLA's conv was padding lanes internally anyway and every stage-boundary
    unpad/slice copy in the fused net is elidable."""
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, x.shape[3]), 3)
    valid = cc < R
    dn = ("NCHW", "OIHW", "NCHW")
    for (q1, s1, b1), (q2, s2, b2) in blocks:
        r = x
        for q, ws, b, act in ((q1, s1, b1, True), (q2, s2, b2, False)):
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                          -127, 127).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                xi, q, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32)
                 * (s_act * ws.reshape(1, -1, 1, 1))).astype(jnp.bfloat16)
            y = y + b.reshape(1, -1, 1, 1).astype(jnp.bfloat16)
            x = jnp.maximum(y, 0) if act else y
        # re-zero the pad columns so the next left-edge window stays exact
        x = jnp.where(valid, jnp.maximum(x + r, 0), 0)
    return x


def chain_nhwc(x, blocks, s_act, codes=False):
    """NHWC activations; weights HWIO.  ``codes``: carry int8 activation
    codes through relu (annotated form) instead of bf16."""
    dn = ("NHWC", "HWIO", "NHWC")
    for (q1, s1, b1), (q2, s2, b2) in blocks:
        r = x
        for q, ws, b, act in ((q1, s1, b1, True), (q2, s2, b2, False)):
            qh = jnp.transpose(q, (2, 3, 1, 0))
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                          -127, 127).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                xi, qh, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            if act and codes:
                # requant straight to the next conv's input codes
                f = (s_act * ws / s_act).reshape(1, 1, 1, -1)
                v = acc.astype(jnp.float32) * f \
                    + (b / s_act + 0.5).reshape(1, 1, 1, -1)
                x = jnp.clip(v, 0.0, 127.99).astype(jnp.int8)
                # next conv consumes codes: skip its quantize
                q2h = jnp.transpose(q2, (2, 3, 1, 0))
                acc2 = lax.conv_general_dilated(
                    x, q2h, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                y = (acc2.astype(jnp.float32)
                     * (s_act * s2).reshape(1, 1, 1, -1)).astype(jnp.bfloat16)
                y = y + b2.reshape(1, 1, 1, -1).astype(jnp.bfloat16)
                x = jnp.maximum(y + r, 0)
                break
            y = (acc.astype(jnp.float32)
                 * (s_act * ws).reshape(1, 1, 1, -1)).astype(jnp.bfloat16)
            y = y + b.reshape(1, 1, 1, -1).astype(jnp.bfloat16)
            x = jnp.maximum(y, 0) if act else y
        else:
            x = jnp.maximum(x + r, 0)
    return x


def chain_gemm_tap(x, blocks, s_act, R):
    """9-tap flat GEMM: x (N, R+2, R+2, C) int8 codes with zero margins;
    each conv = 9 dots (N*(R+2)^2, C) @ (C, O) accumulated, epilogue
    requants back to codes in the SAME margined layout."""
    Rp = R + 2
    n, _, _, C = x.shape

    M = n * Rp * Rp

    def conv(xm, q):
        # out[i] = sum_taps flat[i + (dy-1)*Rp + (dx-1)]: the zero margins
        # (rows/cols R, R+1 of each tile) absorb every cross-tile read
        flat = xm.reshape(M, C)
        fp = jnp.pad(flat, ((Rp + 1, Rp + 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                off = dy * Rp + dx
                sl = lax.slice_in_dim(fp, off, off + M, axis=0)
                w = q[:, :, dy, dx].T                        # (C, O) int8
                d = jax.lax.dot_general(
                    sl, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
        return acc.reshape(n, Rp, Rp, -1)

    # margin mask: valid interior rows/cols [0, R) of each (Rp, Rp) tile,
    # applied on the int8 codes so margins stay zero for the next conv
    rr = jax.lax.broadcasted_iota(jnp.int32, (1, Rp, Rp, 1), 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, Rp, Rp, 1), 2)
    valid = (rr < R) & (cc < R)

    for (q1, s1, b1), (q2, s2, b2) in blocks:
        r = x
        a1 = conv(x, q1)
        f1 = (s_act * s1 / s_act).reshape(1, 1, 1, -1)
        v1 = a1.astype(jnp.float32) * f1 \
            + (b1 / s_act + 0.5).reshape(1, 1, 1, -1)
        y1 = jnp.where(valid, jnp.clip(v1, 0.0, 127.99), 0.0
                       ).astype(jnp.int8)
        a2 = conv(y1, q2)
        v2 = a2.astype(jnp.float32) * (s_act * s2).reshape(1, 1, 1, -1) \
            + b2.reshape(1, 1, 1, -1) + r.astype(jnp.float32) * s_act
        v2 = jnp.maximum(v2, 0.0)
        q = jnp.clip(jnp.round(v2 / s_act), 0, 127)
        x = jnp.where(valid, q, 0.0).astype(jnp.int8)
    return x


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    results = {}
    s_act = 0.05

    for C, R, tag in ((128, 28, "l2"), (256, 14, "l3"), (512, 7, "l4")):
        blocks = []
        for _ in range(2):
            blocks.append((make_weights(rng, C, C), make_weights(rng, C, C)))
        blocks = [((jnp.asarray(q1), jnp.asarray(s1), jnp.asarray(b1)),
                   (jnp.asarray(q2), jnp.asarray(s2), jnp.asarray(b2)))
                  for (q1, s1, b1), (q2, s2, b2) in blocks]

        x_nchw = jnp.asarray(rng.standard_normal((N, C, R, R)),
                             jnp.bfloat16)
        x_nhwc = jnp.asarray(np.transpose(np.asarray(x_nchw, np.float32),
                                          (0, 2, 3, 1)), jnp.bfloat16)
        codes = np.zeros((N, R + 2, R + 2, C), np.int8)
        codes[:, :R, :R, :] = np.clip(np.round(
            np.asarray(x_nhwc, np.float32) / s_act), 0, 127)
        x_gemm = jnp.asarray(codes)

        Rw = {28: 32, 14: 16, 7: 8}[R]
        wide = np.zeros((N, C, R, Rw), np.float32)
        wide[:, :, :, :R] = np.asarray(x_nchw, np.float32)
        x_wide = jnp.asarray(wide, jnp.bfloat16)

        variants = {
            f"{tag}_nchw": (lambda x: chain_nchw(x, blocks, s_act), x_nchw),
            f"{tag}_nchw_wide": (
                lambda x: chain_nchw_wide(x, blocks, s_act, R), x_wide),
            f"{tag}_nhwc": (lambda x: chain_nhwc(x, blocks, s_act), x_nhwc),
            f"{tag}_nhwc_codes": (
                lambda x: chain_nhwc(x, blocks, s_act, codes=True), x_nhwc),
            f"{tag}_gemm_tap": (
                lambda x: chain_gemm_tap(x, blocks, s_act, R), x_gemm),
        }
        for name, (fn, xv) in variants.items():
            try:
                dt, cs = timed_loop(fn, xv)
                per_img = dt / N * 1e6
                results[name] = {"pass_ms": dt * 1e3, "us_per_img": per_img}
                log(f"{name:<16} pass {dt*1e3:8.3f} ms  {per_img:7.3f} "
                    f"us/img  (compile {cs:.0f}s)")
            except Exception as e:
                results[name] = {"error": str(e)[:400]}
                log(f"{name:<16} FAILED: {str(e)[:200]}")

    with open("experiments/smallr_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    log("wrote experiments/smallr_probe.json")


if __name__ == "__main__":
    main()
