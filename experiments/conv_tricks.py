"""Measure candidate conv restructurings on the real TPU (batch 64, bf16).

1. l1 output-row stacking: 3x3 s1 64->64 conv on 56² reformulated as a
   4x3 s(2,1) 64->128 conv (two output rows share one input patch; kernel
   zero-padded per row-shift).  1.33x MACs but full 128-lane utilization.
2. stem space-to-depth: 7x7 s2 3->64 on 224² as 4x4 s1 12->64 on 112².
Also verifies numerical equivalence of both transforms against the plain
conv before timing.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B = 64
DT = jnp.bfloat16


def conv(x, w, s, pad):
    return lax.conv_general_dilated(
        x, w, s, pad, dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)


def time_loop(f, x, n1=10, n2=410, reps=4):
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

    t(n1)
    return max((t(n2) - t(n1)) / (n2 - n1), 1e-9)


def stacked_kernel(K):
    """(64, C, 3, 3) -> (128, C, 4, 3): rows [K;0] and [0;K]."""
    O, C, _, kw = K.shape
    Kp = jnp.zeros((2 * O, C, 4, 3), K.dtype)
    Kp = Kp.at[:O, :, 0:3, :].set(K)
    Kp = Kp.at[O:, :, 1:4, :].set(K)
    return Kp


def stacked_conv(x, Kp, O, H):
    """4x3 s(2,1) conv + row interleave == 3x3 s1 same conv."""
    n = x.shape[0]
    W = x.shape[3]
    z = conv(x, Kp, (2, 1), ((1, 1), (1, 1)))  # (n, 2O, H/2, W)
    T = z.shape[2]
    z = z.reshape(n, 2, O, T, W).transpose(0, 2, 3, 1, 4)
    return z.reshape(n, O, 2 * T, W)


def s2d(x):
    """(N, C, H, W) -> (N, 4C, H/2, W/2), channel blocks by (dr, dc)."""
    n, c, h, w = x.shape
    x = x.reshape(n, c, h // 2, 2, w // 2, 2)
    return x.transpose(0, 3, 5, 1, 2, 4).reshape(n, 4 * c, h // 2, w // 2)


def stem_s2d_kernel(K):
    """(64, 3, 7, 7) -> (64, 12, 4, 4) operating on s2d(2) input.

    Original: y[h', w'] = sum_{r,c} K[r, c] * xp[2h'+r, 2w'+c] with pad 3.
    In s2d space (of xp padded to even alignment), tap (r, c) lives at s2d
    row (2h'+r)//2 offset, parity (r%2, c%2).  With pad 3 on the original,
    we pad 2 on s2d rows and fold the odd pad row into parity handling by
    padding the original ONCE on host instead — here we build the kernel for
    input pre-padded by 4 (even), i.e. xp2 = pad(x, 4) viewed as s2d.
    y[h', w'] uses xp2 rows 2h'+1 .. 2h'+7 = s2d rows h'..h'+3 (4 rows).
    """
    O = K.shape[0]
    Kp = np.zeros((O, 12, 4, 4), np.float32)
    Kn = np.asarray(K, np.float32)
    for r in range(7):
        for c in range(7):
            rr, pr = divmod(r + 1, 2)   # +1: pad-4 vs pad-3 alignment
            cc, pc = divmod(c + 1, 2)
            for ch in range(3):
                # s2d channel layout: (dr, dc, c) -> dr*6 + dc*3 + c
                Kp[:, pr * 6 + pc * 3 + ch, rr, cc] += Kn[:, ch, r, c]
    return jnp.asarray(Kp)


def main():
    rng = np.random.default_rng(0)
    print("verify + time on", jax.devices(), file=sys.stderr)

    # ---- l1 stacking: verify equivalence on small fp32 then time bf16
    x = jnp.asarray(rng.standard_normal((2, 64, 56, 56)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((64, 64, 3, 3)) * 0.1, jnp.float32)
    ref = conv(x, K, (1, 1), ((1, 1), (1, 1)))
    out = stacked_conv(x, stacked_kernel(K), 64, 56)
    err = float(jnp.abs(out - ref).max())
    print(f"l1 stacked-conv equivalence: max|dx| = {err:.2e}")

    # ---- stem s2d: verify
    xs = jnp.asarray(rng.standard_normal((2, 3, 224, 224)), jnp.float32)
    Ks = jnp.asarray(rng.standard_normal((64, 3, 7, 7)) * 0.1, jnp.float32)
    ref_s = conv(xs, Ks, (2, 2), ((3, 3), (3, 3)))          # (2,64,112,112)
    xp = jnp.pad(xs, ((0, 0), (0, 0), (4, 2), (4, 2)))      # pad to even
    out_s = conv(s2d(xp), stem_s2d_kernel(Ks), (1, 1), ((0, 0), (0, 0)))
    out_s = out_s[:, :, :112, :112]
    err_s = float(jnp.abs(out_s - ref_s).max())
    print(f"stem s2d equivalence: max|dx| = {err_s:.2e}")

    # ---- timings (bf16, batch 64)
    xb = jnp.zeros((B, 64, 56, 56), DT)
    Kb = jnp.asarray(K, DT)
    Kpb = jnp.asarray(stacked_kernel(K), DT)
    t_plain = time_loop(lambda v: conv(v, Kb, (1, 1), ((1, 1), (1, 1))
                                       ).astype(DT), xb)
    t_stack = time_loop(lambda v: stacked_conv(v, Kpb, 64, 56).astype(DT), xb)
    print(f"l1 plain  : {t_plain*1e3:.3f} ms")
    print(f"l1 stacked: {t_stack*1e3:.3f} ms  ({t_plain/t_stack:.2f}x)")

    xsb = jnp.zeros((B, 12, 114, 114), DT)
    Ksb = jnp.asarray(stem_s2d_kernel(Ks), DT)
    xsb0 = jnp.zeros((B, 3, 224, 224), DT)
    Ks_b = jnp.asarray(Ks, DT)
    t_stem = time_loop(lambda v: conv(v, Ks_b, (2, 2), ((3, 3), (3, 3))
                                      ).astype(DT), xsb0)
    t_s2d = time_loop(lambda v: conv(v, Ksb, (1, 1), ((0, 0), (0, 0))
                                     ).astype(DT), xsb)
    print(f"stem plain: {t_stem*1e3:.3f} ms")
    print(f"stem s2d  : {t_s2d*1e3:.3f} ms  ({t_stem/t_s2d:.2f}x, excl. s2d reshape)")


def stem_combo():
    """Stem as s2d + output-row stacking: 7x7/2 3ch -> 5x4 s(2,1) 12ch->128."""
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 3, 224, 224)), jnp.float32)
    Ks = jnp.asarray(rng.standard_normal((64, 3, 7, 7)) * 0.1, jnp.float32)
    ref = conv(xs, Ks, (2, 2), ((3, 3), (3, 3)))

    Kp = stem_s2d_kernel(Ks)                      # (64, 12, 4, 4)
    K2 = jnp.zeros((128, 12, 5, 4), jnp.float32)
    K2 = K2.at[:64, :, 0:4, :].set(Kp)
    K2 = K2.at[64:, :, 1:5, :].set(Kp)

    def stem2(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (4, 3), (4, 2)))  # rows 231->s2d odd?
        # need odd s2d rows (115) for T=56: pad H to 230 -> 115 s2d rows
        xp = xp[:, :, :230, :230]
        xd = s2d(xp)                               # (n, 12, 115, 115)
        z = conv(xd, K2, (2, 1), ((0, 0), (0, 0)))  # (n, 128, 56, 112)
        n, _, T, W = z.shape
        z = z.reshape(n, 2, 64, T, W).transpose(0, 2, 3, 1, 4)
        return z.reshape(n, 64, 2 * T, W)[:, :, :112, :112]

    out = stem2(xs)
    err = float(jnp.abs(out - ref).max())
    print(f"stem s2d+stacked equivalence: max|dx| = {err:.2e}")

    xb = jnp.zeros((B, 3, 224, 224), DT)
    K2b = jnp.asarray(K2, DT)
    Ksb = jnp.asarray(Ks, DT)

    def stem2_b(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (4, 3), (4, 2)))[:, :, :230, :230]
        xd = s2d(xp)
        z = conv(xd, K2b, (2, 1), ((0, 0), (0, 0)))
        n, _, T, W = z.shape
        z = z.reshape(n, 2, 64, T, W).transpose(0, 2, 3, 1, 4)
        return z.reshape(n, 64, 2 * T, W)[:, :, :112, :112].astype(DT)

    t_plain = time_loop(lambda v: conv(v, Ksb, (2, 2), ((3, 3), (3, 3))
                                       ).astype(DT), xb)
    t_combo = time_loop(stem2_b, xb)
    print(f"stem plain      : {t_plain*1e3:.3f} ms")
    print(f"stem s2d+stacked: {t_combo*1e3:.3f} ms ({t_plain/t_combo:.2f}x, incl. s2d)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "stem":
        stem_combo()
    else:
        main()
