"""M-row-stacking probe for the stage64 block dots (real TPU).

The tri-packed block conv is 3 K=192 dots of M=64 output rows — half the
MXU's 128-row tile.  IF Mosaic pads M=64 dots to full 128-row passes, then
stacking two dy-tap groups' weights on M (one (128, 192) dot over a
window widened by RS lanes, outputs realigned by a lane-slice add) buys
the second group's MACs for free:

  tri3   : 3 x dot((64,192), (192, S))                 [library PACK=tri]
  dpair  : dot((128,192), (192, S+RS)) + dot((64,192), (192, S))
           acc = d[0:64, 0:S] + d[64:128, RS:RS+S] + d2
  tstack : dot((192,192), (192, S+2RS))
           acc = d[0:64, 0:S] + d[64:128, RS:RS+S] + d[128:192, 2RS:2RS+S]

All variants compute the IDENTICAL 9-tap 3x3 conv over the same dup-3
banks; exact int32 equality of the lane-reduced outputs is asserted.
Forced full compute via the lane-tile reduce store (kernel_probe_r4).

Usage: python experiments/mrow_probe.py            (TPU timing)
       PROBE_INTERP=1 python experiments/mrow_probe.py   (CPU correctness)
Writes/merges experiments/mrow_probe.json.
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
R, RS, S, BUF, HALO = G.R, G.RS, G.S, G.BUF, st.HALO
N = 2 if INTERP else 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _reduce_store(o_ref, acc):
    red = acc[:, 0:128]
    for j in range(1, S // 128):
        red = red + acc[:, j * 128:(j + 1) * 128]
    o_ref[0] = red


def _dup3(dst_ref, src):
    dst_ref[0:64, :] = src
    dst_ref[64:128, 0:BUF - 1] = src[:, 1:BUF]
    dst_ref[128:192, 0:BUF - 2] = src[:, 2:BUF]


def _conv_tri(At_ref, dup_ref):
    acc = None
    for dy in range(3):
        o = HALO + (dy - 1) * RS - 1
        d = jnp.dot(At_ref[:, dy * 192:(dy + 1) * 192],
                    dup_ref[0:192, o:o + S], preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    return acc


def _conv_dpair(A_ref, dup_ref):
    """A_ref = (192, 192) M-stacked [A_dy0; A_dy1; A_dy2] (host-side):
    one (128, 192) dot over a window widened by RS covers dy=0,1; the
    dy=2 rows run as a second M=64 dot.  Mosaic cannot concatenate
    (64, x) vectors on the sublane dim in-kernel, so the stack is an
    input, not an At reshape."""
    o = HALO - RS - 1
    d = jnp.dot(A_ref[0:128, :], dup_ref[0:192, o:o + S + RS],
                preferred_element_type=jnp.int32)
    acc = d[0:64, 0:S] + d[64:128, RS:RS + S]
    d2 = jnp.dot(A_ref[128:192, :],
                 dup_ref[0:192, o + 2 * RS:o + 2 * RS + S],
                 preferred_element_type=jnp.int32)
    return acc + d2


def _conv_tstack(A_ref, dup_ref):
    o = HALO - RS - 1
    d = jnp.dot(A_ref[...], dup_ref[0:192, o:o + S + 2 * RS],
                preferred_element_type=jnp.int32)
    return (d[0:64, 0:S] + d[64:128, RS:RS + S]
            + d[128:192, 2 * RS:2 * RS + S])


_CONVS = {"tri3": _conv_tri, "dpair": _conv_dpair, "tstack": _conv_tstack}


def kern(x_ref, A_ref, o_ref, dup_ref, *, form):
    _dup3(dup_ref, x_ref[0])
    acc = _CONVS[form](A_ref, dup_ref)
    _reduce_store(o_ref, acc)


def call(x, At, form):
    if form == "tri3":
        A = At                                           # (64, 576)
    else:
        # M-stack host-side: rows [A_dy0; A_dy1; A_dy2], each (64, 192)
        A = jnp.concatenate([At[:, d * 192:(d + 1) * 192]
                             for d in range(3)], axis=0)  # (192, 192)
    return pl.pallas_call(
        partial(kern, form=form),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, 64, BUF), lambda n: (n, 0, 0)),
                  pl.BlockSpec(tuple(A.shape), lambda n: (0, 0))],
        out_specs=pl.BlockSpec((1, 64, 128), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 64, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((192, BUF), jnp.int8)],
        interpret=INTERP,
    )(x, A)


def timed(fn, x, At, n1=20, n2=220, reps=4):
    @jax.jit
    def loop(x, n):
        def step(i, x):
            out = fn(x, At)
            return x + (jnp.sum(out[0, :, :1]) % 3).astype(jnp.int8)
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
    a, b = t(n1), t(n2)
    return max((b - a) / (n2 - n1), 1e-9)


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(5)
    w = rng.integers(-90, 90, (64, 64, 3, 3), dtype=np.int8)
    At = np.asarray(st._pack_block_tri(jnp.asarray(w))[0])
    x = np.zeros((N, 64, BUF), np.int8)
    x[:, :, HALO:HALO + S] = rng.integers(-110, 110, (N, 64, S))
    # zero the row-pad cols like the library layout (lane % RS >= R)
    x[:, :, HALO:HALO + S] *= (np.arange(S) % RS < R).astype(np.int8)
    xd = jnp.asarray(x)
    Ad = jnp.asarray(At)

    ref = np.asarray(call(xd, Ad, "tri3"))
    results = {}
    if os.path.exists("experiments/mrow_probe.json"):
        results = json.load(open("experiments/mrow_probe.json"))
    for form in ("tri3", "dpair", "tstack"):
        out = np.asarray(call(xd, Ad, form))
        ok = bool((out == ref).all())
        log(f"{form:<7} exact={ok}")
        assert ok, form
        if INTERP:
            continue
        dt = timed(lambda x, A, f=form: call(x, A, f), xd, Ad)
        us = dt / N * 1e6
        results[form] = {"pass_ms": dt * 1e3, "us_per_img": us}
        log(f"{form:<7} pass {dt*1e3:8.3f} ms  {us:6.3f} us/img")
    with open("experiments/mrow_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    log("wrote experiments/mrow_probe.json")


if __name__ == "__main__":
    main()
