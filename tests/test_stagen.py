"""Fused ResNet body stages (optimize.fuse_stagen + ops/pallas/stagen).

Covers: the IR pattern pass on resnet18/resnet50 (+ negative cases),
decomposed-path parity with the unfused graph, the Pallas whole-stage
kernel in interpreter mode vs an exact NCHW simulation built from the SAME
folded weights (bit-exact up to the bf16 output cast), and geometry gating.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from planer_tpu import models
from planer_tpu.optimize import fuse_stage64, fuse_stagen
from planer_tpu.ops.qtypes import QTensor
from planer_tpu.ops.pallas import stagen as sn


# --------------------------------------------------------------------- pass

def test_fuse_pass_rewrites_resnet18_body():
    net = models.resnet18()
    net.optimize()
    fuse_stage64(net)
    n = fuse_stagen(net)
    assert n == 3
    stages = [l for l in net.graph.layers if l.op == "stagen"]
    for l in stages:
        assert l.kwargs["blocks"][0] == {"kind": "basic", "stride": 2,
                                         "down": True}
        assert len(l.kwargs["blocks"]) == 2
    net.graph.validate()


def test_fuse_pass_rewrites_resnet50():
    net = models.resnet50()
    net.optimize()
    assert fuse_stage64(net) == 1       # stem-only (0-block) stage
    n = fuse_stagen(net)
    assert n == 4
    sizes = [len(l.kwargs["blocks"]) for l in net.graph.layers
             if l.op == "stagen"]
    assert sizes == [3, 4, 6, 3]
    first = [l.kwargs["blocks"][0] for l in net.graph.layers
             if l.op == "stagen"]
    assert first[0] == {"kind": "bottleneck", "stride": 1, "down": True}
    assert all(b == {"kind": "bottleneck", "stride": 2, "down": True}
               for b in first[1:])
    net.graph.validate()


@pytest.mark.parametrize("model", ["resnet18", "resnet50"])
def test_fused_fp32_parity_with_unfused(model):
    ref = getattr(models, model)()
    ref.optimize()
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    y_ref = np.asarray(ref.program(x))
    fuse_stage64(ref)
    fuse_stagen(ref)
    y_fused = np.asarray(ref.program(x))
    np.testing.assert_allclose(y_fused, y_ref, rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------------- pallas

def _qt(rng, shape, act_scale):
    q = rng.integers(-127, 128, size=shape, dtype=np.int8)
    scale = (0.5 + rng.random((shape[0], 1, 1, 1))).astype(np.float32) / 256.0
    return QTensor(jnp.asarray(q), jnp.asarray(scale), act_dynamic=True,
                   act_scale=float(act_scale))


def _mk_stage(rng, kind, cin, cm, co, nblocks, stride, x_absmax):
    """Random quantized stage weights + the flat list + blocks kwarg."""
    blocks, w = [], []
    scales = [0.9, 0.8, 0.7, 0.6, 0.9, 0.8, 0.7, 0.6]
    si = 0

    def nxt_scale():
        nonlocal si
        s = scales[si % len(scales)]
        si += 1
        return s

    cur = x_absmax / 127.0
    for b in range(nblocks):
        first = b == 0
        st = stride if first else 1
        down = first and (st != 1 or cin != co)
        blocks.append({"kind": kind, "stride": st, "down": down})
        ci = cin if first else co
        if kind == "basic":
            W1 = _qt(rng, (co, ci, 3, 3), cur)
            s_m = nxt_scale()
            W2 = _qt(rng, (co, co, 3, 3), s_m)
            w += [W1, jnp.asarray(rng.standard_normal(co).astype(np.float32)
                                  * 0.1),
                  W2, jnp.asarray(rng.standard_normal(co).astype(np.float32)
                                  * 0.1)]
        else:
            W1 = _qt(rng, (cm, ci, 1, 1), cur)
            s1 = nxt_scale()
            W2 = _qt(rng, (cm, cm, 3, 3), s1)
            s2 = nxt_scale()
            W3 = _qt(rng, (co, cm, 1, 1), s2)
            w += [W1, jnp.asarray(rng.standard_normal(cm).astype(np.float32)
                                  * 0.1),
                  W2, jnp.asarray(rng.standard_normal(cm).astype(np.float32)
                                  * 0.1),
                  W3, jnp.asarray(rng.standard_normal(co).astype(np.float32)
                                  * 0.1)]
        if down:
            Wd = _qt(rng, (co, ci, 1, 1), cur)
            w += [Wd, jnp.asarray(rng.standard_normal(co).astype(np.float32)
                                  * 0.1)]
        cur = nxt_scale()   # next block's input scale
        # stamp it onto the next block's first conv via act_scale at build
    # rewrite act_scales so each conv's act_scale is ITS input scale chain
    return blocks, w


def _simulate(x, w, blocks, g):
    """NCHW replay of the kernel using the SAME folded weights from
    stagen._build — identical f32 association, residual int8 requant and
    all, so kernel-vs-sim differs only by the final bf16 cast."""
    weights, _, plan, s_in, s2d = sn._build(x, w, blocks, g, False)
    dn = ("NCHW", "OIHW", "NCHW")

    def unpack3(A, cin):
        o = A.shape[0]
        return A.reshape(o, 3, 3, cin).transpose(0, 3, 1, 2).astype(
            jnp.float32)

    def unpack1(A):
        return A[:, :, None, None].astype(jnp.float32)

    def conv(xv, K, stride, pad):
        return lax.conv_general_dilated(xv, K, (stride, stride),
                                        ((pad, pad), (pad, pad)),
                                        dimension_numbers=dn)

    def aff(acc, f, b):
        return (acc * weights[f].reshape(1, -1, 1, 1)
                + weights[b].reshape(1, -1, 1, 1))

    cur = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127)
    for bi, (pb, bk) in enumerate(zip(plan["blocks"], blocks)):
        st = int(bk.get("stride", 1))
        last = bi == len(plan["blocks"]) - 1
        A, F, B = pb["A"], pb["f"], pb["b"]
        # trunc-fold requant (the _build biases already carry the +0.5)
        def tq(v):
            return jnp.floor(jnp.clip(v, 0.0, 127.99))

        if pb["down"]:
            ap = conv(cur, unpack1(weights[A[-1]]), st, 0)
            resq = jnp.clip(jnp.floor(aff(ap, F[-1], B[-1])), -127.0, 127.0)
        else:
            resq = cur
        if pb["kind"] == "basic":
            a1 = conv(cur, unpack3(weights[A[0]], pb["cin"]), st, 1)
            y1 = tq(aff(a1, F[0], B[0]))
            a2 = conv(y1, unpack3(weights[A[1]], pb["cout"]), 1, 1)
            fin, bfin = F[1], B[1]
        else:
            a1 = conv(cur, unpack1(weights[A[0]]), 1, 0)
            y1 = tq(aff(a1, F[0], B[0]))
            a2 = conv(y1, unpack3(weights[A[1]], pb["cmid"]), st, 1)
            y2 = tq(aff(a2, F[1], B[1]))
            a2 = conv(y2, unpack1(weights[A[2]]), 1, 0)
            fin, bfin = F[2], B[2]
        v = aff(a2, fin, bfin) + resq * pb["sx_res"]
        if last:
            return jnp.maximum(v, 0.0)
        cur = tq(v)


CASES = [
    # (kind, cin, cm, co, nblocks, stride, H)  — l2 of r18; l1, l2 of r50
    ("basic", 64, 128, 128, 2, 2, 56),
    ("bottleneck", 64, 64, 256, 2, 1, 56),
    ("bottleneck", 256, 128, 512, 2, 2, 56),
]


@pytest.mark.slow
@pytest.mark.parametrize("kind,cin,cm,co,nb,stride,H", CASES)
def test_pallas_interpret_matches_simulation(kind, cin, cm, co, nb, stride,
                                             H):
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((1, cin, H, H)) * 20).astype(np.float32)
    blocks, w = _mk_stage(rng, kind, cin, cm, co, nb, stride,
                          np.abs(x).max())
    g = sn._geometry(H // stride)
    assert g is not None
    out = sn.stagen(x, *w, blocks=blocks, interpret=True)
    ref = _simulate(jnp.asarray(x), w, blocks, g)
    out = np.asarray(out, np.float32)
    ref = np.asarray(ref, np.float32)
    assert out.shape == ref.shape == (1, co, H // stride, H // stride)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel
    mean_rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert mean_rel < 2e-3, mean_rel


def test_geometry_gate_and_falloff():
    """Small grids (l3/l4) are rejected by the RS-waste rule and counted."""
    assert sn._geometry(28) is not None and sn._geometry(56) is not None
    assert sn._geometry(14) is None and sn._geometry(7) is None
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 64, 14, 14)) * 5).astype(np.float32)
    blocks, w = _mk_stage(rng, "basic", 64, 128, 128, 1, 1, np.abs(x).max())
    sn.FALLOFF.clear()
    y = sn.stagen(x, *w, blocks=blocks, interpret=True)
    assert y.shape == (1, 128, 14, 14)
    assert sn.FALLOFF.get("geometry") == 1


def test_decomposed_matches_oracle_chain(ops_both=None):
    """numpy and jax decomposed paths agree (CLAUDE.md lockstep)."""
    from planer_tpu.ops import numpy_ops as nops
    from planer_tpu.ops import jax_ops as jops
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    blocks = [{"kind": "bottleneck", "stride": 2, "down": True},
              {"kind": "bottleneck", "stride": 1, "down": False}]
    w = []
    for b in blocks:
        ci = 8 if b["down"] else 16
        w += [rng.standard_normal((4, ci, 1, 1)).astype(np.float32) * .3,
              rng.standard_normal(4).astype(np.float32) * .1,
              rng.standard_normal((4, 4, 3, 3)).astype(np.float32) * .3,
              rng.standard_normal(4).astype(np.float32) * .1,
              rng.standard_normal((16, 4, 1, 1)).astype(np.float32) * .3,
              rng.standard_normal(16).astype(np.float32) * .1]
        if b["down"]:
            w += [rng.standard_normal((16, ci, 1, 1)).astype(np.float32) * .3,
                  rng.standard_normal(16).astype(np.float32) * .1]
    yn = nops.stagen(x, *w, blocks=blocks)
    yj = np.asarray(jops.stagen(x, *w, blocks=blocks))
    np.testing.assert_allclose(yn, yj, rtol=1e-4, atol=1e-4)
