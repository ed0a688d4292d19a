"""Fused ResNet entry stage (optimize.fuse_stage64 + ops/pallas/stage64).

Covers: the IR pattern pass (rewrite + negative cases), decomposed-path
parity vs the unfused graph (same op chain, so near-exact), the Pallas
kernel chain in interpreter mode vs an exact quantized simulation, and
.pla round-trip of a fused graph.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from planer_tpu import models
from planer_tpu.models import eval as ev
from planer_tpu.optimize import fuse_stage64
from planer_tpu.quant import calibrate_act_scales
from planer_tpu.ops.qtypes import QTensor
from planer_tpu.ops.pallas import stage64 as st


def _calibrated_quant_net(shape=(3, 224, 224)):
    net = models.resnet18()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(2, shape, seed=3, batch=1))
    net.quantize("int8", activations="static")
    return net


def test_fuse_pass_rewrites_resnet18():
    net = models.resnet18()
    net.optimize()
    before = len(net.graph.flow)
    n = fuse_stage64(net)
    assert n == 1
    ops = [l.op for l in net.graph.layers]
    assert ops.count("stage64") == 1
    stage = next(l for l in net.graph.layers if l.op == "stage64")
    assert stage.kwargs["blocks"] == 2
    # stem(3 edges) + 2 blocks x 5 edges = 13 edges -> 1
    assert len(net.graph.flow) == before - 12
    net.graph.validate()


def test_fuse_pass_skips_bottleneck_resnet50():
    net = models.resnet50()
    net.optimize()
    assert fuse_stage64(net) == 0


def test_fused_fp32_parity_with_unfused():
    """The stage64 op decomposes to exactly the replaced chain -> the fused
    fp32 graph must match the unfused one to float tolerance."""
    ref = models.resnet18()
    ref.optimize()
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    y_ref = np.asarray(ref.program(x))
    fuse_stage64(ref)
    y_fused = np.asarray(ref.program(x))
    np.testing.assert_allclose(y_fused, y_ref, rtol=2e-4, atol=2e-4)


def test_quantize_static_autofuses_and_oracle_runs():
    net = _calibrated_quant_net()
    assert any(l.op == "stage64" for l in net.graph.layers)
    x = np.random.default_rng(1).standard_normal((1, 3, 224, 224)).astype(
        np.float32)
    y_jit = np.asarray(net.program(x))       # CPU -> decomposed path
    y_orc = np.asarray(net.oracle.run(x))    # fp32 dequant view
    # int8 weight quantization level differences only
    rel = np.abs(y_jit - y_orc).max() / (np.abs(y_orc).max() + 1e-9)
    assert rel < 0.05
    assert y_jit.argmax() == y_orc.argmax()


def test_pla_roundtrip_of_fused_graph(tmp_path):
    from planer_tpu import io as pio
    net = _calibrated_quant_net()
    p = str(tmp_path / "fused.pla")
    pio.save_pla(p, net.graph, net.weights)
    net2 = pio.read_net(p)
    x = np.random.default_rng(2).standard_normal((1, 3, 224, 224)).astype(
        np.float32)
    a = np.asarray(net.program(x))
    b = np.asarray(net2.program(x))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------- pallas

def _rand_qtensor(rng, shape, act_scale):
    q = rng.integers(-127, 128, size=shape, dtype=np.int8)
    scale = (0.5 + rng.random((shape[0], 1, 1, 1))).astype(np.float32) / 256.0
    return QTensor(jnp.asarray(q), jnp.asarray(scale), act_dynamic=True,
                   act_scale=float(act_scale))


def _simulate(x, Ws, Bs, blocks):
    """Exact math of the kernel chain with plain lax ops: integer-valued f32
    convs are exact (|acc| < 2^24), epilogue formulas mirror the kernel."""
    dn = ("NCHW", "OIHW", "NCHW")

    def qt(v, inv):
        return jnp.clip(jnp.round(v * inv), -127, 127)

    xq = qt(x.astype(jnp.float32), 1.0 / Ws.act_scale)
    acc = lax.conv_general_dilated(xq, Ws.q.astype(jnp.float32), (2, 2),
                                   ((3, 3), (3, 3)), dimension_numbers=dn)
    v = acc * (Ws.scale.reshape(1, -1, 1, 1) * Ws.act_scale) \
        + Bs.reshape(1, -1, 1, 1)
    v = jnp.maximum(v, 0.0)
    v = lax.reduce_window(v, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                          ((0, 0), (0, 0), (1, 1), (1, 1)))
    cur_s = blocks[0][0].act_scale
    y = qt(v, 1.0 / cur_s)
    for bi, (W1, B1, W2, B2) in enumerate(blocks):
        s_mid = W2.act_scale
        a1 = lax.conv_general_dilated(y, W1.q.astype(jnp.float32), (1, 1),
                                      ((1, 1), (1, 1)), dimension_numbers=dn)
        v1 = jnp.maximum(a1 * (W1.scale.reshape(1, -1, 1, 1) * cur_s)
                         + B1.reshape(1, -1, 1, 1), 0.0)
        y1 = qt(v1, 1.0 / s_mid)
        a2 = lax.conv_general_dilated(y1, W2.q.astype(jnp.float32), (1, 1),
                                      ((1, 1), (1, 1)), dimension_numbers=dn)
        v2 = a2 * (W2.scale.reshape(1, -1, 1, 1) * s_mid) \
            + B2.reshape(1, -1, 1, 1) + y * cur_s
        v2 = jnp.maximum(v2, 0.0)
        if bi == len(blocks) - 1:
            return v2
        nxt = blocks[bi + 1][0].act_scale
        y = qt(v2, 1.0 / nxt)
        cur_s = nxt


@pytest.mark.slow
def test_pallas_interpret_matches_simulation():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    Ws = _rand_qtensor(rng, (64, 3, 7, 7), act_scale=np.abs(x).max() / 127.0)
    Bs = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
    blocks, bw = [], []
    for scales in ((0.9, 0.8), (0.7, 0.6)):
        W1 = _rand_qtensor(rng, (64, 64, 3, 3), act_scale=scales[0])
        W2 = _rand_qtensor(rng, (64, 64, 3, 3), act_scale=scales[1])
        B1 = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
        B2 = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
        blocks.append((W1, B1, W2, B2))
        bw += [W1, B1, W2, B2]

    out = st.stage64(x, Ws, Bs, *bw, interpret=True)
    ref = _simulate(jnp.asarray(x), Ws, Bs, blocks)
    out = np.asarray(out, np.float32)
    ref = np.asarray(ref, np.float32)
    assert out.shape == ref.shape == (1, 64, 56, 56)
    # identical integer accumulations; scale-multiply association and the
    # final bf16 cast leave only tiny float noise (requant boundary flips
    # would show up as O(scale)-sized errors)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, rel
    mean_rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert mean_rel < 2e-3, mean_rel


def test_calibrate_on_already_fused_graph(tmp_path):
    """ADVICE r2: calibrating a net whose graph already contains stage64
    (e.g. loaded from a fused .pla) must record act scales for the stage's
    internal convs, or the TPU kernel silently decomposes."""
    from planer_tpu import io as pio
    net = _calibrated_quant_net()
    p = str(tmp_path / "fused.pla")
    pio.save_pla(p, net.graph, net.weights)
    net2 = pio.read_net(p)
    assert any(l.op == "stage64" for l in net2.graph.layers)
    net2.graph.meta.pop("act_scales", None)
    scales = calibrate_act_scales(
        net2, ev.synthetic_images(2, (3, 224, 224), seed=5, batch=1))
    stage_ws = [e.src[p] for e in net2.graph.flow
                for p in range(1, len(e.src))
                if net2.graph.layer_map()[e.layers[0]].op == "stage64"
                and p % 2 == 1]
    assert stage_ws and all(w in scales and scales[w] > 0 for w in stage_ws)
    # scales must agree with the ones a pre-fusion calibration produced
    ref = _calibrated_quant_net().graph.meta["act_scales"]
    for w in stage_ws:
        if w in ref:
            np.testing.assert_allclose(scales[w], ref[w], rtol=0.2)
