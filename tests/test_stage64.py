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


def test_fuse_pass_resnet50_stem_only():
    """Bottleneck blocks don't match stage64, but the stem + pool still
    fuses as a 0-block stage (bf16 out) so ResNet-50 gets the stem kernel."""
    net = models.resnet50()
    net.optimize()
    assert fuse_stage64(net) == 1
    stage = next(l for l in net.graph.layers if l.op == "stage64")
    assert stage.kwargs["blocks"] == 0
    net.graph.validate()
    # decomposed parity with the unfused chain
    ref = models.resnet50()
    ref.optimize()
    x = np.random.default_rng(4).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    np.testing.assert_allclose(np.asarray(net.program(x)),
                               np.asarray(ref.program(x)),
                               rtol=2e-4, atol=2e-4)


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


@pytest.mark.slow
def test_quantize_static_autofuses_and_oracle_runs():
    net = _calibrated_quant_net()
    assert any(l.op == "stage64" for l in net.graph.layers)
    x = np.random.default_rng(1).standard_normal((1, 3, 224, 224)).astype(
        np.float32)
    y_jit = np.asarray(net.program(x))       # CPU -> decomposed stage64, but
    y_orc = np.asarray(net.oracle.run(x))    # WITH the chained act quant
    # int8 weight quantization + the annotate_output_quant static activation
    # quantization (now active on every backend, not just TPU batch shapes)
    rel = np.abs(y_jit - y_orc).max() / (np.abs(y_orc).max() + 1e-9)
    assert rel < 0.25
    # argmax agreement holds on the CALIBRATION distribution (structured
    # synthetic images); raw gaussian noise clips against the static scales
    xs = np.concatenate(list(ev.synthetic_images(4, (3, 224, 224), seed=21,
                                                 batch=2)))
    agree = (np.asarray(net.program(xs)).argmax(1)
             == np.asarray(net.oracle.run(xs)).argmax(1)).mean()
    assert agree >= 0.75, agree


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


def _simulate(x, Ws, Bs, blocks, requant="trunc"):
    """Exact math of the fused kernel with plain lax ops: integer-valued f32
    convs are exact (|acc| < 2^24) and the epilogues mirror the kernel's
    FOLDED scale association (f' = w_scale*s_act*inv_next applied as one
    multiply, ReLU folded into the [0,127] clip, the maxpool taken over raw
    accumulators before the affine) — so kernel-vs-simulation is bit-exact
    up to the final bf16 cast, and any requant boundary flip is a bug, not
    tolerance noise.  ``requant='fxp'`` mirrors the int32 fixed-point
    epilogue exactly (same host folding via st._fxp_pack, int64 math)."""
    dn = ("NCHW", "OIHW", "NCHW")
    fxp = requant == "fxp"

    def fold_q(acc, f, b, sx=0.0, res=None):
        # quantizing epilogue, exact mirror of the kernel's chosen mode
        if fxp:
            q = np.asarray(st._fxp_pack(f, np.asarray(b) + 0.5, sx=sx),
                           np.int64)
            m, B, s, mr = (q[:, i].reshape(1, -1, 1, 1) for i in range(4))
            v = np.asarray(acc).astype(np.int64) * m + B
            if res is not None:
                v = v + np.asarray(res).astype(np.int64) * mr
            v = v >> s
            return jnp.asarray(np.clip(v, 0, 127).astype(np.float32))
        # trunc-fold: +0.5 into the bias, floor == the kernel's f32->int8
        # truncation for the non-negative post-ReLU plane
        v = acc * f.reshape(1, -1, 1, 1) + (np.asarray(b) + 0.5
                                            ).reshape(1, -1, 1, 1)
        if res is not None:
            v = v + res * sx
        return jnp.floor(jnp.clip(v, 0.0, 127.99))

    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / Ws.act_scale),
                  -127, 127)
    acc = lax.conv_general_dilated(xq, Ws.q.astype(jnp.float32), (2, 2),
                                   ((3, 3), (3, 3)), dimension_numbers=dn)
    # pool BEFORE the affine (max commutes with positive per-channel affine;
    # -inf init == the kernel's _NEG border sentinel)
    acc = lax.reduce_window(acc, -jnp.inf, lax.max, (1, 1, 3, 3),
                            (1, 1, 2, 2), ((0, 0), (0, 0), (1, 1), (1, 1)))
    if not blocks:     # stem-only stage: bf16 raw out, inv0 = 1
        v = (acc * (Ws.scale.reshape(1, -1, 1, 1) * (Ws.act_scale * 1.0))
             + (Bs * 1.0).reshape(1, -1, 1, 1))
        return jnp.maximum(v, 0.0)
    cur_s = blocks[0][0].act_scale
    inv0 = 1.0 / cur_s
    y = fold_q(acc, Ws.scale.reshape(-1) * (Ws.act_scale * inv0), Bs * inv0)
    for bi, (W1, B1, W2, B2) in enumerate(blocks):
        s_mid = W2.act_scale
        last = bi == len(blocks) - 1
        inv_out = 1.0 if last else 1.0 / blocks[bi + 1][0].act_scale
        a1 = lax.conv_general_dilated(y, W1.q.astype(jnp.float32), (1, 1),
                                      ((1, 1), (1, 1)), dimension_numbers=dn)
        y1 = fold_q(a1, W1.scale.reshape(-1) * (cur_s / s_mid), B1 / s_mid)
        a2 = lax.conv_general_dilated(y1, W2.q.astype(jnp.float32), (1, 1),
                                      ((1, 1), (1, 1)), dimension_numbers=dn)
        if last:    # bf16-emitting plane: exact f32 in BOTH requant modes
            v2 = (a2 * (W2.scale.reshape(1, -1, 1, 1) * s_mid)
                  + B2.reshape(1, -1, 1, 1) + y * cur_s)
            return jnp.maximum(v2, 0.0)
        y = fold_q(a2, np.asarray(W2.scale).reshape(-1) * (s_mid * inv_out),
                   B2 * inv_out, sx=cur_s * inv_out, res=y)
        cur_s = blocks[bi + 1][0].act_scale


def _rand_stage_inputs(rng, size, batch):
    x = rng.standard_normal((batch, 3, size, size)).astype(np.float32)
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
    return x, Ws, Bs, blocks, bw


# batch 2 exercises the 2-images-per-grid-step interleave; batch 1 the
# single-image path; 192/256 the derived (non-224) geometries (VERDICT r2
# weak #3: serving hw_buckets must keep the fast path).  The fxp cases
# cover the int32 fixed-point epilogue (the default on TPU), trunc the
# exact-f32 fallback.
@pytest.mark.slow
@pytest.mark.parametrize("size,batch,requant", [
    (224, 1, "fxp"), (224, 2, "fxp"), (192, 2, "fxp"), (256, 1, "fxp"),
    (224, 1, "trunc")])
def test_pallas_interpret_matches_simulation(size, batch, requant):
    rng = np.random.default_rng(7)
    x, Ws, Bs, blocks, bw = _rand_stage_inputs(rng, size, batch)

    old = st.REQUANT
    st.REQUANT = requant
    try:
        out = st.stage64(x, Ws, Bs, *bw, interpret=True)
    finally:
        st.REQUANT = old
    ref = _simulate(jnp.asarray(x), Ws, Bs, blocks, requant=requant)
    out = np.asarray(out, np.float32)
    ref = np.asarray(ref, np.float32)
    assert out.shape == ref.shape == (batch, 64, size // 4, size // 4)
    # the simulation mirrors the kernel's folded f32 association exactly, so
    # the only difference is the final bf16 cast (<= 2^-8 relative); any
    # requant boundary flip would show as an O(quant-step) ~ percent error
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel
    mean_rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert mean_rel < 2e-3, mean_rel


@pytest.mark.slow
def test_pallas_interpret_stem_only():
    """0-block stage (ResNet-50 stem): bf16 relu'd pooled output."""
    rng = np.random.default_rng(9)
    x, Ws, Bs, _, _ = _rand_stage_inputs(rng, 224, 1)
    out = np.asarray(st.stage64(x, Ws, Bs, interpret=True), np.float32)
    ref = np.asarray(_simulate(jnp.asarray(x), Ws, Bs, []), np.float32)
    assert out.shape == ref.shape == (1, 64, 56, 56)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-3, rel


def test_falloff_counter_and_geometry():
    """Ineligible shapes on the would-be-fast path bump FALLOFF with a
    reason instead of silently decomposing; derived geometries hold the
    layout invariants for every supported size."""
    rng = np.random.default_rng(3)
    x, Ws, Bs, _, bw = _rand_stage_inputs(rng, 100, 1)   # 100 % 4 == 0 but
    st.FALLOFF.clear()                                    # R=25 -> RS search
    g = st._geometry(100)
    if g is not None:   # geometry exists -> use a truly unsupported size
        x = rng.standard_normal((1, 3, 50, 50)).astype(np.float32)
    y = st.stage64(x, Ws, Bs, *bw, interpret=True)        # falls back
    assert y.shape[-2:] == (x.shape[-1] // 4,) * 2
    assert sum(st.FALLOFF.values()) == 1, dict(st.FALLOFF)
    for H in (64, 96, 128, 160, 192, 224, 256, 288):
        geo = st._geometry(H)
        assert geo is not None, H
        assert geo.R == H // 4 and geo.RS >= geo.R + 2
        assert (geo.R * geo.RS) % 128 == 0 and geo.RS + 1 <= st.HALO
        assert geo.S <= st._S_MAX


@pytest.mark.slow
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


# ------------------------------------------------- int8 output (out_scale)

@pytest.mark.slow
def test_pallas_interpret_out_scale_emits_codes():
    """With out_scale the kernel chain's final plane emits int8 activation
    CODES: dequantizing them must match the bf16-emitting run to within one
    quantization step (the only new error source is that final quantize)."""
    rng = np.random.default_rng(11)
    x, Ws, Bs, blocks, bw = _rand_stage_inputs(rng, 224, 2)
    ref = np.asarray(_simulate(jnp.asarray(x), Ws, Bs, blocks), np.float32)
    s_out = float(ref.max()) / 126.0       # a calibration-like scale
    old = st.REQUANT
    st.REQUANT = "trunc"    # exact epilogue: the one-quant-step bound below
    try:                    # only holds without fxp's ~0.9%/plane scale error
        q = np.asarray(st.stage64(x, Ws, Bs, *bw, out_scale=s_out,
                                  interpret=True))
    finally:
        st.REQUANT = old
    assert q.dtype == np.int8 and q.shape == (2, 64, 56, 56)
    assert q.min() >= 0 and q.max() <= 127
    deq = q.astype(np.float32) * s_out
    assert np.abs(deq - ref).max() <= s_out * (1 + 1e-3)
    # and the stem-only (0-block) emission path
    ref0 = np.asarray(_simulate(jnp.asarray(x), Ws, Bs, []), np.float32)
    s0 = float(ref0.max()) / 126.0
    q0 = np.asarray(st.stage64(x, Ws, Bs, out_scale=s0, interpret=True))
    assert q0.dtype == np.int8
    assert np.abs(q0.astype(np.float32) * s0 - ref0).max() \
        <= s0 * (1 + 1e-3)


def test_conv2d_prequantized_int8_input():
    """conv2d on int8 input = pre-quantized codes at K.act_scale, NO
    quantize pass.  C_in >= 128 takes the s8 MXU path; C_in < 128 (this
    case) DECODES the codes to the compute dtype and runs the float path
    (the forced-s8 path measured slower on lane-starved layers) — so the
    fp32 form is exact against the dequant reference while the bf16 form
    carries one bf16 rounding of the decoded activations."""
    from planer_tpu.ops import jax_ops as jops
    rng = np.random.default_rng(13)
    K = _rand_qtensor(rng, (32, 16, 3, 3), act_scale=0.02)
    B = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1)
    codes = jnp.asarray(rng.integers(-127, 128, size=(2, 16, 10, 10),
                                     dtype=np.int8))
    acc = lax.conv_general_dilated(
        codes.astype(jnp.float32), K.q.astype(jnp.float32), (2, 2),
        ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    ref = np.asarray(acc * (0.02 * K.scale.reshape(1, -1, 1, 1))
                     + B.reshape(1, -1, 1, 1))
    y32 = jops.conv2d(codes, K, B, strides=(2, 2), pads=(1, 1, 1, 1))
    assert y32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y32), ref, rtol=1e-5, atol=1e-5)
    y = jops.conv2d(codes, K, B, strides=(2, 2), pads=(1, 1, 1, 1),
                    compute_dtype="bfloat16")
    assert y.dtype == jnp.bfloat16
    # bf16 decode: |codes*s| <= 2.54, one bf16 round (2^-8 rel) per
    # element accumulated over K=144 taps
    np.testing.assert_allclose(np.asarray(y, np.float32), ref,
                               rtol=2e-2, atol=6e-2)


@pytest.mark.slow
def test_annotate_output_quant_resnet18():
    """net.quantize(activations='static') annotates every conv-relu-conv
    chain whose consumer is a C>=128 int8 conv with the consumer's
    calibrated scale; the stage64 stays UN-annotated (its consumers are
    C=64 convs, where forcing the s8 path measured a 3% net regression —
    experiments/elide_ab.json); codes flow producer -> relu -> consumer."""
    net = _calibrated_quant_net()
    graph = net.graph
    stage = next(l for l in graph.layers if l.op == "stage64")
    assert "out_scale" not in stage.kwargs, stage.kwargs
    ann = [l for l in graph.layers
           if l.op == "conv" and l.kwargs.get("out_scale")]
    # ResNet-18 body: conv1->relu->conv2 edges (6) plus — via the residual
    # add extension — every conv2/downsample feeding a resolvable add
    # (5 conv2s + 3 downsamples; l4.1's conv2 stays bf16, its add feeds
    # the head)
    assert len(ann) == 14, [l.name for l in ann]
    qadds = [l for l in graph.layers
             if l.op == "add" and "qadd" in l.kwargs]
    assert len(qadds) == 6, [l.name for l in qadds]
    emitting = [l for l in qadds if l.kwargs["qadd"][2] is not None]
    assert len(emitting) == 5, [l.name for l in emitting]
    # the one decode-add (l4.1: output feeds the head) takes its residual
    # operand as codes but emits float
    (dec,) = [l for l in qadds if l.kwargs["qadd"][2] is None]
    sa, sb, so = dec.kwargs["qadd"]
    assert (sa is None) != (sb is None) and so is None
    scales = graph.meta["act_scales"]
    layers = graph.layer_map()
    name_to_edge = {e.layers[0]: e for e in graph.flow if len(e.layers) == 1}
    for l in ann:
        y = name_to_edge[l.name].dst[0]
        relu_es = [e for e in graph.flow if e.src == [y]
                   and layers[e.layers[0]].op == "relu"]
        if not relu_es:
            # conv2/downsample producers feed their block's add directly;
            # the add records the operand's scale in qadd
            add_es = [e for e in graph.flow if y in e.src
                      and layers[e.layers[0]].op == "add"]
            assert add_es, l.name
            for e2 in add_es:
                q = layers[e2.layers[0]].kwargs["qadd"]
                assert l.kwargs["out_scale"] == q[list(e2.src).index(y)]
            continue
        cons = [e for e in graph.flow if e.src and e.src[0] == relu_es[0].dst[0]]
        assert cons, l.name
        for e2 in cons:
            l2 = layers[e2.layers[0]]
            if l2.op == "add":
                q = l2.kwargs["qadd"]
                assert l.kwargs["out_scale"] == \
                    q[list(e2.src).index(relu_es[0].dst[0])]
            else:
                assert scales[e2.src[1]] == l.kwargs["out_scale"]
    # the chain runs on CPU too: argmax agreement on the calibration
    # distribution (gaussian noise clips against the static scales)
    xs = np.concatenate(list(ev.synthetic_images(4, (3, 224, 224), seed=22,
                                                 batch=2)))
    agree = (np.asarray(net.program(xs)).argmax(1)
             == np.asarray(net.oracle.run(xs)).argmax(1)).mean()
    assert agree >= 0.75, agree


@pytest.mark.slow
def test_quantize_static_nofuse_tight_oracle_parity():
    """Companion to the loosened annotated-path gate (ADVICE r3): with the
    annotation machinery OFF (fuse=False) the quantized jit path must stay in
    tight lockstep with the fp32-dequant oracle — rel < 0.05 and exact
    argmax — so oracle diffing still catches moderate numeric bugs on the
    plain W8A8 static path."""
    net = models.resnet18()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(2, (3, 224, 224), seed=3,
                                                  batch=1))
    net.quantize("int8", activations="static", fuse=False)
    assert not any(l.kwargs.get("out_scale") for l in net.graph.layers)
    xs = np.concatenate(list(ev.synthetic_images(4, (3, 224, 224), seed=31,
                                                 batch=2)))
    y_jit = np.asarray(net.program(xs))
    y_orc = np.asarray(net.oracle.run(xs))
    rel = np.abs(y_jit - y_orc).max() / (np.abs(y_orc).max() + 1e-9)
    assert rel < 0.05, rel
    assert (y_jit.argmax(1) == y_orc.argmax(1)).all()


def test_annotate_requires_static_activations():
    """ADVICE r3 (medium): quantize(activations='dynamic', fuse=True) after
    a prior calibration must NOT annotate out_scale — a dynamic program has
    no static consumer scales, so annotated codes would decode to garbage.
    The gate is graph.meta['act_quant'] == 'static'."""
    net = models.resnet18()
    net.optimize()
    calibrate_act_scales(net, ev.synthetic_images(2, (3, 224, 224), seed=3,
                                                  batch=1))
    net.quantize("int8", activations="dynamic", fuse=True)
    assert net.graph.meta.get("act_scales")          # calibration persisted
    assert not any(l.kwargs.get("out_scale") for l in net.graph.layers)
    xs = np.concatenate(list(ev.synthetic_images(2, (3, 224, 224), seed=33,
                                                 batch=1)))
    y_jit = np.asarray(net.program(xs))
    y_orc = np.asarray(net.oracle.run(xs))
    rel = np.abs(y_jit - y_orc).max() / (np.abs(y_orc).max() + 1e-9)
    assert rel < 0.1, rel   # dynamic per-tensor quant, no silent garbage


def test_int8_graph_inputs_are_values_not_codes():
    """ADVICE r3: genuine int8 image data fed to a statically quantized net
    must be treated as VALUES — the tracer lifts int8 graph inputs to float
    at the boundary so the pre-quantized code gate can only see internally
    produced codes."""
    net = _calibrated_quant_net()
    rng = np.random.default_rng(7)
    x8 = rng.integers(-4, 5, size=(1, 3, 224, 224), dtype=np.int8)
    y8 = np.asarray(net.program(x8))
    yf = np.asarray(net.program(x8.astype(np.float32)))
    np.testing.assert_allclose(y8, yf, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("pack,requant,size", [
    ("pair", "trunc", 224), ("tri", "trunc", 192),
    ("pair", "fxp", 192), ("tri", "fxp", 224),
    ("nine", "fxp", 224), ("nine", "trunc", 192),
    ("dpair", "fxp", 224), ("dpair", "trunc", 192)])
def test_pallas_pack_matches_none(pack, requant, size):
    """PACK='pair'/'tri'/'nine' (lane-packed K=128/192/576 dots over
    dup-shifted activation banks) computes the IDENTICAL integer math as
    the per-tap form — outputs must be bit-equal, any diff is a shift bug
    (experiments/kernel_probe_r4.py found exactly such an uninitialized
    dup-lane bug this way)."""
    rng = np.random.default_rng(17)
    x, Ws, Bs, blocks, bw = _rand_stage_inputs(rng, size, 2)
    s_out = 0.11   # int8-code emission: exact integer comparison
    old_p, old_r = st.PACK, st.REQUANT
    try:
        st.REQUANT = requant
        st.PACK = "none"
        ref = np.asarray(st.stage64(x, Ws, Bs, *bw, out_scale=s_out,
                                    interpret=True))
        st.PACK = pack
        out = np.asarray(st.stage64(x, Ws, Bs, *bw, out_scale=s_out,
                                    interpret=True))
    finally:
        st.PACK, st.REQUANT = old_p, old_r
    assert ref.dtype == out.dtype == np.int8
    assert (ref == out).all()
