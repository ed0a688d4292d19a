"""Tracer tests: jitted-vs-oracle parity, static hoisting, host-tail split,
chain semantics, scalar-dst tuples, quantization."""
import numpy as np
import pytest

from planer_tpu import GraphBuilder, Net
from planer_tpu.runtime.tracer import TracedProgram, analyze


def small_cnn(rng):
    b = GraphBuilder(["x"])
    K1 = b.weight("c1.w", rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2)
    B1 = b.weight("c1.b", rng.standard_normal(8).astype(np.float32))
    Kbn = b.weight("bn.k", rng.standard_normal((1, 8, 1, 1)).astype(np.float32))
    Bbn = b.weight("bn.b", rng.standard_normal((1, 8, 1, 1)).astype(np.float32))
    K2 = b.weight("fc.w", rng.standard_normal((10, 8)).astype(np.float32) * 0.2)
    B2 = b.weight("fc.b", rng.standard_normal(10).astype(np.float32))
    y = b.conv("x", K1, B1, strides=[1, 1], pads=[1, 1, 1, 1],
               dilations=[1, 1], group=1)
    y = b.batchnorm(y, Kbn, Bbn)
    y = b.relu(y)
    y = b.maxpool(y, w=[2, 2], strides=[2, 2], pads=[0, 0, 0, 0])
    y = b.gap(y)
    y = b.flatten(y)
    y = b.dense(y, K2, B2)
    b.ret(y)
    return b.build()


def test_cnn_parity(rng):
    g, w = small_cnn(rng)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    net = Net(g, w)
    ref = net.forward(x, engine="numpy")
    out = net.forward(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_whole_graph_traced(rng):
    g, w = small_cnn(rng)
    plan = analyze(g)
    assert plan.cut == len(g.flow)
    # conv/bn/dense weights all consumed dynamically
    assert {"c1.w", "c1.b", "bn.k", "bn.b", "fc.w", "fc.b"} <= plan.dyn_weights


def test_static_hoisting(rng):
    """A shape->gather->mul->reshape chain must fold away at trace time."""
    b = GraphBuilder(["x"])
    two = b.weight("two", np.array([2], dtype=np.int64))
    shp = b.shape("x")
    n = b.gather(shp, b.weight("idx", np.array(0, dtype=np.int64)))
    n2 = b.mul(b.unsqueeze(n, axes=[0]), two)
    rest = b.weight("rest", np.array([-1], dtype=np.int64))
    tgt = b.concat(n2, rest, axis=0)
    y = b.reshape("x", tgt)
    b.ret(y)
    g, w = b.build()
    plan = analyze(g)
    assert plan.cut == len(g.flow)  # fully traceable
    prog = TracedProgram(g, w)
    x = rng.standard_normal((3, 4, 2)).astype(np.float32)
    out = prog(x)
    np.testing.assert_allclose(np.asarray(out), x.reshape(6, -1))


def test_host_tail_split(rng):
    """nonzero forces a cut; the tail runs on host with prefix outputs."""
    b = GraphBuilder(["x"])
    y = b.relu("x")
    nz = b.nonzero(y)
    cnt = b.shape(nz)
    b.ret(nz)
    g, w = b.build()
    plan = analyze(g)
    assert plan.cut == 1  # relu traced; nonzero on host
    prog = TracedProgram(g, w)
    x = np.array([[-1.0, 3.0], [2.0, -5.0]], dtype=np.float32)
    out = prog(x)
    expect = np.array(np.nonzero(np.maximum(x, 0)))
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_chain_semantics(rng):
    """[src, [l1, l2], dst] threads dst through the chain (net.py:46-47)."""
    b = GraphBuilder(["x"])
    b.layers.append(__import__("planer_tpu").Layer("r1", "relu", {}))
    b.layers.append(__import__("planer_tpu").Layer("s1", "sigmoid", {}))
    from planer_tpu.ir import FlowEdge
    b.flow.append(FlowEdge(["x"], ["r1", "s1"], ["y"], True, True))
    b.ret("y")
    g, w = b.build()
    net = Net(g, w)
    x = rng.standard_normal((3, 3)).astype(np.float32)
    ref = 1 / (1 + np.exp(-np.maximum(x, 0)))
    np.testing.assert_allclose(net.forward(x, engine="numpy"), ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(net.forward(x)), ref, rtol=1e-6)


def test_multi_output_and_scalar_dst(rng):
    b = GraphBuilder(["x"])
    a, c = b.split("x", split=[2, 2], axis=0, n_out=2)
    y = b.add(a, c)
    b.ret([y, a])
    g, w = b.build()
    net = Net(g, w)
    x = rng.standard_normal((4, 3)).astype(np.float32)
    ref = net.forward(x, engine="numpy")
    out = net.forward(x)
    assert isinstance(ref, tuple) and len(ref) == 2
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-6)


def test_input_used_twice_liveness(rng):
    b = GraphBuilder(["x"])
    y1 = b.relu("x")
    y2 = b.sigmoid("x")
    y = b.add(y1, y2)
    b.ret(y)
    g, w = b.build()
    net = Net(g, w)
    x = rng.standard_normal((2, 2)).astype(np.float32)
    ref = np.maximum(x, 0) + 1 / (1 + np.exp(-x))
    np.testing.assert_allclose(net.forward(x, engine="numpy"), ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(net.forward(x)), ref, rtol=1e-5)


def test_quantize_parity(rng):
    g, w = small_cnn(rng)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    net = Net(g, w)
    ref = np.asarray(net.forward(x))
    net.quantize("int8")
    assert net.graph.quant  # conv + dense weights quantized
    assert net.weights[0].dtype == np.int8
    out = np.asarray(net.forward(x))
    # weight-only int8: small relative error
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, f"int8 error too large: {err}"


def test_quantized_oracle_matches(rng):
    g, w = small_cnn(rng)
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    net = Net(g, w)
    net.quantize("int8")
    jit_out = np.asarray(net.forward(x))
    num_out = np.asarray(net.forward(x, engine="numpy"))
    np.testing.assert_allclose(jit_out, num_out, rtol=1e-3, atol=1e-3)


def test_retrace_on_new_shape(rng):
    g, w = small_cnn(rng)
    net = Net(g, w)
    for shape in [(1, 3, 16, 16), (2, 3, 32, 32)]:
        x = rng.standard_normal(shape).astype(np.float32)
        ref = net.forward(x, engine="numpy")
        out = net.forward(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_compute_dtype(rng):
    g, w = small_cnn(rng)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    net = Net(g, w)
    ref = np.asarray(net.forward(x))
    net.astype_compute("bfloat16")
    out = np.asarray(net.forward(x))
    assert out.dtype == np.float32  # fp32 at the API boundary
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.03, f"bf16 rel err {rel}"


def test_bf16_with_int8(rng):
    g, w = small_cnn(rng)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    net = Net(g, w)
    ref = np.asarray(net.forward(x))
    net.quantize("int8")
    net.astype_compute("bfloat16")
    out = np.asarray(net.forward(x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.06, f"int8+bf16 rel err {rel}"


def test_multi_input_graph(rng):
    b = GraphBuilder(["a", "b"])
    y = b.add("a", "b")
    y = b.relu(y)
    b.ret(y)
    g, w = b.build()
    net = Net(g, w)
    xa = rng.standard_normal((3, 4)).astype(np.float32)
    xb = rng.standard_normal((3, 4)).astype(np.float32)
    ref = np.maximum(xa + xb, 0)
    np.testing.assert_allclose(net.forward(xa, xb, engine="numpy"), ref,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(net.forward(xa, xb)), ref,
                               rtol=1e-6)
    np.testing.assert_allclose(net({"b": xb, "a": xa}), ref, rtol=1e-6)


def test_wrong_input_count_raises(rng):
    g, w = small_cnn(rng)
    net = Net(g, w)
    with pytest.raises(TypeError, match="expects 1 input"):
        net.forward(np.zeros((1, 3, 8, 8), np.float32),
                    np.zeros((1, 3, 8, 8), np.float32))


def test_w8a8_dynamic_activation_quant(rng):
    """W8A8 path (C>=128 layers) stays within dynamic-quant tolerance."""
    b = GraphBuilder(["x"])
    K1 = b.weight("c1.w", (rng.standard_normal((128, 128, 3, 3)) * 0.1
                           ).astype(np.float32))
    B1 = b.weight("c1.b", rng.standard_normal(128).astype(np.float32))
    y = b.conv("x", K1, B1, strides=[1, 1], pads=[1, 1, 1, 1],
               dilations=[1, 1], group=1)
    y = b.relu(y)
    b.ret(y)
    net = Net(*b.build())
    # batch*H*W must cross the W8A8 amortization gate (>= 4096)
    x = rng.standard_normal((16, 128, 16, 16)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    net.quantize("int8", activations="dynamic")
    assert net.graph.meta.get("act_quant") == "dynamic"
    out = np.asarray(net.forward(x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, f"w8a8 rel err {rel}"


def test_w8a8_resnet_agreement(rng):
    from planer_tpu import models
    from planer_tpu.models import eval as ev
    fp = models.resnet18(num_classes=32)
    q = models.resnet18(num_classes=32)
    q.optimize()
    q.quantize("int8", activations="dynamic")
    agree = ev.top1_agreement(fp, q, n=24, shape=(3, 64, 64))
    assert agree >= 0.9, f"w8a8 top-1 agreement {agree}"


def test_calibrated_static_activation_scales(rng):
    from planer_tpu import models
    from planer_tpu.quant import calibrate_act_scales
    from planer_tpu.models import eval as ev
    net = models.resnet18(num_classes=16)
    fp = models.resnet18(num_classes=16)
    net.optimize()
    cal = [x for x in ev.synthetic_images(8, (3, 64, 64), seed=5)]
    scales = calibrate_act_scales(net, cal)
    assert len(scales) >= 15  # most convs calibrated
    net.quantize("int8", activations="static")
    agree = ev.top1_agreement(fp, net, n=24, shape=(3, 64, 64), seed=9)
    assert agree >= 0.9, f"static-W8A8 top-1 agreement {agree}"
