"""ONNX frontend tests: protobuf codec round-trip + converter lowering
(incl. BatchNorm folding and Constant folding) + end-to-end execution of a
converted model."""
import numpy as np
import pytest

from planer_tpu.frontend import onnx_proto as P
from planer_tpu.frontend.onnx_convert import convert_model
from planer_tpu.runtime.net import Net
from planer_tpu.ir import unpack_weights


def _attr_i(name, v):
    return P.AttributeProto(name=name, i=v, type=P.ATTR.INT)


def _attr_f(name, v):
    return P.AttributeProto(name=name, f=v, type=P.ATTR.FLOAT)


def _attr_ints(name, v):
    return P.AttributeProto(name=name, ints=list(v), type=P.ATTR.INTS)


def _attr_s(name, v):
    return P.AttributeProto(name=name, s=v.encode(), type=P.ATTR.STRING)


def _vi(name, shape, elem=1):
    return P.ValueInfoProto(name=name, elem_type=elem, shape=list(shape))


def make_small_model(rng):
    """x -> Conv(3->4, 3x3, pad 1) -> BatchNormalization -> Relu ->
    GlobalAveragePool -> Flatten -> Gemm(4->2) -> out"""
    Wc = (rng.standard_normal((4, 3, 3, 3)) * 0.3).astype(np.float32)
    Bc = rng.standard_normal(4).astype(np.float32)
    scale = (1 + 0.1 * rng.standard_normal(4)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(4)).astype(np.float32)
    mean = (0.1 * rng.standard_normal(4)).astype(np.float32)
    var = (1 + 0.1 * np.abs(rng.standard_normal(4))).astype(np.float32)
    Wg = (rng.standard_normal(2, ).reshape(1, 2) * 0 +
          rng.standard_normal((4, 2)) * 0.3).astype(np.float32)  # (K, N): transB=0
    Bg = rng.standard_normal(2).astype(np.float32)

    nodes = [
        P.NodeProto(input=["x", "conv.w", "conv.b"], output=["c1"],
                    name="conv1", op_type="Conv",
                    attribute=[_attr_ints("kernel_shape", [3, 3]),
                               _attr_ints("pads", [1, 1, 1, 1]),
                               _attr_ints("strides", [1, 1]),
                               _attr_ints("dilations", [1, 1]),
                               _attr_i("group", 1)]),
        P.NodeProto(input=["c1", "bn.s", "bn.b", "bn.m", "bn.v"],
                    output=["b1"], name="bn1", op_type="BatchNormalization",
                    attribute=[_attr_f("epsilon", 1e-3)]),
        P.NodeProto(input=["b1"], output=["r1"], name="relu1", op_type="Relu"),
        P.NodeProto(input=["r1"], output=["g1"], name="gap1",
                    op_type="GlobalAveragePool"),
        P.NodeProto(input=["g1"], output=["f1"], name="flat1",
                    op_type="Flatten", attribute=[_attr_i("axis", 1)]),
        P.NodeProto(input=["f1", "gemm.w", "gemm.b"], output=["y"],
                    name="gemm1", op_type="Gemm",
                    attribute=[_attr_i("transB", 0)]),
    ]
    graph = P.GraphProto(
        node=nodes, name="small",
        initializer=[P.from_array(Wc, "conv.w"), P.from_array(Bc, "conv.b"),
                     P.from_array(scale, "bn.s"), P.from_array(bias, "bn.b"),
                     P.from_array(mean, "bn.m"), P.from_array(var, "bn.v"),
                     P.from_array(Wg, "gemm.w"), P.from_array(Bg, "gemm.b")],
        input=[_vi("x", (1, 3, 8, 8))],
        output=[_vi("y", (1, 2))],
    )
    model = P.ModelProto(graph=graph)
    refs = dict(Wc=Wc, Bc=Bc, scale=scale, bias=bias, mean=mean, var=var,
                Wg=Wg, Bg=Bg)
    return model, refs


def test_proto_roundtrip(rng, tmp_path):
    model, _ = make_small_model(rng)
    p = str(tmp_path / "m.onnx")
    P.save_model(model, p)
    m2 = P.load_model(p)
    assert len(m2.graph.node) == len(model.graph.node)
    assert [n.op_type for n in m2.graph.node] == \
           [n.op_type for n in model.graph.node]
    assert m2.graph.node[0].attribute[0].ints == [3, 3]
    assert abs(m2.graph.node[1].attribute[0].f - 1e-3) < 1e-9
    a0 = P.to_array(model.graph.initializer[0])
    a2 = P.to_array(m2.graph.initializer[0])
    np.testing.assert_array_equal(a0, a2)
    assert m2.graph.input[0].name == "x"
    assert m2.graph.input[0].shape == [1, 3, 8, 8]


def test_convert_and_run(rng):
    model, refs = make_small_model(rng)
    graph, blob = convert_model(model)
    assert graph.inputs == ["x"]
    # BN folded: batchnorm layer with affine inits, originals retained in blob
    ops = [l.op for l in graph.layers]
    assert "batchnorm" in ops and "conv" in ops and "dense" in ops
    net = Net(graph)
    net.weights = unpack_weights(graph, blob)
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    out = np.asarray(net.forward(x, engine="numpy"))

    # manual reference computation
    from planer_tpu.ops import numpy_ops as nops
    c = nops.conv2d(x, refs["Wc"], refs["Bc"], pads=(1, 1, 1, 1))
    inv = 1 / np.sqrt(refs["var"] + 1e-3)
    b = c * (refs["scale"] * inv).reshape(1, -1, 1, 1) + (
        refs["bias"] - refs["scale"] * refs["mean"] * inv
    ).reshape(1, -1, 1, 1)
    r = np.maximum(b, 0).mean(axis=(2, 3))
    y = r @ refs["Wg"] + refs["Bg"]
    np.testing.assert_allclose(out, y, rtol=1e-4, atol=1e-5)

    # jitted path agrees too
    out_j = np.asarray(net.forward(x))
    np.testing.assert_allclose(out_j, y, rtol=1e-3, atol=1e-4)


def test_constant_folding(rng):
    cval = np.array([2.0, 3.0], np.float32)
    nodes = [
        P.NodeProto(input=[], output=["c"], name="konst", op_type="Constant",
                    attribute=[P.AttributeProto(
                        name="value", t=P.from_array(cval),
                        type=P.ATTR.TENSOR)]),
        P.NodeProto(input=["x", "c"], output=["y"], name="addc",
                    op_type="Add"),
    ]
    graph = P.GraphProto(node=nodes, input=[_vi("x", (2,))],
                         output=[_vi("y", (2,))])
    g, blob = convert_model(P.ModelProto(graph=graph))
    # Constant became an init, not a layer
    assert all(l.op != "const" for l in g.layers)
    assert "c" in g.init_names()
    net = Net(g)
    net.weights = unpack_weights(g, blob)
    out = np.asarray(net.forward(np.array([1.0, 1.0], np.float32),
                                 engine="numpy"))
    np.testing.assert_allclose(out, [3.0, 4.0])


def test_unknown_op_raises(rng):
    nodes = [P.NodeProto(input=["x"], output=["y"], name="w",
                         op_type="Wormhole")]
    graph = P.GraphProto(node=nodes, input=[_vi("x", (2,))],
                         output=[_vi("y", (2,))])
    with pytest.raises(NotImplementedError, match="Wormhole"):
        convert_model(P.ModelProto(graph=graph))


def test_opset13_squeeze_axes_as_input(rng):
    """Squeeze with axes as a second (initializer) input — opset 13 form."""
    axes = np.array([0], np.int64)
    nodes = [P.NodeProto(input=["x", "ax"], output=["y"], name="sq",
                         op_type="Squeeze")]
    graph = P.GraphProto(node=nodes, initializer=[P.from_array(axes, "ax")],
                         input=[_vi("x", (1, 3))], output=[_vi("y", (3,))])
    g, blob = convert_model(P.ModelProto(graph=graph))
    net = Net(g)
    net.weights = unpack_weights(g, blob)
    out = net.forward(rng.standard_normal((1, 3)).astype(np.float32),
                      engine="numpy")
    assert np.asarray(out).shape == (3,)


def test_varint_edge_cases():
    from planer_tpu.frontend.onnx_proto import _write_varint, _read_varint
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -42):
        b = bytearray()
        _write_varint(b, v)
        out, pos = _read_varint(memoryview(bytes(b)), 0)
        if v < 0:
            out = out - (1 << 64)
        assert out == v and pos == len(b)


def test_lstm_through_converter(rng):
    """ONNX LSTM node with optional inputs omitted (empty names)."""
    L, N, D, H = 4, 2, 6, 5
    W = (rng.standard_normal((1, 4 * H, D)) * 0.3).astype(np.float32)
    R = (rng.standard_normal((1, 4 * H, H)) * 0.3).astype(np.float32)
    B = (rng.standard_normal((1, 8 * H)) * 0.1).astype(np.float32)
    nodes = [P.NodeProto(
        input=["x", "w", "r", "b"], output=["y", "yh", "yc"], name="rnn",
        op_type="LSTM",
        attribute=[_attr_i("hidden_size", H), _attr_s("direction", "forward")])]
    graph = P.GraphProto(
        node=nodes,
        initializer=[P.from_array(W, "w"), P.from_array(R, "r"),
                     P.from_array(B, "b")],
        input=[_vi("x", (L, N, D))], output=[_vi("y", (L, 1, N, H))])
    g, blob = convert_model(P.ModelProto(graph=graph))
    net = Net(g)
    net.weights = unpack_weights(g, blob)
    x = rng.standard_normal((L, N, D)).astype(np.float32)
    out = net.forward(x, engine="numpy")
    from planer_tpu.ops import numpy_ops as nops
    ref = nops.lstm(x, W, R, B, direction="forward")[0]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # jitted path (lax.scan) agrees
    out_j = net.forward(x)
    np.testing.assert_allclose(np.asarray(out_j), ref, rtol=1e-4, atol=1e-4)


def test_slice_opset10_inputs(rng):
    """Slice with starts/ends/axes/steps as tensor inputs (opset 10+)."""
    nodes = [P.NodeProto(input=["x", "st", "en", "ax", "sp"], output=["y"],
                         name="sl", op_type="Slice")]
    graph = P.GraphProto(
        node=nodes,
        initializer=[P.from_array(np.array([1], np.int64), "st"),
                     P.from_array(np.array([4], np.int64), "en"),
                     P.from_array(np.array([1], np.int64), "ax"),
                     P.from_array(np.array([2], np.int64), "sp")],
        input=[_vi("x", (2, 6))], output=[_vi("y", (2, 2))])
    g, blob = convert_model(P.ModelProto(graph=graph))
    net = Net(g)
    net.weights = unpack_weights(g, blob)
    x = rng.standard_normal((2, 6)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(net.forward(x, engine="numpy")),
                               x[:, 1:4:2])
    np.testing.assert_allclose(np.asarray(net.forward(x)), x[:, 1:4:2])


def test_conv_auto_pad_through_converter(rng):
    """Conv with auto_pad=SAME_UPPER (no pads attr) loads and runs — the
    reference silently ignores the attribute (io.py:92-116); we resolve it."""
    W = (rng.standard_normal((4, 3, 3, 3)) * 0.3).astype(np.float32)
    nodes = [P.NodeProto(
        input=["x", "w"], output=["y"], name="c", op_type="Conv",
        attribute=[_attr_ints("kernel_shape", [3, 3]),
                   _attr_ints("strides", [2, 2]),
                   _attr_s("auto_pad", "SAME_UPPER")])]
    graph = P.GraphProto(node=nodes, initializer=[P.from_array(W, "w")],
                         input=[_vi("x", (1, 3, 13, 13))],
                         output=[_vi("y", (1, 4, 7, 7))])
    g, blob = convert_model(P.ModelProto(graph=graph))
    net = Net(g)
    net.weights = unpack_weights(g, blob)
    x = rng.standard_normal((1, 3, 13, 13)).astype(np.float32)
    yn = np.asarray(net.forward(x, engine="numpy"))
    assert yn.shape == (1, 4, 7, 7)  # ceil(13/2)
    yj = np.asarray(net.forward(x))
    np.testing.assert_allclose(yn, yj, rtol=1e-4, atol=1e-4)


def test_pool_ceil_mode_through_converter(rng):
    nodes = [P.NodeProto(
        input=["x"], output=["y"], name="p", op_type="MaxPool",
        attribute=[_attr_ints("kernel_shape", [3, 3]),
                   _attr_ints("strides", [2, 2]),
                   _attr_i("ceil_mode", 1)])]
    graph = P.GraphProto(node=nodes, input=[_vi("x", (1, 2, 14, 14))],
                         output=[_vi("y", (1, 2, 7, 7))])
    g, blob = convert_model(P.ModelProto(graph=graph))
    net = Net(g)
    net.weights = unpack_weights(g, blob)
    x = rng.standard_normal((1, 2, 14, 14)).astype(np.float32)
    yn = np.asarray(net.forward(x, engine="numpy"))
    assert yn.shape == (1, 2, 7, 7)  # ceil((14-3)/2)+1
    np.testing.assert_allclose(yn, np.asarray(net.forward(x)), rtol=1e-5)


def test_gemm_beta_non_init_bias_raises(rng):
    W = rng.standard_normal((3, 2)).astype(np.float32)
    nodes = [
        P.NodeProto(input=["x"], output=["b"], name="r", op_type="Relu"),
        P.NodeProto(input=["x", "w", "b"], output=["y"], name="g",
                    op_type="Gemm",
                    attribute=[_attr_f("beta", 0.5)]),
    ]
    graph = P.GraphProto(node=nodes, initializer=[P.from_array(W, "w")],
                         input=[_vi("x", (1, 3))], output=[_vi("y", (1, 2))])
    with pytest.raises(NotImplementedError, match="beta"):
        convert_model(P.ModelProto(graph=graph))


def test_opset13_axes_inputs_jit_path(rng):
    """Squeeze/Unsqueeze/Split with axes/split as initializer INPUTS must
    trace through the jitted path (static_args hoists them to trace time;
    without it the jax impl crashes converting a tracer to numpy)."""
    nodes = [
        P.NodeProto(input=["x", "ax0"], output=["u"], name="un",
                    op_type="Unsqueeze"),
        P.NodeProto(input=["u", "sp"], output=["s1", "s2"], name="sp0",
                    op_type="Split", attribute=[_attr_i("axis", 2)]),
        P.NodeProto(input=["s1", "s2"], output=["m"], name="mu",
                    op_type="Mul"),
        P.NodeProto(input=["m", "ax0"], output=["y"], name="sq",
                    op_type="Squeeze"),
    ]
    graph = P.GraphProto(
        node=nodes,
        initializer=[P.from_array(np.array([0], np.int64), "ax0"),
                     P.from_array(np.array([2, 2], np.int64), "sp")],
        input=[_vi("x", (3, 4))], output=[_vi("y", (3, 2))])
    g, blob = convert_model(P.ModelProto(graph=graph))
    net = Net(g)
    net.weights = unpack_weights(g, blob)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    ref = x[:, :2] * x[:, 2:]
    np.testing.assert_allclose(np.asarray(net.forward(x, engine="numpy")),
                               ref, rtol=1e-6)
    # the jitted path must not fall back to a host tail: whole graph traces
    assert net.program.plan.cut >= len(g.flow)
    np.testing.assert_allclose(np.asarray(net.forward(x)), ref, rtol=1e-5)
