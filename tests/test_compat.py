"""Reference API-surface compatibility: every public symbol planer users
rely on (reference __init__.py exports) exists and behaves."""
import numpy as np
import pytest

import planer_tpu as pt
from planer_tpu import GraphBuilder


def test_reference_symbols_exist():
    # __init__.py:7 InferenceSession; io read_net/onnx2pla; Net; core;
    # asnumpy/asarray; zoo: Model/load/download/downloads/source/
    # list_source/get_source; util: tile/resize/mapcoord/filters
    for sym in ("read_net", "InferenceSession", "Net", "core", "asnumpy",
                "asarray", "Model", "load", "download", "downloads",
                "source", "list_source", "get_source", "tile", "resize",
                "mapcoord", "uniform_filter", "gaussian_filter", "onnx2pla"):
        assert hasattr(pt, sym), f"missing public symbol {sym}"


def test_core_is_noop_shim():
    import numpy as np2
    out = pt.core(np2)
    import jax.numpy as jnp
    assert out is jnp


def test_asnumpy_asarray(rng):
    import jax.numpy as jnp
    x = jnp.ones((2, 2))
    a = pt.asnumpy(x)
    assert isinstance(a, np.ndarray)
    b = pt.asarray(np.ones((2, 2)))
    assert hasattr(b, "devices") or hasattr(b, "device")


def _simple_net(rng):
    b = GraphBuilder(["x"])
    W = b.weight("w", (rng.standard_normal((4, 3)) * 0.5).astype(np.float32))
    Bv = b.weight("b", rng.standard_normal(4).astype(np.float32))
    y = b.dense("x", W, Bv)
    b.ret(y)
    return b.build_net()


def test_run_onnxruntime_style(rng):
    net = _simple_net(rng)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    out = net.run(None, {"x": x})
    assert isinstance(out, tuple) and out[0].shape == (2, 4)


def test_dict_call(rng):
    net = _simple_net(rng)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    np.testing.assert_allclose(net({"x": x}), net(x))


def test_half_bfloat16(rng):
    net = _simple_net(rng)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    ref = net(x)
    net.half("bfloat16")
    import ml_dtypes
    assert net.weights[0].dtype == ml_dtypes.bfloat16
    out = net(x)
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9) < 0.02


def test_half_float16(rng):
    net = _simple_net(rng)
    net.half()
    assert net.weights[0].dtype == np.float16
    x = rng.standard_normal((2, 3)).astype(np.float32)
    assert np.isfinite(net(x)).all()


def test_fp8_quantization(rng):
    from planer_tpu import models
    net = models.resnet18(num_classes=10)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    net.quantize("fp8")
    import ml_dtypes
    assert net.weights[0].dtype == ml_dtypes.float8_e4m3fn
    out = np.asarray(net.forward(x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, f"fp8 rel err {rel}"


def test_quantized_pla_roundtrip(rng, tmp_path):
    """Quantized models round-trip through .pla (quantized-.pla extension)."""
    from planer_tpu import models, io
    net = models.resnet18(num_classes=10)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    net.quantize("int8")
    ref = np.asarray(net.forward(x))
    p = str(tmp_path / "q18")
    io.save_pla(p, net.graph, net.weights)
    net2 = pt.read_net(p)
    assert net2.graph.quant
    assert net2.weights[0].dtype == np.int8
    out = np.asarray(net2.forward(x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_hlo_dump(rng):
    net = _simple_net(rng)
    x = rng.standard_normal((1, 3)).astype(np.float32)
    txt = net.program.lowered_text(x)
    assert "dot" in txt or "dot_general" in txt


def test_debug_shape_trace(rng, capsys):
    net = _simple_net(rng)
    x = rng.standard_normal((1, 3)).astype(np.float32)
    net.forward(x, debug=True)
    out = capsys.readouterr().out
    assert "dense" in out and "(1, 3)" in out
