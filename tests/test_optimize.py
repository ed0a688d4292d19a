"""Graph optimizer: BN-into-conv folding correctness."""
import numpy as np

from planer_tpu import models, GraphBuilder, Net


def test_fold_bn_resnet(rng):
    net = models.resnet18(num_classes=16)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    rep = net.optimize()
    assert rep["fold_bn_into_conv"] == 20  # every conv/bn pair in resnet18
    assert all(l.op != "batchnorm" for l in net.graph.layers)
    out = np.asarray(net.forward(x))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
    # oracle path agrees too
    out_np = np.asarray(net.forward(x, engine="numpy"))
    np.testing.assert_allclose(out_np, ref, rtol=1e-3, atol=1e-3)


def test_fold_bn_then_quantize(rng):
    net = models.resnet18(num_classes=16)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    net.optimize()
    net.quantize("int8")
    out = np.asarray(net.forward(x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_fold_bn_conv_with_bias(rng):
    b = GraphBuilder(["x"])
    W = b.weight("w", (rng.standard_normal((4, 3, 3, 3)) * 0.3).astype(np.float32))
    Bc = b.weight("bc", rng.standard_normal(4).astype(np.float32))
    K = b.weight("k", (1 + 0.2 * rng.standard_normal((1, 4, 1, 1))).astype(np.float32))
    Bb = b.weight("bb", (0.2 * rng.standard_normal((1, 4, 1, 1))).astype(np.float32))
    y = b.conv("x", W, Bc, pads=[1, 1, 1, 1], strides=[1, 1],
               dilations=[1, 1], group=1)
    y = b.batchnorm(y, K, Bb)
    y = b.relu(y)
    b.ret(y)
    net = b.build_net()
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    ref = np.asarray(net.forward(x, engine="numpy"))
    assert net.optimize()["fold_bn_into_conv"] == 1
    out = np.asarray(net.forward(x, engine="numpy"))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_no_fold_when_conv_output_shared(rng):
    """conv output consumed by bn AND another op -> must not fold."""
    b = GraphBuilder(["x"])
    W = b.weight("w", (rng.standard_normal((4, 3, 1, 1)) * 0.3).astype(np.float32))
    K = b.weight("k", np.ones((1, 4, 1, 1), np.float32))
    Bb = b.weight("bb", np.zeros((1, 4, 1, 1), np.float32))
    y = b.conv("x", W, None, pads=[0, 0, 0, 0], strides=[1, 1],
               dilations=[1, 1], group=1)
    z = b.batchnorm(y, K, Bb)
    w2 = b.add(z, y)   # second consumer of y
    b.ret(w2)
    net = b.build_net()
    x = rng.standard_normal((1, 3, 4, 4)).astype(np.float32)
    ref = np.asarray(net.forward(x, engine="numpy"))
    assert net.optimize()["fold_bn_into_conv"] == 0
    np.testing.assert_allclose(net.forward(x, engine="numpy"), ref)


def test_fold_drops_dead_inits(rng):
    from planer_tpu import models
    net = models.resnet18(num_classes=8)
    n_before = len(net.graph.inits)
    net.optimize()
    # 20 folds, each conv was bias-less: K reused as bias, B dropped -> net -20
    assert len(net.graph.inits) == n_before - 20
    assert len(net.weights) == len(net.graph.inits)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    assert np.isfinite(np.asarray(net.forward(x, engine="numpy"))).all()
