"""Sharding tests on the 8-virtual-device CPU mesh: DP/TP parity with
single-device execution, quantized sharded path, mesh shapes."""
import numpy as np
import pytest

import jax

from planer_tpu import models
from planer_tpu.parallel import (make_mesh, param_shardings, input_sharding,
                                 shard_program)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices("cpu")
    if len(d) < 8:
        pytest.skip("needs 8 virtual cpu devices")
    return d[:8]


def test_mesh_shapes(devices):
    mesh = make_mesh((4, 2), ("data", "model"), devices=devices)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(devices=devices)
    assert mesh1.shape["data"] == 8


def test_param_shardings_specs(devices):
    mesh = make_mesh((2, 4), ("data", "model"), devices=devices)
    net = models.resnet18(num_classes=32)
    prog = net.program
    shards = param_shardings(net.graph, prog.params, mesh)
    # conv kernels sharded on O (axis 0), fc weight on O, biases on O
    s = shards["stem.w"]
    assert s.spec[0] == "model"
    s = shards["fc.w"]
    assert s.spec[0] == "model"
    # folded-BN affine (1,C,1,1) sharded on channel axis
    s = shards["stem.bn.k"]
    assert s.spec[1] == "model"


def test_dp_tp_parity(rng, devices):
    """Sharded DP x TP execution must match single-device output."""
    net = models.resnet18(num_classes=16)
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    mesh = make_mesh((2, 4), ("data", "model"), devices=devices)
    shard_program(net, mesh)
    out = np.asarray(net.forward(x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_dp_only_parity(rng, devices):
    net = models.unet(in_ch=1, out_ch=1, base=8, depth=2)
    x = rng.standard_normal((8, 1, 32, 32)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    mesh = make_mesh((8, 1), ("data", "model"), devices=devices)
    shard_program(net, mesh)
    out = np.asarray(net.forward(x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_quantized_sharded(rng, devices):
    net = models.resnet18(num_classes=16)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    net.quantize("int8")
    ref = np.asarray(net.forward(x))
    mesh = make_mesh((2, 4), ("data", "model"), devices=devices)
    shard_program(net, mesh)
    out = np.asarray(net.forward(x))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
