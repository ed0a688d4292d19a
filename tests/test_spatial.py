"""Spatial (H-axis) sharding: GSPMD path parity and explicit halo exchange."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from planer_tpu import models
from planer_tpu.parallel import make_mesh
from planer_tpu.parallel.spatial import shard_spatial, halo_exchange, spatial_conv


@pytest.fixture(scope="module")
def devices():
    d = jax.devices("cpu")
    if len(d) < 8:
        pytest.skip("needs 8 virtual cpu devices")
    return d[:8]


def test_shard_spatial_parity(rng, devices):
    """H-sharded execution must be EXACT vs unsharded (GSPMD halos), unlike
    host-side tile() which loses receptive field at window borders."""
    net = models.unet(in_ch=1, out_ch=1, base=8, depth=2)
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    mesh = make_mesh((1, 8), ("data", "model"), devices=devices)
    shard_spatial(net, mesh)
    out = np.asarray(net.forward(x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_shard_spatial_resnet(rng, devices):
    net = models.resnet18(num_classes=8)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    ref = np.asarray(net.forward(x))
    mesh = make_mesh((2, 4), ("data", "model"), devices=devices)
    shard_spatial(net, mesh)
    out = np.asarray(net.forward(x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_halo_exchange_rows(rng, devices):
    """Each shard must see its neighbours' edge rows; outer edges zero."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh((1, 8), ("data", "model"), devices=devices)
    x = np.arange(8 * 8, dtype=np.float32).reshape(1, 1, 8, 8)
    x = np.broadcast_to(x, (1, 1, 8, 8)).copy()

    def f(xl):
        return halo_exchange(xl, 1, "model")

    fn = shard_map(f, mesh=mesh, in_specs=(P(None, None, "model", None),),
                   out_specs=P(None, None, "model", None))
    out = np.asarray(fn(jnp.asarray(x)))
    # output: each device's 1-row shard extended to 3 rows, stacked -> 24 rows
    assert out.shape == (1, 1, 24, 8)
    # device 0: [zeros, row0, row1]
    np.testing.assert_array_equal(out[0, 0, 0], np.zeros(8))
    np.testing.assert_array_equal(out[0, 0, 1], x[0, 0, 0])
    np.testing.assert_array_equal(out[0, 0, 2], x[0, 0, 1])
    # device 3: [row2, row3, row4]
    np.testing.assert_array_equal(out[0, 0, 9], x[0, 0, 2])
    np.testing.assert_array_equal(out[0, 0, 10], x[0, 0, 3])
    np.testing.assert_array_equal(out[0, 0, 11], x[0, 0, 4])
    # device 7: [row6, row7, zeros]
    np.testing.assert_array_equal(out[0, 0, 23], np.zeros(8))


def test_spatial_conv_matches_dense(rng, devices):
    """Explicit ppermute-halo conv == ordinary same-padded conv."""
    from planer_tpu.ops import numpy_ops as nops
    mesh = make_mesh((1, 8), ("data", "model"), devices=devices)
    x = rng.standard_normal((1, 4, 32, 16)).astype(np.float32)
    K = (rng.standard_normal((6, 4, 3, 3)) * 0.3).astype(np.float32)
    B = rng.standard_normal(6).astype(np.float32)
    ref = nops.conv2d(x, K, B, pads=(1, 1, 1, 1))
    out = np.asarray(spatial_conv(jnp.asarray(x), jnp.asarray(K),
                                  jnp.asarray(B), mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
