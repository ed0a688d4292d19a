"""Pallas kernel tests in interpreter mode (no TPU needed) — SURVEY §5
race-detection note: kernels get interpret=True tests + tile-edge shapes."""
import numpy as np
import pytest

import jax.numpy as jnp

from planer_tpu.ops.pallas import gemm
from planer_tpu.ops import numpy_ops as nops
from planer_tpu.ops.qtypes import QTensor


def make_q(rng, N, K):
    w = (rng.standard_normal((N, K)) * 0.5).astype(np.float32)
    absmax = np.abs(w).max(axis=1, keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return QTensor(jnp.asarray(q), jnp.asarray(scale)), q, scale


@pytest.mark.parametrize("M,N,K", [
    (8, 128, 128),
    (32, 256, 384),
    (100, 128, 256),   # M not multiple of tile -> pad path
    (256, 512, 128),
])
def test_dense_q_interpret(rng, M, N, K):
    x = rng.standard_normal((M, K)).astype(np.float32)
    qt, q, scale = make_q(rng, N, K)
    B = rng.standard_normal(N).astype(np.float32)
    out = np.asarray(gemm.dense_q(jnp.asarray(x), qt, jnp.asarray(B),
                                  interpret=True))
    ref = x @ (q.astype(np.float32) * scale).T + B
    # bf16 mantissa on activations: ~2^-8 relative
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())


def test_dense_q_fallback_shapes(rng):
    """N/K not lane-aligned -> fallback path, still correct."""
    x = rng.standard_normal((4, 100)).astype(np.float32)
    qt, q, scale = make_q(rng, 10, 100)
    out = np.asarray(gemm.dense_q(jnp.asarray(x), qt, None))
    ref = x @ (q.astype(np.float32) * scale).T
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_batched_input_reshape(rng):
    """Leading dims collapse to M."""
    x = rng.standard_normal((2, 3, 128)).astype(np.float32)
    qt, q, scale = make_q(rng, 128, 128)
    out = np.asarray(gemm.dense_q(jnp.asarray(x), qt, None, interpret=True))
    assert out.shape == (2, 3, 128)
    ref = x.reshape(-1, 128) @ (q.astype(np.float32) * scale).T
    np.testing.assert_allclose(out.reshape(-1, 128), ref, rtol=2e-2,
                               atol=2e-2 * np.abs(ref).max())


def test_matmul_q_interpret(rng):
    x = rng.standard_normal((16, 128)).astype(np.float32)
    # (K, N) layout weights
    w = (rng.standard_normal((128, 256)) * 0.5).astype(np.float32)
    absmax = np.abs(w).max(axis=0, keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    qt = QTensor(jnp.asarray(q), jnp.asarray(scale))
    out = np.asarray(gemm.matmul_q(jnp.asarray(x), qt, interpret=True))
    ref = x @ (q.astype(np.float32) * scale)
    np.testing.assert_allclose(out, ref, rtol=2e-2,
                               atol=2e-2 * np.abs(ref).max())


def test_quantized_1x1_conv_routes_to_gemm(rng, monkeypatch):
    """1x1 stride-1 conv with QTensor weights == dense over channels
    (opt-in routing; default path measured faster through XLA fusion)."""
    from planer_tpu.ops import jax_ops as jops
    monkeypatch.setattr(jops, "_PALLAS_CONV1X1", True)
    x = rng.standard_normal((2, 128, 4, 4)).astype(np.float32)
    w = (rng.standard_normal((256, 128, 1, 1)) * 0.4).astype(np.float32)
    absmax = np.abs(w).max(axis=(1, 2, 3), keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    qt = QTensor(jnp.asarray(q), jnp.asarray(scale))
    B = rng.standard_normal(256).astype(np.float32)
    out = np.asarray(jops.conv2d(jnp.asarray(x), qt, jnp.asarray(B)))
    deq = q.astype(np.float32) * scale
    from planer_tpu.ops import numpy_ops as nops
    ref = nops.conv2d(x, deq, B)
    np.testing.assert_allclose(out, ref, rtol=2e-2,
                               atol=2e-2 * np.abs(ref).max())
    # strided/padded quantized 1x1 still goes through lax.conv correctly
    out2 = np.asarray(jops.conv2d(jnp.asarray(x), qt, jnp.asarray(B),
                                  strides=(2, 2)))
    ref2 = nops.conv2d(x, deq, B, strides=(2, 2))
    np.testing.assert_allclose(out2, ref2, rtol=2e-2,
                               atol=2e-2 * np.abs(ref2).max())
