"""Quantized-tensor pytree type shared by the quantization layer and ops."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["QTensor"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """Quantized weight payload + broadcast-ready scales (a pytree).

    ``q`` is int8 (or fp8) with the original weight's shape; ``scale`` is
    float32 already reshaped for broadcast (per-output-channel).  Weights
    stream HBM->VMEM at quantized width; dequantization happens on-chip —
    either fused by XLA or inside the Pallas dequant+GEMM kernel.

    ``act_dynamic`` (static aux): the consuming op may quantize its
    activations per-tensor on the fly and run the s8 x s8 -> s32 MXU path
    (2x bf16 peak) where the shape profits.
    """

    q: object
    scale: object
    act_dynamic: bool = False
    act_scale: float | None = None   # calibrated static per-tensor act scale

    def dequant(self, dtype=jnp.float32):
        return (self.q.astype(jnp.float32) * self.scale).astype(dtype)

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        return self.q.dtype

    def tree_flatten(self):
        return (self.q, self.scale), (self.act_dynamic, self.act_scale)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, act_dynamic=aux[0], act_scale=aux[1])
