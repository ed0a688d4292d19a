"""Spatial parallelism: shard the image H axis across devices.

This is the pod-scale analog of the reference's host-side ``tile()``
decorator (util.py:291-348): instead of slicing windows on host and blending
overlaps, the H axis of the activations is sharded over the mesh and conv
halos move over ICI (SURVEY §5 long-context: "the CNN analog of
blockwise/context parallelism, with margin playing the role of halo").

Two mechanisms:

  * :func:`shard_spatial` — the production path: annotate the input with an
    H-axis NamedSharding and let XLA GSPMD's spatial partitioner insert the
    halo collective-permutes for every conv/pool automatically.  Exact to the
    unsharded result (unlike host-side tiling, which loses receptive field at
    window borders).

  * :func:`halo_exchange` — the explicit shard_map primitive (ppermute of
    edge rows between H-neighbors), for custom pipelines and as the
    documented building block of the manual path.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map as _shard_map

__all__ = ["shard_spatial", "halo_exchange"]


def shard_spatial(net, mesh: Mesh, spatial_axis: str = "model",
                  batch_axis: str | None = "data"):
    """Rebuild a Net's program with NCHW inputs sharded over H (and
    optionally batch): weights replicated, GSPMD inserts conv halos."""
    from ..runtime.tracer import TracedProgram
    from ..quant import make_quant_program

    if net.graph.quant:
        prog = make_quant_program(net.graph, net.weights)
    else:
        prog = TracedProgram(net.graph, net.weights)

    replicated = jax.tree.map(
        lambda l: NamedSharding(mesh, P()), prog.params)
    prog.params = jax.device_put(prog.params, replicated)
    if batch_axis is not None and batch_axis in mesh.shape \
            and mesh.shape[batch_axis] > 1:
        xspec = P(batch_axis, None, spatial_axis, None)
    else:
        xspec = P(None, None, spatial_axis, None)
    xsh = NamedSharding(mesh, xspec)
    prog._jit_kwargs = dict(prog._jit_kwargs,
                            in_shardings=(replicated, xsh))
    from .sharding import FUSED_OVERRIDES
    prog.op_overrides.update(FUSED_OVERRIDES)
    prog._cache.clear()
    net._program = prog
    return prog


def halo_exchange(x, halo: int, axis_name: str):
    """Exchange ``halo`` edge rows with H-neighbors inside a shard_map.

    ``x``: the local (N, C, H_local, W) shard.  Returns the shard extended to
    H_local + 2*halo with the neighbours' edge rows (zero padding at the
    outer boundaries) — the manual building block for receptive-field-correct
    spatially-sharded convolution.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # rows my neighbours need
    top = x[:, :, :halo]          # my first rows -> previous device's bottom
    bot = x[:, :, -halo:]         # my last rows  -> next device's top
    # ppermute: shift down (i -> i+1) carries my bottom rows to next's top
    from_prev = jax.lax.ppermute(
        bot, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)])
    # zero out the wrapped edges (no halo outside the image)
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=2)


def spatial_conv(x, K, B, mesh: Mesh, axis: str = "model"):
    """Reference implementation of an explicitly halo-exchanged 3x3 conv on
    an H-sharded input (shard_map + ppermute).  Mostly pedagogical — the
    production path is GSPMD via shard_spatial."""
    from ..ops import jax_ops as jops
    kh = K.shape[2]
    halo = kh // 2

    def f(xl, K, B):
        xh = halo_exchange(xl, halo, axis)
        # valid conv over the extended shard = same-padded conv on the
        # logical image restricted to this shard
        return jops.conv2d(xh, K, B, pads=(0, halo, 0, halo))

    spec_x = P(None, None, axis, None)
    fn = _shard_map(f, mesh=mesh, in_specs=(spec_x, P(), P()),
                    out_specs=spec_x)
    return fn(x, K, B)
