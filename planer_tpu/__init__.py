"""planer_tpu — a TPU-native quantized CNN inference engine.

A from-scratch framework with the capabilities of Image-Py/planer
(reference at /root/reference): the JSON flow IR and ONNX frontend are the
kept contract; the runtime is a jit-compiled XLA program (with Pallas fused
INT8 dequant+GEMM kernels on the hot path) instead of an interpreted numpy
graph walk, and scaling is jax.sharding over a TPU device mesh instead of a
backend swap.

Public API parity map (reference symbol -> here):
  read_net / InferenceSession  -> io.read_net (same 3 formats: .pla/.json/.onnx)
  onnx2pla                     -> io.onnx2pla
  Net                          -> runtime.net.Net
  core(backend)                -> gone (single jax backend); kept as a no-op shim
  asnumpy/asarray              -> kept
  Model/load/download/...      -> utils.zoo
  tile/resize/mapcoord/...     -> utils.image, utils.tile
"""
from __future__ import annotations

import numpy as _np

from .ir import Graph, Layer, FlowEdge, pack_weights, unpack_weights
from .registry import OPS, get_op
from .runtime.net import Net
from .runtime.executor import NumpyExecutor
from .runtime.tracer import TracedProgram, analyze
from .models.builder import GraphBuilder
from .io import read_net, onnx2pla, save_pla
from .frontend.torch2planer import torch2planer
from .runtime.serving import ServingEngine
from .runtime import profiler
from .utils.config import Config, get_config, set_config
from .utils.tile import tile, grid_slice, make_slice
from .utils.image import resize, mapcoord, uniform_filter, gaussian_filter
from .utils.zoo import Model, load, download, downloads, source, list_source, get_source

__version__ = "0.1.0"

# onnxruntime-compat alias (reference __init__.py:7)
InferenceSession = read_net


def core(obj=None, silent: bool = True):
    """Backend-switch shim.  The reference rebinds numpy/cupy at runtime
    (__init__.py:22-38); here there is exactly one backend (jax/XLA on TPU),
    so this is a no-op kept for API compatibility.  Returns jax.numpy."""
    import jax.numpy as jnp
    if not silent:
        print("planer_tpu: single jax backend; core() is a no-op")
    return jnp


def asnumpy(arr, **kw):
    return _np.asarray(arr, **kw)


def asarray(arr, **kw):
    import jax.numpy as jnp
    return jnp.asarray(arr, **kw)
