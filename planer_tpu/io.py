"""Model I/O: the three on-disk formats + the ONNX converter entry points.

Format resolution order is kept from the reference (io.py:8-34):
  1. ``<path>.pla``   — zip(json graph + npy weight blob)
  2. ``<path>.json``  + ``<path>.npy``
  3. ``<path>.onnx``  — converted on the fly by the frontend

All three are wire-compatible with reference-produced files; quantized models
add a ``"quant"`` section to the json (unknown to the reference — such files
are planer_tpu-only).
"""
from __future__ import annotations

import io as _io
import json
import os
import zipfile

import numpy as np

from .ir import Graph, pack_weights
from .runtime.net import Net

__all__ = ["read_net", "onnx2pla", "save_pla", "load_graph"]


def load_graph(path: str):
    """Resolve path -> (Graph, blob).  Accepts a path with or without
    extension."""
    path = path.replace(".onnx", "").replace(".pla", "").replace(".json", "")
    if os.path.exists(path + ".pla"):
        with zipfile.ZipFile(path + ".pla") as f:
            base = os.path.split(path)[1]
            body = json.loads(f.read(base + ".json"))
            blob = np.load(_io.BytesIO(f.read(base + ".npy")))
        return Graph.from_json_dict(body), blob
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            body = json.load(f)
        blob = np.load(path + ".npy")
        return Graph.from_json_dict(body), blob
    if os.path.exists(path + ".onnx"):
        from .frontend.onnx_convert import convert_onnx
        return convert_onnx(path + ".onnx")
    raise FileNotFoundError(f"model {path!r} not found "
                            f"(.pla/.json+.npy/.onnx all missing)")


def read_net(path: str, debug: bool = False) -> Net:
    """Load a model from disk (reference io.py:8-34; alias
    ``InferenceSession`` for onnxruntime compatibility)."""
    graph, blob = load_graph(path)
    if debug:
        for l in graph.layers:
            print(l.to_json())
    net = Net(graph)
    net.weights = [np.zeros(s, dtype=d) for _, s, d in graph.inits]
    net.load_weights(blob)
    return net


def save_pla(path: str, graph: Graph, weights: list[np.ndarray]):
    """Write a .pla package (zip of json + npy blob, reference io.py:289-299)."""
    if path.endswith(".pla"):
        path = path[:-4]
    base = os.path.split(path)[1]
    blob = pack_weights(weights)
    bio = _io.BytesIO()
    np.save(bio, blob)
    with zipfile.ZipFile(path + ".pla", "w", zipfile.ZIP_DEFLATED) as f:
        f.writestr(base + ".json", graph.to_json())
        f.writestr(base + ".npy", bio.getvalue())
    return path + ".pla"


def onnx2pla(path: str, zip: bool = True, quantize: str | None = None):
    """Convert an .onnx file to .pla (or loose .json+.npy when zip=False).

    ``quantize='int8'`` emits per-channel INT8 weights + scales at convert
    time (the quantizing-converter extension, SURVEY §2 #4).
    """
    from .frontend.onnx_convert import convert_onnx
    graph, blob = convert_onnx(path)
    net = Net(graph)
    net.weights = [np.zeros(s, dtype=d) for _, s, d in graph.inits]
    net.load_weights(blob)
    if quantize:
        net.quantize(mode=quantize)
    if zip:
        return save_pla(path[:-5], net.graph, net.weights)
    with open(path[:-5] + ".json", "w") as f:
        f.write(net.graph.to_json())
    np.save(path[:-5] + ".npy", pack_weights(net.weights))
    return path[:-5] + ".json"
