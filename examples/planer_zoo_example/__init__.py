"""Example zoo package (the `planer_zoo.*` packaging convention,
reference __init__.py:116-141): a readme.md manifest table lists the model
files; `planer_tpu.Model(this_module)` attaches source/list_source/download
and auto-loads.

This example generates its model locally on first load (no network), which
doubles as the air-gapped deployment pattern: pre-populate the cache dir.
"""
import os

import numpy as np

root = None  # set by Model() to ~/.planer_zoo/planer_zoo_example

# explicit manifest (overrides readme.md parsing when present):
# [name, required, url]  — empty url means "fetch from package dir"
source = [["resnet18_tiny.pla", True,
           "http://example.invalid/resnet18_tiny.pla"]]

_net = None


def _ensure_local():
    """Air-gapped fallback: materialize the model into the cache dir."""
    path = os.path.join(root, "resnet18_tiny")
    if not os.path.exists(path + ".pla"):
        from planer_tpu import models, io
        os.makedirs(root, exist_ok=True)
        net = models.resnet18(num_classes=10)
        io.save_pla(path, net.graph, net.weights)
    return path


def load():
    global _net
    from planer_tpu import read_net
    _net = read_net(_ensure_local())
    return _net


def predict(x: np.ndarray) -> np.ndarray:
    assert _net is not None, "call load() first (Model(auto=True) does)"
    return np.asarray(_net(x))
