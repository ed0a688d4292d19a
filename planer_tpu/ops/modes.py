"""Numeric-parity modes shared by the numpy oracle and the jax path.

Erf: the reference computes Erf through a 1025-entry lookup table over
[-2, 2] (/root/reference/planer/layer.py:253-258) — index
``trunc(clip(x + 2, 0, 4) * 256)`` into ``erf(i/256 - 2)``.  The exact
function is the default here (an accuracy upgrade), but the accuracy
baseline is defined against the reference's *output* (BASELINE.md), so an
opt-in LUT-parity mode reproduces the table bit-for-bit in both executors.

Set the mode BEFORE building a program; compiled programs bake the mode at
trace time (call ``Net``'s forward again after a rebuild to pick up a
change).
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["set_erf_mode", "get_erf_mode", "ERF_LUT"]

# erflut[i] = erf(i/256 - 2), i in [0, 1024] — the reference table verbatim
ERF_LUT = np.asarray([math.erf(i / 256 - 2) for i in range(1025)], np.float32)

_erf_mode = "exact"


def set_erf_mode(mode: str) -> None:
    """``"exact"`` (default) or ``"lut"`` (reference bit-parity)."""
    global _erf_mode
    if mode not in ("exact", "lut"):
        raise ValueError(f"erf mode must be 'exact' or 'lut', got {mode!r}")
    _erf_mode = mode


def get_erf_mode() -> str:
    return _erf_mode


def lut_index_f(x):
    """The reference's index computation: trunc(clip(x+2, 0, 4) * 256).

    Works for numpy and jax arrays alike (pure arithmetic); truncation
    toward zero equals floor here because the operand is non-negative.
    """
    return (x + 2).clip(0, 4) * 256
