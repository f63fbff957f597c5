"""Matmul precision policy.

All DFT/GRU/dense matmuls in the framework route through ``matmul_precision()``:

* ``"highest"`` (default) — true f32 accumulation (6-pass on the MXU).
  This is the parity configuration: the reference runs kissfft + ONNX
  Runtime in f32 on CPU, and the VAD decision chain (band volume vs a 10x
  threshold) is compared against f32 values.
* ``"high"``   — bf16_3x (~f32 quality at ~2x MXU speed).
* ``"default"``— single-pass bf16: fastest; fine for training and for
  applications that tolerate rare one-window segment-boundary shifts.

Selected via ``FVAD_PRECISION`` env var or ``set_matmul_precision()``.
"""

from __future__ import annotations

import os

import jax

_LEVELS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

_current = os.environ.get("FVAD_PRECISION", "highest").lower()
if _current not in _LEVELS:
    raise ValueError(f"FVAD_PRECISION must be one of {sorted(_LEVELS)}, got {_current!r}")


def set_matmul_precision(level: str) -> None:
    global _current
    if level not in _LEVELS:
        raise ValueError(f"precision must be one of {sorted(_LEVELS)}, got {level!r}")
    _current = level


def matmul_precision() -> jax.lax.Precision:
    return _LEVELS[_current]
