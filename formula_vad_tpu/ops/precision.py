"""Matmul precision + activation-storage policy.

All DFT/GRU/dense matmuls in the framework route through ``matmul_precision()``:

* ``"highest"`` (default) — true f32 accumulation (6-pass on the MXU).
  This is the parity configuration: the reference runs kissfft + ONNX
  Runtime in f32 on CPU, and the VAD decision chain (band volume vs a 10x
  threshold) is compared against f32 values.
* ``"high"``   — bf16_3x (~f32 quality at ~2x MXU speed).
* ``"default"``— single-pass bf16: fastest; fine for training and for
  applications that tolerate rare one-window segment-boundary shifts.

Selected via ``FVAD_PRECISION`` env var or ``set_matmul_precision()``.

Orthogonally, ``set_io_dtype("bf16")`` (env ``FVAD_IO_DTYPE``) stores the
denoiser path's big ACTIVATIONS — spectra, features, GRU projections,
gains, OLA product, the 16 kHz stream — in bfloat16, halving the HBM
traffic that bounds the non-MXU part of the step. The matmuls already
read bf16 operands at ``default`` precision, so this costs no extra
mantissa on the MXU inputs; reductions that feed FSM *decisions* (band
magnitude sums, RMS volumes, window ratios) stay f32. A speed tier for
throughput serving — NOT a parity mode (PARITY.md).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_LEVELS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
_IO_DTYPES = {"f32": None, "bf16": jnp.bfloat16}
_QUANT_MODES = ("off", "int8")

_current = os.environ.get("FVAD_PRECISION", "highest").lower()
if _current not in _LEVELS:
    raise ValueError(f"FVAD_PRECISION must be one of {sorted(_LEVELS)}, got {_current!r}")
_io = os.environ.get("FVAD_IO_DTYPE", "f32").lower()
if _io not in _IO_DTYPES:
    raise ValueError(f"FVAD_IO_DTYPE must be one of {sorted(_IO_DTYPES)}, got {_io!r}")
_quant = os.environ.get("FVAD_QUANT", "off").lower()
if _quant not in _QUANT_MODES:
    raise ValueError(f"FVAD_QUANT must be one of {_QUANT_MODES}, got {_quant!r}")


# Named matmul stages of the scoring path (VERDICT r3 next-#4: per-stage
# precision audit). Call sites pass their stage so an override map can run
# individual stages at a different pass count than the global tier —
# the `parity-fast` lever: stages whose HIGH (3-pass) output is proven
# bitwise- or decision-identical to HIGHEST on chip drop half their MXU
# passes while the parity claim is preserved (the predecim select matmul
# already does this ad hoc — PARITY.md dev. 13).
STAGES = ("stft", "istft", "band", "fc_in", "gru_i", "gru_h", "ff")
_stage_overrides: dict[str, str] = {}


def set_matmul_precision(level: str) -> None:
    global _current
    if level not in _LEVELS:
        raise ValueError(f"precision must be one of {sorted(_LEVELS)}, got {level!r}")
    _current = level


def matmul_precision(stage: str | None = None) -> jax.lax.Precision:
    if stage is not None and stage in _stage_overrides:
        return _LEVELS[_stage_overrides[stage]]
    return _LEVELS[_current]


def set_stage_precision(stage: str, level: str | None) -> None:
    """Override one stage's matmul precision (None clears the override).

    Overrides are trace-time state like the global level: re-jit (a fresh
    function object) after changing them."""
    if stage not in STAGES:
        raise ValueError(f"stage must be one of {STAGES}, got {stage!r}")
    if level is None:
        _stage_overrides.pop(stage, None)
        return
    if level not in _LEVELS:
        raise ValueError(f"precision must be one of {sorted(_LEVELS)}, got {level!r}")
    _stage_overrides[stage] = level


def set_stage_overrides(overrides: dict[str, str] | None) -> None:
    """Replace the whole stage-override map (None/{} clears)."""
    for stage in list(_stage_overrides):
        set_stage_precision(stage, None)
    for stage, level in (overrides or {}).items():
        set_stage_precision(stage, level)


def stage_overrides() -> dict[str, str]:
    return dict(_stage_overrides)


def set_io_dtype(name: str) -> None:
    global _io
    if name not in _IO_DTYPES:
        raise ValueError(f"io dtype must be one of {sorted(_IO_DTYPES)}, got {name!r}")
    _io = name


def io_dtype():
    """The activation-storage dtype, or None for full f32."""
    return _IO_DTYPES[_io]


def io_cast(x):
    """Cast an activation to the storage dtype (identity when f32)."""
    dt = _IO_DTYPES[_io]
    return x if dt is None or x.dtype == dt else x.astype(dt)


def set_quant(mode: str) -> None:
    """Select the denoiser-model quantization tier ('off' | 'int8').

    'int8' runs every NSNet2 matmul as an int8 x int8 -> int32 MXU
    contraction (2x the bf16 issue rate on v5e) with symmetric per-output-
    column weight scales; in-scan GRU activations use a STATIC 127 scale
    (|h| <= 1 by gate algebra), so the recurrence adds no per-step max
    reductions. A throughput-serving tier, NOT a parity mode: gains carry
    ~2 decimal digits, so decisions can shift (measured like the bf16 tier,
    benchmarks/precision_sweep.py). See models/nsnet2_q8.py.
    """
    global _quant
    if mode not in _QUANT_MODES:
        raise ValueError(f"quant mode must be one of {_QUANT_MODES}, got {mode!r}")
    _quant = mode


def quant_int8() -> bool:
    """Whether the int8 denoiser-model tier is selected."""
    return _quant == "int8"
