#!/usr/bin/env bash
# Commit gate — the rebuild's equivalent of the reference's CI
# (.github/workflows/main.yml:1-25: `zig build test` + `zig fmt --check`).
#
#   scripts/check.sh          fast gate: syntax + lint + <60 s smoke tests
#   scripts/check.sh --full   the full suite (several minutes, CPU mesh)
#
# Run from the repo root before every commit. Tests force JAX_PLATFORMS=cpu
# (tests/conftest.py); only bench.py should ever touch the real chip.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== syntax (compileall) =="
python -m compileall -q formula_vad_tpu tests benchmarks examples scripts bench.py __graft_entry__.py

echo "== evidence provenance (README perf claims vs driver artifacts) =="
python scripts/provenance_gate.py

echo "== lint (pycodestyle-lite via python -W error import smoke) =="
# No flake8/ruff in this image; catch the high-value classes cheaply:
# import errors anywhere in the package, and tab/space mix via compileall above.
# NOTE: the JAX_PLATFORMS env var alone is overridden by the axon
# sitecustomize — the in-process config update below is what actually keeps
# this off the TPU (same mechanism as tests/conftest.py).
JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import importlib, pkgutil, warnings
import formula_vad_tpu
bad = []
for m in pkgutil.walk_packages(formula_vad_tpu.__path__, "formula_vad_tpu."):
    try:
        importlib.import_module(m.name)
    except Exception as e:  # noqa: BLE001 - report, don't mask
        bad.append((m.name, e))
if bad:
    for name, e in bad:
        print(f"IMPORT FAIL {name}: {e}")
    raise SystemExit(1)
print(f"all formula_vad_tpu modules import cleanly")
EOF

if [[ "${1:-}" == "--full" ]]; then
  echo "== full test suite =="
  JAX_PLATFORMS=cpu python -m pytest tests/ -q
else
  echo "== smoke tests (<60 s) =="
  JAX_PLATFORMS=cpu python -m pytest -q \
    tests/test_ops.py tests/test_structures.py tests/test_eval.py \
    tests/test_io.py tests/test_io_robustness.py tests/test_onnx_formats.py
fi
echo "CHECK OK"
