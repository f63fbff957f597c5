"""Per-stage matmul-precision overrides (ops/precision.py STAGES) — the
parity-fast audit lever (VERDICT r3 next-#4). Numeric effects are
chip-only (XLA:CPU computes every precision level identically), so these
tests pin the API contract and that the full chain still runs with
overrides active."""

import jax
import numpy as np
import pytest

from formula_vad_tpu.ops import precision


@pytest.fixture(autouse=True)
def _restore():
    yield
    precision.set_stage_overrides(None)
    precision.set_matmul_precision("highest")
    precision.set_io_dtype("f32")


def test_override_routing():
    precision.set_matmul_precision("highest")
    assert precision.matmul_precision("stft") == jax.lax.Precision.HIGHEST
    precision.set_stage_precision("stft", "high")
    assert precision.matmul_precision("stft") == jax.lax.Precision.HIGH
    # other stages and the global level are untouched
    assert precision.matmul_precision("istft") == jax.lax.Precision.HIGHEST
    assert precision.matmul_precision() == jax.lax.Precision.HIGHEST
    precision.set_stage_precision("stft", None)
    assert precision.matmul_precision("stft") == jax.lax.Precision.HIGHEST


def test_set_overrides_replaces_whole_map():
    precision.set_stage_overrides({"band": "high", "ff": "default"})
    assert precision.stage_overrides() == {"band": "high", "ff": "default"}
    precision.set_stage_overrides({"gru_h": "high"})
    assert precision.stage_overrides() == {"gru_h": "high"}
    precision.set_stage_overrides(None)
    assert precision.stage_overrides() == {}


def test_validation():
    with pytest.raises(ValueError, match="stage"):
        precision.set_stage_precision("nonsense", "high")
    with pytest.raises(ValueError, match="precision"):
        precision.set_stage_precision("stft", "fastest")


def test_chain_runs_with_overrides():
    """The full FSM-input chain traces+runs with every stage overridden
    (and on CPU produces the same results — precision is a no-op there)."""
    import jax.numpy as jnp

    from formula_vad_tpu.config import VADConfig
    from formula_vad_tpu.models import nsnet2
    from formula_vad_tpu.pipeline import offline, vad

    params = nsnet2.init_params(jax.random.PRNGKey(0))
    st = vad.statics_from_config(VADConfig())
    audio = 0.02 * jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2 * st.chunk_size))

    base = jax.jit(lambda a: offline.window_inputs_batch(params, st, a))(audio)
    precision.set_stage_overrides({s: "high" for s in precision.STAGES})
    got = jax.jit(lambda a: offline.window_inputs_batch(params, st, a))(audio)
    for g, w in zip(got, base):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
