"""Pallas GRU-stack kernel parity vs the XLA scan (interpreter mode on CPU).

The kernel is perf-neutral vs XLA's scan on current hardware (measured on
v5e: within noise) and therefore not wired into the default path; it is
kept as a correctness-tested alternative recurrence backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.models import nsnet2, nsnet2_pallas


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(5))


def test_apply_pallas_matches_apply(params):
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((5, 9, 161)), jnp.float32
    )
    a = nsnet2.apply(params, feats)
    b = nsnet2_pallas.apply_pallas(params, feats, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_row_padding(params):
    """Row counts that aren't a multiple of the tile are padded and trimmed."""
    feats = jnp.asarray(
        np.random.default_rng(1).standard_normal((nsnet2_pallas.ROW_TILE + 3, 4, 161)),
        jnp.float32,
    )
    a = nsnet2.apply(params, feats)
    b = nsnet2_pallas.apply_pallas(params, feats, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
