"""Training step, sharding layout, and driver entry-point tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.parallel import mesh as mesh_lib
from formula_vad_tpu.train import nsnet2_train


class TestTraining:
    def test_loss_decreases(self):
        params = nsnet2.init_params(jax.random.PRNGKey(0))
        _, losses = nsnet2_train.train_demo_steps(
            params, n_steps=6, batch=4, n_frames=8, learning_rate=3e-3
        )
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0], losses

    def test_sharded_training_matches_unsharded(self):
        """One train step on the 2x2 (data, model) mesh == unsharded step."""
        params = nsnet2.init_params(jax.random.PRNGKey(1))
        m = mesh_lib.data_model_mesh(n_model=2, devices=jax.devices()[:4])
        p1, l1 = nsnet2_train.train_demo_steps(params, n_steps=2, batch=4, n_frames=8)
        p2, l2 = nsnet2_train.train_demo_steps(params, n_steps=2, batch=4, n_frames=8, mesh=m)
        np.testing.assert_allclose(l1, l2, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(p1.ff2_w), np.asarray(p2.ff2_w), atol=1e-5
        )

    def test_full_data_model_mesh(self):
        """(4, 2) mesh over all 8 virtual devices."""
        params = nsnet2.init_params(jax.random.PRNGKey(2))
        m = mesh_lib.data_model_mesh(n_model=2)
        assert m.shape == {"data": 4, "model": 2}
        _, losses = nsnet2_train.train_demo_steps(params, n_steps=1, batch=8, n_frames=8, mesh=m)
        assert np.isfinite(losses[0])


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        jitted = jax.jit(fn)
        out = jitted(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)

    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
