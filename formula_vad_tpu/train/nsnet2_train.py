"""NSNet2 training: loss, sharded train step, and mesh-parallel setup.

The reference consumes a pre-trained ONNX model and cannot train
(SURVEY.md §2.2); since the upstream model blob is an absent LFS object,
this framework includes the training loop needed to (re)produce weights:
the DNS-Challenge compressed-spectral MSE objective on (noisy, clean)
spectrogram pairs.

Parallelism (jax.sharding over a ("data", "model") mesh):

* DP   — batch axis sharded over "data".
* TP   — Megatron-style: the input Dense and GRU gate kernels are
         column-sharded over "model", the post-GRU FF pair is
         column- then row-sharded so the pair needs a single psum,
         and the output Dense is replicated. XLA inserts the collectives
         from the sharding annotations alone.
* SP   — activation sharding constraints put the time axis of the
         pointwise pre/post-GRU stages on "model" where profitable;
         the GRU recurrence itself is sequential over time (lax.scan)
         and batch-parallel.
* PP/EP — not applicable: the network is a 6-layer stack with no expert
         routing (SURVEY.md §2.3 notes their absence in the reference too).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import nsnet2

COMPRESSION = 0.3  # spectral compression exponent (DNS-Challenge loss)
ALPHA = 0.3  # complex-loss weight


def spectral_loss(
    params: nsnet2.NSNet2Params,
    feats: jnp.ndarray,  # [B, T, 161] log-power features of noisy audio
    noisy_re: jnp.ndarray,  # [B, T, 161]
    noisy_im: jnp.ndarray,
    clean_re: jnp.ndarray,
    clean_im: jnp.ndarray,
) -> jnp.ndarray:
    """Compressed spectral MSE: magnitude + complex terms (Braun & Tashev)."""
    gains = nsnet2.apply(params, feats)  # [B, T, 161]
    est_re, est_im = noisy_re * gains, noisy_im * gains
    eps = 1e-9
    est_mag = jnp.sqrt(est_re**2 + est_im**2 + eps)
    clean_mag = jnp.sqrt(clean_re**2 + clean_im**2 + eps)
    est_c = est_mag**COMPRESSION
    clean_c = clean_mag**COMPRESSION
    mag_loss = jnp.mean((est_c - clean_c) ** 2)
    # phase-aware term on compressed complex spectra
    scale_e = est_c / est_mag
    scale_s = clean_c / clean_mag
    cplx = jnp.mean(
        (est_re * scale_e - clean_re * scale_s) ** 2
        + (est_im * scale_e - clean_im * scale_s) ** 2
    )
    return (1.0 - ALPHA) * mag_loss + ALPHA * cplx


# ---------------------------------------------------------------------------
# Sharding layout
# ---------------------------------------------------------------------------


def param_pspecs() -> nsnet2.NSNet2Params:
    """Megatron-style tensor-parallel partition specs for NSNet2 weights."""

    def gru_pspec():
        return nsnet2.GRUParams(
            wi=P(None, "model"),  # gates column-sharded
            wh=P(None, "model"),
            bi=P("model"),
            bh=P("model"),
        )

    return nsnet2.NSNet2Params(
        fc_in_w=P(None, "model"),
        fc_in_b=P("model"),
        gru1=gru_pspec(),
        gru2=gru_pspec(),
        ff1_w=P(None, "model"),  # column-sharded
        ff1_b=P("model"),
        ff2_w=P("model", None),  # row-sharded: pair needs one psum
        ff2_b=P(),
        out_w=P(),
        out_b=P(),
    )


def shard_params(params: nsnet2.NSNet2Params, mesh: Mesh) -> nsnet2.NSNet2Params:
    specs = param_pspecs()
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape"),
    )


def batch_pspec() -> P:
    return P("data", None, None)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


def make_train_step(optimizer: optax.GradientTransformation, mesh: Optional[Mesh] = None):
    """Build a jitted, sharded train step:
    (params, opt_state, batch) -> (params, opt_state, loss)."""

    def train_step(params, opt_state, batch):
        feats, n_re, n_im, c_re, c_im = batch
        if mesh is not None:
            cons = NamedSharding(mesh, batch_pspec())
            feats = jax.lax.with_sharding_constraint(feats, cons)
        loss, grads = jax.value_and_grad(spectral_loss)(
            params, feats, n_re, n_im, c_re, c_im
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1))

    param_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_pspecs(),
        is_leaf=lambda x: isinstance(x, P),
    )
    batch_sh = NamedSharding(mesh, batch_pspec())
    return jax.jit(
        train_step,
        in_shardings=(param_sh, None, (batch_sh,) * 5),
        out_shardings=(param_sh, None, NamedSharding(mesh, P())),
        donate_argnums=(0, 1),
    )


def synth_batch(key: jax.Array, batch: int, n_frames: int):
    """Synthesize a (noisy, clean) spectral training batch for smoke tests."""
    ks = jax.random.split(key, 4)
    c_re = jax.random.normal(ks[0], (batch, n_frames, nsnet2.N_BINS))
    c_im = jax.random.normal(ks[1], (batch, n_frames, nsnet2.N_BINS))
    n_re = c_re + 0.5 * jax.random.normal(ks[2], (batch, n_frames, nsnet2.N_BINS))
    n_im = c_im + 0.5 * jax.random.normal(ks[3], (batch, n_frames, nsnet2.N_BINS))
    feats = jnp.log10(jnp.maximum(n_re**2 + n_im**2, 1e-12))
    return feats, n_re, n_im, c_re, c_im


def train_demo_steps(
    params: nsnet2.NSNet2Params,
    n_steps: int = 2,
    batch: int = 4,
    n_frames: int = 16,
    mesh: Optional[Mesh] = None,
    learning_rate: float = 1e-4,
):
    """Run a few training steps (smoke/benchmark helper). Returns losses."""
    opt = optax.adam(learning_rate)
    # The step donates its inputs; copy so the caller's params survive.
    params = jax.tree_util.tree_map(jnp.array, params)
    if mesh is not None:
        params = shard_params(params, mesh)
    opt_state = opt.init(params)
    step = make_train_step(opt, mesh)
    losses = []
    for i in range(n_steps):
        b = synth_batch(jax.random.PRNGKey(i), batch, n_frames)
        if mesh is not None:
            sh = NamedSharding(mesh, batch_pspec())
            b = tuple(jax.device_put(x, sh) for x in b)
        params, opt_state, loss = step(params, opt_state, b)
        losses.append(float(loss))
    return params, losses
