"""Shared slope-timing policy for the on-chip A/B benchmarks.

One implementation of the measurement contract every benchmark must follow
(verify skill, ROOFLINE.md): per-call time is the SLOPE between a short and
a long iteration run ending in a REAL device sync (fixed sync/queue-priming
overheads cancel; `jax.block_until_ready` is a relay no-op). Relay hiccups
occasionally produce dt_short > proportional dt_long (even negative
slopes); a sane slope is positive and within ~3x of the inclusive per-call
average, so retry up to 3x and fall back to the average — an upper bound
that still counts every real cost.
"""

from __future__ import annotations


def bench_setup() -> None:
    """Common benchmark-process setup; call before any backend use.

    * FVAD_BENCH_CPU=1 forces the CPU backend — for local smoke-testing the
      queued on-chip scripts (the queue gets ONE shot when the relay
      recovers, a crash wastes it). The container's sitecustomize pins the
      axon TPU platform, so only jax.config works.
    * Enables JAX's persistent compilation cache (FVAD_JAX_CACHE dir,
      default /tmp/jax_cache_fvad, empty string disables): the queue's
      scripts and bench.py's children recompile the same programs many
      times, and every compile burns relay capture time. Guarded — a
      backend that cannot serialize executables just skips caching."""
    import os

    import jax

    if os.environ.get("FVAD_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("FVAD_JAX_CACHE", "/tmp/jax_cache_fvad")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:
            pass


def slope_from_run(run, n_long: int, n_short: int | None = None) -> float:
    """Per-call seconds from ``run(n) -> elapsed seconds for n calls``.

    ``run`` must end with a real sync (e.g. ``float(jnp.sum(out))``) and is
    assumed already warmed up (compile + first call done by the caller)."""
    if n_short is None:
        n_short = max(1, n_long // 4)
    avg = None
    for _ in range(3):
        dt_s, dt_l = run(n_short), run(n_long)
        slope = (dt_l - dt_s) / (n_long - n_short)
        avg = dt_l / n_long
        if 0.3 * avg <= slope <= 3.0 * avg:
            return slope
    return avg
