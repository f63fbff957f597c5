"""formula_vad_tpu — a TPU-native (JAX/XLA/Pallas) streaming voice-activity-detection
framework with the capabilities of recursiveGecko/Formula-VAD.

The reference's pull-chain of stateful Zig objects is re-expressed as a pure
function over time-major tensors ``(carry, chunk[B, C, T]) -> (carry', events)``
under ``jax.lax.scan``, batched over streams and sharded over a device mesh.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
