"""Subprocess wrapper: run apps.multidaemon on the CPU backend.

The axon sitecustomize pins the TPU platform regardless of JAX_PLATFORMS,
so subprocess tests (which must exercise a REAL OS process they can
SIGKILL) go through this wrapper, which forces CPU before the first
backend use and then hands argv straight to the production main().
"""

import os
import sys


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from formula_vad_tpu.apps.multidaemon import main as md_main

    return md_main(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
