"""Worker process for the real multi-process distributed test.

Launched (>= 2 copies) by tests/test_distributed.py with
COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID set; goes through the
production ``parallel.mesh.maybe_init_distributed`` path (the code a real
multi-host pod launcher uses), builds the GLOBAL data mesh, and runs
BatchRunner sharded across both processes. Writes its segment results as
JSON to the path in argv[1] for the parent test to compare against the
single-process run.
"""

import json
import os
import sys


def main() -> int:
    out_path = sys.argv[1]
    # LOCAL_DEVICES virtual CPU devices per process (default 2) -> a
    # LOCAL_DEVICES * NUM_PROCESSES-device global mesh.
    local_devices = int(os.environ.get("LOCAL_DEVICES", "2"))
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))

    from formula_vad_tpu.parallel import mesh as mesh_lib

    initialized = mesh_lib.maybe_init_distributed()
    assert initialized, "COORDINATOR_ADDRESS must be set for this worker"
    assert jax.process_count() == int(os.environ["NUM_PROCESSES"])
    assert len(jax.devices()) == local_devices * jax.process_count(), jax.devices()

    import numpy as np

    from formula_vad_tpu.config import VADConfig, VADMachineConfig
    from formula_vad_tpu.models import nsnet2
    from formula_vad_tpu.parallel.runner import BatchRunner

    from distributed_corpus import make_batch, machine_config  # noqa: E402

    params = nsnet2.init_params(jax.random.PRNGKey(21))
    batch, lengths = make_batch()
    runner = BatchRunner(
        params,
        VADConfig(vad_machine_config=machine_config()),
        mesh=mesh_lib.data_mesh(),  # GLOBAL mesh: spans both processes
    )
    results = runner.run(batch, lengths)
    payload = {
        "process_id": jax.process_index(),
        "n_processes": jax.process_count(),
        "n_devices": len(jax.devices()),
        "segments": [r.segments for r in results],
    }
    with open(out_path, "w") as f:
        json.dump(payload, f)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
