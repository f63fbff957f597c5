"""Real multi-process distributed execution (VERDICT round-1 #5).

``parallel.mesh.maybe_init_distributed`` had never actually run: the
virtual 8-device mesh and the driver dryrun validate shardings within ONE
process only. This test launches 2 and 4 real OS processes, each with 2
virtual CPU devices, joins them through ``jax.distributed.initialize`` via
the production ``maybe_init_distributed`` env-var path, and runs
BatchRunner's shard_map program over the resulting 4- and 8-device global
meshes. All workers must report segments identical to each other and to a
plain single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from distributed_corpus import machine_config, make_batch
from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.parallel.runner import BatchRunner

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def single_process_segments():
    """Reference result from THIS pytest process (its own 8-device mesh)."""
    params = nsnet2.init_params(jax.random.PRNGKey(21))
    batch, lengths = make_batch()
    runner = BatchRunner(params, VADConfig(vad_machine_config=machine_config()))
    return [r.segments for r in runner.run(batch, lengths)]


@pytest.mark.parametrize("n_processes", [2, 4])
def test_multi_process_batchrunner_matches_single_process(
    tmp_path, n_processes, single_process_segments
):
    port = _free_port()
    procs = []
    outs = []
    for pid in range(n_processes):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES=str(n_processes),
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "distributed_worker.py"), str(out)],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    payloads = [json.loads(out.read_text()) for out in outs]
    for pl in payloads:
        assert pl["n_processes"] == n_processes
        assert pl["n_devices"] == 2 * n_processes  # the GLOBAL device set
    for pl in payloads[1:]:
        assert pl["segments"] == payloads[0]["segments"]

    expected = single_process_segments
    assert payloads[0]["segments"] == expected
    assert any(expected), "corpus must produce segments"
