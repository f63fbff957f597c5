"""On-chip throughput-tier boundary-shift table (PARITY.md deviation 2).

Runs testing/tier_fuzz.py's calibrated-marginal campaign on the REAL chip
— the MXU's bf16 lowering is the one that ships, XLA:CPU's is only a proxy
— and prints the PARITY.md table. Weights: the packaged demo weights by
default (the production neural path), TF_WEIGHTS=random for the fuzz-seed
weights the CPU test uses.

Run from the repo root:  python benchmarks/tier_fuzz.py
Env: TF_CASES (default 60), TF_CHUNKS (default 16).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup  # noqa: E402

bench_setup()

import jax  # noqa: E402

from formula_vad_tpu.models import nsnet2  # noqa: E402
from formula_vad_tpu.models.registry import load_denoiser  # noqa: E402
from formula_vad_tpu.testing import tier_fuzz  # noqa: E402


def main() -> int:
    n_cases = int(os.environ.get("TF_CASES", "60"))
    n_chunks = int(os.environ.get("TF_CHUNKS", "16"))
    if os.environ.get("TF_WEIGHTS", "demo") == "random":
        params = nsnet2.init_params(jax.random.PRNGKey(21))
    else:
        params = load_denoiser("demo")
    print(f"platform={jax.devices()[0].platform} cases={n_cases} "
          f"chunks={n_chunks} weights={os.environ.get('TF_WEIGHTS', 'demo')}")
    stats = tier_fuzz.run_campaign(params, n_cases=n_cases, n_chunks=n_chunks)
    print(tier_fuzz.format_table(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
