#!/bin/bash
# Chain batch 2 behind round3e_queue.sh: serving HBM-ceiling probe with a
# single resident input set (SCALE_INPUT_SETS=1 — the double-buffer is a
# benchmark-only HBM cost; see online_scale.py note). Distinguishes
# "transients still bind" (m=4 unlocks more) from "resident carries bind".
# Launch detached:  nohup scripts/round3e_chain2.sh & echo $! > /tmp/round3e2.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 700); do
  if grep -q "ROUND3E QUEUE DONE" /tmp/relay_queue.log 2>/dev/null; then
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run serve_sets1_mb2 3600 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=2 SCALE_INPUT_SETS=1 \
      SCALE_BS=32256,36864 python benchmarks/online_scale.py
    run serve_sets1_mb4 3600 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=4 SCALE_INPUT_SETS=1 \
      SCALE_BS=36864,46080 python benchmarks/online_scale.py
    echo "ROUND3E2 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3e chain2 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
