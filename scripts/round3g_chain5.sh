#!/bin/bash
# Chain batch 5: sustained-soak evidence at the serving record point.
# The 36,096 record is a 10-iter slope; production claims need the tail.
# 240 individually-synced ticks (~2 min) at the record shape + the m=2
# fallback point, reporting p50/p95/p99/max and the in-budget fraction
# (per-tick sync adds the relay's fixed ~33 ms — conservative).
# Launch detached:  nohup scripts/round3g_chain5.sh & echo $! > /tmp/round3g5.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G4 DONE" /tmp/relay_queue.log 2>/dev/null; then
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run serve_soak_36k 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=3 SCALE_INPUT_SETS=1 \
      SCALE_BS=36096 SCALE_ITERS=6 SCALE_SUSTAIN=240 \
      python benchmarks/online_scale.py
    run serve_soak_32k 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=2 SCALE_INPUT_SETS=1 \
      SCALE_BS=32256 SCALE_ITERS=6 SCALE_SUSTAIN=240 \
      python benchmarks/online_scale.py
    echo "ROUND3G5 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain5 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
