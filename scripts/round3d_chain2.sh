#!/bin/bash
# Chain batch 2 behind round3d_queue.sh: the GRU scan-unroll experiment.
# Launch detached:  nohup scripts/round3d_chain2.sh & echo $! > /tmp/round3d2.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 700); do
  if grep -q "ROUND3D QUEUE DONE" /tmp/relay_queue.log 2>/dev/null; then
    echo "== gru_unroll ==" >> /tmp/relay_queue.log
    timeout 3000 env BENCH_MODES=all python benchmarks/gru_unroll_exp.py \
      > /tmp/q_gru_unroll.log 2>&1
    echo "gru_unroll exit=$? at $(date -u)" >> /tmp/relay_queue.log
    echo "ROUND3D2 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3d chain2 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
