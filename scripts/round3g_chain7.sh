#!/bin/bash
# Chain batch 7: re-run the int8 mechanism probe with the review-fixed
# bf16 baseline (operands pre-cast OUTSIDE the jit — the first run billed
# the f32->bf16 casts' ~20 MB HBM reads to the bf16 side only), plus the
# 32k soak if chain5's got cut by the outage window.
# Launch detached:  nohup scripts/round3g_chain7.sh & echo $! > /tmp/round3g7.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G6 DONE" /tmp/relay_queue.log 2>/dev/null; then
    echo "== int8_dot_probe2 ==" >> /tmp/relay_queue.log
    timeout 1800 python benchmarks/int8_dot_probe.py > /tmp/q_int8_dot_probe2.log 2>&1
    echo "int8_dot_probe2 exit=$? at $(date -u)" >> /tmp/relay_queue.log
    echo "ROUND3G7 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain7 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
