#!/bin/bash
# Chain batch 4: the int8 mechanism probe (bare-op int8 vs bf16 dot at the
# GRU shapes) — closes the ROOFLINE dead-end write-up for the int8 tier
# (full-tick verdicts: x0.911 @ B=4096, x0.794 @ B=13824, OOM @ 36864 m=2).
# Launch detached:  nohup scripts/round3g_chain4.sh & echo $! > /tmp/round3g4.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G3 DONE" /tmp/relay_queue.log 2>/dev/null; then
    echo "== int8_dot_probe ==" >> /tmp/relay_queue.log
    timeout 1800 python benchmarks/int8_dot_probe.py > /tmp/q_int8_dot_probe.log 2>&1
    echo "int8_dot_probe exit=$? at $(date -u)" >> /tmp/relay_queue.log
    echo "ROUND3G4 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain4 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
