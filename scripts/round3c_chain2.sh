#!/bin/bash
# Chain batch 2 behind round3c_queue.sh: wait for its DONE marker in the
# ledger, then run the tail-layout experiment (istft/band/head lane pads).
# Launch detached:  nohup scripts/round3c_chain2.sh & echo $! > /tmp/round3c2.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 700); do
  if grep -q "ROUND3C QUEUE DONE" /tmp/relay_queue.log 2>/dev/null; then
    echo "== tail_layout ==" >> /tmp/relay_queue.log
    timeout 2400 env BENCH_MODES=all python benchmarks/tail_layout_exp.py \
      > /tmp/q_tail_layout.log 2>&1
    echo "tail_layout exit=$? at $(date -u)" >> /tmp/relay_queue.log
    echo "ROUND3C2 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3c chain2 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
