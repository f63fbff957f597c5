#!/bin/bash
# Chain batch 8: chip_gate at the decode-overlap commit (verify skill —
# parallel/online.py changed; the overlap itself is host orchestration
# whose outputs are test-pinned identical, but the gate keeps the on-chip
# evidence line current at HEAD).
# Launch detached:  nohup scripts/round3g_chain8.sh & echo $! > /tmp/round3g8.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G7 DONE" /tmp/relay_queue.log 2>/dev/null; then
    echo "== chip_gate_g4 ==" >> /tmp/relay_queue.log
    timeout 2700 scripts/chip_gate.sh --quick > /tmp/q_chip_gate_g4.log 2>&1
    echo "chip_gate_g4 exit=$? at $(date -u)" >> /tmp/relay_queue.log
    echo "ROUND3G8 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain8 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
