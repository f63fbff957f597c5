#!/bin/bash
# Chain batch 3 behind round3g_chain2.sh: the on-chip evidence gate at the
# int8-tier commit (verify skill: any compute-path change — here the quant
# routing in models/nsnet2.py — refreshes CHIP_GATE.log when the relay is
# up; the default-off routing must leave the shipping step untouched).
# Launch detached:  nohup scripts/round3g_chain3.sh & echo $! > /tmp/round3g3.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G2 DONE" /tmp/relay_queue.log 2>/dev/null; then
    echo "== chip_gate_g2 ==" >> /tmp/relay_queue.log
    timeout 2700 scripts/chip_gate.sh --quick > /tmp/q_chip_gate_g2.log 2>&1
    echo "chip_gate_g2 exit=$? at $(date -u)" >> /tmp/relay_queue.log
    echo "ROUND3G3 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain3 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
