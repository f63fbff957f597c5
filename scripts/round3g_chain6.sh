#!/bin/bash
# Chain batch 6: chip_gate at the session-G HEAD (the 22:34 gate attempt
# hit a relay outage window and exited 3 = skipped; the int8-tier commit
# still needs its on-chip evidence line in CHIP_GATE.log).
# Launch detached:  nohup scripts/round3g_chain6.sh & echo $! > /tmp/round3g6.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G5 DONE" /tmp/relay_queue.log 2>/dev/null; then
    echo "== chip_gate_g3 ==" >> /tmp/relay_queue.log
    timeout 2700 scripts/chip_gate.sh --quick > /tmp/q_chip_gate_g3.log 2>&1
    echo "chip_gate_g3 exit=$? at $(date -u)" >> /tmp/relay_queue.log
    echo "ROUND3G6 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain6 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
