#!/bin/bash
# Chain batch 12 (final for session G): chip_gate at HEAD (the g5 attempt
# hit a relay flap, exit 3 = skipped) + a full bench capture at the final
# session-G defaults for BENCH_LOCAL provenance.
# Launch detached:  nohup scripts/round3g_chain12.sh & echo $! > /tmp/round3g12.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  code=$(curl -s -o /dev/null -m 5 -w '%{http_code}' http://127.0.0.1:8083/ 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run chip_gate_g6 2700 scripts/chip_gate.sh --quick
    run bench_g 4000 python bench.py
    echo "ROUND3G12 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain12: relay never came back ($(date -u))" >> /tmp/relay_queue.log
exit 1
