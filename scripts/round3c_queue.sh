#!/bin/bash
# Relay-recovery queue, round-3 session C (post pad768 commit 64998f7).
#
# Items, in priority order:
#  1. chip_gate --quick  — on-chip evidence gate for the padded-basis
#     default (compute-path change; identity stage deferred to item 4).
#  2. gru_pad_exp        — lane-alignment A/B on the GRU stack (plain /
#     split3 / whpad / kpad512), the next bf16-ceiling lever.
#  3. bench capture      — post-pad768 headline refresh.
#  4. chip_identity      — full identity under the padded default.
#
# Launch detached:  nohup scripts/round3c_queue.sh & echo $! > /tmp/round3c.pid
cd "$(dirname "$0")/.." || exit 1
PROBES=${RELAY_PROBES:-700}   # 1/min => ~12 h window
for i in $(seq 1 "$PROBES"); do
  code=$(curl -s -m 5 http://127.0.0.1:8083/ -o /dev/null -w "%{http_code}" 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "relay up (code $code) probe $i at $(date -u)" >> /tmp/relay_queue.log
    sleep 20
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run chip_gate_c 3600 bash scripts/chip_gate.sh --quick
    run gru_pad 2400 env BENCH_MODES=all python benchmarks/gru_pad_exp.py
    run bench_c 3600 python bench.py
    run chip_identity_c 4200 python benchmarks/chip_identity_check.py
    echo "ROUND3C QUEUE DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "relay never recovered for round3c ($(date -u))" >> /tmp/relay_queue.log
exit 1
