#!/bin/bash
# Chain batch 9: the int8 epilogue-fusion probes. Probe 2 showed the int8
# MXU rate is REAL at [R,400]@[400,1200] (1.72x bf16) but XLA's dequant
# pass erases it — these runs measure (a) XLA epilogue variants
# (preferred_element_type=f32/bf16, bf16-stored dequant) and (b) the
# Pallas fused-dequant kernel (ops/matmul_q8.py), at the probe shape and
# at the dense serving tick's row count (24064 = 12032 rows x 2 ch).
# Launch detached:  nohup scripts/round3g_chain9.sh & echo $! > /tmp/round3g9.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G8 DONE" /tmp/relay_queue.log 2>/dev/null; then
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run int8_probe3_8k 1800 env PROBE_ROWS=8192 python benchmarks/int8_dot_probe.py
    run int8_probe3_24k 1800 env PROBE_ROWS=24064 python benchmarks/int8_dot_probe.py
    echo "ROUND3G9 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain9 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
