#!/bin/bash
# Chain batch 14: dense-tick decomposition retry (the 13824 run OOM'd on
# the wavefront variant's second program; TB_WAVEFRONT=0 now skips it).
# Launch detached:  nohup scripts/round3g_chain14.sh & echo $! > /tmp/round3g14.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G13 DONE" /tmp/relay_queue.log 2>/dev/null; then
    run() {
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run tick_bisect_9k 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      TB_B=9216 TB_WAVEFRONT=0 python benchmarks/tick_bisect.py
    run tick_bisect_13k2 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      TB_B=13824 TB_WAVEFRONT=0 python benchmarks/tick_bisect.py
    echo "ROUND3G14 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain14 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
