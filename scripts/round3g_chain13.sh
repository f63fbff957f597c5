#!/bin/bash
# Chain batch 13: dense-tick decomposition. The serving ceiling is now
# latency-bound (~36.4k at 0.5 s); the float tick at B=13,824 measures
# ~174.5 ms — this bisect (TB_B=13824, bf16 production tiers) maps where
# those milliseconds sit (denoise model vs window accumulator vs volume)
# to aim round-4 levers at the right stage.
# Launch detached:  nohup scripts/round3g_chain13.sh & echo $! > /tmp/round3g13.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G12 DONE" /tmp/relay_queue.log 2>/dev/null; then
    echo "== tick_bisect_13k ==" >> /tmp/relay_queue.log
    timeout 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 TB_B=13824 \
      python benchmarks/tick_bisect.py > /tmp/q_tick_bisect_13k.log 2>&1
    echo "tick_bisect_13k exit=$? at $(date -u)" >> /tmp/relay_queue.log
    echo "ROUND3G13 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain13 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
