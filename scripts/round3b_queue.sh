#!/bin/bash
# Round-3 session-B measurement queue: predecim STFT A/B (can flip the
# FVAD_STFT_PREDECIM default), then the serving-ceiling follow-ups
# (bf16-activation tier at the post-pcm16 ceiling; in-process pcm16-vs-f32
# dequant A/B at the 13,824 tier to resolve the 416.9-vs-192 ms
# cross-process contradiction — relay throttle lottery).
#
# Launch detached:  nohup scripts/round3b_queue.sh > /dev/null 2>&1 &
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/relay_queue.log

# One chip job at a time through the tunnel: wait for any tracked bench
# capture to finish before queueing (same rule as serve_ceiling_queue.sh).
if [ -f /tmp/bench_high.pid ]; then
  while kill -0 "$(cat /tmp/bench_high.pid)" 2>/dev/null; do sleep 30; done
fi
for i in $(seq 1 "${RELAY_PROBES:-120}"); do
  code=$(curl -s -m 5 http://127.0.0.1:8083/ -o /dev/null -w "%{http_code}" 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "round3b queue: relay up (code $code) at $(date -u)" >> "$LOG"
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name start $(date -u) ==" >> "$LOG"
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> "$LOG"
    }
    run stft_ab 3000 env BENCH_MODES=all python benchmarks/stft_ab.py
    run serve_pcm16_ev_bf16io 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_BS=18432,23040,27648 \
      python benchmarks/online_scale.py
    run serve_ab_13824 3000 env FVAD_PRECISION=default SCALE_DENOISED=0 \
      SCALE_AB=1 SCALE_BS=13824 python benchmarks/online_scale.py
    echo "ROUND3B QUEUE DONE at $(date -u)" >> "$LOG"
    exit 0
  fi
  sleep 60
done
echo "round3b queue: relay never recovered ($(date -u))" >> "$LOG"
exit 1
