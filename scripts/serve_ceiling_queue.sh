#!/bin/bash
# Round-3 serving-ceiling follow-up queue.
#
# The measured bf16 events-only ceiling (13,824 streams; 18,432 OOM) was set
# by the BENCHMARK's two resident f32 input buffers (14 GB at 18,432), not by
# serving state. Re-measure with SCALE_PCM16=1 — resident int16 inputs, the
# server's production ingestion path (parallel/online.py::push), 4x smaller —
# plus an FVAD_IO_DTYPE=bf16 tier that also halves the step's activation HBM.
#
# Waits for the relay to be up and for any pid in /tmp/bench_high.pid to
# finish first (one chip job at a time through the tunnel).
#
# Launch detached:  nohup scripts/serve_ceiling_queue.sh > /dev/null 2>&1 &
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/relay_queue.log

if [ -f /tmp/bench_high.pid ]; then
  while kill -0 "$(cat /tmp/bench_high.pid)" 2>/dev/null; do sleep 30; done
fi
for i in $(seq 1 "${RELAY_PROBES:-120}"); do
  code=$(curl -s -m 5 http://127.0.0.1:8083/ -o /dev/null -w "%{http_code}" 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "serve_ceiling queue: relay up (code $code) at $(date -u)" >> "$LOG"
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name start $(date -u) ==" >> "$LOG"
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> "$LOG"
    }
    run serve_pcm16_ev_bf16 3000 env FVAD_PRECISION=default SCALE_DENOISED=0 \
      SCALE_PCM16=1 SCALE_BS=13824,18432,23040,27648 \
      python benchmarks/online_scale.py
    run serve_pcm16_ev_bf16io 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_BS=27648,36864,46080 \
      python benchmarks/online_scale.py
    echo "SERVE-CEILING QUEUE DONE at $(date -u)" >> "$LOG"
    exit 0
  fi
  sleep 60
done
echo "serve_ceiling queue: relay never recovered ($(date -u))" >> "$LOG"
exit 1
