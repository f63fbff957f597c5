#!/bin/bash
# Relay queue, round-3 session D (post istft-pad/split3/microbatch commits).
#
# Items, in priority order:
#  1. chip_gate --quick   — gate the new compute-path defaults
#     (FVAD_ISTFT_PAD=on, FVAD_GRU_SPLIT3=auto) with bench sanity.
#  2. istft_ab            — full-step A/B of the padded inverse basis
#     (bare-op win measured in tail_layout_exp; this decides end-to-end).
#  3. serve microbatch    — does SCALE_MICROBATCH=2 unlock the 23,040/
#     27,648-stream points that OOM'd at m=1? (HBM binder = transients.)
#  4. bench capture       — post-lever headline refresh.
#  5. chip_identity       — full identity under the new defaults.
#
# Launch detached:  nohup scripts/round3d_queue.sh & echo $! > /tmp/round3d.pid
cd "$(dirname "$0")/.." || exit 1
PROBES=${RELAY_PROBES:-700}
for i in $(seq 1 "$PROBES"); do
  code=$(curl -s -m 5 http://127.0.0.1:8083/ -o /dev/null -w "%{http_code}" 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "round3d: relay up (code $code) probe $i at $(date -u)" >> /tmp/relay_queue.log
    sleep 10
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run chip_gate_d 3600 bash scripts/chip_gate.sh --quick
    run istft_ab 3000 env BENCH_MODES=all python benchmarks/istft_ab.py
    run serve_mb2 3600 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=2 \
      SCALE_BS=18432,23040,27648 python benchmarks/online_scale.py
    run bench_d 3600 python bench.py
    run chip_identity_d 4200 python benchmarks/chip_identity_check.py
    echo "ROUND3D QUEUE DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3d: relay never recovered ($(date -u))" >> /tmp/relay_queue.log
exit 1
