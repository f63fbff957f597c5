#!/bin/bash
# Relay queue, round-3 session E (post istft-pad-off / gate-hardening commit).
#
# Items, in priority order:
#  1. chip_gate --quick   — gate the new defaults (FVAD_ISTFT_PAD=off) and
#     prove the hardened bench-sanity stage passes where round-3d's failed.
#  2. serve ceiling push  — microbatch=2 at B=32,256/36,864: how far does
#     the transient-activation unlock go before HBM or the 0.5 s budget?
#  3. serve m=3 probe     — B=36,864 at microbatch=3 (in case m=2 OOMs).
#  4. bench capture       — full table at the new defaults (pad off).
#
# Launch detached:  nohup scripts/round3e_queue.sh & echo $! > /tmp/round3e.pid
cd "$(dirname "$0")/.." || exit 1
PROBES=${RELAY_PROBES:-700}
for i in $(seq 1 "$PROBES"); do
  code=$(curl -s -m 5 http://127.0.0.1:8083/ -o /dev/null -w "%{http_code}" 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "round3e: relay up (code $code) probe $i at $(date -u)" >> /tmp/relay_queue.log
    sleep 10
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run chip_gate_e 3600 bash scripts/chip_gate.sh --quick
    run serve_mb2_push 3600 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=2 \
      SCALE_BS=32256,36864 python benchmarks/online_scale.py
    run serve_mb3_probe 2400 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=3 \
      SCALE_BS=36864 python benchmarks/online_scale.py
    run bench_e 3600 python bench.py
    echo "ROUND3E QUEUE DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3e: relay never recovered ($(date -u))" >> /tmp/relay_queue.log
exit 1
