#!/bin/bash
# Chain batch 2 behind round3g_queue.sh: the int8 serving-tier decision.
# 1) quant_tick_ab — full-tick float-vs-int8 interleaved in one process at
#    the densest serving shape (B=4096 fast read, B=13824 the m=1 regime).
# 2) If int8 wins, the ceiling sweep below tells whether it converts into
#    a new streams/chip record (36,864 @ m=2 needs ~x1.13 on the tick;
#    43k/46k @ m=4 need ~x1.3-1.45). Run unconditionally — a miss is a few
#    bounded minutes and still calibrates the quant curve at scale.
# Launch detached:  nohup scripts/round3g_chain2.sh & echo $! > /tmp/round3g2.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G DONE" /tmp/relay_queue.log 2>/dev/null; then
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run quant_ab_4k 2400 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      AB_B=4096 python benchmarks/quant_tick_ab.py
    run quant_ab_13k 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      AB_B=13824 AB_ITERS=6 python benchmarks/quant_tick_ab.py
    run serve_q8_mb2 2400 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      FVAD_QUANT=int8 SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=2 \
      SCALE_INPUT_SETS=1 SCALE_BS=32256,36864 python benchmarks/online_scale.py
    run serve_q8_mb4 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      FVAD_QUANT=int8 SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=4 \
      SCALE_INPUT_SETS=1 SCALE_BS=43008,46080 python benchmarks/online_scale.py
    echo "ROUND3G2 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain2 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
