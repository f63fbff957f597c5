#!/bin/bash
# Chain batch 11: clean-provenance v3 A/B at HEAD (36ce32a routing:
# bf16-out -> Pallas fused-dequant kernel, f32-out -> XLA f32-preferred
# dot) and, if it wins, the int8 serving-ceiling sweep.
# Launch detached:  nohup scripts/round3g_chain11.sh & echo $! > /tmp/round3g11.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G10 DONE" /tmp/relay_queue.log 2>/dev/null; then
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run quant3_ab_13k 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      AB_B=13824 AB_ITERS=6 python benchmarks/quant_tick_ab.py
    run serve_q8v3_edge 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      FVAD_QUANT=int8 SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=3 \
      SCALE_INPUT_SETS=1 SCALE_BS=36096,46080 python benchmarks/online_scale.py
    echo "ROUND3G11 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain11 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
