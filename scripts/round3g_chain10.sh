#!/bin/bash
# Chain batch 10: the int8 v2 decision. After chain9's kernel probes,
# re-run the full-tick interleaved A/B with the v2 model (fused dot_q8
# projections + Pallas fused-dequant kernel) at both serving shapes, and
# a chip_gate at the v2 commit. If v2 WINS, a follow-up sweeps the
# serving ceiling with FVAD_QUANT=int8.
# Launch detached:  nohup scripts/round3g_chain10.sh & echo $! > /tmp/round3g10.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  if grep -q "ROUND3G9 DONE" /tmp/relay_queue.log 2>/dev/null; then
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run quant2_ab_4k 2400 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      AB_B=4096 python benchmarks/quant_tick_ab.py
    run quant2_ab_13k 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      AB_B=13824 AB_ITERS=6 python benchmarks/quant_tick_ab.py
    run chip_gate_g5 2700 scripts/chip_gate.sh --quick
    echo "ROUND3G10 DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g chain10 never started ($(date -u))" >> /tmp/relay_queue.log
exit 1
