#!/bin/bash
# Relay-recovery measurement queue (round 3).
#
# The dev TPU tunnel (127.0.0.1:8083) has been down since ~2026-08-17 19:30
# UTC; every on-chip decision is queued here. Poll the relay; on recovery
# run the round-3 measurement queue in priority order, logging to
# /tmp/q_*.log with a one-line ledger in /tmp/relay_queue.log.
#
# Launch detached:  nohup scripts/relay_queue.sh & echo $! > /tmp/relay_queue.pid
cd "$(dirname "$0")/.." || exit 1
PROBES=${RELAY_PROBES:-2000}   # 1/min => ~33 h window
for i in $(seq 1 "$PROBES"); do
  code=$(curl -s -m 5 http://127.0.0.1:8083/ -o /dev/null -w "%{http_code}" 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "relay up (code $code) probe $i at $(date -u)" >> /tmp/relay_queue.log
    sleep 20
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    # Priority order: default-flipping A/Bs first, then the serving curve,
    # then evidence refreshes, then the slowest (identity), then a bench
    # capture at whatever defaults the A/Bs justified.
    run band_fold_ab 2400 env BENCH_MODES=all python benchmarks/band_fold_ab.py
    run chip_gate_quick 3600 bash scripts/chip_gate.sh --quick
    run online_scale 3000 env SCALE_BS=256,1024,2304,4608 python benchmarks/online_scale.py
    run tick_bisect 1800 python benchmarks/tick_bisect.py
    run fe_overlap_ab 2400 env BENCH_MODES=both python benchmarks/fe_overlap_ab.py
    run pipeline_ab 2400 env BENCH_MODES=all python benchmarks/pipeline_ab.py
    run batch_scale 2400 env BENCH_MODES=both python benchmarks/batch_scale.py
    # Deep pipeline + 2-layer GRU wavefront combination (rider composes
    # with the wavefront schedule — tests/test_pipelined.py): does halving
    # the serial chain beat the layer-by-layer throughput schedule at the
    # bench shape once everything else rides the scan?
    run pipeline_ab_wavefront 2400 env FVAD_GRU_WAVEFRONT=on python benchmarks/pipeline_ab.py
    run chip_identity 4200 python benchmarks/chip_identity_check.py
    run bench 3600 python bench.py
    echo "QUEUE DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "relay never recovered ($(date -u))" >> /tmp/relay_queue.log
exit 1
