#!/bin/bash
# Round-3g on-chip queue: evidence freshness at HEAD + the serving
# knife-edge. Session E showed the 0.5 s tick budget (not HBM) binds the
# serving ceiling: B=32,256 @ m=2 measures 443.1 ms and B=36,864 @ m=4
# misses by 0.1 ms (500.1 ms). Latency is ~linear in B, so points between
# should land: probe m=2/m=3/m=4 at B in [34,560 .. 36,352] to pin the
# largest B that measures inside the budget.
# Launch detached:  nohup scripts/round3g_queue.sh & echo $! > /tmp/round3g.pid
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 1440); do
  code=$(curl -s -o /dev/null -m 5 -w '%{http_code}' http://127.0.0.1:8083/ 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "round3g: relay up (code $code) probe $i at $(date -u)" >> /tmp/relay_queue.log
    run() { # run <name> <timeout> <cmd...>
      local name=$1 t=$2; shift 2
      echo "== $name ==" >> /tmp/relay_queue.log
      timeout "$t" "$@" > "/tmp/q_$name.log" 2>&1
      echo "$name exit=$? at $(date -u)" >> /tmp/relay_queue.log
    }
    run chip_gate_g 2700 scripts/chip_gate.sh --quick
    # Knife-edge: each point ~2-4 min (compile + 10-iter slope). The m=2
    # point doubles as an HBM probe (32,256 fit at m=2; +7% may not).
    run serve_edge_mb2 2400 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=2 SCALE_INPUT_SETS=1 \
      SCALE_BS=34560 python benchmarks/online_scale.py
    run serve_edge_mb3 3000 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=3 SCALE_INPUT_SETS=1 \
      SCALE_BS=34560,36096 python benchmarks/online_scale.py
    run serve_edge_mb4 2400 env FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 \
      SCALE_DENOISED=0 SCALE_PCM16=1 SCALE_MICROBATCH=4 SCALE_INPUT_SETS=1 \
      SCALE_BS=36352 python benchmarks/online_scale.py
    echo "ROUND3G DONE at $(date -u)" >> /tmp/relay_queue.log
    exit 0
  fi
  sleep 60
done
echo "round3g: relay never came back ($(date -u))" >> /tmp/relay_queue.log
exit 1
