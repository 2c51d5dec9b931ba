#!/bin/bash
# Round-5 TPU queue 5: 3DMonitor280 rerun on the chunked SoA layout +
# BE stencil-matvec A/B + the BE full runs with the winner.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3600 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-200)"
}

run soa280b env MMADMM_BENCH_BUDGET=3300 python -u bench.py 3DMonitor280
run begrid  python -u scripts/tpu_be_grid_probe.py Monitor1160 96

# CompMesh family on the CHORD kernel (VERDICT r4 item 4)
run ch320 python -u bench.py 3DMonitor320
run ch310 python -u bench.py 3DMonitor310

echo "=== queue 5 done ($(date -u +%H:%M:%SZ))"
