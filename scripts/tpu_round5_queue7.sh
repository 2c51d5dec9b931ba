#!/bin/bash
# Round-5 TPU queue 7: the 3D tiers on the new stencil consensus.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3600 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-200)"
}

run st240 python -u bench.py 3DMonitor240
run st140 python -u bench.py 3DMonitor140
run st280 env MMADMM_BENCH_BUDGET=3300 MMADMM_BENCH_CHUNK=2 python -u bench.py 3DMonitor280
run st180 env MMADMM_BENCH_BUDGET=3300 python -u bench.py 3DMonitor180

echo "=== queue 7 done ($(date -u +%H:%M:%SZ))"
