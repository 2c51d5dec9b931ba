#!/bin/bash
# Round-4 TPU queue 3: the 6.1M-tet tier (stretch — VERDICT r3 item 3's
# "3DMonitor280 vs the ref's 2,865 s" clause, plus 3DMonitor180 vs its
# 25,290 s). Chunked loops, j_carry auto-off, slab-streamed Jacobians.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q3_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q3_$tag.log | tail -1 | cut -c1-160)"
}
run b3d280 env MMADMM_BENCH_LOOP=chunked MMADMM_BENCH_BUDGET=2900 python -u bench.py 3DMonitor280
run b3d180 env MMADMM_BENCH_LOOP=chunked MMADMM_BENCH_BUDGET=2900 python -u bench.py 3DMonitor180
echo "=== queue3 done ($(date -u +%H:%M:%SZ))"
