#!/bin/bash
# Round-5 TPU queue 9: whole-run device loops for the stencil-engine
# method-1/2 rows (the chunked loop's per-chunk dispatch was ~29 ms/step
# of pure overhead at Monitor1160 — device mode measured 1.16 ms/step).
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3600 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-200)"
}

run eu1320d python -u scripts/tpu_methods_bench.py Monitor1320 1
run be1160d python -u scripts/tpu_methods_bench.py Monitor1160 2

echo "=== queue 9 done ($(date -u +%H:%M:%SZ))"
