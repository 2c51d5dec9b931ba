#!/bin/bash
# Round-5 TPU queue 8: explicit Euler on the stencil engine
# (ops/dense_eg2d.py) — remeasure the two weakest surviving rows.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3600 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-200)"
}

run eu1160g env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1160 1
run eu1320g env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1320 1

echo "=== queue 8 done ($(date -u +%H:%M:%SZ))"
