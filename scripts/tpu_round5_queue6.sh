#!/bin/bash
# Round-5 TPU queue 6: BE full runs with the kernelized stencil path +
# final headline rehearsal on the committed state.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3600 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-200)"
}

# retry: the first 280 run completed 98/100 steps at ~12.9 s/step and
# wedged on its final dispatch (tunnel); chunk=1 for shorter dispatches
run soa280c env MMADMM_BENCH_BUDGET=3300 MMADMM_BENCH_CHUNK=1 python -u bench.py 3DMonitor280
run be1160k env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1160 2
run be1320k env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1320 2
run final1320 python -u bench.py Monitor1320

echo "=== queue 6 done ($(date -u +%H:%M:%SZ))"
