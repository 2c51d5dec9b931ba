#!/bin/bash
# Round-4 TPU measurement queue (single chip, single tunnel — strictly
# sequential). Each entry logs to /tmp/q_<tag>.log and appends to
# Results/tpu_bench.json. Order: cheap small-config rows first (device
# mode), then the big chunked runs, then the prox A/B.

cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q_$tag.log | tail -1 | cut -c1-150)"
}

# small configs, whole-run device loop (sub-30 s dispatches)
run m120   python -u scripts/tpu_methods_bench.py Monitor120 2 1
run m140   python -u scripts/tpu_methods_bench.py Monitor140 2
run m3d110 python -u scripts/tpu_methods_bench.py 3DMonitor110 1 2
run m2320e python -u scripts/tpu_methods_bench.py Monitor2320 1
run m3d310 python -u scripts/tpu_methods_bench.py 3DMonitor310 0

# big runs, chunked (device dispatches must stay short on this tunnel)
run m1320e env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1320 1
run m3d320 env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py 3DMonitor320 0
run b3d240 env MMADMM_BENCH_LOOP=chunked python -u bench.py 3DMonitor240

# prox backend A/B at the headline size
run proxab python -u scripts/tpu_prox_bench.py Monitor1320

echo "=== queue done ($(date -u +%H:%M:%SZ))"
