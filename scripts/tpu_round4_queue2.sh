#!/bin/bash
# Round-4 TPU queue 2: rise-stop Monitor2320 Euler rerun + the remaining
# small-config ADMM rows (device loop) + Monitor1160 Euler.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q2_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q2_$tag.log | tail -1 | cut -c1-160)"
}

run m2320r python -u scripts/tpu_methods_bench.py Monitor2320 1
run m1160e env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1160 1
run a120   python -u scripts/tpu_methods_bench.py Monitor120 0
run a180   python -u scripts/tpu_methods_bench.py Monitor180 0
run a220   python -u scripts/tpu_methods_bench.py Monitor220 0
run a320   python -u scripts/tpu_methods_bench.py Monitor320 0
run a3d210 python -u scripts/tpu_methods_bench.py 3DMonitor210 0
echo "=== queue2 done ($(date -u +%H:%M:%SZ))"

# 2D ADMM reruns with the Pallas prox backend (bench.py now defaults to
# it for 2D configs)
run p2320 python -u bench.py Monitor2320
run p3320 python -u bench.py Monitor3320r
run p1160 python -u bench.py Monitor1160
run p2160 python -u bench.py Monitor2160
run p3160 python -u bench.py Monitor3160
echo "=== queue2b done ($(date -u +%H:%M:%SZ))"
