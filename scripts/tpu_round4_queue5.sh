#!/bin/bash
# Round-4 TPU queue 5: 3D rows with the 12x12 Pallas prox kernel.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-160)"
}
run k3d110 python -u bench.py 3DMonitor110
run k3d120 python -u bench.py 3DMonitor120
run k3d210 python -u scripts/tpu_methods_bench.py 3DMonitor210 0
run k3d220 env MMADMM_BENCH_LOOP=chunked python -u bench.py 3DMonitor220
run k3d140 env MMADMM_BENCH_LOOP=chunked python -u bench.py 3DMonitor140
run k3d240 env MMADMM_BENCH_LOOP=chunked python -u bench.py 3DMonitor240
run rehearse python -u bench.py
echo "=== queue5 done ($(date -u +%H:%M:%SZ))"
