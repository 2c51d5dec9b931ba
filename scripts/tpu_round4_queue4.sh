#!/bin/bash
# Round-4 TPU queue 4: device-loop reruns of the remaining 3D rows whose
# recorded numbers predate the device loop, then the DRIVER REHEARSAL —
# a plain `python bench.py` exactly as the round-end driver invokes it.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q4_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q4_$tag.log | tail -1 | cut -c1-160)"
}
run b3d110 python -u bench.py 3DMonitor110
run b3d120 python -u bench.py 3DMonitor120
run b3d220 env MMADMM_BENCH_LOOP=chunked python -u bench.py 3DMonitor220
run rehearse python -u bench.py
echo "=== queue4 done ($(date -u +%H:%M:%SZ))"
