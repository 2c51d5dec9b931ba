#!/bin/bash
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q7_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q7_$tag.log | tail -1 | cut -c1-160)"
}
run c3d310 python -u bench.py 3DMonitor310
run c3d320 env MMADMM_BENCH_LOOP=chunked python -u bench.py 3DMonitor320
echo "=== queue7 done ($(date -u +%H:%M:%SZ))"
