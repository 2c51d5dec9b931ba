#!/bin/bash
# Round-5 TPU queue 10: device-loop defaults for the remaining
# short-dispatch chunked rows (queue 9 measured the chunked host loop
# costing ~29 ms/step of dispatch overhead).
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3600 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-200)"
}

run d3d220 python -u bench.py 3DMonitor220
run d3320r python -u bench.py Monitor3320r
run d3d140 python -u bench.py 3DMonitor140
run d3d240 python -u bench.py 3DMonitor240

echo "=== queue 10 done ($(date -u +%H:%M:%SZ))"
