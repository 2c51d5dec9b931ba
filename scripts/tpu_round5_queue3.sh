#!/bin/bash
# Round-5 TPU queue 3: SoA 6.1M-tet compile probe + BE chord A/B probe.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-200)"
}

run soa280 python -u scripts/tpu_280_probe.py 3DMonitor280 pallas
run bechord python -u scripts/tpu_be_chord_probe.py Monitor1160 96

echo "=== queue 3 done ($(date -u +%H:%M:%SZ))"
