#!/bin/bash
# Round-5 TPU queue 1: mid-tier recorded-artifact rows (VERDICT r4 item 5)
# + quality-fallback A/B for the two rows that never reached reference
# quality on the pallas path (ADVICE r4 medium): 3DMonitor120 and
# Monitor220 rerun with the vmap prox.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-160)"
}

run m240  python -u bench.py Monitor240
run m280  python -u bench.py Monitor280
run m340  python -u bench.py Monitor340
run m380  python -u bench.py Monitor380
run m210  python -u bench.py Monitor210
run m310  python -u bench.py Monitor310

# ADVICE r4 medium: do these reach ref quality on the vmap prox?
run q3d120v env MMADMM_PROX=vmap python -u bench.py 3DMonitor120
run q220v   env MMADMM_PROX=vmap python -u bench.py Monitor220

echo "=== queue 1 done ($(date -u +%H:%M:%SZ))"
