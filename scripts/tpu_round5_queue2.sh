#!/bin/bash
# Round-5 TPU queue 2: BE chord-carry A/B (VERDICT r4 item 3) +
# restore the pallas rows for 3DMonitor120/Monitor220 that queue 1's
# vmap A/B overwrote.
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3000 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-160)"
}

# BE with the new at-scale chord carry (auto-on at NF>=50k)
run be1160 env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1160 2
run be1320 env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1320 2

# restore the pallas-path rows (queue 1 replaced them with vmap rows)
run m3d120p python -u bench.py 3DMonitor120
run m220p   python -u bench.py Monitor220

echo "=== queue 2 done ($(date -u +%H:%M:%SZ))"
