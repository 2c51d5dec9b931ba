#!/bin/bash
# Round-5 TPU queue 4: the big measurement sweep.
#  1. Monitor1320 — headline, now on the structured-grid stencil engine
#  2. 3DMonitor280 — the 6.1M-tet tier (SoA slab engine; compile probe
#     passed: temp 5.48 GiB)
#  3. 3DMonitor180 — stretch (Shoulder 3D, constant monitor, ~4.6M tets)
#  4. BE m2 reruns with the FIXED chord carry (no extrapolation)
#  5. quality-extension reruns (3DMonitor120, Monitor220)
#  6. other 2D rows on the grid engine (Monitor1160/2320/2160)
cd /root/repo
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date -u +%H:%M:%SZ))"
  timeout 3600 "$@" > /tmp/q5_$tag.log 2>&1
  echo "    rc=$? $(grep -v WARNING /tmp/q5_$tag.log | tail -1 | cut -c1-200)"
}

run g1320  python -u bench.py Monitor1320
run soa280run env MMADMM_BENCH_BUDGET=3300 python -u bench.py 3DMonitor280
run be1160f env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1160 2
run qual120 python -u bench.py 3DMonitor120
run qual220 python -u bench.py Monitor220
run g1160  python -u bench.py Monitor1160
run g2320  python -u bench.py Monitor2320
run soa180run env MMADMM_BENCH_BUDGET=3300 python -u bench.py 3DMonitor180
run be1320f env MMADMM_BENCH_MODE=chunked python -u scripts/tpu_methods_bench.py Monitor1320 2
run g2160  python -u bench.py Monitor2160

echo "=== queue 4 done ($(date -u +%H:%M:%SZ))"
