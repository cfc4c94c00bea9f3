#!/bin/bash
# Unattended TPU measurement battery (round 4).
#
# The axon TPU tunnel goes down for long stretches (device enumeration
# itself hangs); this script polls until a probe succeeds, then runs the
# pending measurement battery:
#   1. bench.py default — geo_only headline + frame (fast) + frame (exact)
#      + frame (exact, bf16 value payloads) [VERDICT r3 #3]
#   2. bench.py --frame nuscenes_occ_compact_pairs — x-pair-bundled MSDA
#      gathers (2 rows/point, exact reassociation) [VERDICT r3 #9 fallback]
#   3. bench.py --frame nuscenes_occ_compact_bundle — FULL corner bundle
#      compiler-crash RETEST on the current toolchain [VERDICT r3 #9]
# Everything is tee'd under .tpu_runs/ for later doc reconciliation.
# NOTE run #3 may crash the TPU worker (history: HTTP 500 + device fault);
# it runs LAST, and each step re-probes the tunnel first because a prior
# crash wounds it for ~5-10 min.
set -u
OUT=/root/repo/.tpu_runs
mkdir -p "$OUT"
cd /root/repo

probe() {
  while true; do
    if timeout 180 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d" \
        >> "$OUT/status.log" 2>&1; then
      return 0
    fi
    echo "$(date -u +%FT%TZ) probe failed/hung; retrying in 600s" >> "$OUT/status.log"
    sleep 600
  done
}

echo "$(date -u +%FT%TZ) battery r4: polling for TPU" >> "$OUT/status.log"
probe
echo "$(date -u +%FT%TZ) TPU UP — bench default (incl. bf16 exact frame)" >> "$OUT/status.log"
timeout 7200 python bench.py > "$OUT/bench_r4_default.json" 2> "$OUT/bench_r4_default.log"
echo "$(date -u +%FT%TZ) bench default rc=$?" >> "$OUT/status.log"

probe
echo "$(date -u +%FT%TZ) frame compact_pairs" >> "$OUT/status.log"
timeout 3600 python bench.py --frame nuscenes_occ_compact_pairs \
  > "$OUT/bench_r4_pairs.json" 2> "$OUT/bench_r4_pairs.log"
echo "$(date -u +%FT%TZ) compact_pairs rc=$?" >> "$OUT/status.log"

probe
echo "$(date -u +%FT%TZ) frame compact_bf16_pairs (composed levers)" >> "$OUT/status.log"
timeout 3600 python bench.py --frame nuscenes_occ_compact_bf16_pairs \
  > "$OUT/bench_r4_bf16_pairs.json" 2> "$OUT/bench_r4_bf16_pairs.log"
echo "$(date -u +%FT%TZ) compact_bf16_pairs rc=$?" >> "$OUT/status.log"

probe
echo "$(date -u +%FT%TZ) frame compact_bundle (crash retest — LAST)" >> "$OUT/status.log"
timeout 3600 python bench.py --frame nuscenes_occ_compact_bundle \
  > "$OUT/bench_r4_bundle.json" 2> "$OUT/bench_r4_bundle.log"
echo "$(date -u +%FT%TZ) compact_bundle rc=$?" >> "$OUT/status.log"

echo "$(date -u +%FT%TZ) battery r4 DONE" >> "$OUT/status.log"
