#!/bin/bash
# Unattended TPU measurement battery (round 5).
#
# The axon TPU tunnel goes down for long stretches (device enumeration
# itself hangs); this script polls until a probe succeeds, then runs the
# round-5 measurement battery:
#   0. dryrun time guard (CPU only, VERDICT r4 #8): the 8-device dryrun
#      must finish < 8 min or the step FAILS — this is the regression guard
#      for the driver's MULTICHIP budget (r4 shipped rc:124 because round-4
#      compiles silently grew past it; now cold ~5 min / warm ~1.5 min).
#   1. bench.py default — render headline + fast frame + exact frame +
#      forward_occ entry [VERDICT r4 #4]
#      (eval-skip was UNWIRED from the fast recipe after the round-5
#      skip-delta measurement: 3.4x slower + 0.97 m depth deviation —
#      docs/PERFORMANCE.md dead ends; skip_delta.py opts in explicitly)
#   2. exact-train v5e fit probe (best point_chunk from the round-5 sweep,
#      see .tpu_runs/sweep_fit.log) + 24 sustained steps when it fits
#      [VERDICT r4 #2]
#   3. eval_novel_depth per-frame latency: warm-cache run then a 3-sample
#      run; frame_s ~ (t3 - t1) / 2 [VERDICT r4 #7]
# Everything is tee'd under .tpu_runs/ for later doc reconciliation.
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

echo "$(date -u +%FT%TZ) battery r5: step 0 dryrun guard (CPU)" >> "$OUT/status.log"
START=$(date +%s)
if XLA_FLAGS=--xla_force_host_platform_device_count=8 timeout 480 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
    > "$OUT/dryrun_guard.log" 2>&1; then
  echo "$(date -u +%FT%TZ) dryrun guard OK ($(($(date +%s) - START))s)" >> "$OUT/status.log"
else
  echo "$(date -u +%FT%TZ) dryrun guard FAIL rc=$? ($(($(date +%s) - START))s > 480s budget)" >> "$OUT/status.log"
fi

probe
echo "$(date -u +%FT%TZ) TPU UP — bench default (headline+frames+occ)" >> "$OUT/status.log"
timeout 7200 python bench.py > "$OUT/bench_r5_default.json" 2> "$OUT/bench_r5_default.log"
echo "$(date -u +%FT%TZ) bench default rc=$?" >> "$OUT/status.log"

# (The exact-train v5e fit question is SETTLED as does-not-fit: a 14-point
# round-5 lever matrix — point_chunk ladder incl. per-plane tuples,
# train_ray_chunk, capacity tightening, query_unroll, batch-folded gather —
# bottomed at 16.40 GB vs 15.75 usable; see .tpu_runs/sweep_fit.log and
# docs/PERFORMANCE.md. No fit probe here anymore.)

probe
echo "$(date -u +%FT%TZ) skip-delta (fast-tier depth deviation + speedup)" >> "$OUT/status.log"
timeout 3600 python tools/skip_delta.py nuscenes_occ_fast \
  > "$OUT/skip_delta.json" 2> "$OUT/skip_delta.log"
echo "$(date -u +%FT%TZ) skip-delta rc=$?" >> "$OUT/status.log"

probe
echo "$(date -u +%FT%TZ) prepare ablation (exact bundle recipe)" >> "$OUT/status.log"
timeout 3600 python tools/profile_prepare.py nuscenes_occ_compact_bundle \
  > "$OUT/profile_prepare.json" 2> "$OUT/profile_prepare.log"
echo "$(date -u +%FT%TZ) prepare ablation (exact) rc=$?" >> "$OUT/status.log"
probe
timeout 3600 python tools/profile_prepare.py nuscenes_occ_fast \
  > "$OUT/profile_prepare_fast.json" 2> "$OUT/profile_prepare_fast.log"
echo "$(date -u +%FT%TZ) prepare ablation (fast) rc=$?" >> "$OUT/status.log"

# NOTE: back-to-back TPU processes OOM — the tunnel holds the previous
# process' HBM for ~1-2 min after exit (round-5 lesson: both novel runs
# OOM'd at 30 s settle). 120 s settle before every big job.
sleep 120
probe
echo "$(date -u +%FT%TZ) eval_novel_depth per-stage latency (bundle recipe)" >> "$OUT/status.log"
timeout 3600 python tools/probe_novel_bundle.py nuscenes_novel_depth_bundle \
  > "$OUT/novel_bundle.json" 2> "$OUT/novel_bundle.log"
echo "$(date -u +%FT%TZ) novel-depth bundle rc=$?" >> "$OUT/status.log"
sleep 120
probe
timeout 3600 python tools/probe_novel_bundle.py nuscenes_novel_depth_fast_bundle \
  > "$OUT/novel_fast_bundle.json" 2> "$OUT/novel_fast_bundle.log"
echo "$(date -u +%FT%TZ) novel-depth fast_bundle rc=$?" >> "$OUT/status.log"
sleep 120
probe
timeout 3600 python bench.py --occ > "$OUT/bench_occ.json" 2> "$OUT/bench_occ.log"
echo "$(date -u +%FT%TZ) bench --occ rc=$?" >> "$OUT/status.log"

echo "$(date -u +%FT%TZ) battery r5 DONE" >> "$OUT/status.log"
