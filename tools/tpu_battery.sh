#!/bin/bash
# Unattended TPU measurement battery.
#
# The axon TPU tunnel goes down for long stretches (device enumeration
# itself hangs); this script polls until a probe succeeds, then runs the
# pending measurement battery (CLAUDE.md "TPU measurements pending"):
#   1. bench.py default     — geo_only headline + frame (fast) + frame (exact)
#   2. bench.py --full-channels --no-frames — the all-channel gather headline
#      (the round-2 number, for the payload-regression comparison)
#   3. train.py nuscenes_occ_compact_train — reference-exact-semantics train
#      step on the 16 GB v5e (VERDICT r2 #5); the log captures s/step or OOM
# Everything is tee'd under .tpu_runs/ for later doc reconciliation.
set -u
OUT=/root/repo/.tpu_runs
mkdir -p "$OUT"
cd /root/repo

echo "$(date -u +%FT%TZ) battery: polling for TPU" >> "$OUT/status.log"
while true; do
  if timeout 180 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d" \
      >> "$OUT/status.log" 2>&1; then
    break
  fi
  echo "$(date -u +%FT%TZ) probe failed/hung; retrying in 600s" >> "$OUT/status.log"
  sleep 600
done
echo "$(date -u +%FT%TZ) TPU UP — running battery" >> "$OUT/status.log"

timeout 5400 python bench.py > "$OUT/bench_default.json" 2> "$OUT/bench_default.log"
echo "$(date -u +%FT%TZ) bench default rc=$?" >> "$OUT/status.log"

timeout 2700 python bench.py --full-channels --no-frames \
  > "$OUT/bench_fullch.json" 2> "$OUT/bench_fullch.log"
echo "$(date -u +%FT%TZ) bench full-channels rc=$?" >> "$OUT/status.log"

timeout 1800 python tools/bench_gather.py > "$OUT/bench_gather.json" \
  2> "$OUT/bench_gather.log"
echo "$(date -u +%FT%TZ) bench gather rc=$?" >> "$OUT/status.log"

# sweep DMA pipeline depth (cheap once compiled per shape)
for inflight in 8 32 64; do
  timeout 900 python tools/bench_gather.py --inflight $inflight \
    > "$OUT/bench_gather_if$inflight.json" 2>> "$OUT/bench_gather.log"
done
echo "$(date -u +%FT%TZ) gather sweep rc=$?" >> "$OUT/status.log"

timeout 5400 python train.py --py-config nuscenes_occ_compact_train \
  --synthetic --max-steps 4 --print-freq 1 --prefetch 2 \
  --work-dir "$OUT/train_compact" > "$OUT/train_compact.log" 2>&1
echo "$(date -u +%FT%TZ) compact train rc=$?" >> "$OUT/status.log"

echo "$(date -u +%FT%TZ) battery DONE" >> "$OUT/status.log"
