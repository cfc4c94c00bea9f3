#!/bin/bash
# One-command north-star parity dress rehearsal (VERDICT r3 #8):
#   import .pth -> round-trip export/import gate -> eval_depth -> eval_iou
# Usage:
#   tools/parity_rehearsal.sh <config> <ckpt.pth> [extra parity_rehearsal.py args...]
# e.g. on real data:
#   tools/parity_rehearsal.sh nuscenes_occ released.pth --occ3d --sem --use-mask --num-samples 50
set -euo pipefail
CFG=${1:?usage: parity_rehearsal.sh <config> <ckpt.pth> [args...]}
CKPT=${2:?usage: parity_rehearsal.sh <config> <ckpt.pth> [args...]}
shift 2
cd "$(dirname "$0")/.."
exec python tools/parity_rehearsal.py --py-config "$CFG" \
    --torch-ckpt "$CKPT" "$@"
