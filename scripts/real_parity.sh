#!/usr/bin/env bash
# Real-data parity gate in one command (VERDICT r3 item 8).
#
#   scripts/real_parity.sh DATA_ROOT POSE_ROOT CKPT LPIPS_NPZ [OUTDIR] [extra args...]
#
# Runs: overlap-table generation -> full binned eval (PSNR/SSIM/LPIPS/pose,
# exact f32 AND fast bf16+cf[16,4]) -> parity report vs the BASELINE budgets.
# Writes OUTDIR/report.json; exits non-zero if a gate fails.
#
# Dry run (no dataset/weights needed; fabricated scenes + random LPIPS):
#   scripts/real_parity.sh --dry-run [OUTDIR]
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--dry-run" ]]; then
    OUT="${2:-/tmp/real_parity_dry}"
    exec python scripts/real_parity.py --dry_run --out "$OUT"
fi

if [[ $# -lt 4 ]]; then
    grep '^#' "$0" | head -12
    exit 2
fi
DATA="$1"; POSE="$2"; CKPT="$3"; LPIPS="$4"; OUT="${5:-/tmp/real_parity}"
shift 4; [[ $# -gt 0 ]] && shift
exec python scripts/real_parity.py \
    --data_root "$DATA" --pose_root "$POSE" \
    --checkpoint "$CKPT" --lpips_weights "$LPIPS" \
    --out "$OUT" "$@"
