"""Render-path FLOP ledger: per-ray cost of the reference eval protocol.

The ledger counts the matmul/elementwise FLOPs both implementations execute
per rendered query ray (val mode: dual hypothesis, V=2 context views, S=64
epipolar samples/ray — reference CoPoNeRF.py:208-576, test.py:173-196).  The
model math is identical on both sides (parity-tested), so one ledger anchors:

  * the reference baseline: A6000 fp32 peak (38.7 TFLOP/s; the reference
    runs pure fp32 — no autocast/half/TF32-matmul anywhere in the repo)
    times an assumed utilization band;
  * our speed-of-light: v5e bf16 peak (197 TFLOP/s);
  * achieved MFU for any measured rays/s.

Run:  python scripts/flops_ledger.py [measured_rays_per_sec]
"""

from __future__ import annotations

import sys

# protocol constants (reference values; CoPoNeRF.py:24, 20-104)
S = 64            # epipolar samples per ray (npoints)
V = 2             # context views == val-mode hypotheses
LAT = 832         # latent_dim (3*256 UFC + 64 conv_map)
HALF = LAT // 2   # 416
HID = 128         # attention key width
LC = 16           # local_coords channels
PHI_HID = 128
PHI_BLOCKS = 3

A6000_FP32 = 38.71e12   # NVIDIA spec sheet, fp32 CUDA-core peak
V5E_BF16 = 197e12       # TPU v5e spec, bf16 MXU peak per chip


def mm(m, n):
    """FLOPs per token of an (in=m -> out=n) dense layer (MAC = 2 FLOPs)."""
    return 2 * m * n


def per_ray_ledger() -> dict:
    led = {}
    # 4 encode combinations (primary/secondary x view, CoPoNeRF.py:384-408),
    # each over S samples: W1 (LAT+3 -> LAT), relu, W2 (LAT -> HALF)
    led["encode (4xS tokens: W1+W2)"] = 4 * S * (mm(LAT + 3, LAT) + mm(LAT, HALF))
    # value/key heads over V*S samples (CoPoNeRF.py:404-408)
    led["latent_value (VxS)"] = V * S * mm(LAT, HALF)
    led["key_map(+2) (VxS)"] = V * S * (mm(LAT, HID) + mm(HID, HID))
    # query embeds over V*S samples (CoPoNeRF.py:411-446, 467-485)
    led["query_embed(+2) (VxS)"] = V * S * (mm(LC, HID) + mm(HID, HID))
    led["repeat_embed(+2) (VxS)"] = V * S * (mm(HID + LC, HID) + mm(HID, HID))
    # two attention rounds: dot + weighted value sum (CoPoNeRF.py:450-485)
    led["attention dots+sums"] = 2 * V * S * (2 * HID + 2 * HALF)
    # light-field MLP, one token per ray (lightfield.py:131-167)
    led["phi (ResnetFC)"] = (
        mm(2 * 9, PHI_HID)
        + PHI_BLOCKS * (mm(V * HALF, PHI_HID) + 2 * mm(PHI_HID, PHI_HID))
        + mm(PHI_HID, 3)
    )
    # bilinear blends of the 2 sampling passes (4 corners, ~11 flops/channel)
    led["bilinear blends"] = 2 * V * S * LAT * 11 // V  # primary+secondary per view pair
    led["geometry (epipolar, projections)"] = V * S * 120  # ~120 flops/sample
    return led


def main():
    led = per_ray_ledger()
    total = sum(led.values())
    print("per-ray FLOPs (val-mode render, S=64, V=2):")
    for k, v in led.items():
        print(f"  {k:40s} {v / 1e6:8.2f} MF")
    print(f"  {'TOTAL':40s} {total / 1e6:8.2f} MF")
    print()
    print(f"A6000 fp32 SOL: {A6000_FP32 / total:,.0f} rays/s/GPU (100% MFU)")
    for eta in (0.3, 0.5, 0.7):
        print(f"  at {eta:.0%} MFU: {A6000_FP32 * eta / total:,.0f} rays/s/GPU")
    print(f"v5e bf16 SOL:  {V5E_BF16 / total:,.0f} rays/s/chip (100% MFU)")
    if len(sys.argv) > 1:
        measured = float(sys.argv[1])
        print(f"measured {measured:,.0f} rays/s/chip -> MFU {measured * total / V5E_BF16:.1%}")


if __name__ == "__main__":
    main()
