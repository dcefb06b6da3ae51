"""Fetch + convert the LPIPS-VGG weights (NETWORK-REQUIRING; run outside
this offline image).

The reference evaluates LPIPS with the ``lpips`` package's VGG variant
(reference test.py:149,258-263).  That needs two external state dicts:

  1. torchvision VGG16 ImageNet weights (``vgg16-397923af.pth``)
  2. the lpips package's linear-head weights (``weights/v0.1/vgg.pth``)

This script downloads both and converts them into the single ``.npz``
consumed by ``coponerf_tpu.eval.lpips_jax.LPIPSVGG`` (numeric faithfulness
of the converter + JAX forward is pinned by the torch-oracle test in
``tests/test_lpips.py``, which exercises the exact same conversion path
with random weights).

Usage:
    python scripts/fetch_lpips_weights.py [out.npz]
"""

import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
LPIPS_LIN_URL = (
    "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
    "lpips/weights/v0.1/vgg.pth"
)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz"
    import torch

    from coponerf_tpu.eval.lpips_jax import convert_torch_lpips

    vgg = torch.hub.load_state_dict_from_url(VGG16_URL, map_location="cpu")
    lin = torch.hub.load_state_dict_from_url(LPIPS_LIN_URL, map_location="cpu")
    convert_torch_lpips(
        {k: v.numpy() for k, v in lin.items()},
        {k: v.numpy() for k, v in vgg.items()},
        out_path,
    )
    print(f"wrote {out_path}; pass it as --lpips_weights to test.py")


if __name__ == "__main__":
    main()
