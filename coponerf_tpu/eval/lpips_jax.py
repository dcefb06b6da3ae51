"""LPIPS (VGG16 backbone) in JAX — external-weight dependency.

The reference evaluates LPIPS with the ``lpips`` package's VGG variant
(test.py:149,258-263), which needs pretrained VGG16 + linear-head weights.
This image has no network and no lpips/torchvision, so weights must be
supplied as a converted ``.npz`` (schema below).  ``convert_torch_lpips``
produces that file from a torch LPIPS state_dict + torchvision VGG16
state_dict when available.

npz schema: conv kernels ``features_{i}/kernel`` (HWIO) and ``.../bias`` for
torchvision VGG16 feature indices i in CONV_IDX; head kernels
``lin{k}/kernel`` with shape (1, 1, C_k, 1).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np
from jax import lax

# torchvision VGG16 .features conv layer indices and the tap points used by
# LPIPS (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
TAPS = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}  # layer index after relu -> head id
CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def make_random_weights(path: str, seed: int = 0) -> str:
    """Write a structurally-valid random-weight npz (offline drives/tests:
    exercises the full LPIPS code path when the pretrained weights — an
    external network dependency — are unavailable).  NOT the reference
    metric; fetch real weights with scripts/fetch_lpips_weights.py."""
    rng = np.random.RandomState(seed)
    out = {}
    in_ch = 3
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for i, c in zip(CONV_IDX, chans):
        out[f"features_{i}/kernel"] = (rng.randn(3, 3, in_ch, c) * 0.05).astype(np.float32)
        out[f"features_{i}/bias"] = np.zeros(c, np.float32)
        in_ch = c
    for k, c in enumerate(CHANNELS):
        out[f"lin{k}/kernel"] = np.abs(rng.randn(1, 1, c, 1)).astype(np.float32) * 0.1
    np.savez(path, **out)
    return path


class LPIPSVGG:
    _cache = {}

    def __init__(self, weights_path: str):
        data = np.load(weights_path)
        self.convs = [
            (jnp.asarray(data[f"features_{i}/kernel"]), jnp.asarray(data[f"features_{i}/bias"]))
            for i in CONV_IDX
        ]
        self.lins = [jnp.asarray(data[f"lin{k}/kernel"]) for k in range(5)]

    @classmethod
    def get(cls, weights_path: str) -> "LPIPSVGG":
        if weights_path not in cls._cache:
            cls._cache[weights_path] = cls(weights_path)
        return cls._cache[weights_path]

    def _features(self, x: jnp.ndarray):
        """x: (B, H, W, 3) in [-1, 1] -> list of 5 tap activations."""
        x = (x - _SHIFT) / _SCALE
        taps = []
        layer_idx = 0
        conv_i = 0
        pool_after = {4, 9, 16, 23}  # torchvision maxpool positions (by tap order)
        # iterate the canonical VGG16 structure: [2,2,3,3,3] convs per block
        per_block = [2, 2, 3, 3, 3]
        for b, n_convs in enumerate(per_block):
            for _ in range(n_convs):
                k, bias = self.convs[conv_i]
                conv_i += 1
                x = lax.conv_general_dilated(
                    x, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = x + bias
                x = jnp.maximum(x, 0)
            taps.append(x)
            if b < 4:
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return taps

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> float:
        """img1/img2: (H, W, 3) or (B, H, W, 3) in [-1, 1]."""
        if img1.ndim == 3:
            img1, img2 = img1[None], img2[None]
        f1 = self._features(jnp.asarray(img1))
        f2 = self._features(jnp.asarray(img2))
        total = 0.0
        for k, (a, b) in enumerate(zip(f1, f2)):
            na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = self.lins[k][0, 0, :, 0]
            total = total + jnp.mean(jnp.sum(d * w, axis=-1))
        return float(total)


def convert_torch_lpips(lpips_state: dict, vgg_state: dict, out_path: str):
    """Build the npz from torch state dicts: lpips lin heads
    (lin{k}.model.1.weight) + torchvision VGG16 ``features.{i}.weight``."""
    out = {}
    for i in CONV_IDX:
        w = np.asarray(vgg_state[f"features.{i}.weight"])
        out[f"features_{i}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"features_{i}/bias"] = np.asarray(vgg_state[f"features.{i}.bias"])
    for k in range(5):
        w = np.asarray(lpips_state[f"lin{k}.model.1.weight"])  # (1, C, 1, 1)
        out[f"lin{k}/kernel"] = np.transpose(w, (2, 3, 1, 0))
    np.savez(out_path, **out)
