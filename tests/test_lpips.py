"""LPIPS-VGG structure test with synthetic weights (the real pretrained
weights are an external dependency; see eval/lpips_jax.py)."""

import numpy as np
import pytest

from coponerf_tpu.eval import lpips_jax


@pytest.fixture(scope="module")
def weights_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    out = {}
    in_ch = 3
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for i, c in zip(lpips_jax.CONV_IDX, chans):
        out[f"features_{i}/kernel"] = (rng.randn(3, 3, in_ch, c) * 0.05).astype(np.float32)
        out[f"features_{i}/bias"] = np.zeros(c, np.float32)
        in_ch = c
    for k, c in enumerate(lpips_jax.CHANNELS):
        out[f"lin{k}/kernel"] = np.abs(rng.randn(1, 1, c, 1)).astype(np.float32) * 0.1
    path = str(tmp_path_factory.mktemp("lpips") / "w.npz")
    np.savez(path, **out)
    return path


def test_lpips_zero_for_identical_and_positive_for_different(weights_file):
    rng = np.random.RandomState(1)
    img = rng.rand(64, 64, 3).astype(np.float32) * 2 - 1
    model = lpips_jax.LPIPSVGG.get(weights_file)
    d_same = model(img, img)
    assert d_same == pytest.approx(0.0, abs=1e-6)
    other = np.clip(img + rng.randn(64, 64, 3).astype(np.float32) * 0.3, -1, 1)
    d_diff = model(img, other)
    assert d_diff > 1e-4
    # metric-ish: symmetric
    assert model(other, img) == pytest.approx(d_diff, rel=1e-5)
