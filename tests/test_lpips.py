"""LPIPS-VGG structure test with synthetic weights (the real pretrained
weights are an external dependency; see eval/lpips_jax.py)."""

import numpy as np
import pytest

from coponerf_tpu.eval import lpips_jax


@pytest.fixture(scope="module")
def weights_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lpips") / "w.npz")
    return lpips_jax.make_random_weights(path)


def test_lpips_matches_torch_oracle_through_converter(tmp_path):
    """Numeric pin of the JAX LPIPS: build random torch-format state dicts
    (torchvision VGG16 + lpips lin-head key schema), convert through
    convert_torch_lpips (the exact path scripts/fetch_lpips_weights.py uses
    for the real weights), and compare against an independent torch forward
    implementing the lpips package's defined computation (scaling layer ->
    VGG16 relu taps -> unit-normalize -> 1x1 lin heads -> spatial average;
    reference usage test.py:149,258-263).  Pins conv/pool semantics, tap
    positions, normalization and head application to 1e-5."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(7)
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg_state, in_ch = {}, 3
    for i, c in zip(lpips_jax.CONV_IDX, chans):
        vgg_state[f"features.{i}.weight"] = (rng.randn(c, in_ch, 3, 3) * 0.05).astype(np.float32)
        vgg_state[f"features.{i}.bias"] = (rng.randn(c) * 0.01).astype(np.float32)
        in_ch = c
    lpips_state = {
        f"lin{k}.model.1.weight": np.abs(rng.randn(1, c, 1, 1)).astype(np.float32) * 0.1
        for k, c in enumerate(lpips_jax.CHANNELS)
    }
    path = str(tmp_path / "w.npz")
    lpips_jax.convert_torch_lpips(lpips_state, vgg_state, path)

    def torch_lpips(a, b):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(x):
            x = (x - shift) / scale
            taps, conv_i = [], 0
            for blk, n_convs in enumerate([2, 2, 3, 3, 3]):
                for _ in range(n_convs):
                    i = lpips_jax.CONV_IDX[conv_i]
                    w = torch.from_numpy(vgg_state[f"features.{i}.weight"])
                    bias = torch.from_numpy(vgg_state[f"features.{i}.bias"])
                    x = F.relu(F.conv2d(x, w, bias, padding=1))
                    conv_i += 1
                taps.append(x)
                if blk < 4:
                    x = F.max_pool2d(x, 2, 2)
            return taps

        total = 0.0
        for k, (fa, fb) in enumerate(zip(feats(a), feats(b))):
            na = fa / (fa.norm(dim=1, keepdim=True) + 1e-10)
            nb = fb / (fb.norm(dim=1, keepdim=True) + 1e-10)
            w = torch.from_numpy(lpips_state[f"lin{k}.model.1.weight"])
            d = F.conv2d((na - nb) ** 2, w)
            total = total + d.mean(dim=(2, 3)).sum()
        return float(total)

    img1 = rng.rand(1, 48, 48, 3).astype(np.float32) * 2 - 1
    img2 = np.clip(img1 + rng.randn(1, 48, 48, 3).astype(np.float32) * 0.2, -1, 1)
    want = torch_lpips(
        torch.from_numpy(img1.transpose(0, 3, 1, 2)),
        torch.from_numpy(img2.transpose(0, 3, 1, 2)),
    )
    got = lpips_jax.LPIPSVGG.get(path)(img1, img2)
    assert got == pytest.approx(want, rel=1e-4)


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
