"""Metrics and loss-function tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from coponerf_tpu.eval import metrics as M
from coponerf_tpu.training.losses import gaussian_window, huber, masked_ssim_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert M.psnr(a, b) == pytest.approx(20.0, abs=1e-6)


def test_ssim_identity_and_symmetry():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 3)
    assert M.ssim(img, img) == pytest.approx(1.0, abs=1e-9)
    noisy = np.clip(img + rng.randn(64, 64, 3) * 0.1, 0, 1)
    s1 = M.ssim(img, noisy)
    s2 = M.ssim(noisy, img)
    assert 0.0 < s1 < 1.0
    assert s1 == pytest.approx(s2, abs=1e-9)
    # heavier corruption scores lower
    noisier = np.clip(img + rng.randn(64, 64, 3) * 0.4, 0, 1)
    assert M.ssim(img, noisier) < s1


def test_rotation_and_translation_metrics():
    th = 0.25
    Rz = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    assert M.rotation_geodesic(Rz[None], np.eye(3)[None])[0] == pytest.approx(th, abs=1e-7)
    l2, ang = M.translation_error(np.array([[1.0, 0, 0]]), np.array([[0.0, 1, 0]]))
    assert l2[0] == pytest.approx(np.sqrt(2), abs=1e-7)
    assert ang[0] == pytest.approx(np.pi / 2, abs=1e-7)


def test_overlap_bins():
    assert M.overlap_bin(0.3) == "small"
    assert M.overlap_bin(0.5) == "medium"
    assert M.overlap_bin(0.75) == "medium"
    assert M.overlap_bin(0.76) == "large"


def test_metric_accumulator():
    acc = M.MetricAccumulator()
    acc.add("small", psnr=20.0)
    acc.add("large", psnr=30.0)
    s = acc.summary()
    assert s["all"]["psnr_avg"] == pytest.approx(25.0)
    assert s["small"]["psnr_avg"] == pytest.approx(20.0)
    assert "medium" not in s


def test_huber_matches_torch():
    rng = np.random.RandomState(1)
    a = rng.randn(32).astype(np.float32) * 3
    b = rng.randn(32).astype(np.float32)
    ref = F.huber_loss(torch.from_numpy(a), torch.from_numpy(b), reduction="none").numpy()
    got = np.asarray(huber(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_masked_ssim_loss_matches_torch_oracle():
    rng = np.random.RandomState(2)
    img1 = rng.rand(1, 3, 32, 32).astype(np.float32)
    img2 = rng.rand(1, 3, 32, 32).astype(np.float32)
    mask = (rng.rand(1, 1, 32, 32) > 0.3).astype(np.float32)

    # torch oracle of loss_function.py:19-60
    win1d = torch.exp(-((torch.arange(11).float() - 5) ** 2) / (2 * 1.5 ** 2))
    win1d = (win1d / win1d.sum()).unsqueeze(1)
    win = win1d.mm(win1d.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11).contiguous()

    def conv(x):
        return F.conv2d(torch.from_numpy(x), win, padding=5, groups=3)

    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1 ** 2
    s2 = conv(img2 * img2) - mu2 ** 2
    s12 = conv(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
    tm = torch.from_numpy(mask)
    ref = (torch.sum((1 - smap) * tm) / torch.sum(tm) / 3).item()

    got = float(masked_ssim_loss(jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(mask)))
    assert got == pytest.approx(ref, abs=1e-5)
