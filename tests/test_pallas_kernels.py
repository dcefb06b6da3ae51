"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coponerf_tpu.ops.grid_sample import grid_sample
from coponerf_tpu.ops.pallas.bilinear_sample import grid_sample_onehot


@pytest.mark.parametrize("mode", ["border", "zeros"])
def test_onehot_sampling_matches_exact_gather(mode):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 16, 16, 128).astype(np.float32))
    # include far out-of-bounds coords; NaN only under zeros padding (the
    # model pre-scrubs NaNs before border sampling, CoPoNeRF.py:282-285)
    pts = rng.rand(2, 64, 8, 2).astype(np.float32) * 2.4 - 1.2
    if mode == "zeros":
        pts[0, 0, 0] = [np.nan, 1e8]
    pts = jnp.asarray(pts)
    ref = np.asarray(grid_sample(img, pts, padding_mode=mode))
    got = np.asarray(grid_sample_onehot(img, pts, padding_mode=mode))
    # bf16 selection-matrix quantization bounds the error
    np.testing.assert_allclose(got, ref, atol=2e-2)
    scale = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / scale < 5e-3


def test_onehot_sampling_gradient_matches_exact(monkeypatch):
    """Table-gradient of the one-hot kernel vs the exact gather path."""
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, 16, 16, 128).astype(np.float32))
    pts = jnp.asarray((rng.rand(1, 32, 4, 2) * 2 - 1).astype(np.float32))
    cot = jnp.asarray(rng.rand(1, 32, 4, 128).astype(np.float32))

    def loss_fast(im):
        return jnp.sum(grid_sample_onehot(im, pts, padding_mode="border") * cot)

    def loss_exact(im):
        return jnp.sum(grid_sample(im, pts, padding_mode="border") * cot)

    g_fast = jax.grad(loss_fast)(img)
    g_exact = jax.grad(loss_exact)(img)
    scale = np.abs(np.asarray(g_exact)).max() + 1e-9
    np.testing.assert_allclose(
        np.asarray(g_fast) / scale, np.asarray(g_exact) / scale, atol=2e-2
    )
