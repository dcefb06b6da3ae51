"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coponerf_tpu.ops.grid_sample import grid_sample
from coponerf_tpu.ops.pallas.bilinear_sample import grid_sample_onehot

pytestmark = pytest.mark.slow


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


@pytest.mark.parametrize("mode", ["border", "zeros"])
def test_banded_onehot_matches_exact_gather(mode):
    """Band-sparse kernel (multi-chunk grid, clamped table index map) vs the
    exact gather, including far out-of-band and out-of-image points."""
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(2, 64, 64, 32).astype(np.float32))
    # sample-major-style points: coherent rows plus scattered outliers
    base = rng.rand(2, 1024, 2).astype(np.float32) * 0.2 - 0.9
    base[:, 512:] = rng.rand(2, 512, 2) * 2.4 - 1.2   # spread, some OOB
    if mode == "zeros":
        base[0, 0] = [np.nan, 1e8]
    pts = jnp.asarray(base.reshape(2, 64, 16, 2))
    ref = np.asarray(grid_sample(img, pts, padding_mode=mode))
    got = np.asarray(
        grid_sample_onehot(img, pts, padding_mode=mode, banded=True, block_hw=512)
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)
    scale = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / scale < 5e-3


def test_onehot_matmul_sample_band_sparse_matches_dense():
    """The band_sparse=True path (per-block [lo, hi] chunk skip via scalar
    prefetch) must agree with the dense kernel.  Regression: the band array
    was built (B, NP, 2) while _kernel_banded reads a (B, 2, NP) layout,
    silently skipping in-band chunks."""
    from coponerf_tpu.ops.pallas.bilinear_sample import onehot_matmul_sample

    rng = np.random.RandomState(7)
    B, HW, C, P = 2, 2048, 64, 1024
    table = jnp.asarray(rng.rand(B, HW, C).astype(np.float32))
    # narrow per-block bands (so chunks ARE skipped) at different offsets
    idx = np.empty((B, P, 4), np.int32)
    for b in range(B):
        for blk in range(P // 256):
            lo = rng.randint(0, HW - 300)
            idx[b, blk * 256: (blk + 1) * 256] = rng.randint(
                lo, lo + 256, size=(256, 4))
    w = rng.rand(B, P, 4).astype(np.float32)
    dense = np.asarray(onehot_matmul_sample(
        table, jnp.asarray(idx), jnp.asarray(w), block_p=256, block_hw=256))
    banded = np.asarray(onehot_matmul_sample(
        table, jnp.asarray(idx), jnp.asarray(w), block_p=256, block_hw=256,
        band_sparse=True))
    np.testing.assert_allclose(banded, dense, atol=1e-4)


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


def test_weighted_sum_smaj_matches_einsum():
    from coponerf_tpu.ops.pallas.weighted_sum import weighted_sum_smaj

    rng = np.random.RandomState(5)
    R, S, N, C = 2, 8, 48, 256   # N not a block multiple: exercises padding
    pre = jnp.asarray(rng.randn(R, S * N, C).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.rand(R, N, S).astype(np.float32))
    got = np.asarray(weighted_sum_smaj(pre, w, S))
    ref = np.einsum("rns,rsnc->rnc", np.asarray(w),
                    np.asarray(pre.astype(jnp.float32)).reshape(R, S, N, C))
    np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-2)
    # fused view-sum variant (R = B*V rows summed in-kernel)
    got_v = np.asarray(weighted_sum_smaj(pre, w, S, vsum=2))
    np.testing.assert_allclose(got_v, ref.reshape(1, 2, N, C).sum(axis=1),
                               atol=1e-2, rtol=1e-2)
    # explicit small block_n exercises the out-block revisit accumulation
    got_vb = np.asarray(weighted_sum_smaj(pre, w, S, block_n=32, vsum=2))
    np.testing.assert_allclose(got_vb, got_v, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("mode", ["border", "zeros"])
def test_windowed_onehot_matches_exact_gather(mode):
    """Windowed band kernel (large grid, bulk per-block window DMA) vs the
    exact gather, including wide-band blocks and out-of-image points."""
    from coponerf_tpu.ops.pallas.experimental.windowed_sample import grid_sample_onehot_window

    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(2, 64, 64, 24).astype(np.float32))
    base = rng.rand(2, 4096, 2).astype(np.float32) * 0.25 - 0.8
    base[:, 2048:3072] = rng.rand(2, 1024, 2) * 2.4 - 1.2   # wide band + OOB
    if mode == "zeros":
        base[0, 0] = [np.nan, 1e8]
        base[1, 5] = [-1e8, 0.0]
    pts = jnp.asarray(base.reshape(2, 256, 16, 2))
    ref = np.asarray(grid_sample(img, pts, padding_mode=mode))
    got = np.asarray(grid_sample_onehot_window(
        img, pts, padding_mode=mode, block_p=1024, win_rows=8))
    np.testing.assert_allclose(got, ref, atol=2e-2)
    scale = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / scale < 5e-3


@pytest.mark.parametrize("mode", ["border", "zeros"])
def test_multilevel_banded_sample_matches_exact(mode):
    """Fused 3-level resident-table sampler vs per-level exact gathers."""
    from coponerf_tpu.ops.pallas.experimental.multilevel_sample import multilevel_banded_sample

    rng = np.random.RandomState(4)
    tables = [jnp.asarray(rng.rand(2, s, s, 32).astype(np.float32))
              for s in (16, 32, 64)]
    base = rng.rand(2, 4096, 2).astype(np.float32) * 0.3 - 0.85
    base[:, 1024:2048] = rng.rand(2, 1024, 2) * 2.4 - 1.2
    if mode == "zeros":
        base[0, 0] = [np.nan, 1e8]
    pts = jnp.asarray(base)
    outs = multilevel_banded_sample(tables, pts, mode, block_p=1024, sub=256)
    for t, got in zip(tables, outs):
        ref = np.asarray(grid_sample(t, pts.reshape(2, 64, 64, 2), padding_mode=mode))
        np.testing.assert_allclose(
            np.asarray(got).reshape(ref.shape), ref, atol=2e-2)
        scale = np.abs(ref).mean() + 1e-6
        assert np.abs(np.asarray(got).reshape(ref.shape) - ref).mean() / scale < 5e-3


def test_soft_argmax_both_matches_flat():
    """Fused dual-axis soft-argmax == the soft_argmax_flat pair (values and
    gradients; the online-softmax rescaling only reassociates f32 sums)."""
    from coponerf_tpu.ops.correlation import soft_argmax_flat
    from coponerf_tpu.ops.pallas.soft_argmax import soft_argmax_both

    rng = np.random.RandomState(3)
    c = jnp.asarray(rng.randn(2, 256, 64).astype(np.float32) * 3)

    mf, mb = soft_argmax_both(c)
    np.testing.assert_allclose(
        np.asarray(mf), np.asarray(soft_argmax_flat(c, axis=2)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mb), np.asarray(soft_argmax_flat(c, axis=1)), atol=1e-5
    )

    def loss_flat(c):
        return (
            jnp.sum(jnp.sin(soft_argmax_flat(c, axis=2)))
            + jnp.sum(soft_argmax_flat(c, axis=1) ** 2)
        )

    def loss_both(c):
        a, b = soft_argmax_both(c)
        return jnp.sum(jnp.sin(a)) + jnp.sum(b ** 2)

    g1 = jax.grad(loss_flat)(c)
    g2 = jax.grad(loss_both)(c)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4)
