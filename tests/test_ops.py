"""Ops vs torch oracles: bilinear resize, grid_sample, correlation/soft-argmax."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from coponerf_tpu.ops import (  # noqa: E402
    resize_nchw,
    interpolate4d,
    grid_sample_nchw,
    correlation,
    soft_argmax,
    unnormalise_and_convert_mapping_to_flow,
)

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape", [((2, 3, 8, 8), (16, 16)), ((1, 4, 16, 16), (7, 5)), ((2, 2, 5, 9), (10, 18))])
def test_resize_matches_torch(align_corners, shape):
    in_shape, out_hw = shape
    x = RNG.randn(*in_shape).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners).numpy()
    got = np.asarray(resize_nchw(jnp.asarray(x), out_hw, align_corners=align_corners))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(padding_mode):
    img = RNG.randn(2, 5, 9, 7).astype(np.float32)
    # include out-of-bounds and extreme coords
    grid = (RNG.rand(2, 11, 13, 2).astype(np.float32) * 4 - 2)
    grid[0, 0, 0] = [1e9, -1e9]
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode, align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_nchw(jnp.asarray(img), jnp.asarray(grid), padding_mode=padding_mode))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_grid_sample_nan_coords_zero_padding():
    img = np.ones((1, 2, 4, 4), np.float32)
    grid = np.full((1, 1, 3, 2), np.nan, np.float32)
    got = np.asarray(grid_sample_nchw(jnp.asarray(img), jnp.asarray(grid), padding_mode="zeros"))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, 0.0)


def test_correlation_matches_einsum_oracle():
    src = RNG.randn(2, 6, 5, 8).astype(np.float32)  # NHWC
    trg = RNG.randn(2, 6, 5, 8).astype(np.float32)
    got = np.asarray(correlation(jnp.asarray(src), jnp.asarray(trg)))

    s = torch.from_numpy(src).permute(0, 3, 1, 2)
    t = torch.from_numpy(trg).permute(0, 3, 1, 2)
    s = s / (s.norm(dim=1, keepdim=True) + 1e-5)
    t = t / (t.norm(dim=1, keepdim=True) + 1e-5)
    ref = torch.einsum("bchw,bcxy->bhwxy", s, t).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_soft_argmax_recovers_shifted_identity():
    # correlation that puts all mass for target pixel (i, j) at source (i, j)
    h = w = 8
    corr = np.zeros((1, h * w, h, w), np.float32)
    for i in range(h):
        for j in range(w):
            corr[0, i * w + j, i, j] = 50.0
    gx, gy = soft_argmax(jnp.asarray(corr), beta=0.02)
    xs = np.linspace(-1, 1, w, dtype=np.float32)
    ys = np.linspace(-1, 1, h, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(gx)[0, 0], np.tile(xs, (h, 1)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy)[0, 0], np.tile(ys[:, None], (1, w)), atol=1e-3)


def test_mapping_to_flow_zero_for_identity():
    h = w = 6
    xs = np.linspace(-1, 1, w, dtype=np.float32)
    ys = np.linspace(-1, 1, h, dtype=np.float32)
    mapping = np.stack([np.tile(xs, (h, 1)), np.tile(ys[:, None], (1, w))])[None]
    flow = np.asarray(unnormalise_and_convert_mapping_to_flow(jnp.asarray(mapping)))
    np.testing.assert_allclose(flow, 0.0, atol=1e-5)


def test_interpolate4d_matches_torch_two_pass():
    x = RNG.randn(1, 2, 4, 4, 4, 4).astype(np.float32)
    got = np.asarray(interpolate4d(jnp.asarray(x), (8, 8, 8, 8)))

    tx = torch.from_numpy(x)
    B, C, Hs, Ws, Ht, Wt = tx.shape
    t = tx.reshape(B, C * Hs * Ws, Ht, Wt)
    t = F.interpolate(t, size=(8, 8), mode="bilinear", align_corners=True)
    t = t.reshape(B, C, Hs, Ws, 8, 8).permute(0, 1, 4, 5, 2, 3).reshape(B, C * 64, Hs, Ws)
    t = F.interpolate(t, size=(8, 8), mode="bilinear", align_corners=True)
    ref = t.reshape(B, C, 8, 8, 8, 8).permute(0, 1, 4, 5, 2, 3).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_conv4d_3d_impl_matches_2d():
    """Conv4d's transpose-free 3-spatial-dim formulation must match the
    fold-into-batch conv2d formulation (same params) on both the symmetric
    stage-0 shape and the strided feat-to-corr shapes, fwd and grad."""
    import coponerf_tpu.models.conv4d as c4

    cases = [
        ((2, 8, 256, 256), (16, 16), (16, 16), (8, (3,) * 4, (1,) * 4, (1,) * 4)),
        ((1, 1, 1024, 1024), (32, 32), (32, 32), (8, (3,) * 4, (2,) * 4, (1,) * 4)),
        ((1, 1, 1024, 1024), (32, 32), (32, 32), (8, (5,) * 4, (4,) * 4, (2,) * 4)),
    ]
    for shape, qhw, shw, args in cases:
        x = jnp.asarray(RNG.randn(*shape).astype(np.float32))
        mods = {impl: c4.Conv4d(*args, impl=impl) for impl in ("2d", "3d")}
        v = mods["2d"].init(jax.random.PRNGKey(0), x, qhw, shw)  # same param tree

        def loss(v, impl):
            o, q, s = mods[impl].apply(v, x, qhw, shw)
            return jnp.sum(o * jnp.cos(o)), (o, q, s)

        (l2, (o2, q2, s2)), g2 = jax.value_and_grad(loss, has_aux=True)(v, "2d")
        (l3, (o3, q3, s3)), g3 = jax.value_and_grad(loss, has_aux=True)(v, "3d")
        assert (q2, s2) == (q3, s3)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o3), atol=2e-5)
        scale = float(jnp.abs(o2).mean()) + 1e-6
        for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g3)):
            err = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
            assert err < 1e-4, (err, scale)


def test_grid_sample_prepadded_matches_unpadded():
    """The prepadded zeros-mode path (caller supplies the 2-texel zero ring,
    used by the render fast path to hoist the pad out of the chunk loop)
    must be bitwise identical to the standard zeros path."""
    from coponerf_tpu.ops.grid_sample import grid_sample

    img = jnp.asarray(RNG.randn(2, 16, 12, 5).astype(np.float32))
    grid = jnp.asarray((RNG.rand(2, 33, 2).astype(np.float32) * 4 - 2))
    grid = grid.at[0, 0].set(jnp.nan)
    a = grid_sample(img, grid, padding_mode="zeros")
    padded = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)))
    b = grid_sample(padded, grid, padding_mode="zeros", prepadded=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_ufc_remat_policy_equivalence():
    """UFC gradients must agree across remat=off / remat(full) / remat(dots):
    remat with any jax.checkpoint policy is a scheduling transform, not a
    numerics change (beyond reassociation noise)."""
    from coponerf_tpu.models.ufc import UFC

    feats = [
        jnp.asarray(RNG.randn(2, 8 * 2**s, 8 * 2**s, 16).astype(np.float32))
        for s in range(3)
    ]

    def build(remat, policy):
        return UFC(nhead=4, feat_dim=(32, 32, 32), layer_nums=(1, 1, 1),
                   remat=remat, remat_policy=policy)

    v = build(False, "full").init(jax.random.PRNGKey(0), feats)

    results = {}
    for key, (remat, policy) in {
        "off": (False, "full"), "full": (True, "full"), "dots": (True, "dots"),
    }.items():
        mod = build(remat, policy)

        def loss(v):
            feat_list, flows, c = mod.apply(v, feats)
            return sum(jnp.mean(f * f) for f in feat_list) + jnp.mean(c * c) + jnp.mean(flows[0] ** 2)

        l, g = jax.value_and_grad(loss)(v)
        results[key] = (float(l), g)

    l0, g0 = results["off"]
    for key in ("full", "dots"):
        l1, g1 = results[key]
        assert abs(l1 - l0) <= 1e-5 * max(1.0, abs(l0))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            err = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
            assert err < 2e-3, (key, err)


@pytest.mark.parametrize("conv_bf16,sample_bf16", [(False, False), (True, True)])
def test_convmap_sample_pair_grads_match_autodiff(conv_bf16, sample_bf16):
    """The fused conv+sample custom VJP (direct conv-kernel gradient from
    weighted input patches) must match plain XLA autodiff through the
    unfused conv -> grid_sample composition — including out-of-image
    secondary coordinates (zeros mode) and border clamping."""
    from coponerf_tpu.ops.convmap_sample import convmap_sample_pair, _fwd_impl

    rng = np.random.RandomState(0)
    BV, H, W, P = 4, 16, 16, 37
    rgb = jnp.asarray(rng.randn(BV, H, W, 3).astype(np.float32))
    kernel = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    grid_p = jnp.asarray(rng.uniform(-1.3, 1.3, (BV, P, 2)).astype(np.float32))
    # secondary coords include far-out points (projections can be wild)
    gs = rng.uniform(-1.5, 1.5, (BV, P, 2)).astype(np.float32)
    gs[:, :3] = 50.0
    gs[:, 3:5] = -50.0
    grid_s = jnp.asarray(gs)

    def loss_fused(k, b):
        sp, ss = convmap_sample_pair(rgb, k, b, grid_p, grid_s, conv_bf16, sample_bf16)
        return (jnp.sum(jnp.sin(sp.astype(jnp.float32)))
                + jnp.sum(jnp.cos(ss.astype(jnp.float32))))

    def loss_ref(k, b):
        sp, ss = _fwd_impl(rgb, k, b, grid_p, grid_s, conv_bf16, sample_bf16)
        return (jnp.sum(jnp.sin(sp.astype(jnp.float32)))
                + jnp.sum(jnp.cos(ss.astype(jnp.float32))))

    # forward identical by construction
    np.testing.assert_array_equal(
        np.asarray(loss_fused(kernel, bias)), np.asarray(loss_ref(kernel, bias))
    )
    gk_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(kernel, bias)
    if conv_bf16 or sample_bf16:
        # the unfused bf16 autodiff quantizes the full-table cotangent to
        # bf16 BEFORE the big reductions (observed ~8% bias-grad error vs
        # truth); the fused path reduces in f32 and is closer to the f32
        # ground truth — so gate the bf16 path against that truth instead
        def loss_truth(k, b):
            sp, ss = _fwd_impl(rgb, k, b, grid_p, grid_s, False, False)
            return jnp.sum(jnp.sin(sp)) + jnp.sum(jnp.cos(ss))

        gk_r, gb_r = jax.grad(loss_truth, argnums=(0, 1))(kernel, bias)
        tol = 3e-2
    else:
        gk_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(kernel, bias)
        tol = 2e-4
    scale = float(np.abs(gk_r).max())
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r), atol=tol * scale)
    np.testing.assert_allclose(
        np.asarray(gb_f), np.asarray(gb_r), atol=tol * max(1.0, float(np.abs(gb_r).max()))
    )


def test_flat_flow_extraction_matches_5d_path():
    """The flat-layout flow extraction (resize4d_flat_kron + soft_argmax_flat)
    must reproduce the original 5D formulation (interpolate4d_flat + marginal
    soft_argmax) — it exists purely to avoid small-lane TPU padding."""
    from coponerf_tpu.models.ufc import interpolate4d_flat
    from coponerf_tpu.ops.correlation import soft_argmax, soft_argmax_flat
    from coponerf_tpu.ops.resize import resize4d_flat_kron

    rng = np.random.RandomState(7)
    b, fine = 2, 16
    for hw in (4, 8, 16):
        x = jnp.asarray(rng.randn(b, 1, hw * hw, hw * hw).astype(np.float32))
        ref = interpolate4d_flat(x, (hw, hw), (hw, hw), (fine, fine), (fine, fine))
        flat = resize4d_flat_kron(x, hw, fine)
        np.testing.assert_allclose(np.asarray(flat), np.asarray(ref), rtol=2e-5, atol=2e-5)

    c = jnp.asarray(rng.randn(b, fine * fine, fine * fine).astype(np.float32))
    # axis=2: positions on the source grid, softmax over target tokens
    gx, gy = soft_argmax(jnp.swapaxes(c, 1, 2).reshape(b, fine * fine, fine, fine))
    ref_fwd = np.concatenate([np.asarray(gx), np.asarray(gy)], axis=1)
    np.testing.assert_allclose(
        np.asarray(soft_argmax_flat(c, axis=2)), ref_fwd, rtol=1e-5, atol=1e-6
    )
    # axis=1: positions on the target grid, softmax over source tokens
    gx, gy = soft_argmax(c.reshape(b, fine * fine, fine, fine))
    ref_bwd = np.concatenate([np.asarray(gx), np.asarray(gy)], axis=1)
    np.testing.assert_allclose(
        np.asarray(soft_argmax_flat(c, axis=1)), ref_bwd, rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("impl", ["rowpair", "patch"])
def test_grid_sample_dense_matches_patch_formulation(impl):
    """Both dense warp sampler formulations (row-pair gathers and the single
    (C,2,2) patch gather behind DENSE_WARP_IMPL) must be numerically identical
    to the patch-gather grid_sample in zeros mode — including out-of-range,
    extreme, and NaN coordinates — and their gradient w.r.t. the grid must
    match."""
    import importlib

    # NB: `from coponerf_tpu.ops import grid_sample` binds the FUNCTION the
    # package re-exports, not the module — importlib gets the module itself.
    gs = importlib.import_module("coponerf_tpu.ops.grid_sample")

    img = RNG.randn(2, 3, 12, 10).astype(np.float32)
    grid = (RNG.rand(2, 12, 10, 2).astype(np.float32) * 4 - 2)
    grid[0, 0, 0] = [1e9, -1e9]
    grid[1, 0, 1] = [np.nan, 0.3]
    prev = gs.DENSE_WARP_IMPL
    gs.DENSE_WARP_IMPL = impl
    try:
        ref = grid_sample_nchw(jnp.asarray(img), jnp.asarray(grid), padding_mode="zeros")
        got = gs.grid_sample_dense_nchw(jnp.asarray(img), jnp.asarray(grid))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

        # gradient w.r.t. the sampling grid (the only grad path the SSIM loss
        # uses: warped images are data constants, masks are boolean)
        finite_grid = np.clip(np.nan_to_num(grid), -1.5, 1.5)

        def loss_ref(g):
            return jnp.sum(grid_sample_nchw(jnp.asarray(img), g, padding_mode="zeros") ** 2)

        def loss_dense(g):
            return jnp.sum(gs.grid_sample_dense_nchw(jnp.asarray(img), g) ** 2)

        g_ref = jax.grad(loss_ref)(jnp.asarray(finite_grid))
        g_dense = jax.grad(loss_dense)(jnp.asarray(finite_grid))
        np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_ref), atol=1e-4)
    finally:
        gs.DENSE_WARP_IMPL = prev


def test_warp_matches_torch_oracle():
    """flow.warp (dense sampler path) vs the reference's warp util semantics:
    grid normalized by (size-1), F.grid_sample zeros/align_corners=False
    (utils_training/utils.py:642-671)."""
    from coponerf_tpu import flow as flow_ops

    img = RNG.randn(2, 3, 8, 8).astype(np.float32)
    flo = (RNG.randn(2, 2, 8, 8) * 3).astype(np.float32)
    got = np.asarray(flow_ops.warp(jnp.asarray(img), jnp.asarray(flo)))

    B, C, H, W = img.shape
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    base = np.stack([xx, yy], axis=0)[None].astype(np.float32)
    vgrid = base + flo
    vgrid_n = np.stack(
        [2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0, 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0],
        axis=-1,
    )
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(vgrid_n),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_ssim_warp_packed_matches_unpacked():
    """flow.ssim_warp_packed == cyclic_consistency_masks + separate image
    warps: identical warped images/masks AND identical flow gradients (the
    packed operand's flow channels are stop_gradient'ed; in the unpacked form
    their only consumer is a boolean, so the cotangent is zero either way)."""
    from coponerf_tpu import flow as flow_ops

    im0 = jnp.asarray(RNG.randn(2, 3, 16, 16).astype(np.float32))
    im1 = jnp.asarray(RNG.randn(2, 3, 16, 16).astype(np.float32))
    ff = jnp.asarray((RNG.randn(2, 2, 4, 4) * 2).astype(np.float32))
    fb = jnp.asarray((RNG.randn(2, 2, 4, 4) * 2).astype(np.float32))

    def unpacked(ff, fb):
        up_f, up_b, mask_f, mask_b = flow_ops.cyclic_consistency_masks(
            ff, fb, out_size=16, scale=16 / 4
        )
        return flow_ops.warp(im1, up_f), flow_ops.warp(im0, up_b), mask_f, mask_b

    def packed(ff, fb):
        return flow_ops.ssim_warp_packed(im0, im1, ff, fb, out_size=16, scale=16 / 4)

    w1_u, w0_u, mf_u, mb_u = unpacked(ff, fb)
    w1_p, w0_p, mf_p, mb_p = packed(ff, fb)
    np.testing.assert_allclose(np.asarray(w1_p), np.asarray(w1_u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w0_p), np.asarray(w0_u), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mf_p), np.asarray(mf_u))
    np.testing.assert_array_equal(np.asarray(mb_p), np.asarray(mb_u))

    def loss_u(ff, fb):
        w1, w0, mf, mb = unpacked(ff, fb)
        return jnp.sum(w1**2 * mf[:, None]) + jnp.sum(w0**2 * mb[:, None])

    def loss_p(ff, fb):
        w1, w0, mf, mb = packed(ff, fb)
        return jnp.sum(w1**2 * mf[:, None]) + jnp.sum(w0**2 * mb[:, None])

    gu = jax.grad(loss_u, argnums=(0, 1))(ff, fb)
    gp = jax.grad(loss_p, argnums=(0, 1))(ff, fb)
    for a, b in zip(gp, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
