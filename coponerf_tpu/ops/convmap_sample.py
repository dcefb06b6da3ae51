"""Fused conv_map -> epipolar sampling with a direct conv-kernel backward.

Training samples only ~12k epipolar points per view from the 256^2 conv_map
table (reference: CoPoNeRF.py:187 conv_map, :312/:370 grid_sample of the
full-res latent).  The generic autodiff path materializes the full table
cotangent — dtable (B*V, 65536, 64) — via the one-hot transpose matmul
kernel (2 x 35 ms/step at batch 6, trace-verified: the single largest items
in the train step) and then correlates it with the input to get the conv
kernel gradient.

But dtable is only ever CONSUMED by that correlation, and it is 0.4%-sparse
(4 corners x 12k samples over 65k positions).  This op exploits the algebraic
shortcut

    dK = sum_n sum_corners w_c[n] * g[n] (x) rgb_patch7x7(pos_c[n])
    db = sum_n (sum_corners w_c[n]) * g[n]

i.e. one 8x8-patch gather at the sample anchors + four (N,147)^T @ (N,64)
matmuls — no 65536-wide intermediate at all (~3 ms vs ~40 ms per table).

Correctness relies on two properties of ops.grid_sample's modes:
  - border mode clamps coordinates to [0, W-1-eps] BEFORE flooring, so the
    four corners are always in-bounds at offsets exactly {0,1}x{0,1} from
    the (y0, x0) anchor;
  - zeros mode zero-WEIGHTS out-of-image corners (bilinear_corner_
    decomposition), so a clamped anchor patch reads garbage only where the
    weight is already zero.

Gradients flow to (kernel, bias) only: rgb is input data and the epipolar /
reprojection coordinates are stop-gradient geometry on this path (identical
to the grid_sample_tablegrad contract).  Forward numerics are IDENTICAL to
the unfused path: the same lax conv (same dtype promotion as nn.Conv) and
the same ops.grid_sample calls.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp

from coponerf_tpu.ops.grid_sample import grid_sample
from coponerf_tpu.ops.pallas.bilinear_sample import bilinear_corner_decomposition


def _conv_table(rgb, kernel, bias, conv_dtype):
    """nn.Conv(64, (7,7), padding=3, dtype=conv_dtype) numerics."""
    x, k, b = rgb, kernel, bias
    if conv_dtype is not None:
        x, k, b = x.astype(conv_dtype), k.astype(conv_dtype), b.astype(conv_dtype)
    pad = ((3, 3), (3, 3))
    out = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _swap_views(t):
    bv = t.shape[0]
    return t.reshape(bv // 2, 2, *t.shape[1:])[:, ::-1].reshape(t.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def convmap_sample_pair(rgb, kernel, bias, grid_p, grid_s, conv_bf16: bool, sample_bf16: bool):
    """rgb: (B*V, H, W, 3) normalized input (view pairs adjacent in rows);
    kernel (kh, kw, 3, C), bias (C,); grid_p/grid_s: (B*V, P, 2) in [-1, 1].

    Returns (primary samples, secondary samples), each (B*V, P, C):
      primary   = grid_sample(conv(rgb), grid_p, border)
      secondary = grid_sample(swap_views(conv(rgb)), grid_s, zeros)
    """
    return _fwd_impl(rgb, kernel, bias, grid_p, grid_s, conv_bf16, sample_bf16)


def _fwd_impl(rgb, kernel, bias, grid_p, grid_s, conv_bf16, sample_bf16):
    table = _conv_table(rgb, kernel, bias, jnp.bfloat16 if conv_bf16 else None)
    if sample_bf16:
        table = table.astype(jnp.bfloat16)
    s_p = grid_sample(table, grid_p, padding_mode="border")
    s_s = grid_sample(_swap_views(table), grid_s, padding_mode="zeros")
    return s_p, s_s


def _fwd(rgb, kernel, bias, grid_p, grid_s, conv_bf16, sample_bf16):
    out = _fwd_impl(rgb, kernel, bias, grid_p, grid_s, conv_bf16, sample_bf16)
    # zero-byte carriers keep the param dtypes static in the backward
    k_car = jnp.zeros((0,), kernel.dtype)
    b_car = jnp.zeros((0,), bias.dtype)
    return out, (rgb, grid_p, grid_s, k_car, b_car)


def _grad_terms(col, grid, g, mode, kh, kw, patch_dtype):
    """dK, db contributions of one sampled set.

    col: (BV, H, W, kh*kw*Cin) im2col of the conv input — channel
    (dy*kw+dx)*Cin+ci at (y, x) is the conv-SAME input pixel
    (y - kh//2 + dy, x - kw//2 + dx, ci).  grid: (BV, P, 2);
    g: (BV, P, Cout) cotangent.

    The taps live in the LANE dimension (147-wide), so the corner patches
    gather as the same 2x2xC slices the forward sampler uses (index-bound
    regime of the gather engine) — a direct (N, 8, 8, 3) patch gather was
    measured-NEGATIVE: its 3-wide lane pads 42x and the 192-element slices
    leave the gather's index-bound regime (fused step 567 ms vs 536 ms
    unfused; this formulation is what makes the shortcut pay)."""
    BV, H, W, CK = col.shape
    Cout = g.shape[-1]
    idx, w = bilinear_corner_decomposition(grid, H, W, mode)   # (BV, P, 4)
    # anchor = clamped corner-0 position, kept <= H-2/W-2 so the 2x2 slice
    # never start-clips a row a valid corner needs; per-corner offsets from
    # the anchor are then exactly right in both modes (invalid corners carry
    # weight 0, so their clipped offsets are harmless)
    ay = jnp.clip(idx[..., 0] // W, 0, H - 2)
    ax = jnp.clip(idx[..., 0] % W, 0, W - 2)
    sy = jnp.clip(idx // W - ay[..., None], 0, 1)
    sx = jnp.clip(idx % W - ax[..., None], 0, 1)

    starts = jnp.stack([ay, ax], axis=-1)                      # (BV, P, 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def per_view(img, st):
        return lax.gather(img, st, dn, slice_sizes=(2, 2, CK), mode="clip")

    patch = jax.vmap(per_view)(col, starts)                    # (BV, P, 2, 2, CK)
    N = BV * grid.shape[1]
    patch = patch.reshape(N, 2, 2, CK)

    g32 = g.reshape(N, Cout).astype(jnp.float32)
    w32 = w.reshape(N, 4).astype(jnp.float32)
    sy = sy.reshape(N, 4)
    sx = sx.reshape(N, 4)

    # bilinear corner blend: (N, CK) weighted patch rows, then one matmul
    blend = jnp.zeros((N, CK), jnp.float32)
    for a in (0, 1):
        for b in (0, 1):
            w_ab = jnp.sum(w32 * ((sy == a) & (sx == b)).astype(jnp.float32), axis=-1)
            blend = blend + w_ab[:, None] * patch[:, a, b, :].astype(jnp.float32)
    dk = lax.dot_general(
        blend.astype(patch_dtype), g32.astype(patch_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                          # (CK, Cout)
    db = jnp.einsum("n,nc->c", jnp.sum(w32, axis=-1), g32)
    Cin = CK // (kh * kw)
    return dk.reshape(kh, kw, Cin, Cout), db


def _bwd(conv_bf16, sample_bf16, res, gs):
    rgb, grid_p, grid_s, k_car, b_car = res
    k_dtype, b_dtype = k_car.dtype, b_car.dtype
    g_p, g_s = gs
    kh, kw = 7, 7
    hh, hw = kh // 2, kw // 2
    patch_dtype = jnp.bfloat16 if (conv_bf16 or sample_bf16) else jnp.float32
    BV, H, W, Cin = rgb.shape
    rgbp = jnp.pad(rgb.astype(patch_dtype), ((0, 0), (hh, hh), (hw, hw), (0, 0)))
    col = jnp.concatenate(
        [rgbp[:, dy: dy + H, dx: dx + W, :] for dy in range(kh) for dx in range(kw)],
        axis=-1,
    )                                                          # (BV, H, W, 147)
    dk_p, db_p = _grad_terms(col, grid_p, g_p, "border", kh, kw, patch_dtype)
    # secondary sampled the view-swapped table; since dK sums over all rows,
    # gathering the UNSWAPPED im2col at view-swapped coords/cotangents is the
    # same sum (row permutation under a full reduction) — avoids a second
    # 230 MB im2col
    dk_s, db_s = _grad_terms(
        col, _swap_views(grid_s), _swap_views(g_s), "zeros", kh, kw, patch_dtype
    )
    dk = (dk_p + dk_s).astype(k_dtype)
    db = (db_p + db_s).astype(b_dtype)
    return (
        jnp.zeros_like(rgb),
        dk,
        db,
        jnp.zeros_like(grid_p),
        jnp.zeros_like(grid_s),
    )


convmap_sample_pair.defvjp(_fwd, _bwd)
