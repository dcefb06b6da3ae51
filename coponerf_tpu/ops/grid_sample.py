"""Gather-based bilinear image sampling at irregular coordinates.

TPU-native replacement for ``torch.nn.functional.grid_sample`` with the two
padding modes the reference uses (``border`` at models/CoPoNeRF.py:312 and
``zeros`` at models/CoPoNeRF.py:316,370) under ``align_corners=False``.

Implementation note (measured on v5e): XLA TPU gather cost is dominated by
the NUMBER OF INDICES, nearly independent of slice size up to 2x2xC.  So the
four corner gathers are fused into ONE ``lax.gather`` of 2x2xC patches per
point (1.5x faster than four take_along_axis gathers), followed by the
bilinear blend.  Border mode nudges coordinates below the last texel so the
patch start stays in range; the O(1e-5) weight shift is far below the
parity tolerance.

Images are NHWC (TPU layout).  Coordinates are in [-1, 1] with the last axis
ordered (x, y), matching the torch convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_COORD_CLIP = 3.0e4  # guards int32 casts against the reference's 1e10 NaN-scrub sentinel
_EDGE_EPS = 1e-5


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
    prepadded: bool = False,
) -> jnp.ndarray:
    """Sample ``image`` (B, H, W, C) at ``grid`` (B, ..., 2) -> (B, ..., C).

    grid[..., 0] is x (width), grid[..., 1] is y (height), both in [-1, 1].
    NaN/Inf coordinates produce zeros under ``zeros`` padding and border
    pixels under ``border`` padding.

    ``prepadded`` (zeros mode only): the caller supplies ``image`` already
    wrapped in the 2-texel zero ring (content dims = H-4, W-4).  Hoists the
    per-call jnp.pad out of chunked render loops where the table is
    loop-invariant (a per-chunk HBM copy otherwise, trace-verified).
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    if prepadded and padding_mode != "zeros":
        raise ValueError("prepadded requires padding_mode='zeros'")
    B, H, W, C = image.shape
    if prepadded:
        H, W = H - 4, W - 4  # content dims; index math below re-adds the ring
    batch_shape = grid.shape[:-1]

    x = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0 - _EDGE_EPS)
        y = jnp.clip(y, 0.0, H - 1.0 - _EDGE_EPS)
    else:
        # zeros padding via a 2-texel zero ring: every bilinear corner then
        # reads its exact value (in-image texel or ring zero) with UNCHANGED
        # weights — no validity masks or patch-cell weight remapping (the
        # mask+remap formulation costs ~2x the gather itself, trace-verified).
        # Any point with a corner outside the ring has ALL corners out of
        # image (true value 0), and start-clamping keeps it reading zeros.
        x = jnp.clip(
            jnp.nan_to_num(x, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP),
            -_COORD_CLIP, _COORD_CLIP,
        ) + 2.0
        y = jnp.clip(
            jnp.nan_to_num(y, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP),
            -_COORD_CLIP, _COORD_CLIP,
        ) + 2.0
        if not prepadded:
            image = jnp.pad(image, ((0, 0), (2, 2), (2, 2), (0, 0)))
        H, W = H + 4, W + 4

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(image.dtype)
    wy = (y - y0f).astype(image.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # weights indexed w[a][b]: a = y-corner (0/1), b = x-corner (0/1)
    w = [[(1 - wx) * (1 - wy), wx * (1 - wy)], [(1 - wx) * wy, wx * wy]]
    sx = jnp.clip(x0, 0, W - 2)
    sy = jnp.clip(y0, 0, H - 2)
    wpatch = jnp.stack([w[0][0], w[0][1], w[1][0], w[1][1]], axis=-1)

    weights = wpatch.reshape(B, -1, 2, 2)
    starts = jnp.stack([sy, sx], axis=-1).reshape(B, -1, 2)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def per_view(img, st, w):
        patch = jax.lax.gather(img, st, dn, slice_sizes=(2, 2, C), mode="clip")
        return jnp.einsum("pijc,pij->pc", patch, w)

    out = jax.vmap(per_view)(image, starts, weights)
    return out.reshape(*batch_shape, C)


def grid_sample_nchw(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Reference-layout wrapper: image (B, C, H, W), grid (B, h, w, 2) ->
    (B, C, h, w), mirroring ``F.grid_sample``'s shapes exactly."""
    out = grid_sample(jnp.moveaxis(image, 1, -1), grid, padding_mode, align_corners)
    return jnp.moveaxis(out, -1, 1)


# Formulation switch for the dense warp sampler, A/B-able in one process
# (scripts/probe_dense_warp.py): "rowpair" = two (C, 2) row-pair gathers from
# the flat image; "patch" = one (C, 2, 2) patch gather + multiply/reduce
# blend.  Same numerics either way (pinned in tests/test_ops.py).
DENSE_WARP_IMPL = "rowpair"


def grid_sample_dense_nchw(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Dense few-channel variant of ``grid_sample_nchw`` (zeros padding,
    align_corners=False) for full-image flow warps (C = 2-3, P = H*W points).

    The naive patch-gather formulation above materializes (P, 2, 2, C) corner
    patches and (P, 2, 2) blend weights; with C in lanes and the patch cell
    in sublanes, TPU (8, 128) tiling pads those to ~43x (C=3) / ~256x
    (weights) their logical size — ~0.8-1.6 GB EACH at 256^2 batch 6, which
    is what forced XLA to rematerialize every warp's gathers in the train
    backward.  Here the two bilinear rows are fetched as (C, 2)-slices from
    the row-flattened image with output layout (B, C, 2, P) — P stays in
    lanes (no padding, ~38 MB), the blend weights stay flat (B, P) vectors,
    and the corner values are cheap enough to SAVE for the backward instead
    of recomputing.  Numerics are identical to grid_sample_nchw (same
    unnormalize / 2-texel zero ring / corner weights); equivalence is pinned
    in tests/test_ops.py.

    A single (C, 2, 2) patch-gather variant (half the gather indices) is kept
    behind ``DENSE_WARP_IMPL`` — measured NEUTRAL-to-negative on v5e (the
    2-row slice leaves the gather engine's fast path, giving back what the
    halved index count saves; see PERF.md r4 notes), with two further traps
    measured along the way: slicing the patch into top/bot pairs doubles its
    HBM footprint (OOM at the no-remat batch-6 peak), and an einsum blend
    lowers to a DEFAULT-precision TPU dot (bf16-truncated blend).
    """
    B, C, H, W = image.shape
    batch_shape = grid.shape[:-1]

    x = _unnormalize(grid[..., 0].astype(jnp.float32), W, False)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), H, False)
    x = jnp.clip(
        jnp.nan_to_num(x, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP),
        -_COORD_CLIP, _COORD_CLIP,
    ) + 2.0
    y = jnp.clip(
        jnp.nan_to_num(y, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP),
        -_COORD_CLIP, _COORD_CLIP,
    ) + 2.0
    Hp, Wp = H + 4, W + 4

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(image.dtype).reshape(B, -1)
    wy = (y - y0f).astype(image.dtype).reshape(B, -1)
    sx = jnp.clip(x0f.astype(jnp.int32), 0, Wp - 2)
    sy = jnp.clip(y0f.astype(jnp.int32), 0, Hp - 2)

    if DENSE_WARP_IMPL == "patch":
        padded = jnp.pad(image, ((0, 0), (0, 0), (2, 2), (2, 2)))  # (B, C, Hp, Wp)
        starts = jnp.stack([sy, sx], axis=-1).reshape(B, -1, 2)    # (B, P, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(0, 1, 2), collapsed_slice_dims=(), start_index_map=(1, 2)
        )

        def per_view(img, st):
            return jax.lax.gather(img, st, dn, slice_sizes=(C, 2, 2), mode="clip")

        patch = jax.vmap(per_view)(padded, starts)  # (B, C, 2, 2, P)
        patch4 = patch.reshape(B, C, 4, -1)         # corners [y0x0, y0x1, y1x0, y1x1]
        w4 = jnp.stack(
            [(1.0 - wy) * (1.0 - wx), (1.0 - wy) * wx, wy * (1.0 - wx), wy * wx],
            axis=1,
        )                                           # (B, 4, P)
        out = jnp.sum(patch4 * w4[:, None], axis=2)
        return out.reshape(B, C, *batch_shape[1:])

    flat = jnp.pad(image, ((0, 0), (0, 0), (2, 2), (2, 2))).reshape(B, C, Hp * Wp)
    ftop = (sy * Wp + sx).reshape(B, -1, 1)  # (B, P, 1) flat start of the top x-pair

    # output (C, 2, P): the x-pair sits in sublanes (4x pad on a small
    # tensor), P in lanes (unpadded)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 1), collapsed_slice_dims=(), start_index_map=(1,)
    )

    def per_view(img, st):
        top = jax.lax.gather(img, st, dn, slice_sizes=(C, 2), mode="clip")
        bot = jax.lax.gather(img, st + Wp, dn, slice_sizes=(C, 2), mode="clip")
        return top, bot

    wx = wx.reshape(B, 1, -1)
    wy = wy.reshape(B, 1, -1)
    top, bot = jax.vmap(per_view)(flat, ftop)  # (B, C, 2, P) each
    row_t = top[:, :, 0] * (1.0 - wx) + top[:, :, 1] * wx
    row_b = bot[:, :, 0] * (1.0 - wx) + bot[:, :, 1] * wx
    out = row_t * (1.0 - wy) + row_b * wy  # (B, C, P)
    return out.reshape(B, C, *batch_shape[1:])
