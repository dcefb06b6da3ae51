"""Gather-based bilinear image sampling at irregular coordinates.

TPU-native replacement for ``torch.nn.functional.grid_sample`` with the two
padding modes the reference uses (``border`` at models/CoPoNeRF.py:312 and
``zeros`` at models/CoPoNeRF.py:316,370) under ``align_corners=False``.

Images are NHWC (TPU layout).  Coordinates are in [-1, 1] with the last axis
ordered (x, y), matching the torch convention, so epipolar sample grids can be
passed through unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_COORD_CLIP = 3.0e4  # guards int32 casts against the reference's 1e10 NaN-scrub sentinel


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample ``image`` (B, H, W, C) at ``grid`` (B, ..., 2) -> (B, ..., C).

    grid[..., 0] is x (width), grid[..., 1] is y (height), both in [-1, 1].
    NaN/Inf coordinates produce zeros under ``zeros`` padding and border
    pixels under ``border`` padding (coordinates are sanitized before the
    integer cast, so no UB on extreme values).
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = image.shape
    batch_shape = grid.shape[:-1]

    x = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        valid = None
    else:
        # validity per corner is computed from the raw coords below;
        # clip only to keep the int cast well-defined.
        x = jnp.clip(jnp.nan_to_num(x, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP), -_COORD_CLIP, _COORD_CLIP)
        y = jnp.clip(jnp.nan_to_num(y, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP), -_COORD_CLIP, _COORD_CLIP)
        valid = True  # marker; masks built per corner

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(image.dtype)
    wy = (y - y0f).astype(image.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def corner_mask(xi, yi):
        if valid is None:
            return None
        return ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(image.dtype)

    masks = [corner_mask(x0, y0), corner_mask(x1, y0), corner_mask(x0, y1), corner_mask(x1, y1)]

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    flat_img = image.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, -1)
        out = jnp.take_along_axis(flat_img, idx[..., None], axis=1)
        return out.reshape(*batch_shape, C)

    v00 = gather(y0c, x0c)
    v10 = gather(y0c, x1c)
    v01 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    w00 = ((1 - wx) * (1 - wy))[..., None]
    w10 = (wx * (1 - wy))[..., None]
    w01 = ((1 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]

    if valid is not None:
        w00 = w00 * masks[0][..., None]
        w10 = w10 * masks[1][..., None]
        w01 = w01 * masks[2][..., None]
        w11 = w11 * masks[3][..., None]

    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


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
