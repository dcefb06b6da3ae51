"""Optical-flow utilities: warping, flow<->mapping conversion, cyclic
consistency masks, and keypoint transfer through flow fields.

Parity targets: utils_training/utils.py:642-671 (warp), 503-573
(convert_flow_to_mapping), 576-602 (get_gt_correspondence_mask), 52-69
(flow2kps), 260-276 (generate_mask_from_confidence_score).

Flow tensors follow the reference's NCHW layout (B, 2, H, W) with channel 0 =
x-flow, channel 1 = y-flow, in pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coponerf_tpu.ops.grid_sample import grid_sample_dense_nchw
from coponerf_tpu.ops.resize import resize_nchw


def warp(x: jnp.ndarray, flo: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp image ``x`` (B, C, H, W) by flow ``flo`` (B, 2, H, W):
    output[p] = x[p + flo[p]], bilinear, zero padding (torch grid_sample
    defaults, align_corners=False).  Dense few-channel warps use the
    lane-friendly row-pair sampler (see grid_sample_dense_nchw) — the
    patch-gather formulation's padded temporaries dominated the train-step
    loss block before round 4."""
    b, c, h, w = x.shape
    xx = jnp.arange(w, dtype=flo.dtype)[None, None, :]
    yy = jnp.arange(h, dtype=flo.dtype)[None, :, None]
    vx = (xx + flo[:, 0]) * 2.0 / max(w - 1, 1) - 1.0
    vy = (yy + flo[:, 1]) * 2.0 / max(h - 1, 1) - 1.0
    vgrid = jnp.stack([vx, vy], axis=-1)
    return grid_sample_dense_nchw(x, vgrid)


def convert_flow_to_mapping(flow: jnp.ndarray) -> jnp.ndarray:
    """flow (B, 2, H, W) in pixels -> absolute pixel mapping (B, 2, H, W)."""
    _, _, h, w = flow.shape
    xx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    yy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    return jnp.stack([flow[:, 0] + xx, flow[:, 1] + yy], axis=1)


def get_gt_correspondence_mask(flow: jnp.ndarray) -> jnp.ndarray:
    """Mask of flows that land inside the image. (B, 2, H, W) -> (B, H, W)."""
    mapping = convert_flow_to_mapping(flow)
    _, _, h, w = mapping.shape
    mask_x = (mapping[:, 0] >= 0) & (mapping[:, 0] <= w - 1)
    mask_y = (mapping[:, 1] >= 0) & (mapping[:, 1] <= h - 1)
    return mask_x & mask_y


def cyclic_consistency_masks(flow_fwd: jnp.ndarray, flow_bwd: jnp.ndarray, out_size: int = 256, threshold: float = 10.0, scale: float | None = None):
    """Upsample both flows to ``out_size`` and compute the two forward-backward
    consistency masks the renderer and SSIM loss use.

    ``scale`` multiplies the flow values after upsampling.  The reference uses
    two DIFFERENT conventions that we replicate: the loss scales by
    out_size/flow_h (loss_function.py:110-113, geometrically correct) while
    the renderer scales by out_size/image_h == 1 (CoPoNeRF.py:230-231, so its
    matchability masks are built from 4x-understated flows).  Default: the
    geometrically correct out_size/flow_h."""
    h = flow_fwd.shape[-2]
    if scale is None:
        scale = out_size / h
    up_fwd = resize_nchw(flow_fwd, (out_size, out_size), align_corners=False) * scale
    up_bwd = resize_nchw(flow_bwd, (out_size, out_size), align_corners=False) * scale
    err_fwd = jnp.linalg.norm(up_fwd + warp(up_bwd, up_fwd), axis=1) <= threshold
    err_bwd = jnp.linalg.norm(up_bwd + warp(up_fwd, up_bwd), axis=1) <= threshold
    mask_fwd = err_fwd & get_gt_correspondence_mask(up_fwd)
    mask_bwd = err_bwd & get_gt_correspondence_mask(up_bwd)
    return up_fwd, up_bwd, mask_fwd, mask_bwd


def ssim_warp_packed(
    im0: jnp.ndarray,
    im1: jnp.ndarray,
    flow_fwd: jnp.ndarray,
    flow_bwd: jnp.ndarray,
    out_size: int = 256,
    threshold: float = 10.0,
    scale: float | None = None,
):
    """The SSIM-loss warp block with the image warp and the consistency-flow
    warp PACKED into one 5-channel gather per direction — they share the warp
    grid, so this halves the loss block's gather count (the 8 loss-side warp
    gathers were ~42 ms/step at batch 6, all index-rate-bound; trace r5).

    Returns (warped_im1, warped_im0, mask_fwd, mask_bwd), numerically
    identical to cyclic_consistency_masks + two separate warp() calls: the
    gather fetches the same corners with the same weights and bilinear
    blending is per-channel independent.  The packed operand's flow channels
    are stop_gradient'ed — their warped values feed only the boolean
    consistency test (zero cotangent in the unpacked form too), and keeping
    them live would force autodiff to build a dense operand-scatter for the
    whole packed tensor where the unpacked form needs none.  (The r4
    measured-negative C=5 packing was the PATCH formulation, whose (P,2,2,C)
    temporaries tile-pad ~43x; the row-pair layout pads the sublane pair
    4x packed or not, so packing is footprint-neutral here.)
    """
    h = flow_fwd.shape[-2]
    if scale is None:
        scale = out_size / h
    up_fwd = resize_nchw(flow_fwd, (out_size, out_size), align_corners=False) * scale
    up_bwd = resize_nchw(flow_bwd, (out_size, out_size), align_corners=False) * scale
    pf = warp(jnp.concatenate([im1, jax.lax.stop_gradient(up_bwd)], axis=1), up_fwd)
    pb = warp(jnp.concatenate([im0, jax.lax.stop_gradient(up_fwd)], axis=1), up_bwd)
    c_im = im0.shape[1]
    warped_im1, warped_bwd = pf[:, :c_im], pf[:, c_im:]
    warped_im0, warped_fwd = pb[:, :c_im], pb[:, c_im:]
    err_fwd = jnp.linalg.norm(up_fwd + warped_bwd, axis=1) <= threshold
    err_bwd = jnp.linalg.norm(up_bwd + warped_fwd, axis=1) <= threshold
    mask_fwd = err_fwd & get_gt_correspondence_mask(up_fwd)
    mask_bwd = err_bwd & get_gt_correspondence_mask(up_bwd)
    return warped_im1, warped_im0, mask_fwd, mask_bwd


def flow2kps(trg_kps: jnp.ndarray, flow: jnp.ndarray, n_pts: int, upsample_size: tuple[int, int] = (256, 256)):
    """Transfer target keypoints through a flow field.

    trg_kps: (B, N, 2) pixel coords (float); flow: (B, 2, h, w).
    Returns (src_kps (B, 2, n_pts), mask (B, n_pts)) — keypoints displaced by
    the flow sampled (nearest, integer cast) at their location, and an
    in-bounds validity mask on the *raw* keypoints.
    """
    h = flow.shape[-2]
    up = resize_nchw(flow, upsample_size, align_corners=False) * (upsample_size[0] / h)
    return flow2kps_from_upsampled(trg_kps, up, n_pts)


def flow2kps_from_upsampled(trg_kps: jnp.ndarray, up: jnp.ndarray, n_pts: int):
    """flow2kps with the flow already upsampled+scaled (chunk-invariant part
    precomputed once per pair); up: (B, 2, H, W)."""
    hw = up.shape[-2:]
    kps_i = trg_kps[:, :n_pts].astype(jnp.int32)  # trunc-toward-zero, like .long()
    mask = ((kps_i >= 0) & (kps_i < hw[0])).all(axis=-1)
    kp = jnp.clip(kps_i, 0, hw[0] - 1)
    flat = up.reshape(up.shape[0], 2, -1)
    idx = kp[..., 1] * hw[1] + kp[..., 0]  # (B, n_pts)
    sampled = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # (B, 2, n_pts)
    src_kps = jnp.swapaxes(kp, 1, 2).astype(up.dtype) + sampled
    return src_kps, mask


def mask_from_confidence(points: jnp.ndarray, confidence: jnp.ndarray, n_pts: int, upsample_size: tuple[int, int] = (256, 256)) -> jnp.ndarray:
    """Sample a confidence map at (clamped, integer) pixel locations.

    points: (B, N, 2); confidence: (B, H, W) -> (B, n_pts)."""
    kp = jnp.clip(points[:, :n_pts].astype(jnp.int32), 0, upsample_size[0] - 1)
    flat = confidence.reshape(confidence.shape[0], -1)
    idx = kp[..., 1] * upsample_size[1] + kp[..., 0]
    return jnp.take_along_axis(flat, idx, axis=1)
