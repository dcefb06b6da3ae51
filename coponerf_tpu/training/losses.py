"""Training losses.

Parity target: models/loss_function.py — always-on L1 image loss (:65-71,107),
optional SSIM loss on flow-warped context images under cyclic-consistency
masks (:109-120, SSIM window :19-60), optional Huber cycle/correspondence
loss with three masks (:122-130), optional pose loss = geodesic rotation
distance + translation L2 (:132-134).  Weights w1=0.01, w2=1.0, w3=1.0.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from coponerf_tpu import flow as flow_ops
from coponerf_tpu.config import LossConfig
from coponerf_tpu.geometry import geodesic_rotation_distance


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    xs = jnp.arange(window_size) - window_size // 2
    g = jnp.exp(-(xs.astype(jnp.float32) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _depthwise_conv2d(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """img: (B, C, H, W); window: (k, k) applied per channel, SAME padding."""
    b, c, h, w = img.shape
    k = window.shape[0]
    kern = jnp.broadcast_to(window[None, None], (c, 1, k, k))
    return jax.lax.conv_general_dilated(
        img, kern, window_strides=(1, 1), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
    )


def masked_ssim_loss(img1: jnp.ndarray, img2: jnp.ndarray, mask: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """(sum over mask of (1 - SSIM)) / sum(mask) / 3 — reference's odd
    normalization kept verbatim (loss_function.py:45)."""
    win = gaussian_window(window_size)
    mu1 = _depthwise_conv2d(img1, win)
    mu2 = _depthwise_conv2d(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _depthwise_conv2d(img1 * img1, win) - mu1_sq
    sigma2_sq = _depthwise_conv2d(img2 * img2, win) - mu2_sq
    sigma12 = _depthwise_conv2d(img1 * img2, win) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.sum((1.0 - ssim_map) * mask) / jnp.sum(mask) / 3.0


def image_loss(model_out: Dict[str, Any], gt: Dict[str, Any]) -> jnp.ndarray:
    gt_rgb = jnp.nan_to_num(gt["rgb"], nan=0.0)
    rgb = jnp.nan_to_num(model_out["rgb"], nan=0.0)
    return jnp.mean(jnp.abs(gt_rgb - rgb))


def huber(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """torch.nn.functional.huber_loss, reduction='none'."""
    err = pred - target
    abs_err = jnp.abs(err)
    return jnp.where(abs_err < delta, 0.5 * err ** 2, delta * (abs_err - 0.5 * delta))


def lf_loss(
    cfg: LossConfig,
    model_input: Dict[str, Any],
    model_out: Dict[str, Any],
    gt: Dict[str, Any],
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Returns (loss_dict, aux) — loss_dict values are scalars; the train
    step sums them (wrapper.py:110-123)."""
    # note: cfg.depth mirrors the reference's --depth flag, which is inert
    # there too (LFLoss stores it but implements no depth term,
    # loss_function.py:90-136)
    losses: Dict[str, jnp.ndarray] = {}
    losses["img_loss"] = image_loss(model_out, gt)

    if cfg.ssim:
        flow_f, flow_b = model_out["flow"][0], model_out["flow"][1]
        h = flow_f.shape[-2]
        ctx_rgb = model_input["context"]["rgb"]
        out_size = ctx_rgb.shape[2]  # 256 in the reference (loss_function.py:112)
        im0 = jnp.transpose(ctx_rgb[:, 0], (0, 3, 1, 2))
        im1 = jnp.transpose(ctx_rgb[:, 1], (0, 3, 1, 2))
        # image + consistency-flow warps packed per direction (they share the
        # warp grid) — identical numerics, half the gather count; see
        # flow.ssim_warp_packed for why the r4 patch-formulation packing lost
        w1, w0, mask_f, mask_b = flow_ops.ssim_warp_packed(
            im0, im1, flow_f, flow_b, out_size=out_size, scale=out_size / h
        )
        s1 = masked_ssim_loss(w1, im0, mask_f[:, None].astype(im0.dtype))
        s2 = masked_ssim_loss(w0, im1, mask_b[:, None].astype(im0.dtype))
        losses["ssim_loss"] = cfg.w_ssim * (s1 + s2) / 2.0

    if cfg.cycle:
        pred = model_out["T_to_C1_pts"]
        targ = model_out["C2_pts_to_C1"]
        err = jnp.linalg.norm(pred - targ, axis=-1, keepdims=True)
        valid = jax.lax.stop_gradient(err) <= 20.0
        mask_c2 = model_out["mask_c2"][..., None]
        mask_cycle = model_out["matchability_cycle_mask"][..., None]
        m = valid.astype(pred.dtype) * mask_c2.astype(pred.dtype) * mask_cycle.astype(pred.dtype)
        losses["cycle_loss"] = cfg.w_cycle * (
            jnp.sum(huber(pred, targ) * m) / (jnp.sum(m) + 1e-6)
        )

    if cfg.pose:
        # eps keeps the arccos gradient finite as the pose converges; the
        # reference's exact form NaNs there and relies on its grad-guard to
        # skip the step (loss_function.py:76-86 + wrapper.py:44-58), which
        # stalls pose training once the fit is good.  Angle floor ~4.5e-4 rad.
        rot = jnp.mean(
            geodesic_rotation_distance(
                model_out["rel_pose"][:, :3, :3], model_out["gt_rel_pose"][:, :3, :3],
                eps=1e-7,
            )
        )
        trans = jnp.mean(
            jnp.linalg.norm(
                model_out["rel_pose"][:, :3, 3] - model_out["gt_rel_pose"][:, :3, 3], axis=-1
            )
        )
        losses["pose_loss"] = cfg.w_pose * (rot + trans)

    return losses, {}
