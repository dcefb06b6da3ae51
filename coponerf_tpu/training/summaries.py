"""Observability: TensorBoard image/scalar summaries.

Parity target: summary/summaries.py:106-267 (prediction/depth/context/query
image panels, attention entropy, rotation error in degrees mean/std/max,
translation MSE) and summary/inspect_epipolar_geometry.py:13-122 (epipolar
line overlays comparing estimated vs GT fundamental matrices, drawn with
cv2.computeCorrespondEpilines).  All host-side numpy; written through the
trainer's MetricLogger (TB when torch is available, JSONL always).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _skew(t: np.ndarray) -> np.ndarray:
    return np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])


def fundamental_from_pose(K1: np.ndarray, K2: np.ndarray, rel_pose: np.ndarray) -> np.ndarray:
    """F = K2^-T [t]x R K1^-1 per batch element."""
    R = rel_pose[:, :3, :3]
    T = rel_pose[:, :3, 3]
    Fs = []
    for i in range(len(T)):
        E = _skew(T[i]) @ R[i]
        Fs.append(np.linalg.inv(K2[i, :3, :3]).T @ E @ np.linalg.inv(K1[i, :3, :3]))
    return np.stack(Fs)


_PTS = np.array([[64, 64], [64, 128], [64, 192], [128, 64], [128, 128], [128, 192], [192, 64], [192, 128], [192, 192]])
_COLORS = np.array(
    [[63, 228, 92], [222, 155, 167], [56, 220, 130], [216, 43, 206], [47, 172, 72],
     [198, 181, 0], [137, 99, 246], [22, 160, 10], [23, 240, 252]]
)


def epipolar_panels(img1, K1, img2, K2, rel_pose_est, rel_pose_gt) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Draw epipolar lines of fixed keypoints in img2 under the estimated and
    GT fundamental matrices.  imgs: (B, H, W, 3) in [-1, 1]."""
    if cv2 is None:
        return None
    try:
        F_est = fundamental_from_pose(K1, K2, rel_pose_est)
        F_gt = fundamental_from_pose(K1, K2, rel_pose_gt)
        pred_panels, gt_panels = [], []
        for i in range(len(F_est)):
            a = ((img1[i] + 1) * 127.5).astype(np.uint8).copy()
            for F, out in ((F_est[i], pred_panels), (F_gt[i], gt_panels)):
                lines = cv2.computeCorrespondEpilines(_PTS.reshape(-1, 1, 2).astype(np.float32), 1, F)
                lines = lines.reshape(-1, 3)
                left = a.copy()
                right = ((img2[i] + 1) * 127.5).astype(np.uint8).copy()
                overlay = right.copy()
                h, w = right.shape[:2]
                for p, l, c in zip(_PTS, lines, _COLORS):
                    c = tuple(int(x) for x in c)
                    left = cv2.circle(left, tuple(int(x) for x in p), 5, c, -1)
                    if abs(l[1]) < 1e-9:
                        continue
                    x0, y0 = 0, int(-l[2] / l[1])
                    x1, y1 = w, int(-(l[2] + l[0] * w) / l[1])
                    overlay = cv2.line(overlay, (x0, y0), (x1, y1), c, 10)
                blended = cv2.addWeighted(overlay, 0.4, right, 0.6, 0)
                out.append(np.concatenate([left, blended], axis=1))
        return np.stack(pred_panels), np.stack(gt_panels)
    except Exception:
        return None


def _grid(images: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) [-1,1] float -> one row-strip uint8-ish float [0,1]."""
    images = (np.clip(images, -1, 1) + 1) * 0.5
    return np.concatenate(list(images), axis=1)


def _overlay_mask(img_u8: np.ndarray, invalid: np.ndarray, color=(255, 102, 51), alpha=0.5) -> np.ndarray:
    """Blend ``color`` over pixels where ``invalid`` (H, W bool) holds, with a
    contour outline — the reference's overlay_semantic_mask rendering
    (summary/summaries.py:42-72) for the cyclic-consistency overlays."""
    out = img_u8.copy()
    c = np.array(color, np.float32)
    sel = invalid.astype(bool)
    out[sel] = (out[sel] * alpha + c * (1 - alpha)).astype(np.uint8)
    if cv2 is not None:
        contours = cv2.findContours(invalid.astype(np.uint8), cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)[-2:]
        cv2.drawContours(out, contours[0], -1, tuple(int(x) for x in color), 1)
    return out


def warped_context_panels(ctx_rgb: np.ndarray, flow_fwd: np.ndarray, flow_bwd: np.ndarray):
    """Flow-warped context panels with cyclic-consistency mask overlays
    (reference summary/summaries.py:163-207).

    ctx_rgb: (B, 2, H, W, 3) in [-1, 1]; flows: (B, 2, h, w) NCHW pixels.
    Returns dict of 4 panels, each (B, 3H, W, 3) float in [0, 1]:
      warped_img        = [ctx2 ; warp(ctx2, up_fwd) ; ctx1] stacked on H
      masked_warped_img = warped row with invalid-mask overlay
      (+ the _flip pair for the reverse direction).
    Flow products are computed with the SAME jnp ops as the loss
    (coponerf_tpu.flow), jitted on the host CPU device.
    """
    import jax
    import jax.numpy as jnp

    from coponerf_tpu import flow as flow_ops

    B, _, H, W, _ = ctx_rgb.shape

    def _products(f_fwd, f_bwd, rgb):
        up_f, up_b, mask_f, mask_b = flow_ops.cyclic_consistency_masks(
            f_fwd, f_bwd, out_size=H, threshold=10.0, scale=H / f_fwd.shape[-2]
        )
        im1 = jnp.transpose(rgb[:, 0], (0, 3, 1, 2))  # ctx1 NCHW
        im2 = jnp.transpose(rgb[:, 1], (0, 3, 1, 2))
        w_f = flow_ops.warp((im2 + 1.0) * 0.5, up_f)   # ctx2 warped toward ctx1
        w_b = flow_ops.warp((im1 + 1.0) * 0.5, up_b)
        return (jnp.transpose(w_f, (0, 2, 3, 1)), jnp.transpose(w_b, (0, 2, 3, 1)),
                mask_f, mask_b)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        w_f, w_b, mask_f, mask_b = jax.jit(_products)(
            jnp.asarray(flow_fwd), jnp.asarray(flow_bwd), jnp.asarray(ctx_rgb)
        )
    w_f, w_b = np.asarray(w_f), np.asarray(w_b)
    mask_f, mask_b = np.asarray(mask_f), np.asarray(mask_b)
    ctx01 = (np.clip(ctx_rgb, -1, 1) + 1) * 0.5

    panels = {"warped_img": [], "masked_warped_img": [],
              "warped_img_flip": [], "masked_warped_img_flip": []}
    for i in range(B):
        over_f = _overlay_mask((np.clip(w_f[i], 0, 1) * 255).astype(np.uint8), ~mask_f[i])
        over_b = _overlay_mask((np.clip(w_b[i], 0, 1) * 255).astype(np.uint8), ~mask_b[i])
        panels["warped_img"].append(np.concatenate([ctx01[i, 1], w_f[i], ctx01[i, 0]], axis=0))
        panels["masked_warped_img"].append(
            np.concatenate([ctx01[i, 1], over_f / 255.0, ctx01[i, 0]], axis=0))
        panels["warped_img_flip"].append(np.concatenate([ctx01[i, 0], w_b[i], ctx01[i, 1]], axis=0))
        panels["masked_warped_img_flip"].append(
            np.concatenate([ctx01[i, 0], over_b / 255.0, ctx01[i, 1]], axis=0))
    return {k: np.clip(np.stack(v), 0.0, 1.0) for k, v in panels.items()}


def img_summaries(
    logger,
    model_input: Dict,
    gt: Dict,
    model_output: Dict,
    step: int,
    prefix: str = "",
    img_shape: Tuple[int, int] = (256, 256),
):
    h, w = img_shape
    pred = np.asarray(model_output["rgb"]).reshape(-1, h, w, 3)
    logger.log_image(step, prefix + "predictions", _grid(pred))

    depth = np.asarray(model_output["depth_ray"]).reshape(-1, h, w) / 10.0
    try:
        import matplotlib.pyplot as plt

        cmap = plt.get_cmap("jet")
        depth_img = cmap(np.clip(depth, 0, 1))[..., :3]
        logger.log_image(step, prefix + "depth_images", np.concatenate(list(depth_img), axis=1))
    except Exception:
        pass

    ctx = np.asarray(model_input["context"]["rgb"])
    logger.log_image(step, prefix + "context_images", _grid(ctx.reshape(-1, *ctx.shape[2:])))
    qry = np.asarray(gt["rgb"]).reshape(-1, h, w, 3)
    logger.log_image(step, prefix + "query_images", _grid(qry))

    # flow-warped context panels with cyclic-consistency overlays
    # (reference summary/summaries.py:163-207)
    if "flow" in model_output:
        try:
            flows = model_output["flow"]
            wp = warped_context_panels(ctx, np.asarray(flows[0]), np.asarray(flows[1]))
            for k, v in wp.items():
                logger.log_image(step, prefix + k, np.concatenate(list(v), axis=1))
        except Exception:
            pass  # panels are best-effort observability, never fail training

    rel_pose = np.asarray(model_output["rel_pose"])
    gt_rel = np.asarray(model_output["gt_rel_pose"])
    panels = epipolar_panels(
        ctx[:, 1], np.asarray(model_input["context"]["intrinsics"])[:, 1],
        ctx[:, 0], np.asarray(model_input["context"]["intrinsics"])[:, 0],
        rel_pose, gt_rel,
    )
    if panels is not None:
        logger.log_image(step, prefix + "epipolar_pred", panels[0][0] / 255.0)
        logger.log_image(step, prefix + "epipolar_GT", panels[1][0] / 255.0)

    # scalars (summaries.py:114-121, 225-232)
    at_wt = np.asarray(model_output["at_wt"])
    ent = -(at_wt * np.log(at_wt + 1e-5)).sum(-1)
    m = rel_pose[:, :3, :3] @ np.swapaxes(gt_rel[:, :3, :3], -1, -2)
    cos = np.clip((m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2] - 1) / 2, -1, 1)
    deg = np.degrees(np.arccos(cos))
    logger.log(step, {
        prefix + "ent": float(np.nan_to_num(ent).mean()),
        prefix + "rot_distance": float(np.arccos(cos).mean()),
        prefix + "rot_distance_degrees_mean": float(deg.mean()),
        prefix + "rot_distance_degrees_std": float(deg.std()),
        prefix + "rot_distance_degrees_max": float(deg.max()),
        prefix + "tran_L1": float(np.mean((rel_pose[:, :3, 3] - gt_rel[:, :3, 3]) ** 2)),
        prefix + "out_min": float(pred.min()),
        prefix + "out_max": float(pred.max()),
    })
