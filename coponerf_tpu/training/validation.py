"""Periodic in-training validation: chunked full-image rendering + losses +
image summaries (replaces wrapper.py:160-254, without the reference's silent
bare-except swallow)."""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu.config import Config
from coponerf_tpu.eval.harness import make_renderer
from coponerf_tpu.models import CoPoNeRF
from coponerf_tpu.training import summaries as S
from coponerf_tpu.training.losses import lf_loss


def make_val_fn(
    cfg: Config,
    val_batches: Iterable,
    chunk: int = 512,
    image_size: int = 256,
    max_batches: int = 8,
) -> Callable:
    """Returns val_fn(state, step, logger) for trainer.train.

    val_batches: iterable of (model_input, gt) numpy batch dicts with FULL
    query images (uv covers the image).  At most ``max_batches`` are
    materialized — in-training validation is a periodic spot check
    (reference wrapper.py:160-254 renders a handful of val scenes), and a
    real val loader is far too large to hold in host memory."""
    import itertools

    model = CoPoNeRF(cfg.model)
    # assemble EVERY per-ray output the enabled losses and summaries need:
    # real at_wt (honest entropy) plus the correspondence points/masks so the
    # val loss dict carries the same terms as training (wrapper.py:160-254)
    keys = ("rgb", "depth_ray", "at_wt")
    if cfg.loss.cycle:
        keys += ("T_to_C1_pts", "C2_pts_to_C1", "mask_c2", "matchability_cycle_mask")
    encode, render_image = make_renderer(model, chunk, keys=keys)
    batches = list(itertools.islice(iter(val_batches), max_batches))

    def val_fn(train_state, step, logger):
        variables = {
            "params": jax.device_get(train_state.params),
            "batch_stats": jax.device_get(train_state.batch_stats),
        }
        variables = jax.tree.map(jnp.asarray, variables)
        losses_acc = {}
        last = None
        for batch_np, gt in batches:
            batch = jax.tree.map(jnp.asarray, batch_np)
            n_rays = batch["query"]["uv"].shape[2]
            scene = encode(variables, batch)
            out = dict(render_image(variables, batch, scene, n_rays))
            out.update(
                flow=scene.flows,
                rel_pose=scene.rel_pose,
                gt_rel_pose=jnp.linalg.inv(batch["context"]["cam2world"][:, 0])
                @ batch["context"]["cam2world"][:, 1],
            )
            # full val-loss parity: every enabled term is computed on the
            # assembled outputs (ssim needs only the pair flows; cycle uses
            # the assembled correspondence points)
            val_losses, _ = lf_loss(cfg.loss, batch, out, gt)
            for k, v in val_losses.items():
                losses_acc.setdefault(k, []).append(float(v))
            last = (batch_np, gt, out)
        logger.log(step, {f"val_{k}": float(np.mean(v)) for k, v in losses_acc.items()})
        if last is not None:
            batch_np, gt, out = last
            S.img_summaries(
                logger, batch_np, gt, jax.device_get(out), step, prefix="val_",
                img_shape=(image_size, image_size),
            )

    return val_fn
