"""Offline evaluation harness: encode once per stereo pair, render the full
query image in jitted ray chunks, compute quality + pose metrics binned by
overlap (replaces test.py:111-302).

Deviations from the reference, by design:
  - equal-size ray chunks (4096 x 16 for 256^2) instead of torch.chunk's 18
    uneven chunks — one compiled shape, same protocol;
  - PSNR/SSIM recorded per batch element everywhere (the reference mixes a
    joint-over-batch PSNR into its 'all' bin, test.py:246).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu.eval import metrics as M


def _chunk_query(batch, start, size):
    q = dict(batch["query"])
    q["uv"] = jax.lax.dynamic_slice_in_dim(batch["query"]["uv"], start, size, axis=2)
    q["rgb"] = jax.lax.dynamic_slice_in_dim(batch["query"]["rgb"], start, size, axis=2)
    return {"context": batch["context"], "query": q}


# per-ray render outputs assembled across chunks: key -> ray axis.  These are
# exactly what the reference re-concatenates after its chunk loop
# (test.py:200-212, wrapper.py:188-219) — including the REAL attention
# weights (at_wt) so logged entropy is honest, and the correspondence
# points/masks so validation can compute the cycle loss at full parity.
_RAY_AXIS = {
    "rgb": 2,
    "depth_ray": 1,
    "at_wt": 1,
    "T_to_C1_pts": 1,
    "T_to_C2_pts": 1,
    "C2_pts_to_C1": 1,
    "mask_c2": 1,
    "matchability_cycle_mask": 1,
}


def make_renderer(
    model,
    chunk: int = 4096,
    keys: tuple = ("rgb", "depth_ray", "at_wt"),
    prune_invalid: bool = False,
):
    """Returns jitted (encode, render_image) callables.

    render_image(variables, batch, state, n_rays) -> dict of per-ray outputs
    assembled across chunks (``keys``, each a _RAY_AXIS entry).

    prune_invalid=True: compute the per-ray epipolar validity mask first (a
    ~10 flop/ray geometry pass, model.valid_ray_mask), stably compact valid
    rays to the front, and render only ceil(max_valid/chunk) chunks instead
    of n_rays/chunk.  The reference renders invalid rays fully and then
    overwrites them white (CoPoNeRF.py:562-563); on real scenes with sparse
    overlap this skips that dead work per image.  rgb for pruned rays is
    EXACTLY the white the renderer would emit; aux outputs (depth/at_wt/...)
    for pruned rays are zero-filled (the reference's values there are
    garbage-by-construction — they feed panels only, never metrics).  Each
    distinct chunk count compiles once (bounded by n_rays/chunk programs)."""

    @jax.jit
    def encode(variables, batch):
        return model.apply(variables, batch, train=False, method="encode")

    def _render_chunk(variables, batch, state, start, size):
        out = model.apply(
            variables, _chunk_query(batch, start, size), state, val=True, method="render"
        )
        return {k: out[k] for k in keys}

    @functools.partial(jax.jit, static_argnames=("n_rays",))
    def render_image(variables, batch, state, n_rays: int):
        n_chunks = n_rays // chunk

        def alloc(k, v):
            shape = list(v.shape)
            shape[_RAY_AXIS[k]] = n_rays
            return jnp.zeros(shape, v.dtype)

        def insert(acc, out, start):
            return {
                k: jax.lax.dynamic_update_slice_in_dim(acc[k], out[k], start, axis=_RAY_AXIS[k])
                for k in keys
            }

        first = _render_chunk(variables, batch, state, 0, chunk)
        acc = insert({k: alloc(k, v) for k, v in first.items()}, first, 0)

        def body(i, acc):
            out = _render_chunk(variables, batch, state, i * chunk, chunk)
            return insert(acc, out, i * chunk)

        acc = jax.lax.fori_loop(1, n_chunks, body, acc)
        rem = n_rays - n_chunks * chunk
        if rem:
            out = _render_chunk(variables, batch, state, n_chunks * chunk, rem)
            acc = insert(acc, out, n_chunks * chunk)
        return acc

    if not prune_invalid:
        return encode, render_image

    @jax.jit
    def ray_mask(variables, batch, state):
        return model.apply(variables, batch, state, val=True, method="valid_ray_mask")

    @functools.partial(jax.jit, static_argnames=("n_render",))
    def permute_rays(batch, order, n_render: int):
        q = dict(batch["query"])
        idx = order[:, None, :, None]
        q["uv"] = jnp.take_along_axis(batch["query"]["uv"], idx, axis=2)[:, :, :n_render]
        q["rgb"] = jnp.take_along_axis(batch["query"]["rgb"], idx, axis=2)[:, :, :n_render]
        return {"context": batch["context"], "query": q}

    @functools.partial(jax.jit, static_argnames=("n_rays",))
    def scatter_back(rendered, order, n_rays: int):
        """Undo the valid-first permutation ON DEVICE: pad each rendered
        buffer from n_render to n_rays with its fill value (rgb=white — exactly
        render()'s vm_any overwrite — aux keys zero), then gather with the
        inverse permutation.  Keeping this jitted avoids 2 full-buffer
        host round trips per key over the tunneled backend (measured: the
        numpy put_along_axis formulation made pruning a net LOSS, 1.28 vs
        1.12 s/image at 256^2/25% valid)."""
        inv = jnp.argsort(order, axis=-1)  # original ray -> permuted position
        B = order.shape[0]
        out = {}
        for k, v in rendered.items():
            ax = _RAY_AXIS[k]
            pad = [(0, 0)] * v.ndim
            pad[ax] = (0, n_rays - v.shape[ax])
            vp = jnp.pad(v, pad, constant_values=1.0 if k == "rgb" else 0.0)
            # some per-ray outputs carry a b-major (B*V) leading dim (at_wt,
            # T_to_*): repeat each batch element's permutation per view slot
            assert v.shape[0] % B == 0, (k, v.shape)
            idx_k = jnp.repeat(inv, v.shape[0] // B, axis=0)
            ish = [1] * v.ndim
            ish[0], ish[ax] = idx_k.shape[0], idx_k.shape[1]
            out[k] = jnp.take_along_axis(vp, idx_k.reshape(ish), axis=ax)
        return out

    def render_image_pruned(variables, batch, state, n_rays: int):
        mask = np.asarray(ray_mask(variables, batch, state))  # (B, n_rays) bool
        n_valid = int(mask.sum(axis=-1).max())
        if n_valid >= n_rays:
            render_image_pruned.last_n_rendered = n_rays
            return render_image(variables, batch, state, n_rays)
        # valid rays first; kind="stable" keeps the original ray order inside
        # each class so per-chunk token layouts stay image-coherent.  Always
        # render >= 1 chunk: keeps output shapes key-complete in the (degenerate)
        # all-invalid case, and any invalid rays inside the rendered prefix come
        # out white from render()'s own vm_any overwrite.
        order = jnp.asarray(np.argsort(~mask, axis=-1, kind="stable"))
        n_render = min(n_rays, max(chunk, -(-n_valid // chunk) * chunk))
        render_image_pruned.last_n_rendered = n_render
        pbatch = permute_rays(batch, order, n_render)
        rendered = render_image(variables, pbatch, state, n_render)
        return scatter_back(rendered, order, n_rays)

    return encode, render_image_pruned


def evaluate(
    model,
    variables,
    dataset,
    batch_size: int = 2,
    chunk: int = 4096,
    max_batches: Optional[int] = None,
    lpips_weights: Optional[str] = None,
    image_size: int = 256,
    verbose: bool = True,
    logger=None,
    prune_invalid: bool = False,
    drop_last: bool = True,
    num_workers: int = 0,
) -> M.MetricAccumulator:
    """logger: optional training.trainer.MetricLogger — when given, per-batch
    image panels and pose scalars are written as in the reference
    (test.py:270 img_summaries).

    drop_last=True matches the reference eval protocol exactly (its DataLoader
    is constructed with drop_last=True, test.py:130) — the n % batch_size tail
    scenes are NOT evaluated.  drop_last=False evaluates every scene (one extra
    compile for the smaller final batch); a deliberate deviation, off by default.

    num_workers>0 decodes scenes in worker processes (ordered PrefetchLoader)
    so cv2/npz decode overlaps the TPU render instead of serializing with it;
    results are identical to num_workers=0 for deterministic eval datasets."""
    from coponerf_tpu.data.loader import PrefetchLoader

    if lpips_weights is None:
        # the reference protocol ALWAYS reports LPIPS (test.py:258-263);
        # a run without it must not silently look like the full protocol
        import warnings

        warnings.warn(
            "LPIPS weights not provided — the LPIPS column will be MISSING "
            "and these results are NOT the full reference eval protocol "
            "(test.py:258-263). Fetch weights with "
            "scripts/fetch_lpips_weights.py and pass lpips_weights=...",
            stacklevel=2,
        )
    encode, render_image = make_renderer(model, chunk, prune_invalid=prune_invalid)
    acc = M.MetricAccumulator()

    loader = PrefetchLoader(
        dataset, batch_size, shuffle=False, num_workers=num_workers,
        drop_last=drop_last,
    )
    n_batches = len(loader)
    if max_batches:
        n_batches = min(n_batches, max_batches)
    it = iter(loader)
    try:
        for bi in range(n_batches):
            batch_np, gt, overlaps = next(it)
            bs = batch_np["context"]["rgb"].shape[0]
            batch = jax.tree.map(jnp.asarray, batch_np)
            n_rays = batch["query"]["uv"].shape[2]

            t0 = time.time()
            state = encode(variables, batch)
            rendered = render_image(variables, batch, state, n_rays)
            rgb, depth = rendered["rgb"], rendered["depth_ray"]
            rgb = jax.block_until_ready(rgb)
            dt = time.time() - t0

            rgb = np.asarray(rgb).reshape(bs, image_size, image_size, 3)
            target = np.asarray(gt["rgb"]).reshape(bs, image_size, image_size, 3)
            rgb = (np.clip(rgb, -1, 1) + 1) * 0.5
            target = (target + 1) * 0.5

            rel_pose = np.asarray(state.rel_pose)
            ctx_c2w = np.asarray(batch_np["context"]["cam2world"])
            gt_rel = np.linalg.inv(ctx_c2w[:, 0]) @ ctx_c2w[:, 1]
            rot = M.rotation_geodesic(rel_pose[:, :3, :3], gt_rel[:, :3, :3])
            trans_l2, trans_ang = M.translation_error(rel_pose[:, :3, 3], gt_rel[:, :3, 3])

            for e in range(bs):
                vals = {
                    "psnr": M.psnr(rgb[e], target[e]),
                    "mse": float(np.mean((rgb[e] - target[e]) ** 2)),
                    "ssim": M.ssim(rgb[e], target[e]),
                    "rot": float(rot[e]),
                    "trans": float(trans_l2[e]),
                    "angle_trans": float(trans_ang[e]),
                    "rays_per_sec": n_rays * bs / dt,
                }
                lp = M.lpips_vgg(rgb[e] * 2 - 1, target[e] * 2 - 1, lpips_weights)
                if lp is not None:
                    vals["lpips"] = lp
                acc.add(M.overlap_bin(float(np.ravel(overlaps)[e])), **vals)
            if logger is not None:
                from coponerf_tpu.training.summaries import img_summaries

                out = {
                    "rgb": np.asarray(rgb) * 2 - 1,
                    "depth_ray": np.asarray(depth),
                    "rel_pose": rel_pose,
                    "gt_rel_pose": gt_rel,
                    "at_wt": np.asarray(rendered["at_wt"]),  # real attention weights
                    "flow": [np.asarray(f) for f in state.flows],
                }
                img_summaries(logger, batch_np, gt, out, bi, prefix="val_",
                              img_shape=(image_size, image_size))
            if verbose:
                print(f"{bi + 1}/{n_batches} done.")
                print(acc.format())
    finally:
        it.close()  # stops loader workers even on early exit
    return acc
