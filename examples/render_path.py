"""Render a novel-view camera path from one unposed stereo pair.

The interactive-serving demo (BASELINE config 5; reference analogue:
test.py:102-108 make_circle + the per-frame render loop at test.py:176-196,
here amortized into ONE jitted dispatch, eval/trajectory.py).

    # trained checkpoint (.npz or the reference's released .pth), real scene
    python examples/render_path.py --checkpoint model.npz \
        --data_root .../test --pose_root .../test.mat --scene_idx 0 \
        --n_frames 30 --out /tmp/path

    # no checkpoint/dataset: random weights on a procedural scene (smoke)
    python examples/render_path.py --fast_init --image_size 64 --out /tmp/path

Writes frame_%03d.png plus an optional path.mp4 (if imageio-ffmpeg exists).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None, help=".npz or .pth")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--pose_root", type=str, default=None)
    p.add_argument("--scene_idx", type=int, default=0)
    p.add_argument("--n_frames", type=int, default=30)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--chunk", type=int, default=32768,
                   help="ray chunk (32768 = the measured v5e optimum, PERF.md)")
    p.add_argument("--cf", type=str, default="16,4",
                   help="coarse,fine epipolar samples (quality-gated default "
                        "16,4; '0,0' = exact 64-sample uniform stage)")
    p.add_argument("--exact", action="store_true",
                   help="exact f32 parity path (no bf16, no fast sampling)")
    p.add_argument("--circle_radius", type=float, default=None,
                   help="optional circular perturbation of the path (test.py:102)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--fast_init", action="store_true",
                   help="random structural init instead of a checkpoint (smoke)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    opt = p.parse_args()

    import jax

    if opt.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.eval.trajectory import render_trajectory
    from coponerf_tpu.models import CoPoNeRF

    if not opt.cpu:
        # the persistent cache only helps (and only works reliably) on the
        # TPU backend; on CPU it can load AOT results for mismatched
        # machine features
        from coponerf_tpu.utils.jax_setup import enable_compilation_cache

        enable_compilation_cache()
    cf = tuple(int(x) for x in opt.cf.split(","))
    if opt.exact:
        cfg = ModelConfig()
    else:
        cfg = ModelConfig(
            fast_sampling=True, compute_dtype="bfloat16",
            coarse_samples=cf[0], fine_samples=cf[1],
        )
    model = CoPoNeRF(cfg)
    opt.chunk = min(opt.chunk, opt.image_size * opt.image_size)

    if opt.data_root:
        from coponerf_tpu.data.realestate import RealEstate10kVis

        ds = RealEstate10kVis(opt.data_root, opt.pose_root, image_size=opt.image_size)
        item, _, _ = ds[opt.scene_idx]
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], item)
    else:
        from coponerf_tpu.data.synthetic import make_batch

        batch_np, _ = make_batch(batch_size=1, image_size=opt.image_size, n_rays=16, seed=0)
        batch = jax.tree.map(jnp.asarray, batch_np)

    if opt.checkpoint:
        from coponerf_tpu.training import checkpoint as ckpt_lib

        params, batch_stats, _, step = ckpt_lib.load(opt.checkpoint)
        variables = jax.tree.map(jnp.asarray, {"params": params, "batch_stats": batch_stats})
        print(f"loaded {opt.checkpoint} (step {step})")
    elif opt.fast_init:
        from coponerf_tpu.utils.fast_init import fast_init

        variables = fast_init(model, batch, val=False, train=False)
        print("fast_init (random weights — smoke only)")
    else:
        p.error("pass --checkpoint or --fast_init")

    frames = render_trajectory(
        model, variables, batch, n_frames=opt.n_frames,
        image_size=opt.image_size, chunk=opt.chunk,
        circle_radius=opt.circle_radius,
    )
    os.makedirs(opt.out, exist_ok=True)
    u8 = np.clip((frames * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    try:
        import imageio.v2 as imageio
    except ImportError:
        import imageio
    for i, f in enumerate(u8):
        imageio.imwrite(os.path.join(opt.out, f"frame_{i:03d}.png"), f)
    try:
        imageio.mimwrite(os.path.join(opt.out, "path.mp4"), u8, fps=10)
        print(f"wrote {len(u8)} frames + path.mp4 to {opt.out}")
    except Exception:
        print(f"wrote {len(u8)} frames to {opt.out} (no mp4 backend)")


if __name__ == "__main__":
    main()
