"""Novel-view trajectory rendering (BASELINE config 5; reference analogue:
data/realestate10k_dataio.py:80-172 get_camera_pose + test.py:102-108
make_circle).  Renders a camera path between/around the two context views
with encode amortized once — the interactive serving path.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu.eval.harness import make_renderer


def make_circle(n: int, radius: float = 0.1) -> np.ndarray:
    """Circular offsets in the camera plane (test.py:102-108)."""
    angles = np.linspace(0, 4 * np.pi, n)
    return np.stack(
        [np.cos(angles) * radius, np.sin(angles) * radius, np.zeros(n)], axis=-1
    )


def interpolate_poses(pose_a: np.ndarray, pose_b: np.ndarray, n: int) -> np.ndarray:
    """Linear translation + slerp-free rotation blend (small baselines): a
    simple pose path between the two context cameras."""
    ts = np.linspace(0.0, 1.0, n)
    out = []
    for t in ts:
        m = np.eye(4, dtype=np.float32)
        # rotation: normalize the interpolated matrix via SVD (adequate for
        # the small inter-context rotations of RealEstate10K)
        R = (1 - t) * pose_a[:3, :3] + t * pose_b[:3, :3]
        u, _, vt = np.linalg.svd(R)
        m[:3, :3] = u @ vt
        m[:3, 3] = (1 - t) * pose_a[:3, 3] + t * pose_b[:3, 3]
        out.append(m)
    return np.stack(out)


def render_scene_path(
    model,
    variables,
    path_item: Dict,
    image_size: int = 256,
    chunk: int = 4096,
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """Render every query pose of a CameraPathDataset item (the reference's
    get_camera_pose protocol: contexts at the sequence ends, one render per
    intermediate frame pose), reusing one encode."""
    encode, render_image = make_renderer(model, chunk)
    ctx = jax.tree.map(lambda x: jnp.asarray(x)[None], path_item["context"])
    n_rays = image_size * image_size
    uv = jnp.asarray(path_item["query_path"]["uv"])[None, None]
    poses = path_item["query_path"]["cam2world"]
    intr = path_item["query_path"]["intrinsics"]
    if max_frames:
        poses, intr = poses[:max_frames], intr[:max_frames]
    state = encode(variables, {"context": ctx, "query": {
        "uv": uv, "rgb": jnp.zeros((1, 1, n_rays, 3)),
        "cam2world": jnp.asarray(poses[0])[None, None],
        "intrinsics": jnp.asarray(intr[0])[None, None]}})
    frames = []
    for i in range(len(poses)):
        q = {
            "uv": uv,
            "rgb": jnp.zeros((1, 1, n_rays, 3), jnp.float32),
            "cam2world": jnp.asarray(poses[i])[None, None],
            "intrinsics": jnp.asarray(intr[i])[None, None],
        }
        rgb, _ = render_image(variables, {"context": ctx, "query": q}, state, n_rays)
        frames.append(np.asarray(rgb).reshape(image_size, image_size, 3))
    return np.stack(frames)


def render_trajectory(
    model,
    variables,
    batch: Dict,
    n_frames: int = 30,
    image_size: int = 256,
    chunk: int = 4096,
    circle_radius: Optional[float] = None,
) -> np.ndarray:
    """Render ``n_frames`` novel views along a path between the two context
    cameras (optionally perturbed by a circle), reusing one encode.

    batch: a (B=1) stereo-pair batch dict.  Returns (n_frames, H, W, 3) in
    [-1, 1].
    """
    encode, render_image = make_renderer(model, chunk)
    state = encode(variables, batch)

    c2w = np.asarray(batch["context"]["cam2world"])[0]
    path = interpolate_poses(c2w[0], c2w[1], n_frames)
    if circle_radius:
        path = path.copy()
        path[:, :3, 3] += make_circle(n_frames, circle_radius)

    dim = image_size
    g = np.stack(np.meshgrid(np.arange(dim), np.arange(dim)), -1).reshape(-1, 2)
    uv = jnp.asarray(g.astype(np.float32))[None, None]

    frames = []
    n_rays = dim * dim
    for i in range(n_frames):
        q = {
            "uv": uv,
            "rgb": jnp.zeros((1, 1, n_rays, 3), jnp.float32),
            "cam2world": jnp.asarray(path[i])[None, None],
            "intrinsics": batch["query"]["intrinsics"],
        }
        fb = {"context": batch["context"], "query": q}
        rgb, _ = render_image(variables, fb, state, n_rays)
        frames.append(np.asarray(rgb).reshape(dim, dim, 3))
    return np.stack(frames)
