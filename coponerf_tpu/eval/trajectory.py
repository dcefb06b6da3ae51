"""Novel-view trajectory rendering (BASELINE config 5; reference analogue:
data/realestate10k_dataio.py:80-172 get_camera_pose + test.py:102-108
make_circle).  Renders a camera path between/around the two context views
with encode amortized once — the interactive serving path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu.eval.harness import make_renderer


def make_path_renderer(model, chunk: int = 4096):
    """One-dispatch trajectory rendering: a single jitted lax.map over all
    path poses (each frame chunk-rendered inside).  On the tunneled backend a
    per-frame dispatch costs ~30 ms — for a 30-frame path that is ~1 s of
    pure overhead this removes."""
    _, render_image = make_renderer(model, chunk)

    @functools.partial(jax.jit, static_argnames=("n_rays",))
    def render_path(variables, batch, state, poses, n_rays: int):
        def frame(pose):
            q = dict(batch["query"])
            q["cam2world"] = pose[None, None]
            out = render_image(variables, {"context": batch["context"], "query": q}, state, n_rays)
            return out["rgb"]

        return jax.lax.map(frame, poses)  # (n_frames, B, 1, n_rays, 3)

    return render_path


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
    encode, _ = make_renderer(model, chunk)
    render_path = make_path_renderer(model, chunk)
    ctx = jax.tree.map(lambda x: jnp.asarray(x)[None], path_item["context"])
    n_rays = image_size * image_size
    uv = jnp.asarray(path_item["query_path"]["uv"])[None, None]
    poses = path_item["query_path"]["cam2world"]
    intr = path_item["query_path"]["intrinsics"]
    if max_frames:
        poses, intr = poses[:max_frames], intr[:max_frames]
    # intrinsics: one camera per scene in RealEstate10K, so the first frame's
    # K serves the whole path (lets all frames share one compiled render)
    batch = {"context": ctx, "query": {
        "uv": uv, "rgb": jnp.zeros((1, 1, n_rays, 3), jnp.float32),
        "cam2world": jnp.asarray(poses[0])[None, None],
        "intrinsics": jnp.asarray(intr[0])[None, None]}}
    state = encode(variables, batch)
    rgb = render_path(variables, batch, state, jnp.asarray(poses), n_rays)
    return np.asarray(rgb).reshape(len(poses), image_size, image_size, 3)


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
    encode, _ = make_renderer(model, chunk)
    render_path = make_path_renderer(model, chunk)
    state = encode(variables, batch)

    c2w = np.asarray(batch["context"]["cam2world"])[0]
    path = interpolate_poses(c2w[0], c2w[1], n_frames)
    if circle_radius:
        path = path.copy()
        path[:, :3, 3] += make_circle(n_frames, circle_radius)

    dim = image_size
    g = np.stack(np.meshgrid(np.arange(dim), np.arange(dim)), -1).reshape(-1, 2)
    uv = jnp.asarray(g.astype(np.float32))[None, None]

    n_rays = dim * dim
    fb = {
        "context": batch["context"],
        "query": {
            "uv": uv,
            "rgb": jnp.zeros((1, 1, n_rays, 3), jnp.float32),
            "cam2world": jnp.asarray(path[0])[None, None],
            "intrinsics": batch["query"]["intrinsics"],
        },
    }
    rgb = render_path(variables, fb, state, jnp.asarray(path), n_rays)
    return np.asarray(rgb).reshape(n_frames, dim, dim, 3)
