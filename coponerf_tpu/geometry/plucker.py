"""Plucker-line utilities: ray embedding and closest-point line intersection.

Parity targets: utils_training/geometry.py:236-245 (plucker_embedding),
:132-162 (get_intersection), :87-129 (get_3d_point_epipolar with its
parallel/equivalent degeneracy flags and NaN scrubbing).

The reference promotes the intersection to float64 (geometry.py:114-116).
TPUs have no fast f64; we instead keep the computation in f32 on normalized
line coordinates (directions from plucker_embedding are already unit length,
which is what conditions the |l1 x l2|^2 denominator) and preserve the exact
NaN-scrub semantics.  Tests check agreement with an f64 oracle to ~1e-3,
which is far below the half-pixel scale the sampled features resolve.
"""

from __future__ import annotations

import jax.numpy as jnp

from coponerf_tpu.geometry import cameras


def plucker_embedding(cam2world: jnp.ndarray, uv: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Plucker coordinates (direction, moment) of pixel rays.

    cam2world: (B, 4, 4); uv: (B, N, 2) pixel coords; intrinsics: (B, 4, 4)
    -> (B, N, 6).
    """
    ray_dirs = cameras.get_ray_directions(uv, cam2world=cam2world, intrinsics=intrinsics)
    cam_pos = cameras.get_ray_origin(cam2world)
    cam_pos = jnp.broadcast_to(cam_pos[..., None, :], ray_dirs.shape)
    moment = jnp.cross(cam_pos, ray_dirs)
    return jnp.concatenate((ray_dirs, moment), axis=-1)


def plucker_line_intersection(line_1: jnp.ndarray, line_2: jnp.ndarray):
    """Closest points (p1 on line_1, p2 on line_2) between two Plucker lines.

    Both inputs broadcast to a common shape (..., 6).
    """
    line_1 = jnp.broadcast_to(line_1, line_2.shape)
    l1, m1 = line_1[..., :3], line_1[..., 3:]
    l2, m2 = line_2[..., :3], line_2[..., 3:]

    l1_cross_l2 = jnp.cross(l1, l2)
    cross_sq = jnp.sum(l1_cross_l2 * l1_cross_l2, axis=-1, keepdims=True) + 1e-12

    l2_cross_l1_cross_l2 = jnp.cross(l2, l1_cross_l2)
    term_a = -jnp.cross(m1, l2_cross_l1_cross_l2)
    term_b = jnp.sum(m2 * l1_cross_l2, axis=-1, keepdims=True) * l1
    p1 = (term_a + term_b) / cross_sq

    l1_cross_l1_cross_l2 = jnp.cross(l1, l1_cross_l2)
    term_c = jnp.cross(m2, l1_cross_l1_cross_l2)
    term_d = jnp.sum(m1 * l1_cross_l2, axis=-1, keepdims=True) * l2
    p2 = (term_c - term_d) / cross_sq

    return p1, p2


def get_3d_point_epipolar(
    query_ray: jnp.ndarray,
    pixel_val: jnp.ndarray,
    context_cam2world: jnp.ndarray,
    H: int,
    W: int,
    intrinsics: jnp.ndarray,
):
    """3D point on the query ray nearest to each epipolar-sample pixel ray.

    query_ray: (B, N, 6) Plucker; pixel_val: (B, N, S, 2) in [-1, 1];
    context_cam2world: (B, 4, 4); intrinsics: (B, 4, 4).
    Returns (p1 (B,N,S,3), dist (B,N,S,1), parallel (B,N,S), equivalent (B,N,S)).
    """
    b, n_qry = query_ray.shape[:2]
    n_pts = pixel_val.shape[-2]
    pixel_x = (pixel_val[..., 0:1] + 1) / 2 * (W - 1)
    pixel_y = (pixel_val[..., 1:2] + 1) / 2 * (H - 1)
    pixel_coord = jnp.concatenate((pixel_x, pixel_y), axis=-1).reshape(b, n_qry * n_pts, 2)

    context_plucker = plucker_embedding(context_cam2world, pixel_coord, intrinsics)
    context_plucker = context_plucker.reshape(b, n_qry, n_pts, 6)

    line_1 = query_ray[..., None, :]
    p1, p2 = plucker_line_intersection(line_1, context_plucker)

    l1 = jnp.broadcast_to(line_1, context_plucker.shape)[..., :3]
    l2 = context_plucker[..., :3]
    parallel = jnp.linalg.norm(jnp.cross(l1, l2), axis=-1) < 1e-12

    u1 = cameras.normalize(jnp.broadcast_to(line_1, context_plucker.shape))
    u2 = cameras.normalize(context_plucker)
    equivalent = jnp.abs(1.0 - jnp.sum(u1 * u2, axis=-1)) < 1e-12

    dist = jnp.linalg.norm(p2 - p1, axis=-1)[..., None]
    p1 = jnp.nan_to_num(p1, nan=0.0, posinf=0.0, neginf=0.0)
    return p1, dist, parallel, equivalent
