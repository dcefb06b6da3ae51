"""Epipolar segment computation: project query rays into a context camera and
clip the projected ray to the image frame.

Parity target: models/epipolar.py:74-253.  The reference's boolean-mask
scatter combine (epipolar.py:241-251) is rewritten as nested ``jnp.where`` so
the whole routine is shape-static and jit/vmap-friendly; the four
(min_valid, max_valid) cases are mutually exclusive per ray, so the where
chain is mathematically identical to the reference's in-place case loop.

All coordinates are in the 0-1 normalized image plane (intrinsics must be
pre-normalized by image size, as the caller does in models/CoPoNeRF.py:259-261).
"""

from __future__ import annotations

import jax.numpy as jnp

from coponerf_tpu.geometry.cameras import to_homogeneous


def _project_normalized(points: jnp.ndarray, intrinsics: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """K @ (p / z) -> xy, for (camera, ray, 3) points and (camera, 3, 3) K."""
    points = points / (points[..., -1:] + epsilon)
    points = jnp.einsum("cij,crj->cri", intrinsics, points)
    return points[..., :2]


def _is_in_bounds(xy: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return jnp.all(xy >= -epsilon, axis=-1) & jnp.all(xy <= 1 + epsilon, axis=-1)


def _is_in_front(xyz: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    return xyz[..., -1] > -epsilon


def _intersect_image_coordinate(intrinsics, origins, directions, dim: int, coordinate_value: float):
    """Intersection of a ray's image-plane projection with the border line
    {x = v} (dim=0) or {y = v} (dim=1).  Infinite t from parallel rays is
    fine and intentionally unguarded, as in the reference."""
    other = 1 - dim
    K = intrinsics[:, None]
    fs = K[..., dim, dim]
    fo = K[..., other, other]
    cs = K[..., dim, 2]
    co = K[..., other, 2]
    os_ = origins[..., dim]
    oo = origins[..., other]
    ds = directions[..., dim]
    do = directions[..., other]
    oz = origins[..., 2]
    dz = directions[..., 2]
    c = (coordinate_value - cs) / fs

    t = (c * oz - os_) / (ds - c * dz)

    coord_num = fo * (oo * (c * dz - ds) + do * (os_ - c * oz))
    coord_den = dz * os_ - ds * oz
    coord_other = co + coord_num / coord_den
    coord_same = jnp.full_like(coord_other, coordinate_value)
    if dim == 0:
        xy = jnp.stack([coord_same, coord_other], axis=-1)
    else:
        xy = jnp.stack([coord_other, coord_same], axis=-1)
    xyz = origins + t[..., None] * directions
    valid = _is_in_bounds(xy) & _is_in_front(xyz)
    return {"t": t, "xy": xy, "valid": valid}


def _compare_projections(intersections, reduction: str):
    t = jnp.stack([i["t"] for i in intersections], axis=0)
    xy = jnp.stack([i["xy"] for i in intersections], axis=0)
    valid = jnp.stack([i["valid"] for i in intersections], axis=0)

    lowest = jnp.inf if reduction == "min" else -jnp.inf
    t = jnp.where(valid, t, lowest)
    t = jnp.nan_to_num(t, nan=lowest)

    sel = jnp.argmin(t, axis=0) if reduction == "min" else jnp.argmax(t, axis=0)
    sel_e = sel[None]
    t_red = jnp.take_along_axis(t, sel_e, axis=0)[0]
    xy_red = jnp.take_along_axis(xy, sel_e[..., None], axis=0)[0]
    valid_red = jnp.take_along_axis(valid, sel_e, axis=0)[0]
    return {"t": t_red, "xy": xy_red, "valid": valid_red}


def _point_projection(xyz, t, intrinsics):
    xy = _project_normalized(xyz, intrinsics)
    return {"t": t, "xy": xy, "valid": _is_in_bounds(xy) & _is_in_front(xyz)}


def project_rays(origins, directions, extrinsics, intrinsics, epsilon: float = 1e-6):
    """Clip each world-space ray's projection to the image of each camera.

    origins/directions: (camera, ray, 3); extrinsics: (camera, 4, 4) cam2world;
    intrinsics: (camera, 3or4, 3or4) normalized to a 0-1 image.

    Returns dict with t_min/t_max (camera, ray), xy_min/xy_max
    (camera, ray, 2) in 0-1 coords, overlaps_image (camera, ray) bool.
    """
    intrinsics = intrinsics[..., :3, :3]

    world_to_cam = jnp.linalg.inv(extrinsics)
    o = jnp.einsum("cij,crj->cri", world_to_cam, to_homogeneous(origins))[..., :3]
    d_h = jnp.concatenate([directions, jnp.zeros_like(directions[..., :1])], axis=-1)
    d = jnp.einsum("cij,crj->cri", world_to_cam, d_h)[..., :3]

    frame = (
        _intersect_image_coordinate(intrinsics, o, d, 0, 0.0),
        _intersect_image_coordinate(intrinsics, o, d, 0, 1.0),
        _intersect_image_coordinate(intrinsics, o, d, 1, 0.0),
        _intersect_image_coordinate(intrinsics, o, d, 1, 1.0),
    )
    frame_min = _compare_projections(frame, "min")
    frame_max = _compare_projections(frame, "max")

    # Projection at zero depth: if the origin sits at the camera, project the
    # direction instead; if it merely lies on the z=0 plane, mark invalid.
    mask_depth_zero = o[..., -1] < epsilon
    mask_at_camera = jnp.linalg.norm(o, axis=-1) < epsilon
    origins_for_projection = jnp.where(mask_at_camera[..., None], d, o)
    projection_at_zero = _point_projection(
        origins_for_projection, jnp.zeros_like(frame_min["t"]), intrinsics
    )
    zero_valid = projection_at_zero["valid"] & ~(mask_depth_zero & ~mask_at_camera)

    # Projection at infinite depth == projecting the direction vector.
    projection_at_infinity = _point_projection(
        d, jnp.full_like(frame_min["t"], jnp.inf), intrinsics
    )
    inf_valid = projection_at_infinity["valid"]

    def pick(cond, a, b):
        return jnp.where(cond, a, b)

    t_min = pick(zero_valid, projection_at_zero["t"], frame_min["t"])
    xy_min = pick(zero_valid[..., None], projection_at_zero["xy"], frame_min["xy"])
    v_min = pick(zero_valid, zero_valid, frame_min["valid"])

    t_max = pick(inf_valid, projection_at_infinity["t"], frame_max["t"])
    xy_max = pick(inf_valid[..., None], projection_at_infinity["xy"], frame_max["xy"])
    v_max = pick(inf_valid, inf_valid, frame_max["valid"])

    return {
        "t_min": t_min,
        "t_max": t_max,
        "xy_min": xy_min,
        "xy_max": xy_max,
        "overlaps_image": v_min & v_max,
    }
