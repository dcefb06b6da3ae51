from coponerf_tpu.geometry.cameras import (
    get_ray_origin,
    parse_intrinsics,
    lift,
    project,
    project_cam2world,
    world_from_xy_depth,
    get_ray_directions,
    get_ray_directions_cam,
    pose_inverse_4x4,
    encode_relative_point,
    r6d2mat,
    to_homogeneous,
    from_homogeneous,
    batch_project_to_other_img,
    geodesic_rotation_distance,
)
from coponerf_tpu.geometry.plucker import (
    plucker_embedding,
    plucker_line_intersection,
    get_3d_point_epipolar,
)
from coponerf_tpu.geometry.epipolar import project_rays
