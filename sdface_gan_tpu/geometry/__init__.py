from .cameras import CameraParams, generate_camera_params, camera_extrinsics_from_angles
from .rays import (
    Rays,
    get_rays,
    sample_depths,
    stratified_depths,
    points_along_rays,
    z_normalize_points,
    base_t_vals,
)

__all__ = [
    "CameraParams",
    "generate_camera_params",
    "camera_extrinsics_from_angles",
    "Rays",
    "get_rays",
    "sample_depths",
    "stratified_depths",
    "points_along_rays",
    "z_normalize_points",
    "base_t_vals",
]
