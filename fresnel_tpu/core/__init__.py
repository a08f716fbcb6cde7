from fresnel_tpu.core.gaussians import (
    GaussianCloud,
    quaternion_to_rotation_matrix,
    rotation_6d_to_quaternion,
)
from fresnel_tpu.core.camera import Camera

__all__ = [
    "GaussianCloud",
    "Camera",
    "quaternion_to_rotation_matrix",
    "rotation_6d_to_quaternion",
]
