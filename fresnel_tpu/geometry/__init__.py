from fresnel_tpu.geometry.saag import (
    SurfaceGaussianParams,
    SilhouetteWrapParams,
    VolumetricShellParams,
    AdaptiveDensityParams,
    PointCloud,
    surface_info,
    pointcloud_from_depth,
    pointcloud_to_gaussians,
    to_surface_gaussians,
    quaternion_from_normal,
)

__all__ = [
    "SurfaceGaussianParams", "SilhouetteWrapParams", "VolumetricShellParams",
    "AdaptiveDensityParams", "PointCloud", "surface_info",
    "pointcloud_from_depth", "pointcloud_to_gaussians",
    "to_surface_gaussians", "quaternion_from_normal",
]
