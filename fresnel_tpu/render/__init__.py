from fresnel_tpu.render.projection import (
    GaussianProjection,
    project_gaussians,
    compute_2d_covariance,
    effective_radius,
)
from fresnel_tpu.render.dense import render_dense
from fresnel_tpu.render.tile import render_tiled, TileRendererConfig

__all__ = [
    "GaussianProjection",
    "project_gaussians",
    "compute_2d_covariance",
    "effective_radius",
    "render_dense",
    "render_tiled",
    "TileRendererConfig",
]
