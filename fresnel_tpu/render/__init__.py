from fresnel_tpu.render.projection import (
    GaussianProjection,
    project_gaussians,
    compute_2d_covariance,
    effective_radius,
)
from fresnel_tpu.render.dense import render_dense
from fresnel_tpu.render.tile import render_tiled, TileRendererConfig
from fresnel_tpu.render.wave import render_wave_field
from fresnel_tpu.render.asm import AngularSpectrumPropagator, render_asm_wave_field
from fresnel_tpu.render.fourier import render_fourier
from fresnel_tpu.render.simplified import render_simplified
from fresnel_tpu.render.factory import make_renderer, select_training_renderer

__all__ = [
    "GaussianProjection",
    "project_gaussians",
    "compute_2d_covariance",
    "effective_radius",
    "render_dense",
    "render_tiled",
    "TileRendererConfig",
    "render_wave_field",
    "AngularSpectrumPropagator",
    "render_asm_wave_field",
    "render_fourier",
    "render_simplified",
    "make_renderer",
    "select_training_renderer",
]
