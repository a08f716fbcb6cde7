"""Loss aggregation for decoder training — one fused, jit-friendly function.

Mirrors the reference aggregator's terms and weights (reference:
scripts/training/train_gaussian_decoder.py:838-1003):
  L1 RGB (optionally VLM-density weighted) + SSIM (1 − ssim) + LPIPS +
  normalized depth L1 + residual regularization + Fresnel boundary emphasis +
  Helmholtz wave-equation + HFGS phase-retrieval + frequency-domain.

Differences by design: every term is computed unconditionally at trace time
when its static config flag is on (no Python exception guards inside jit —
the FFT terms are total functions here), and the returned loss_dict holds
traced scalars, not floats.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.losses.ssim import ssim
from fresnel_tpu.losses.physics import (
    constrain_learnable_wavelengths,
    frequency_domain_loss,
    normalized_depth_l1,
    phase_retrieval_loss,
    wave_equation_loss,
)
from fresnel_tpu.physics.fresnel_zones import FresnelZones
from fresnel_tpu.train.config import HFGSConfig, PhysicsConfig, TrainingConfig


def compute_losses(
    rendered: jax.Array,                       # (B, 3, H, W)
    target: jax.Array,                         # (B, 3, H, W)
    rendered_depth: Optional[jax.Array] = None,   # (B, H, W)
    target_depth: Optional[jax.Array] = None,     # (B, H, W)
    residuals: Optional[Dict[str, jax.Array]] = None,
    config: TrainingConfig = None,
    lpips_fn=None,                             # callable(params, a, b) -> (B,)
    lpips_params=None,
    vlm_density: Optional[jax.Array] = None,   # (B, 1, H, W)
    physics_config: Optional[PhysicsConfig] = None,
    hfgs_config: Optional[HFGSConfig] = None,
    learnable_wavelengths_raw: Optional[jax.Array] = None,  # raw (3,)
    fresnel_zones: Optional[FresnelZones] = None,
    boundary_emphasis: Optional[jax.Array] = None,  # (num_zones + 1,)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    config = config or TrainingConfig()
    loss_dict: Dict[str, jax.Array] = {}

    # RGB L1 (optionally VLM-weighted).
    if vlm_density is not None and config.use_vlm_guidance and config.vlm_weight > 0:
        pixel_loss = jnp.abs(rendered - target)
        dens = jax.lax.stop_gradient(vlm_density)
        if dens.shape[-2:] != rendered.shape[-2:]:
            dens = jax.image.resize(
                dens, dens.shape[:2] + rendered.shape[-2:], method="linear")
        weight = (1.0 - config.vlm_weight) + config.vlm_weight * dens
        rgb_loss = jnp.mean(pixel_loss * weight)
    else:
        rgb_loss = jnp.mean(jnp.abs(rendered - target))
    loss_dict["rgb"] = rgb_loss
    total = config.rgb_weight * rgb_loss

    rendered_c = jnp.clip(rendered, 0.0, 1.0)

    if config.ssim_weight > 0:
        ssim_l = 1.0 - ssim(rendered_c, target, data_range=1.0)
        loss_dict["ssim"] = ssim_l
        total = total + config.ssim_weight * ssim_l

    if lpips_fn is not None and config.lpips_weight > 0:
        # Downscale to 128 px and map to [-1, 1] like the reference.
        B = rendered_c.shape[0]
        r128 = jax.image.resize(rendered_c, (B, 3, 128, 128), "linear") * 2 - 1
        t128 = jax.image.resize(target, (B, 3, 128, 128), "linear") * 2 - 1
        lp = jnp.mean(lpips_fn(lpips_params, r128, t128))
        loss_dict["lpips"] = lp
        total = total + config.lpips_weight * lp

    if rendered_depth is not None and target_depth is not None and config.depth_weight > 0:
        d_l = normalized_depth_l1(rendered_depth, target_depth)
        loss_dict["depth"] = d_l
        total = total + config.depth_weight * d_l

    if residuals is not None:
        reg = 0.0
        for key in ["pos_delta", "scale_delta", "color_delta", "opacity_delta"]:
            if key in residuals:
                reg = reg + jnp.mean(jnp.abs(residuals[key]))
        loss_dict["residual"] = reg
        total = total + config.residual_weight * reg

    if (fresnel_zones is not None and config.boundary_weight > 0
            and target_depth is not None):
        bm = fresnel_zones.boundary_mask(
            target_depth, emphasis=boundary_emphasis)            # (B, H, W)
        pixel_loss = jnp.mean(jnp.abs(rendered - target), axis=1)
        b_l = jnp.mean(pixel_loss * bm)
        loss_dict["boundary"] = b_l
        total = total + config.boundary_weight * b_l

    if physics_config is not None and physics_config.wave_equation_weight > 0:
        w_l = wave_equation_loss(rendered, physics_config.wavelength,
                                 pixel_spacing=1.0 / config.image_size)
        loss_dict["wave_eq"] = w_l
        total = total + physics_config.wave_equation_weight * w_l

    if hfgs_config is not None:
        wavelength = hfgs_config.wavelength_g
        if learnable_wavelengths_raw is not None:
            wavelength = constrain_learnable_wavelengths(
                learnable_wavelengths_raw)[1]  # green reference channel
        if hfgs_config.use_phase_retrieval_loss and target_depth is not None:
            pr = phase_retrieval_loss(
                rendered, target, target_depth, wavelength=wavelength,
                focal_depth=hfgs_config.focal_depth)
            loss_dict["phase_retrieval"] = pr
            total = total + hfgs_config.phase_retrieval_weight * pr
        if hfgs_config.use_frequency_loss:
            fq = frequency_domain_loss(
                rendered, target, cutoff=hfgs_config.frequency_cutoff,
                high_weight=hfgs_config.high_freq_weight)
            loss_dict["frequency"] = fq
            total = total + hfgs_config.frequency_loss_weight * fq

    loss_dict["total"] = total
    return total, loss_dict
