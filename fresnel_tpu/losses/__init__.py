from fresnel_tpu.losses.ssim import ssim, ssim_loss, ms_ssim
from fresnel_tpu.losses.physics import (
    phase_retrieval_loss,
    frequency_domain_loss,
    wave_equation_loss,
    normalized_depth_l1,
    constrain_learnable_wavelengths,
    init_learnable_wavelengths,
)
from fresnel_tpu.losses.aggregate import compute_losses
from fresnel_tpu.losses.lpips import LPIPS, load_lpips, random_lpips

__all__ = [
    "ssim", "ssim_loss", "ms_ssim",
    "phase_retrieval_loss", "frequency_domain_loss", "wave_equation_loss",
    "normalized_depth_l1", "constrain_learnable_wavelengths",
    "init_learnable_wavelengths", "compute_losses",
    "LPIPS", "load_lpips", "random_lpips",
]
