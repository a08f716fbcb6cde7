from fresnel_tpu.utils.profiling import RenderStats, render_with_stats, trace, StepTimer
from fresnel_tpu.utils.image import (
    depth_colormap, normalize_depth, save_ppm, load_ppm, save_png, resize)
from fresnel_tpu.utils.vlm_guidance import VLMGuidance, density_to_weight_map

__all__ = [
    "RenderStats", "render_with_stats", "trace", "StepTimer",
    "depth_colormap", "normalize_depth", "save_ppm", "load_ppm", "save_png",
    "resize", "VLMGuidance", "density_to_weight_map",
]
