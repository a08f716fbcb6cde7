"""Renderer factory — mirrors the reference's training renderer selection
logic (reference: scripts/training/train_gaussian_decoder.py:1864-1907):

  hfgs.use_fourier_renderer      -> tiled renderer w/ phase blending (0.3)
  experiment 4 + phase_blending  -> fourier (spatial-parity mode)
  physics.use_wave_rendering     -> wave-field renderer
  otherwise                      -> tiled renderer (phase blending per config)

All renderers share one signature:
  render(positions, scales, rotations, colors, opacities, camera,
         phases=None, return_depth=False) -> (3, H, W) [, (H, W) depth]
"""

from __future__ import annotations

from typing import Callable, Optional

from fresnel_tpu.render.tile import TileRendererConfig, render_tiled
from fresnel_tpu.render.dense import render_dense
from fresnel_tpu.render.wave import render_wave_field
from fresnel_tpu.render.asm import render_asm_wave_field
from fresnel_tpu.render.fourier import render_fourier
from fresnel_tpu.render.simplified import render_simplified


def make_renderer(name: str, *, use_phase_blending: bool = False,
                  phase_amplitude: float = 0.25, max_per_tile: int = 256,
                  **kw) -> Callable:
    """Build a renderer callable by name: tile | dense | wave | asm |
    fourier | fourier_true | simplified."""
    name = name.lower()

    if name == "tile":
        import os
        cfg = TileRendererConfig(
            use_phase_blending=use_phase_blending,
            phase_amplitude=phase_amplitude,
            max_per_tile=max_per_tile,
            backend=os.environ.get("FRESNEL_RENDER_BACKEND", "auto"))

        def render(p, s, r, c, o, cam, phases=None, return_depth=False,
                   return_overflow=False):
            return render_tiled(p, s, r, c, o, cam, phases=phases,
                                return_depth=return_depth,
                                return_overflow=return_overflow, config=cfg)
        # Capacity telemetry is a tile-binning concept; callers (the train
        # harness) probe this marker before requesting it.
        render.supports_overflow = True
        return render

    if name == "dense":
        def render(p, s, r, c, o, cam, phases=None, return_depth=False):
            return render_dense(p, s, r, c, o, cam, return_depth=return_depth)
        return render

    if name == "wave":
        def render(p, s, r, c, o, cam, phases=None, return_depth=False):
            if phases is None:
                raise ValueError("wave renderer requires phases")
            return render_wave_field(p, s, r, c, o, cam, phases,
                                     return_depth=return_depth)
        return render

    if name == "asm":
        def render(p, s, r, c, o, cam, phases=None, return_depth=False):
            if phases is None:
                raise ValueError("asm renderer requires phases")
            return render_asm_wave_field(p, s, r, c, o, cam, phases,
                                         return_depth=return_depth, **kw)
        return render

    if name in ("fourier", "fourier_true"):
        mode = "fourier" if name == "fourier_true" else "spatial"

        def render(p, s, r, c, o, cam, phases=None, return_depth=False):
            return render_fourier(p, s, r, c, o, cam, phases=phases,
                                  return_depth=return_depth, mode=mode, **kw)
        return render

    if name == "simplified":
        def render(p, s, r, c, o, cam, phases=None, return_depth=False):
            return render_simplified(p, s, r, c, o, cam,
                                     return_depth=return_depth)
        return render

    raise ValueError(f"unknown renderer: {name}")


def select_training_renderer(config, physics_config, hfgs_config) -> Callable:
    """Reference renderer-selection logic over the config triple."""
    mpt = getattr(config, "max_per_tile", 256)
    if hfgs_config is not None and hfgs_config.use_fourier_renderer:
        return make_renderer("tile", use_phase_blending=True,
                             phase_amplitude=0.3, max_per_tile=mpt)
    if config.experiment == 4 and config.use_phase_blending:
        return make_renderer("fourier")
    if physics_config is not None and physics_config.use_wave_rendering:
        return make_renderer("wave")
    return make_renderer("tile", use_phase_blending=config.use_phase_blending,
                         phase_amplitude=config.phase_amplitude,
                         max_per_tile=mpt)
