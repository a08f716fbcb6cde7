"""Tracing / profiling utilities.

The reference's observability is std::chrono phase timers in the renderer
and wall-clock epoch prints (SURVEY.md §5.1).  TPU equivalents here:
  * RenderStats — the Stats-struct idea (project/sort+bin/composite/total ms
    + counts) measured by running the renderer stages as separate jitted
    programs (the fused production path has no internal boundaries to time);
  * trace() — context manager around jax.profiler for TensorBoard traces;
  * StepTimer — EMA step timing for training loops.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RenderStats:
    project_ms: float = 0.0
    bin_ms: float = 0.0
    composite_ms: float = 0.0
    total_ms: float = 0.0
    num_gaussians: int = 0
    num_visible: int = 0
    num_tiles: int = 0
    # Capacity telemetry: (gaussian, tile) pairs dropped by the static
    # max_per_tile cap, tiles over cap, and the largest tile's hit count.
    dropped_pairs: int = 0
    total_pairs: int = 0
    overflow_tiles: int = 0
    max_tile_hits: int = 0

    def __str__(self):
        return (f"render: {self.total_ms:.2f} ms "
                f"(project {self.project_ms:.2f} | bin {self.bin_ms:.2f} | "
                f"composite {self.composite_ms:.2f}) "
                f"{self.num_visible}/{self.num_gaussians} gaussians, "
                f"{self.num_tiles} tiles, "
                f"overflow {self.dropped_pairs}/{self.total_pairs} pairs "
                f"({self.overflow_tiles} tiles over cap, "
                f"max {self.max_tile_hits}/tile)")


def render_with_stats(positions, scales, rotations, colors, opacities,
                      camera, config=None) -> tuple:
    """Stage-timed render: returns (image, RenderStats).

    Runs projection / binning / compositing as separate jitted programs to
    attribute time per phase (the production render_tiled fuses them; use
    this for diagnostics only).
    """
    import dataclasses as dc

    from fresnel_tpu.render.tile import (
        TileRendererConfig, _bin_gaussians, render_tiled)
    from fresnel_tpu.render.projection import (
        depth_sort_indices, project_gaussians)

    cfg = config or TileRendererConfig()
    stats = RenderStats(num_gaussians=positions.shape[0])
    ts = cfg.tile_size
    ntx = -(-camera.width // ts)
    nty = -(-camera.height // ts)
    stats.num_tiles = ntx * nty

    t0 = time.perf_counter()
    proj = jax.jit(lambda p, s, r: project_gaussians(
        p, s, r, camera,
        max_radius=min(cfg.max_radius, (cfg.tile_window // 2) * ts)))(
            positions, scales, rotations)
    visible = proj.visible & (opacities > 0)
    order = depth_sort_indices(dc.replace(proj, visible=visible))
    jax.block_until_ready(order)
    stats.project_ms = (time.perf_counter() - t0) * 1000
    stats.num_visible = int(jnp.sum(visible))

    t0 = time.perf_counter()
    m_cap = min(cfg.max_per_tile, positions.shape[0])
    m_cap = -(-m_cap // cfg.chunk) * cfg.chunk
    tbl = jax.jit(lambda m, r, v: _bin_gaussians(
        m, r, v, ntx, nty, ts, m_cap, cfg.tile_window))(
            proj.means2d[order], proj.radii[order], visible[order])
    jax.block_until_ready(tbl)
    stats.bin_ms = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    img, ovf = render_tiled(positions, scales, rotations, colors, opacities,
                            camera, config=cfg, return_overflow=True)
    img.block_until_ready()
    stats.composite_ms = (time.perf_counter() - t0) * 1000
    stats.total_ms = stats.project_ms + stats.bin_ms + stats.composite_ms
    ovf = [int(x) for x in ovf]
    stats.dropped_pairs, stats.total_pairs = ovf[0], ovf[1]
    stats.overflow_tiles, stats.max_tile_hits = ovf[2], ovf[3]
    return img, stats


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fresnel_trace"):
    """jax.profiler trace for TensorBoard (`tensorboard --logdir ...`)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timing + throughput for training loops."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.ema_s: Optional[float] = None
        self._t0: Optional[float] = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema_s = (dt if self.ema_s is None
                      else self.momentum * self.ema_s + (1 - self.momentum) * dt)
        return dt

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.ema_s if self.ema_s else 0.0
