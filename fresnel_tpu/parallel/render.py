"""Multi-device rendering (SURVEY.md §2.6 consequences b/c).

Three sharded render paths, all demonstrated over a jax.sharding.Mesh:
  * render_batch_sharded — one image per device: the batch axis of the
    Gaussian arrays is sharded over "data"; rendering is embarrassingly
    parallel (no collectives).
  * render_gaussian_sharded — a single huge cloud sharded along the GAUSSIAN
    axis.  Tile compositing is order-dependent, but the over-operator is
    ASSOCIATIVE on (premultiplied color, transmittance) pairs:
        (c1, T1) ⊕ (c2, T2) = (c1 + T1·c2, T1·T2)
    so each device composites its depth-contiguous shard locally and shards
    are combined front-to-back — an O(log D) tree combine expressed here as
    an all_gather of per-shard (color, T) partials plus the tiny sequential
    fold.  The caller must pass the cloud pre-sorted by depth so shards are
    depth-contiguous.
  * render_pixel_sharded — one image, PIXEL space sharded: each device gets a
    horizontal band of tile rows and the full (replicated) cloud, culls to
    its band, and renders it; the result is already sharded along H (the
    sequence-parallel analogue for rendering — no collectives on the hot
    path, ideal when N_pixels >> N_gaussians).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.render.tile import TileRendererConfig, render_tiled


def render_batch_sharded(positions, scales, rotations, colors, opacities,
                         camera: Camera, mesh: Mesh,
                         config: TileRendererConfig = TileRendererConfig()):
    """(B, N, ...) Gaussian batches -> (B, 3, H, W), batch sharded on "data"."""
    def one_shard(p, s, r, c, o):
        return jax.vmap(
            lambda pp, ss, rr, cc, oo: render_tiled(
                pp, ss, rr, cc, oo, camera, config=config)
        )(p, s, r, c, o)

    f = shard_map(one_shard, mesh=mesh, in_specs=(P("data"),) * 5,
                  out_specs=P("data"), check_vma=False)
    return jax.jit(f)(positions, scales, rotations, colors, opacities)


def render_gaussian_sharded(positions, scales, rotations, colors, opacities,
                            camera: Camera, mesh: Mesh,
                            config: TileRendererConfig = TileRendererConfig(),
                            background: Tuple[float, float, float] = (0, 0, 0)):
    """One cloud, Gaussian axis sharded over "data"; cloud must be pre-sorted
    front-to-back so each shard is a depth-contiguous slab."""
    n_dev = mesh.devices.size

    def one_shard(p, s, r, c, o):
        # Local compositing of this depth-slab against a black background;
        # the compositor's own residual transmittance comes out alongside
        # (one render per shard — no bg=1 re-render needed).
        img, T = render_tiled(p, s, r, c, o, camera,
                              background=(0.0, 0.0, 0.0),
                              return_transmittance=True, config=config)
        T = jnp.broadcast_to(T[None], (3,) + T.shape)  # (3, H, W)
        return jnp.stack([img, T])[None]               # (1, 2, 3, H, W)

    f = shard_map(one_shard, mesh=mesh, in_specs=(P("data"),) * 5,
                  out_specs=P("data"), check_vma=False)
    parts = jax.jit(f)(positions, scales, rotations, colors, opacities)
    # parts: (D, 2, 3, H, W) — one (color, T) partial per depth slab.

    # Sequential front-to-back fold over the D slab partials (D is small).
    color = parts[0, 0]
    T = parts[0, 1]
    for d in range(1, n_dev):
        color = color + T * parts[d, 0]
        T = T * parts[d, 1]
    bg = jnp.asarray(background, jnp.float32)
    return jnp.clip(color + T * bg[:, None, None], 0.0, 1.0)


def render_pixel_sharded(positions, scales, rotations, colors, opacities,
                         camera: Camera, mesh: Mesh,
                         config: TileRendererConfig = TileRendererConfig(),
                         background: Tuple[float, float, float] = (0, 0, 0)):
    """One cloud replicated everywhere; IMAGE rows sharded over "data".

    Each device renders a horizontal band by shifting the principal point
    cy by its band offset (axis_index * band_h) — the band camera sees
    exactly its rows of the full image.  Output stays sharded along H; no
    collectives on the render path.
    """
    n_dev = mesh.devices.size
    if camera.height % n_dev:
        raise ValueError(
            f"height {camera.height} not divisible by {n_dev} devices")
    band_h = camera.height // n_dev

    def one_band(p, s, r, c, o):
        row0 = jax.lax.axis_index("data").astype(jnp.float32) * band_h
        band_cam = dataclasses.replace(
            camera, cy=camera.cy - row0, height=band_h)
        img = render_tiled(p, s, r, c, o, band_cam, background=background,
                           config=config)                  # (3, band_h, W)
        return img[None]                                   # (1, 3, band_h, W)

    f = shard_map(one_band, mesh=mesh, in_specs=(P(),) * 5,
                  out_specs=P("data"), check_vma=False)
    bands = jax.jit(f)(positions, scales, rotations, colors, opacities)
    # bands: (D, 3, band_h, W) sharded on the leading axis -> (3, H, W).
    return jnp.concatenate([bands[d] for d in range(n_dev)], axis=1)
