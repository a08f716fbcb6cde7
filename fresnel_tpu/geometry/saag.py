"""SAAG geometry: depth -> point cloud -> surface-aligned anisotropic
Gaussians with silhouette wrapping, volumetric shell, and adaptive density.

This is the TPU rebuild of the reference's flagship C++ algorithmic pipeline
(reference: src/core/pointcloud.cpp:8-431, src/core/image.cpp:157-230).  The
per-point C++ loops become fully vectorized jnp over the whole pixel grid —
one jit-able program — with TPU-native STATIC shapes: every augmentation
stage (shell back / walls / wrap layers / density fill) emits a fixed-size
block whose inactive entries are masked to zero opacity, instead of the
reference's data-dependent emission.

Semantics parity checklist:
  * unprojection with normalized INVERTED depth (z = (1-normalized)*scale),
    Y-flip, camera at origin looking down -Z; confidence = normalized depth
    (pointcloud.cpp:8-76);
  * surface info: Sobel/8 gradients, normal = normalize(-gx*s, -gy*s, 1),
    3x3 depth delta & variance (image.cpp:157-230);
  * SAAG discs: quaternion_from_normal, slerp by normal_strength, aspect
    ratio thinning, edge shrink above edge_threshold, opacity *
    confidence * (0.7 + 0.3*edge_factor) (pointcloud.cpp:206-261);
  * volumetric shell: view-aligned back offset, darkened back color,
    gradient-tangent side walls (pointcloud.cpp:263-343);
  * silhouette wrap: wrap dir = cross(normal, grad3d) flipped away from
    camera, layered with geometric opacity falloff (pointcloud.cpp:345-394);
  * adaptive density: deterministic integer-hash jitter (identical hash
    constants) (pointcloud.cpp:192-197, 396-427).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.core.gaussians import GaussianCloud


# ----------------------------------------------------------------------
# Parameter structs (defaults mirror pointcloud.hpp:18-80)
# ----------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SurfaceGaussianParams:
    base_size: float = 0.008
    aspect_ratio: float = 5.0
    edge_threshold: float = 0.15
    edge_shrink: float = 0.3
    min_confidence: float = 0.1
    gradient_scale: float = 50.0
    normal_strength: float = 1.0


@dataclasses.dataclass(frozen=True)
class SilhouetteWrapParams:
    enabled: bool = True
    edge_threshold: float = 0.15
    wrap_layers: int = 3
    layer_spacing: float = 0.5
    opacity_falloff: float = 0.7
    max_wrap_angle: float = 75.0
    wrap_aspect: float = 2.0


@dataclasses.dataclass(frozen=True)
class VolumetricShellParams:
    enabled: bool = True
    thickness: float = 0.3
    back_opacity: float = 0.6
    back_darken: float = 0.8
    connect_walls: bool = True
    wall_segments: int = 3
    wall_opacity: float = 0.5
    edge_threshold: float = 0.1


@dataclasses.dataclass(frozen=True)
class AdaptiveDensityParams:
    enabled: bool = True
    gradient_threshold: float = 0.08
    extra_count: int = 4
    position_jitter: float = 0.6
    size_variance: float = 0.3
    opacity_scale: float = 0.7
    seed: int = 12345


# ----------------------------------------------------------------------
# Surface info (Sobel gradients -> normals)
# ----------------------------------------------------------------------

def surface_info(depth: jax.Array, gradient_scale: float = 50.0
                 ) -> Dict[str, jax.Array]:
    """(H, W) depth -> per-pixel surface info dict.

    Keys: normal (H,W,3), gradient_mag (H,W), gradient_dir (H,W,2),
    depth_delta (H,W), variance (H,W).
    """
    d = jnp.pad(depth, 1, mode="edge")

    def sh(dy, dx):  # 3x3 neighborhood shifts
        return d[1 + dy : 1 + dy + depth.shape[0],
                 1 + dx : 1 + dx + depth.shape[1]]

    d00, d10, d20 = sh(-1, -1), sh(-1, 0), sh(-1, 1)
    d01, d11, d21 = sh(0, -1), sh(0, 0), sh(0, 1)
    d02, d12, d22 = sh(1, -1), sh(1, 0), sh(1, 1)

    gx = (-d00 + d20 - 2 * d01 + 2 * d21 - d02 + d22) / 8.0
    gy = (-d00 - 2 * d10 - d20 + d02 + 2 * d12 + d22) / 8.0
    mag = jnp.sqrt(gx * gx + gy * gy)
    safe = jnp.maximum(mag, 1e-6)
    grad_dir = jnp.where(mag[..., None] > 1e-6,
                         jnp.stack([gx, gy], -1) / safe[..., None], 0.0)

    stack = jnp.stack([d00, d10, d20, d01, d11, d21, d02, d12, d22])
    depth_delta = jnp.max(stack, 0) - jnp.min(stack, 0)
    mean = jnp.mean(stack, 0)
    variance = jnp.mean((stack - mean) ** 2, 0) * 9.0 / 9.0

    n = jnp.stack([-gx * gradient_scale, -gy * gradient_scale,
                   jnp.ones_like(gx)], -1)
    n_len = jnp.linalg.norm(n, axis=-1, keepdims=True)
    normal = jnp.where(n_len > 1e-6, n / jnp.maximum(n_len, 1e-6),
                       jnp.array([0.0, 0.0, 1.0]))
    return {"normal": normal, "gradient_mag": mag, "gradient_dir": grad_dir,
            "depth_delta": depth_delta, "variance": variance}


# ----------------------------------------------------------------------
# Point cloud
# ----------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    positions: jax.Array    # (N, 3)
    colors: jax.Array       # (N, 3)
    confidence: jax.Array   # (N,)
    pixel_xy: jax.Array     # (N, 2) int32 source pixels
    valid: jax.Array        # (N,) bool

    @property
    def num_points(self) -> int:
        return self.positions.shape[0]

    def bounds(self):
        big = 1e9
        pos = jnp.where(self.valid[:, None], self.positions, jnp.array([big] * 3))
        lo = jnp.min(pos, axis=0)
        pos = jnp.where(self.valid[:, None], self.positions, jnp.array([-big] * 3))
        hi = jnp.max(pos, axis=0)
        return lo, hi

    def center(self) -> "PointCloud":
        lo, hi = self.bounds()
        mid = 0.5 * (lo + hi)
        return dataclasses.replace(self, positions=self.positions - mid)

    def normalize(self, target_extent: float = 3.0) -> "PointCloud":
        c = self.center()
        lo, hi = c.bounds()
        max_ext = jnp.max(hi - lo)
        s = jnp.where(max_ext > 1e-6, target_extent / jnp.maximum(max_ext, 1e-6), 1.0)
        return dataclasses.replace(c, positions=c.positions * s)


def pointcloud_from_depth(
    depth: jax.Array,                    # (H, W) raw depth
    color: Optional[jax.Array] = None,   # (H, W, 3)
    intrinsics: Tuple[float, float, float, float] = (500.0, 500.0, 0.0, 0.0),
    depth_scale: float = 1.0,
    subsample: int = 1,
) -> PointCloud:
    H, W = depth.shape
    fx, fy, cx, cy = intrinsics
    cx = cx if cx > 0 else W * 0.5
    cy = cy if cy > 0 else H * 0.5

    ys = jnp.arange(0, H, subsample)
    xs = jnp.arange(0, W, subsample)
    YY, XX = jnp.meshgrid(ys, xs, indexing="ij")
    d = depth[YY, XX]

    min_d, max_d = jnp.min(depth), jnp.max(depth)
    rng = jnp.where(max_d - min_d < 1e-6, 1.0, max_d - min_d)
    norm_d = (d - min_d) / rng
    z = (1.0 - norm_d) * depth_scale
    valid = z >= 0.01 * depth_scale

    X = (XX - cx) / fx * z
    Y = (cy - YY) / fy * z
    Z = -z
    positions = jnp.stack([X, Y, Z], -1).reshape(-1, 3)

    if color is not None:
        cols = color[jnp.minimum(YY, color.shape[0] - 1),
                     jnp.minimum(XX, color.shape[1] - 1)].reshape(-1, 3)
    else:
        cols = jnp.full((positions.shape[0], 3), 0.7)

    return PointCloud(
        positions=positions,
        colors=cols,
        confidence=norm_d.reshape(-1),
        pixel_xy=jnp.stack([XX, YY], -1).reshape(-1, 2).astype(jnp.int32),
        valid=valid.reshape(-1),
    )


def pointcloud_to_gaussians(pc: PointCloud, point_size: float = 0.01,
                            opacity: float = 0.8) -> GaussianCloud:
    """Legacy isotropic conversion (pointcloud.cpp:78-98)."""
    n = pc.num_points
    size = point_size * (0.5 + 0.5 * pc.confidence)
    rot = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    op = jnp.where(pc.valid, opacity * pc.confidence, 0.0)
    return GaussianCloud(
        positions=pc.positions,
        scales=jnp.broadcast_to(size[:, None], (n, 3)),
        rotations=rot,
        colors=pc.colors,
        opacities=op,
    )


# ----------------------------------------------------------------------
# Rotation helpers
# ----------------------------------------------------------------------

def quaternion_from_normal(normal: jax.Array) -> jax.Array:
    """Quaternion rotating +Z to `normal`, vectorized over leading dims."""
    up = jnp.array([0.0, 0.0, 1.0])
    axis = jnp.cross(jnp.broadcast_to(up, normal.shape), normal)
    dot = normal[..., 2]
    axis_len = jnp.linalg.norm(axis, axis=-1)

    angle = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    safe_axis = axis / jnp.maximum(axis_len, 1e-9)[..., None]
    half = 0.5 * angle
    q_general = jnp.concatenate(
        [jnp.cos(half)[..., None], safe_axis * jnp.sin(half)[..., None]], -1)

    # Degenerate: normal (anti)parallel to +Z.
    q_identity = jnp.zeros_like(q_general).at[..., 0].set(1.0)
    q_flip = jnp.zeros_like(q_general).at[..., 1].set(1.0)  # 180° about X
    degenerate = axis_len < 1e-6
    q_degen = jnp.where((dot > 0)[..., None], q_identity, q_flip)
    return jnp.where(degenerate[..., None], q_degen, q_general)


def slerp_from_identity(q: jax.Array, t: float) -> jax.Array:
    """slerp(identity, q, t) — scale the rotation angle by t."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    axis = q[..., 1:4] / jnp.maximum(sin_half, 1e-9)[..., None]
    half_t = 0.5 * t * angle
    q_t = jnp.concatenate(
        [jnp.cos(half_t)[..., None], axis * jnp.sin(half_t)[..., None]], -1)
    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where((sin_half < 1e-6)[..., None], identity, q_t)


def _pseudo_random(px: jax.Array, py: jax.Array, i, seed: int) -> jax.Array:
    """The reference's deterministic pixel hash (identical constants)."""
    x = px.astype(jnp.uint32)
    y = py.astype(jnp.uint32)
    ii = jnp.uint32(i)
    h = (x * jnp.uint32(374761393) + y * jnp.uint32(668265263)
         + ii * jnp.uint32(2147483647) + jnp.uint32(seed)) ^ jnp.uint32(0x85EBCA6B)
    h = ((h >> 16) ^ h) * jnp.uint32(0x7FEB352D)
    return (h & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0


# ----------------------------------------------------------------------
# The flagship: to_surface_gaussians
# ----------------------------------------------------------------------

def to_surface_gaussians(
    pc: PointCloud,
    depth: jax.Array,                       # (H, W) the SAME depth map
    params: SurfaceGaussianParams = SurfaceGaussianParams(),
    wrap_params: SilhouetteWrapParams = SilhouetteWrapParams(),
    shell_params: VolumetricShellParams = VolumetricShellParams(),
    density_params: AdaptiveDensityParams = AdaptiveDensityParams(),
    opacity: float = 0.8,
) -> GaussianCloud:
    """Static-shape SAAG cloud.  Output block layout (masked => opacity 0):
    [N base | N shell-back | N*segments walls | N*layers wrap |
     N*extra density]."""
    n = pc.num_points
    px, py = pc.pixel_xy[:, 0], pc.pixel_xy[:, 1]

    info = surface_info(depth, params.gradient_scale)
    normal = info["normal"][py, px]            # (N, 3)
    grad_mag = info["gradient_mag"][py, px]
    grad_dir = info["gradient_dir"][py, px]    # (N, 2)

    max_grad = jnp.maximum(jnp.max(
        jnp.where(pc.valid, grad_mag, 0.0)), 1e-6)
    norm_grad = grad_mag / max_grad

    active = pc.valid & (pc.confidence >= params.min_confidence)

    # --- base SAAG discs -------------------------------------------------
    surf_rot = quaternion_from_normal(normal)
    rotation = slerp_from_identity(surf_rot, params.normal_strength)

    base = params.base_size * (0.5 + 0.5 * pc.confidence)
    t_edge = jnp.clip((norm_grad - params.edge_threshold)
                      / jnp.maximum(1.0 - params.edge_threshold, 1e-6),
                      0.0, 1.0)
    edge_factor = jnp.where(norm_grad > params.edge_threshold,
                            1.0 - t_edge * (1.0 - params.edge_shrink), 1.0)
    tangent = base * edge_factor
    normal_sc = base / params.aspect_ratio * edge_factor
    scale = jnp.stack([tangent, tangent, normal_sc], -1)
    final_opacity = opacity * pc.confidence * (0.7 + 0.3 * edge_factor)
    final_opacity = jnp.where(active, final_opacity, 0.0)

    blocks = [(pc.positions, scale, rotation, pc.colors, final_opacity)]

    # Shared view frame (camera at origin).
    view_dir = pc.positions / jnp.maximum(
        jnp.linalg.norm(pc.positions, axis=-1, keepdims=True), 1e-9)
    world_up = jnp.array([0.0, 1.0, 0.0])
    right = jnp.cross(jnp.broadcast_to(world_up, view_dir.shape), view_dir)
    right_len = jnp.linalg.norm(right, axis=-1, keepdims=True)
    right = jnp.where(right_len > 1e-6, right / jnp.maximum(right_len, 1e-6),
                      jnp.array([1.0, 0.0, 0.0]))
    up = jnp.cross(view_dir, right)

    # --- volumetric shell ------------------------------------------------
    if shell_params.enabled:
        shell_active = active & (norm_grad > shell_params.edge_threshold)
        back_pos = pc.positions + view_dir * shell_params.thickness
        back_rot = quaternion_from_normal(view_dir)
        back_col = pc.colors * shell_params.back_darken
        back_op = jnp.where(shell_active,
                            final_opacity * shell_params.back_opacity, 0.0)
        blocks.append((back_pos, scale, back_rot, back_col, back_op))

        if shell_params.connect_walls:
            wall_tangent = (right * grad_dir[:, 0:1] + up * grad_dir[:, 1:2])
            wt_len = jnp.linalg.norm(wall_tangent, axis=-1)
            wall_ok = shell_active & (wt_len > 0.1)
            wall_tangent = wall_tangent / jnp.maximum(wt_len, 1e-9)[:, None]
            wall_normal = jnp.cross(view_dir, wall_tangent)
            wn_len = jnp.linalg.norm(wall_normal, axis=-1, keepdims=True)
            wall_normal = wall_normal / jnp.maximum(wn_len, 1e-9)
            wall_rot = quaternion_from_normal(wall_normal)
            wall_scale = scale * 0.9
            wall_op = jnp.where(wall_ok,
                                final_opacity * shell_params.wall_opacity, 0.0)
            for seg in range(1, shell_params.wall_segments + 1):
                t = seg / float(shell_params.wall_segments + 1)
                wall_pos = pc.positions * (1 - t) + back_pos * t
                blocks.append((wall_pos, wall_scale, wall_rot, pc.colors,
                               wall_op))

    # --- silhouette wrapping --------------------------------------------
    if wrap_params.enabled:
        gd_len = jnp.linalg.norm(grad_dir, axis=-1)
        wrap_ok = active & (norm_grad > wrap_params.edge_threshold) & (gd_len > 0.1)
        grad_3d = right * grad_dir[:, 0:1] + up * grad_dir[:, 1:2]
        wrap = jnp.cross(normal, grad_3d)
        # Flip to point away from camera (into the unseen side).
        flip = jnp.sum(wrap * view_dir, axis=-1, keepdims=True) < 0
        wrap = jnp.where(flip, -wrap, wrap)
        w_len = jnp.linalg.norm(wrap, axis=-1, keepdims=True)
        g3_len = jnp.linalg.norm(grad_3d, axis=-1, keepdims=True)
        wrap_dir = jnp.where(w_len > 1e-6, wrap / jnp.maximum(w_len, 1e-9),
                             grad_3d / jnp.maximum(g3_len, 1e-9))
        wrap_rot = quaternion_from_normal(-wrap_dir)
        wrap_base = base * 0.8
        wrap_scale = jnp.stack(
            [wrap_base, wrap_base, wrap_base / wrap_params.wrap_aspect], -1)
        for layer in range(wrap_params.wrap_layers):
            offset = jnp.asarray(
                (layer + 1) * wrap_params.layer_spacing * params.base_size)
            wrap_pos = pc.positions + wrap_dir * offset[..., None]
            wrap_op = jnp.where(
                wrap_ok,
                final_opacity * wrap_params.opacity_falloff ** (layer + 1),
                0.0)
            blocks.append((wrap_pos, wrap_scale, wrap_rot, pc.colors, wrap_op))

    # --- adaptive density ------------------------------------------------
    if density_params.enabled:
        dens_ok = active & (norm_grad > density_params.gradient_threshold)
        for i in range(density_params.extra_count):
            rx = (_pseudo_random(px, py, i * 3 + 0, density_params.seed) - 0.5) * 2
            ry = (_pseudo_random(px, py, i * 3 + 1, density_params.seed) - 0.5) * 2
            rz = (_pseudo_random(px, py, i * 3 + 2, density_params.seed) - 0.5) * 2
            jitter = density_params.position_jitter * base
            extra_pos = pc.positions + jnp.stack([rx, ry, rz], -1) * jitter[:, None]
            size_var = 1.0 + (_pseudo_random(px, py, i * 3 + 100,
                                             density_params.seed) - 0.5) \
                * density_params.size_variance * 2.0
            extra_scale = scale * size_var[:, None] * 0.8
            extra_op = jnp.where(dens_ok,
                                 final_opacity * density_params.opacity_scale,
                                 0.0)
            blocks.append((extra_pos, extra_scale, rotation, pc.colors, extra_op))

    positions = jnp.concatenate([b[0] for b in blocks], 0)
    scales = jnp.concatenate([b[1] for b in blocks], 0)
    rotations = jnp.concatenate([b[2] for b in blocks], 0)
    colors = jnp.concatenate([b[3] for b in blocks], 0)
    opacities = jnp.concatenate([b[4] for b in blocks], 0)
    return GaussianCloud(positions=positions, scales=scales,
                         rotations=rotations, colors=colors,
                         opacities=opacities)


# ----------------------------------------------------------------------
# Feature-guided SAAG (experiment 3 inference path)
# ----------------------------------------------------------------------

def modulated_surface_params(base: SurfaceGaussianParams, mods: Dict,
                             pixel_xy: jax.Array,
                             grid_hw: Tuple[int, int]):
    """Per-POINT SurfaceGaussianParams from FeatureGuidedSAAG's 37x37
    modulation maps (reference intent: gaussian_decoder_models.py:1422-1490 —
    the reference's training loop only ever applied the patch MEAN; this is
    the full spatial application).

    mods: dict of (gh, gw) maps (single sample, no batch dim).
    Returns a SurfaceGaussianParams whose fields are (N,) arrays — every
    consumer expression in to_surface_gaussians broadcasts elementwise.
    """
    gh, gw = mods["base_size_mult"].shape[-2:]
    H, W = grid_hw
    px = jnp.clip((pixel_xy[:, 0].astype(jnp.float32) / W * gw).astype(jnp.int32),
                  0, gw - 1)
    py = jnp.clip((pixel_xy[:, 1].astype(jnp.float32) / H * gh).astype(jnp.int32),
                  0, gh - 1)

    def at(name):
        return mods[name][py, px]

    return SurfaceGaussianParams(
        base_size=base.base_size * at("base_size_mult"),
        aspect_ratio=base.aspect_ratio * at("aspect_ratio_mult"),
        edge_threshold=jnp.clip(
            base.edge_threshold + at("edge_threshold_add"), 0.01, 0.99),
        edge_shrink=jnp.clip(base.edge_shrink * at("edge_shrink_mult"),
                             0.0, 1.0),
        min_confidence=base.min_confidence,
        gradient_scale=base.gradient_scale,
        normal_strength=jnp.clip(
            base.normal_strength * at("normal_strength_mult"), 0.0, 1.0),
    )


def feature_guided_surface_gaussians(
    pc: PointCloud,
    depth: jax.Array,
    mods: Dict,
    base_params: SurfaceGaussianParams = SurfaceGaussianParams(),
    wrap_params: SilhouetteWrapParams = SilhouetteWrapParams(),
    shell_params: VolumetricShellParams = VolumetricShellParams(),
    density_params: AdaptiveDensityParams = AdaptiveDensityParams(),
    opacity: float = 0.8,
) -> GaussianCloud:
    """SAAG with the full per-patch modulation maps applied spatially,
    including the opacity multiplier."""
    params = modulated_surface_params(
        base_params, mods, pc.pixel_xy, depth.shape[-2:])
    cloud = to_surface_gaussians(pc, depth, params=params,
                                 wrap_params=wrap_params,
                                 shell_params=shell_params,
                                 density_params=density_params,
                                 opacity=opacity)
    # Opacity modulation, tiled across the static output blocks.
    gh, gw = mods["opacity_mult"].shape[-2:]
    H, W = depth.shape[-2:]
    px = jnp.clip((pc.pixel_xy[:, 0].astype(jnp.float32) / W * gw).astype(jnp.int32),
                  0, gw - 1)
    py = jnp.clip((pc.pixel_xy[:, 1].astype(jnp.float32) / H * gh).astype(jnp.int32),
                  0, gh - 1)
    op_mult = mods["opacity_mult"][py, px]
    n = pc.num_points
    reps = cloud.num_gaussians // n
    op_full = jnp.tile(op_mult, reps)
    return cloud.replace(opacities=jnp.clip(cloud.opacities * op_full, 0.0, 1.0))
