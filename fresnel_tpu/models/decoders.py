"""Gaussian decoder family — DirectPatchDecoder (the workhorse) and the
physics-phase variant.

Flax ports of the reference decoders with identical parameterization and
output semantics (reference: scripts/models/gaussian_decoder_models.py:622-1147):
  * per-patch MLP [512,512,256,128] over the 37x37 DINOv2 grid, K Gaussians
    per patch x 16 outputs (19 with per-RGB phases);
  * grid base positions in [-1,1], XY offsets scaled 0.25;
  * Z LOCKED to depth: base_z = depth_offset + depth * (-2)   (Exp-015 fix);
  * scales = softplus(raw + 1) * 0.15 clamped to [1e-6, 2];
  * 6D rotation -> quaternion; sigmoid colors/opacities;
  * optional Fresnel zone depth quantization, edge-aware scale/opacity
    modulation, pose-encoded opacity in [0.5, 1.5], view-aware grid rotation;
  * HFTS progressive growing: predict full K, statically slice the first k.

Layouts are NHWC (features (B, 37, 37, C)) — the TPU-native convention; the
training harness adapts any cached channels-first data on load.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from fresnel_tpu.core.gaussians import rotation_6d_to_quaternion
from fresnel_tpu.models.blocks import (
    MLP,
    DepthEncoder,
    PoseEncoder,
    rotate_positions_for_pose,
)
from fresnel_tpu.physics.fresnel_zones import FresnelZones, PhysicsFresnelZones
from fresnel_tpu.physics.edge_detector import FresnelEdgeDetector

TWO_PI = 6.283185307179586


def _resize_depth_to_grid(depth: jax.Array, h: int, w: int) -> jax.Array:
    """(B, H, W[, 1]) -> (B, h, w) bilinear."""
    if depth.ndim == 4:
        depth = depth[..., 0]
    B = depth.shape[0]
    # antialias=False: parity with the reference's F.interpolate(bilinear)
    return jax.image.resize(depth, (B, h, w), method="linear",
                            antialias=False)


def head_transform(
    raw: jax.Array,                        # (B, H, W, K, 16|19)
    depth: Optional[jax.Array],            # (B, Hd, Wd[, 1]) or None
    depth_offset: jax.Array,               # scalar
    *,
    scale_bias: float = 0.0,
    opacity_bias: float = 0.0,
    use_fresnel_zones: bool = False,
    num_fresnel_zones: int = 8,
    use_edge_aware: bool = False,
    edge_scale_factor: float = 0.5,
    edge_opacity_boost: float = 0.2,
    use_phase_output: bool = False,
    elevation: Optional[jax.Array] = None,  # (B,)
    azimuth: Optional[jax.Array] = None,    # (B,)
    depth_z_scale: float = -2.0,
    z_offset_scale: float = 0.0,
) -> Dict[str, jax.Array]:
    """Raw per-patch head outputs -> Gaussian parameter dict.

    The reference's head semantics (gaussian_decoder_models.py:805-870):
    base grid in [-1,1], XY offsets scaled 0.25, Z locked to depth
    (base_z = depth_offset + depth * (-2)), scales = softplus(raw+1)*0.15
    clamped, 6D->quat rotations, sigmoid colors/opacities, optional zone
    quantization / edge-aware modulation.

    Pure function shared by DirectPatchDecoder.__call__ and the
    decoder-space teacher fitter (train/fit_teacher.py) so distillation
    targets live in EXACTLY the space the decoder head emits.
    """
    B, H, W, K = raw.shape[:4]
    raw_pos = raw[..., 0:3]
    raw_scale = raw[..., 3:6]
    rot_6d = raw[..., 6:12]
    raw_color = raw[..., 12:15]
    raw_opacity = raw[..., 15]
    raw_phase = raw[..., 16:19] if use_phase_output else None

    # Base grid in [-1, 1].
    y_grid, x_grid = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, H), jnp.linspace(-1.0, 1.0, W), indexing="ij")
    base_x = jnp.broadcast_to(x_grid[None, :, :, None], (B, H, W, K))
    base_y = jnp.broadcast_to(y_grid[None, :, :, None], (B, H, W, K))

    edge_strength = None
    if depth is not None:
        depth_grid = _resize_depth_to_grid(depth, H, W)         # (B, H, W)
        if use_edge_aware:
            edge_strength = FresnelEdgeDetector()(depth_grid)   # (B,H,W,1)
        if use_fresnel_zones:
            zones = FresnelZones(num_zones=num_fresnel_zones)
            depth_grid = zones.zone_centers_for_depth(depth_grid)
        # depth_z_scale = -2.0 is reference parity
        # (gaussian_decoder_models.py:841) but GEOMETRICALLY INVERTED: the
        # camera sits at +Z looking down -Z, and disparity is larger =
        # closer, so close content should get LARGER z.  +2.0 (with
        # depth_offset re-initialized near -2) is the physically-correct
        # mapping for view-aware training on corpus_v2 (T-038+).
        base_z = depth_offset + depth_grid[..., None] * depth_z_scale
        base_z = jnp.broadcast_to(base_z, (B, H, W, K))
    else:
        base_z = jnp.full((B, H, W, K), depth_offset)

    # z_offset_scale > 0 re-enables the otherwise-unused raw z channel as
    # a bounded per-Gaussian residual on the depth lock — frontal-only
    # supervision cannot constrain it, but side-view GT (corpus_v2) can.
    z_term = (base_z + jnp.tanh(raw_pos[..., 2]) * z_offset_scale
              if z_offset_scale else base_z)

    positions = jnp.stack(
        [base_x + raw_pos[..., 0] * 0.25,
         base_y + raw_pos[..., 1] * 0.25,
         z_term],  # Z locked to depth (modulo optional residual)
        axis=-1)

    if elevation is not None and azimuth is not None:
        positions = rotate_positions_for_pose(positions, elevation, azimuth)

    scales = jax.nn.softplus(
        jnp.clip(raw_scale, -10.0, 20.0) + 1.0 + scale_bias) * 0.15
    scales = jnp.clip(scales, 1e-6, 2.0)
    rotations = rotation_6d_to_quaternion(rot_6d)
    colors = jax.nn.sigmoid(raw_color)
    opacities = jax.nn.sigmoid(raw_opacity + opacity_bias)

    if use_edge_aware and edge_strength is not None:
        edge = edge_strength[..., 0][..., None]                 # (B, H, W, 1)
        scales = scales * (1.0 - edge_scale_factor * edge[..., None])
        opacities = jnp.clip(opacities + edge_opacity_boost * edge, 0.0, 1.0)

    phases = None
    if raw_phase is not None:
        phases = jax.nn.sigmoid(raw_phase) * TWO_PI             # (B,H,W,K,3)

    N = H * W * K
    result = {
        "positions": positions.reshape(B, N, 3),
        "scales": scales.reshape(B, N, 3),
        "rotations": rotations.reshape(B, N, 4),
        "colors": colors.reshape(B, N, 3),
        "opacities": opacities.reshape(B, N),
    }
    if phases is not None:
        result["phases"] = phases.reshape(B, N, 3)
    if edge_strength is not None:
        result["edge_strength"] = edge_strength
    return result


class DirectPatchDecoder(nn.Module):
    feature_dim: int = 384
    gaussians_per_patch: int = 8
    hidden_dims: Sequence[int] = (512, 512, 256, 128)
    dropout: float = 0.1
    # Fresnel enhancements
    use_fresnel_zones: bool = False
    num_fresnel_zones: int = 8
    use_edge_aware: bool = False
    use_phase_output: bool = False
    edge_scale_factor: float = 0.5
    edge_opacity_boost: float = 0.2
    # View-dependent opacity
    use_pose_encoding: bool = False
    pose_embed_dim: int = 64
    # Depth fusion
    use_depth_fusion: bool = False
    depth_feature_dim: int = 64
    # Head-initialization biases (TPU addition; 0.0 = exact reference
    # behavior).  At raw=0 the reference head emits sigma ~= 0.2 world units
    # (~18 px at the training camera) and opacity 0.5 — T-023 measured that
    # render-loss training from there converges to a large-scale/low-opacity
    # blur equilibrium, while a direct fit STARTED at surface-like params
    # (sigma ~= patch pitch, opacity ~0.8) reaches SSIM 0.99 on the same
    # budget.  scale_bias=-2.6 / opacity_bias=1.5 move the INIT into that
    # basin without changing the reachable set.
    scale_bias: float = 0.0
    opacity_bias: float = 0.0
    # Geometry of the depth lock (see head_transform): -2.0 = reference
    # parity; +2.0 = physically-correct parallax for view-aware training.
    # z_offset_scale > 0 re-enables the raw z channel as a bounded
    # per-Gaussian residual (tanh * scale).
    depth_z_scale: float = -2.0
    z_offset_scale: float = 0.0
    # Decode on an f x finer patch lattice (TPU addition, no reference
    # equivalent).  T-038's spectral analysis localized the texture cliff
    # at the 37x37 patch grid's Nyquist (~18.5 cycles/image): every decoder
    # reproduces structure up to its patch sampling rate and almost nothing
    # beyond, and T-040 showed doubling per-patch K does NOT move the
    # >16-cycle bands — the lattice, not K, is the bottleneck.  With
    # feature_upsample=f the feature grid is bilinearly upsampled f x and
    # locally refined by a small learned conv stack before the per-patch
    # MLP, doubling (f=2) the lattice Nyquist at equal Gaussian budget
    # (74x74 x K/4 == 37x37 x K).
    feature_upsample: int = 1

    @property
    def output_per_gaussian(self) -> int:
        return 19 if self.use_phase_output else 16

    @nn.compact
    def __call__(
        self,
        features: jax.Array,                 # (B, 37, 37, C)
        depth: Optional[jax.Array] = None,   # (B, H, W) or (B, H, W, 1)
        num_gaussians: Optional[int] = None, # HFTS progressive K (static)
        elevation: Optional[jax.Array] = None,  # (B,)
        azimuth: Optional[jax.Array] = None,    # (B,)
        deterministic: bool = True,
        return_raw: bool = False,               # add "raw" (B,H,W,K,opg)
    ) -> Dict[str, jax.Array]:
        B, H, W, C = features.shape
        if self.feature_upsample > 1:
            f = self.feature_upsample
            H, W = H * f, W * f
            up = jax.image.resize(features, (B, H, W, C), method="linear")
            # Learned local refinement so adjacent sub-patches can
            # differentiate (bilinear alone would emit near-duplicate rows
            # into the per-patch MLP).  The residual conv is ZERO-INIT:
            # a random residual doubles feature variance with noise at
            # init and scrambles whatever the (jointly trained) encoder
            # emits — the exp2_g74 arm trained through that and collapsed
            # to structureless color fields (T-045).
            up = up + nn.Conv(C, (3, 3), name="upsample_refine",
                              kernel_init=nn.initializers.zeros)(
                nn.gelu(nn.Conv(C, (3, 3), name="upsample_conv")(up)))
            features = up
        full_K = self.gaussians_per_patch
        K = min(num_gaussians, full_K) if num_gaussians is not None else full_K
        opg = self.output_per_gaussian

        if self.use_depth_fusion and depth is not None:
            dfeat = DepthEncoder(self.depth_feature_dim, grid_size=H)(depth)
            features = jnp.concatenate([features, dfeat], axis=-1)

        out = MLP(tuple(self.hidden_dims), full_K * opg, self.dropout)(
            features.reshape(B * H * W, -1), deterministic=deterministic)
        out = out.reshape(B, H, W, full_K, opg)[:, :, :, :K, :]

        depth_offset = self.param(
            "depth_offset", lambda _: jnp.asarray(-2.0, jnp.float32))

        result = head_transform(
            out, depth, depth_offset,
            scale_bias=self.scale_bias, opacity_bias=self.opacity_bias,
            use_fresnel_zones=self.use_fresnel_zones,
            num_fresnel_zones=self.num_fresnel_zones,
            use_edge_aware=self.use_edge_aware,
            edge_scale_factor=self.edge_scale_factor,
            edge_opacity_boost=self.edge_opacity_boost,
            use_phase_output=self.use_phase_output,
            elevation=elevation, azimuth=azimuth,
            depth_z_scale=self.depth_z_scale,
            z_offset_scale=self.z_offset_scale)

        if self.use_pose_encoding and elevation is not None and azimuth is not None:
            pose_emb = PoseEncoder(self.pose_embed_dim)(elevation, azimuth)
            mod = nn.Dense(1)(nn.relu(nn.Dense(128)(pose_emb)))
            opacity_mod = 0.5 + jax.nn.sigmoid(mod)             # (B, 1) in [0.5, 1.5]
            result["opacities"] = jnp.clip(
                result["opacities"] * opacity_mod, 0.0, 1.0)

        if return_raw:
            result["raw"] = out
        return result


class PhysicsDirectPatchDecoder(nn.Module):
    """DirectPatchDecoder with phase COMPUTED from z via the wave equation
    (batch-normalized z -> φ = (2π/λ)|z̃ − f|, wrapped to [0, 2π)) instead of
    predicted."""

    feature_dim: int = 384
    gaussians_per_patch: int = 8
    hidden_dims: Sequence[int] = (512, 512, 256, 128)
    dropout: float = 0.1
    wavelength: float = 0.05
    learnable_wavelength: bool = True
    focal_depth: float = 0.5
    # Fringe-guided edge placement.  The reference accepts this flag and
    # constructs FresnelDiffraction but never calls it in forward
    # (gaussian_decoder_models.py:1027-1030 — inert); here the fringe
    # intensity actually modulates opacity near depth edges.
    use_diffraction_placement: bool = False
    # Head-init biases, see DirectPatchDecoder.
    scale_bias: float = 0.0
    opacity_bias: float = 0.0

    @nn.compact
    def __call__(
        self,
        features: jax.Array,
        depth: Optional[jax.Array] = None,
        num_gaussians: Optional[int] = None,
        elevation: Optional[jax.Array] = None,
        azimuth: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        B, H, W, C = features.shape
        full_K = self.gaussians_per_patch
        K = min(num_gaussians, full_K) if num_gaussians is not None else full_K

        out = MLP(tuple(self.hidden_dims), full_K * 16, self.dropout)(
            features.reshape(B * H * W, C), deterministic=deterministic)
        out = out.reshape(B, H, W, full_K, 16)[:, :, :, :K, :]

        raw_pos, raw_scale = out[..., 0:3], out[..., 3:6]
        rot_6d, raw_color, raw_opacity = out[..., 6:12], out[..., 12:15], out[..., 15]

        y_grid, x_grid = jnp.meshgrid(
            jnp.linspace(-1.0, 1.0, H), jnp.linspace(-1.0, 1.0, W), indexing="ij")
        base_x = jnp.broadcast_to(x_grid[None, :, :, None], (B, H, W, K))
        base_y = jnp.broadcast_to(y_grid[None, :, :, None], (B, H, W, K))

        depth_offset = self.param(
            "depth_offset", lambda _: jnp.asarray(-2.0, jnp.float32))
        if depth is not None:
            depth_grid = _resize_depth_to_grid(depth, H, W)
            base_z = depth_offset + depth_grid[..., None] * (-2.0)
            base_z = jnp.broadcast_to(base_z, (B, H, W, K))
        else:
            base_z = jnp.full((B, H, W, K), depth_offset)

        positions = jnp.stack(
            [base_x + raw_pos[..., 0] * 0.25,
             base_y + raw_pos[..., 1] * 0.25,
             base_z], axis=-1)

        scales = jnp.clip(
            jax.nn.softplus(jnp.clip(raw_scale, -10.0, 20.0) + 1.0
                            + self.scale_bias) * 0.15,
            1e-6, 2.0)
        rotations = rotation_6d_to_quaternion(rot_6d)
        colors = jax.nn.sigmoid(raw_color)
        opacities = jax.nn.sigmoid(raw_opacity + self.opacity_bias)

        if self.use_diffraction_placement and depth is not None:
            from fresnel_tpu.physics.diffraction import FresnelDiffraction
            from fresnel_tpu.physics.fresnel_zones import sobel_gradients

            fd = FresnelDiffraction(wavelength=self.wavelength)
            depth_grid = _resize_depth_to_grid(depth, H, W)   # (B, H, W)
            gx, gy = sobel_gradients(depth_grid)
            edge = jnp.tanh(jnp.sqrt(gx**2 + gy**2 + 1e-12) * 10.0)
            # Proxy distance-from-edge: strong edges -> in the fringe region.
            dist = (1.0 - edge) * 0.5
            w = fd.compute_fresnel_parameter(dist, jnp.abs(depth_grid) + 1.0)
            fringe = jnp.clip(fd.fresnel_intensity(w) / 2.0, 0.5, 1.25)
            opacities = jnp.clip(opacities * fringe[..., None], 0.0, 1.0)

        # Physics-derived scalar phase from normalized z.
        if self.learnable_wavelength:
            wl_raw = self.param(
                "wavelength_raw", lambda _: jnp.asarray(self.wavelength, jnp.float32))
        else:
            wl_raw = jnp.asarray(self.wavelength, jnp.float32)
        zones = PhysicsFresnelZones(
            wavelength_init=self.wavelength, focal_depth=self.focal_depth)
        z = positions[..., 2]
        z_min = jnp.min(z, axis=(1, 2, 3), keepdims=True)
        z_max = jnp.max(z, axis=(1, 2, 3), keepdims=True)
        z_norm = (z - z_min) / (z_max - z_min + 1e-8)
        phases = jnp.mod(zones.depth_to_phase(z_norm, wavelength=wl_raw), TWO_PI)

        N = H * W * K
        return {
            "positions": positions.reshape(B, N, 3),
            "scales": scales.reshape(B, N, 3),
            "rotations": rotations.reshape(B, N, 4),
            "colors": colors.reshape(B, N, 3),
            "opacities": opacities.reshape(B, N),
            "phases": phases.reshape(B, N),
        }
