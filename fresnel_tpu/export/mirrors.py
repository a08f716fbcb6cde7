"""Torch mirrors of every exportable decoder family.

The reference exports each trained experiment family to ONNX for its C++
viewer (reference: scripts/training/train_gaussian_decoder.py:2060-2143 —
exp 1 refinement, exp 2 direct, exp 3 modulation maps, exp 4/5 direct-style;
export/export_physics_decoder.py:120-150 — physics decoder with phases).
JAX has no ONNX path offline, so each Flax decoder gets a torch MIRROR: an
nn.Module with the exact same forward math whose weights are copied from the
Flax checkpoint, exported via torch.onnx (TorchScript fallback when the
onnx serializer is unavailable) and verified numerically against the Flax
forward before export.

Input/output conventions follow the reference bridge protocol
(scripts/inference/decoder_inference.py): channels-first features
(1, C, 37, 37), depth (1, 1, H, W); direct-style families emit a flat
(N, 14) Gaussian tensor ((N, 15) with phases for the physics decoder),
exp 1 emits refined Gaussian tuples, exp 3 emits the six SAAG modulation
maps.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def rot6d_to_quat(rot_6d):
    """6D rotation -> wxyz quaternion (Gram-Schmidt + Shepperd, where-based;
    mirrors core/gaussians.rotation_6d_to_quaternion)."""
    import torch
    import torch.nn.functional as F

    a1, a2 = rot_6d[..., :3], rot_6d[..., 3:6]
    b1 = F.normalize(a1, dim=-1, eps=1e-6)
    b2 = F.normalize(
        a2 - (b1 * a2).sum(-1, keepdim=True) * b1, dim=-1, eps=1e-6)
    b3 = torch.cross(b1, b2, dim=-1)
    R = torch.stack([b1, b2, b3], dim=-1)
    r = R.reshape(-1, 3, 3)
    t = r[:, 0, 0] + r[:, 1, 1] + r[:, 2, 2]
    s1 = torch.sqrt(torch.clamp(t + 1, min=1e-10)) * 2
    q1 = torch.stack([0.25 * s1, (r[:, 2, 1] - r[:, 1, 2]) / s1,
                      (r[:, 0, 2] - r[:, 2, 0]) / s1,
                      (r[:, 1, 0] - r[:, 0, 1]) / s1], -1)
    s2 = torch.sqrt(torch.clamp(
        1 + r[:, 0, 0] - r[:, 1, 1] - r[:, 2, 2], min=1e-10)) * 2
    q2 = torch.stack([(r[:, 2, 1] - r[:, 1, 2]) / s2, 0.25 * s2,
                      (r[:, 0, 1] + r[:, 1, 0]) / s2,
                      (r[:, 0, 2] + r[:, 2, 0]) / s2], -1)
    s3 = torch.sqrt(torch.clamp(
        1 + r[:, 1, 1] - r[:, 0, 0] - r[:, 2, 2], min=1e-10)) * 2
    q3 = torch.stack([(r[:, 0, 2] - r[:, 2, 0]) / s3,
                      (r[:, 0, 1] + r[:, 1, 0]) / s3, 0.25 * s3,
                      (r[:, 1, 2] + r[:, 2, 1]) / s3], -1)
    s4 = torch.sqrt(torch.clamp(
        1 + r[:, 2, 2] - r[:, 0, 0] - r[:, 1, 1], min=1e-10)) * 2
    q4 = torch.stack([(r[:, 1, 0] - r[:, 0, 1]) / s4,
                      (r[:, 0, 2] + r[:, 2, 0]) / s4,
                      (r[:, 1, 2] + r[:, 2, 1]) / s4, 0.25 * s4], -1)
    c1 = (t > 0)[:, None]
    c2 = ((r[:, 0, 0] > r[:, 1, 1]) & (r[:, 0, 0] > r[:, 2, 2]))[:, None]
    c3 = (r[:, 1, 1] > r[:, 2, 2])[:, None]
    quat = torch.where(c1, q1, torch.where(c2, q2,
                                           torch.where(c3, q3, q4)))
    quat = F.normalize(quat, dim=-1, eps=1e-6)
    return quat.reshape(rot_6d.shape[:-1] + (4,))


def quat_multiply(q1, q2):
    """Hamilton product, wxyz (mirrors core/gaussians.quaternion_multiply)."""
    import torch

    w1, x1, y1, z1 = q1.unbind(-1)
    w2, x2, y2, z2 = q2.unbind(-1)
    return torch.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], -1)


def load_mlp(flat: Dict[str, np.ndarray], prefix: str):
    """blocks.MLP params (Dense_i under `prefix`) -> torch nn.Sequential
    (ReLU between layers, linear final — the Flax MLP contract)."""
    import torch
    import torch.nn as nn

    keys = sorted({k.rsplit("/", 1)[0] for k in flat
                   if k.startswith(prefix)},
                  key=lambda s: int(s.rsplit("_", 1)[1]))
    layers = []
    for i, dk in enumerate(keys):
        w = flat[f"{dk}/kernel"]
        lin = nn.Linear(w.shape[0], w.shape[1])
        lin.weight.data = torch.from_numpy(np.ascontiguousarray(w.T))
        lin.bias.data = torch.from_numpy(flat[f"{dk}/bias"].copy())
        layers.append(lin)
        if i < len(keys) - 1:
            layers.append(nn.ReLU())
    return nn.Sequential(*layers)


def load_linear(flat, name):
    import torch
    import torch.nn as nn

    w = flat[f"{name}/kernel"]
    lin = nn.Linear(w.shape[0], w.shape[1])
    lin.weight.data = torch.from_numpy(np.ascontiguousarray(w.T))
    lin.bias.data = torch.from_numpy(flat[f"{name}/bias"].copy())
    return lin


def sample_grid_ac_true(grid_nchw, coords_m11):
    """F.grid_sample wrapper matching fibonacci.sample_grid_at
    (align_corners=True, border padding).  grid (1, C, H, W); coords (N, 2)
    in [-1, 1] -> (N, C)."""
    import torch.nn.functional as F

    g = coords_m11[None, :, None, :]                       # (1, N, 1, 2)
    out = F.grid_sample(grid_nchw, g, mode="bilinear",
                        padding_mode="border", align_corners=True)
    return out[0, :, :, 0].T                               # (N, C)


def sample_grid_ac_false(grid_nchw, coords01):
    """blocks.bilinear_sample parity (align_corners=False, border):
    coords (N, 2) in [0, 1] -> (N, C)."""
    import torch.nn.functional as F

    g = (coords01 * 2.0 - 1.0)[None, :, None, :]
    out = F.grid_sample(grid_nchw, g, mode="bilinear",
                        padding_mode="border", align_corners=False)
    return out[0, :, :, 0].T


def _head_common(out, base_x, base_y, base_z, xy_scale, scale_bias,
                 opacity_bias):
    """Shared direct-style head: raw (.., K, 16) + base grids -> (N, 14)."""
    import torch
    import torch.nn.functional as F

    raw_pos = out[..., 0:3]
    raw_scale = out[..., 3:6]
    rot_6d = out[..., 6:12]
    raw_color = out[..., 12:15]
    raw_op = out[..., 15]
    pos = torch.stack(
        [base_x + raw_pos[..., 0] * xy_scale,
         base_y + raw_pos[..., 1] * xy_scale,
         base_z], -1)
    scales = torch.clamp(
        F.softplus(torch.clamp(raw_scale, -10, 20) + 1.0 + scale_bias)
        * 0.15, 1e-6, 2.0)
    quat = rot6d_to_quat(rot_6d)
    colors = torch.sigmoid(raw_color)
    opac = torch.sigmoid(raw_op + opacity_bias)
    N = pos.shape[:-1].numel()
    return torch.cat(
        [pos.reshape(N, 3), scales.reshape(N, 3), quat.reshape(N, 4),
         colors.reshape(N, 3), opac.reshape(N, 1)], -1)


def build_direct_patch_mirror(flat: Dict[str, np.ndarray], config: dict):
    """Exp-2 DirectPatchDecoder mirror: (features (1,C,37,37), depth
    (1,1,H,W)) -> (N, 14).  Honors scale/opacity head biases, depth_z_scale,
    z_offset_scale, and the finer-lattice feature_upsample stack."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    K = int(config.get("gaussians_per_patch", 4))
    scale_bias = float(config.get("scale_bias", 0.0))
    opacity_bias = float(config.get("opacity_bias", 0.0))
    depth_z_scale = float(config.get("depth_z_scale", -2.0))
    z_offset_scale = float(config.get("z_offset_scale", 0.0))
    upsample = int(config.get("feature_upsample", 1))
    # 19 raw channels when the head also predicts per-RGB phases (QSR
    # wave path); the export then emits (N, 17) = [gaussians(14) | phases].
    opg = 19 if config.get("use_phase_output") else 16

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = load_mlp(flat, "MLP_0/")
            self.depth_offset = nn.Parameter(
                torch.tensor(float(flat["depth_offset"])))
            if upsample > 1:
                for name in ("upsample_conv", "upsample_refine"):
                    w = flat[f"{name}/kernel"]          # (kh, kw, I, O)
                    conv = nn.Conv2d(w.shape[2], w.shape[3], w.shape[:2],
                                     padding="same")
                    conv.weight.data = torch.from_numpy(
                        np.ascontiguousarray(w.transpose(3, 2, 0, 1)))
                    conv.bias.data = torch.from_numpy(
                        flat[f"{name}/bias"].copy())
                    setattr(self, name, conv)

        def forward(self, features, depth):
            B, C, H, W = features.shape
            if upsample > 1:
                H, W = H * upsample, W * upsample
                up = F.interpolate(features, (H, W), mode="bilinear",
                                   align_corners=False)
                # flax nn.gelu defaults to the tanh approximation.
                up = up + self.upsample_refine(
                    F.gelu(self.upsample_conv(up), approximate="tanh"))
                features = up
            x = features.permute(0, 2, 3, 1).reshape(B * H * W, C)
            out = self.mlp(x).reshape(B, H, W, K, opg)

            ygrid, xgrid = torch.meshgrid(
                torch.linspace(-1, 1, H), torch.linspace(-1, 1, W),
                indexing="ij")
            base_x = xgrid[None, :, :, None].expand(B, H, W, K)
            base_y = ygrid[None, :, :, None].expand(B, H, W, K)
            dgrid = F.interpolate(depth, (H, W), mode="bilinear",
                                  align_corners=False)
            base_z = (self.depth_offset
                      + dgrid[:, 0][..., None] * depth_z_scale)
            base_z = base_z.expand(B, H, W, K)
            if z_offset_scale:
                base_z = base_z + torch.tanh(
                    out[..., 2]) * z_offset_scale
            g = _head_common(out, base_x, base_y, base_z, 0.25,
                             scale_bias, opacity_bias)
            if opg == 19:
                TWO_PI = 6.283185307179586
                phases = torch.sigmoid(out[..., 16:19]) * TWO_PI
                g = torch.cat([g, phases.reshape(-1, 3)], -1)
            return g

    return Mirror()


def build_physics_mirror(flat: Dict[str, np.ndarray], config: dict):
    """PhysicsDirectPatchDecoder mirror -> (N, 15): [gaussians(14) | phase].
    Phase = (2π/λ)·|z_norm − focal| mod 2π (reference:
    export/export_physics_decoder.py output contract)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    K = int(config.get("gaussians_per_patch", 4))
    scale_bias = float(config.get("scale_bias", 0.0))
    opacity_bias = float(config.get("opacity_bias", 0.0))
    focal = float(config.get("physics_focal_depth", 0.5))
    TWO_PI = 6.283185307179586

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = load_mlp(flat, "MLP_0/")
            self.depth_offset = nn.Parameter(
                torch.tensor(float(flat["depth_offset"])))
            wl = flat.get("wavelength_raw",
                          np.float32(config.get("physics_wavelength", 0.05)))
            self.wavelength = nn.Parameter(torch.tensor(float(wl)))

        def forward(self, features, depth):
            B, C, H, W = features.shape
            x = features.permute(0, 2, 3, 1).reshape(B * H * W, C)
            out = self.mlp(x).reshape(B, H, W, K, 16)
            ygrid, xgrid = torch.meshgrid(
                torch.linspace(-1, 1, H), torch.linspace(-1, 1, W),
                indexing="ij")
            base_x = xgrid[None, :, :, None].expand(B, H, W, K)
            base_y = ygrid[None, :, :, None].expand(B, H, W, K)
            dgrid = F.interpolate(depth, (H, W), mode="bilinear",
                                  align_corners=False)
            base_z = (self.depth_offset + dgrid[:, 0][..., None] * (-2.0))
            base_z = base_z.expand(B, H, W, K)
            g = _head_common(out, base_x, base_y, base_z, 0.25,
                             scale_bias, opacity_bias)
            z = g[:, 2]
            z_norm = (z - z.min()) / (z.max() - z.min() + 1e-8)
            phase = torch.remainder(
                (TWO_PI / self.wavelength) * torch.abs(z_norm - focal),
                TWO_PI)
            return torch.cat([g, phase[:, None]], -1)

    return Mirror()


def build_saag_refine_mirror(flat: Dict[str, np.ndarray], config: dict):
    """Exp-1 SAAGRefinementNet mirror: (features, positions, scales,
    rotations, colors, opacities) -> refined 5-tuple (reference export
    contract, train_gaussian_decoder.py:2068-2090)."""
    import torch
    import torch.nn as nn

    residual_scale = float(config.get("saag_residual_scale", 0.1))

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = load_mlp(flat, "MLP_0/")
            for s in ("pos_scale", "scale_scale", "color_scale",
                      "opacity_scale"):
                setattr(self, s, nn.Parameter(torch.tensor(float(flat[s]))))

        def forward(self, features, positions, scales, rotations, colors,
                    opacities):
            B, N = positions.shape[:2]
            z = torch.clamp(positions[..., 2:3], min=0.1)
            pos01 = torch.clamp((positions[..., :2] / z + 2.0) / 4.0, 0, 1)
            sampled = torch.stack([
                sample_grid_ac_false(features[b:b + 1], pos01[b])
                for b in range(B)])                        # (B, N, C)
            inputs = torch.cat(
                [sampled, positions, scales, rotations, colors,
                 opacities[..., None]], -1)
            res = self.mlp(inputs)
            pos_d = res[..., 0:3] * self.pos_scale * residual_scale
            scale_d = res[..., 3:6] * self.scale_scale * residual_scale
            rot_d = rot6d_to_quat(res[..., 6:12])
            color_d = res[..., 12:15] * self.color_scale * residual_scale
            op_d = res[..., 15:16] * self.opacity_scale * residual_scale
            quat = quat_multiply(rot_d, rotations)
            quat = quat / torch.clamp(
                quat.norm(dim=-1, keepdim=True), min=1e-6)
            return (positions + pos_d, scales * torch.exp(scale_d), quat,
                    torch.clamp(colors + color_d, 0, 1),
                    torch.clamp(opacities + op_d[..., 0], 0, 1))

    return Mirror()


def build_feature_guided_mirror(flat: Dict[str, np.ndarray], config: dict):
    """Exp-3 FeatureGuidedSAAG mirror: features -> six modulation maps
    (reference output names, train_gaussian_decoder.py:2130-2137)."""
    import torch
    import torch.nn as nn

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = load_linear(flat, "Dense_0")
            self.fc2 = load_linear(flat, "Dense_1")

        def forward(self, features):
            x = features.permute(0, 2, 3, 1)               # NCHW -> NHWC
            p = self.fc2(torch.relu(self.fc1(x)))
            return (1.0 + torch.tanh(p[..., 0]) * 0.5,
                    torch.tanh(p[..., 1]) * 0.1,
                    1.0 + torch.tanh(p[..., 2]) * 0.3,
                    1.0 + torch.tanh(p[..., 3]) * 0.3,
                    1.0 + torch.tanh(p[..., 4]) * 0.5,
                    1.0 + torch.tanh(p[..., 5]) * 0.3)

    return Mirror()


def build_fibonacci_mirror(flat: Dict[str, np.ndarray], config: dict):
    """Exp-4 FibonacciPatchDecoder mirror -> (N, 14).  Spiral coordinates
    are baked from the Flax implementation (bit-identical lattice)."""
    import torch
    import torch.nn as nn

    from fresnel_tpu.models.blocks import fibonacci_spiral_positions

    n_points = int(config.get("n_spiral_points", 377))
    scale_bias = float(config.get("scale_bias", 0.0))
    opacity_bias = float(config.get("opacity_bias", 0.0))
    sx, sy = fibonacci_spiral_positions(n_points)
    coords = np.stack([np.asarray(sx), np.asarray(sy)], -1)

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = load_mlp(flat, "MLP_0/")
            self.depth_offset = nn.Parameter(
                torch.tensor(float(flat["depth_offset"])))
            self.register_buffer(
                "coords", torch.from_numpy(coords.astype(np.float32)))

        def forward(self, features, depth):
            B = features.shape[0]
            N = self.coords.shape[0]
            sampled = torch.stack([
                sample_grid_ac_true(features[b:b + 1], self.coords)
                for b in range(B)])                        # (B, N, C)
            out = self.mlp(sampled.reshape(B * N, -1)).reshape(B, N, 1, 16)
            base_x = self.coords[None, :, 0, None].expand(B, N, 1)
            base_y = self.coords[None, :, 1, None].expand(B, N, 1)
            d_sampled = torch.stack([
                sample_grid_ac_true(depth[b:b + 1], self.coords)[:, 0]
                for b in range(B)])                        # (B, N)
            base_z = (self.depth_offset
                      + d_sampled[..., None] * (-2.0)).expand(B, N, 1)
            return _head_common(out, base_x, base_y, base_z, 0.15,
                                scale_bias, opacity_bias)

    return Mirror()


def build_nca_mirror(flat: Dict[str, np.ndarray], config: dict):
    """Exp-5 NCAGaussianDecoder mirror -> (N, 14): deterministic (masks=1)
    unrolled NCA steps with k-NN perception, exactly models/nca.py."""
    import torch
    import torch.nn as nn

    from fresnel_tpu.models.blocks import fibonacci_spiral_positions

    n_points = int(config.get("n_spiral_points", 377))
    n_steps = int(config.get("nca_steps", 16))
    k_neighbors = int(config.get("nca_neighbors", 6))
    sx, sy = fibonacci_spiral_positions(n_points)
    coords = np.stack([np.asarray(sx), np.asarray(sy)], -1)

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.init_net = load_mlp(flat, "init_state_net/")
            self.perception = load_mlp(flat, "perception/")
            self.update_hidden = load_linear(flat, "update_hidden")
            self.update_out = load_linear(flat, "update_out")
            self.step_size = nn.Parameter(
                torch.tensor(float(flat["step_size"])))
            self.depth_offset = nn.Parameter(
                torch.tensor(float(flat["depth_offset"])))
            self.register_buffer(
                "coords", torch.from_numpy(coords.astype(np.float32)))

        def _step(self, state):
            B, N, D = state.shape
            pos = state[..., :3]
            diff = pos[:, :, None, :] - pos[:, None, :, :]
            dists = torch.sqrt((diff * diff).sum(-1) + 1e-12)
            _, idx = torch.topk(-dists, k_neighbors + 1, dim=-1)
            idx = idx[..., 1:]                             # (B, N, k)
            neighbors = torch.gather(
                state[:, None].expand(B, N, N, D), 2,
                idx[..., None].expand(B, N, k_neighbors, D))
            percep_in = torch.cat(
                [state, neighbors.reshape(B, N, -1)], -1)
            # Flax perception Sequential ends in relu (no linear tail).
            perceived = torch.relu(self.perception(percep_in))
            delta = self.update_out(
                torch.relu(self.update_hidden(perceived)))
            return state + self.step_size * delta

        def forward(self, features, depth):
            import torch.nn.functional as F

            B = features.shape[0]
            N = self.coords.shape[0]
            sampled = torch.stack([
                sample_grid_ac_true(features[b:b + 1], self.coords)
                for b in range(B)])
            state = self.init_net(sampled)                 # (B, N, D)
            d_sampled = torch.stack([
                sample_grid_ac_true(depth[b:b + 1], self.coords)[:, 0]
                for b in range(B)])
            base_x = self.coords[None, :, 0].expand(B, N)
            base_y = self.coords[None, :, 1].expand(B, N)
            base_z = self.depth_offset + d_sampled * (-2.0)
            state = torch.cat([
                (base_x + state[..., 0] * 0.15)[..., None],
                (base_y + state[..., 1] * 0.15)[..., None],
                base_z[..., None], state[..., 3:]], -1)
            for _ in range(n_steps):
                state = self._step(state)
            pos = state[..., 0:3]
            scales = torch.clamp(
                F.softplus(torch.clamp(state[..., 3:6], -10, 20) + 1.0)
                * 0.15, 1e-6, 2.0)
            quat = rot6d_to_quat(state[..., 6:12])
            colors = torch.sigmoid(state[..., 12:15])
            opac = torch.sigmoid(state[..., 15])
            NN = B * N
            return torch.cat(
                [pos.reshape(NN, 3), scales.reshape(NN, 3),
                 quat.reshape(NN, 4), colors.reshape(NN, 3),
                 opac.reshape(NN, 1)], -1)

    return Mirror()


BUILDERS = {
    1: build_saag_refine_mirror,
    2: build_direct_patch_mirror,
    3: build_feature_guided_mirror,
    4: build_fibonacci_mirror,
    5: build_nca_mirror,
    "physics": build_physics_mirror,
}


def build_mirror(flat: Dict[str, np.ndarray], config: dict):
    """Flat Flax weights + checkpoint config dict -> torch mirror module.

    `config` is the TrainingConfig dict from the .msgpack.json sidecar; the
    physics decoder is selected the same way the harness does (experiment 2
    + use_wave_rendering without phase output)."""
    exp = int(config.get("experiment", 2))
    if exp == 2 and config.get("use_wave_rendering") \
            and not config.get("use_phase_output"):
        return BUILDERS["physics"](flat, config)
    if exp not in BUILDERS:
        raise ValueError(f"no export mirror for experiment {exp}")
    return BUILDERS[exp](flat, config)
