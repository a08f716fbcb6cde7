"""TRELLIS distillation dataset (Fresnel v2).

Loads teacher outputs saved per sample as
  features.pt  (num_patches, 1024) DINOv2-large features
  coords.pt    (N, 4) [batch_idx, x, y, z] sparse voxel coords
  gaussians.ply  standard 3DGS PLY
(reference: scripts/distillation/trellis_dataset.py:24-426, writer at
generate_trellis_data.py:37-363).  Variable-length samples are padded to
static (max_coords, max_gaussians) with validity masks — the TPU equivalent
of the reference's variable-length collate.  Occupancy targets are computed
by Gaussian proximity (threshold 0.15 in [-1,1]).

SyntheticTrellisDataset fabricates consistent samples (random blob surfaces)
so the distillation pipeline trains and tests with zero external data.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np


def _load_pt(path: Path) -> np.ndarray:
    import torch

    t = torch.load(str(path), map_location="cpu", weights_only=False)
    return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def _occupancy_targets(coords_xyz: np.ndarray, gauss_pos: np.ndarray,
                       threshold: float = 0.15,
                       grid_resolution: int = 64) -> np.ndarray:
    centers = coords_xyz.astype(np.float32) / grid_resolution * 2 - 1
    if len(gauss_pos) == 0:
        return np.zeros(len(centers), np.float32)
    d2 = ((centers[:, None, :] - gauss_pos[None, :, :]) ** 2).sum(-1)
    return (d2.min(1) < threshold ** 2).astype(np.float32)


class TrellisDistillationDataset:
    def __init__(self, data_dir: str, max_coords: int = 4096,
                 max_gaussians: int = 16384,
                 occupancy_threshold: float = 0.15,
                 max_samples: Optional[int] = None):
        self.max_coords = max_coords
        self.max_gaussians = max_gaussians
        self.occupancy_threshold = occupancy_threshold
        root = Path(data_dir)
        dirs = sorted(d for d in root.iterdir() if d.is_dir()
                      and (d / "features.pt").exists()
                      and (d / "coords.pt").exists()
                      and (d / "gaussians.ply").exists())
        if max_samples:
            dirs = dirs[:max_samples]
        if not dirs:
            raise FileNotFoundError(f"no TRELLIS samples in {data_dir}")
        self._samples = [self._load(d) for d in dirs]

    def _load(self, d: Path) -> Dict[str, np.ndarray]:
        from fresnel_tpu.core import io as gio

        feats = _load_pt(d / "features.pt")
        if feats.ndim == 3:
            feats = feats[0]
        coords = _load_pt(d / "coords.pt").astype(np.int32)
        if coords.shape[-1] == 3:
            coords = np.concatenate(
                [np.zeros((len(coords), 1), np.int32), coords], -1)
        cloud = gio.load_ply(d / "gaussians.ply")
        gauss = np.asarray(cloud.to_flat(), np.float32)
        return self._pad(feats, coords, gauss)

    def _pad(self, feats, coords, gauss) -> Dict[str, np.ndarray]:
        mc, mg = self.max_coords, self.max_gaussians
        nc = min(len(coords), mc)
        ng = min(len(gauss), mg)
        c = np.zeros((mc, 4), np.int32)
        c[:nc] = coords[:nc]
        cm = np.zeros(mc, bool)
        cm[:nc] = True
        g = np.zeros((mg, 14), np.float32)
        g[:ng] = gauss[:ng]
        gm = np.zeros(mg, bool)
        gm[:ng] = True
        occ = _occupancy_targets(c[:, 1:4], g[:ng, :3],
                                 self.occupancy_threshold) * cm
        return {"features": feats.astype(np.float32), "coords": c,
                "coord_mask": cm, "gaussians": g, "gaussian_mask": gm,
                "occupancy": occ.astype(np.float32)}

    def __len__(self) -> int:
        return len(self._samples)

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self._samples))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            keys = self._samples[0].keys()
            yield {k: np.stack([self._samples[j][k] for j in idx])
                   for k in keys}


class SyntheticTrellisDataset(TrellisDistillationDataset):
    """Procedural teacher samples: Gaussians on random blob surfaces, coords
    = their (plus noise) voxelization, features = random projections of the
    blob parameters (deterministic per seed)."""

    def __init__(self, n_samples: int = 8, max_coords: int = 512,
                 max_gaussians: int = 1024, n_gaussians: int = 600,
                 feature_dim: int = 1024, num_patches: int = 1369,
                 seed: int = 0):
        self.max_coords = max_coords
        self.max_gaussians = max_gaussians
        self.occupancy_threshold = 0.15
        self._samples = []
        rng = np.random.default_rng(seed)
        for _ in range(n_samples):
            # Blob surface points.
            dirs = rng.normal(size=(n_gaussians, 3))
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
            radii = 0.5 + 0.2 * np.sin(3 * dirs[:, 0]) * np.cos(2 * dirs[:, 1])
            pos = (dirs * radii[:, None]).astype(np.float32)
            gauss = np.zeros((n_gaussians, 14), np.float32)
            gauss[:, :3] = pos
            gauss[:, 3:6] = rng.uniform(0.005, 0.03, (n_gaussians, 3))
            quat = rng.normal(size=(n_gaussians, 4)).astype(np.float32)
            gauss[:, 6:10] = quat / np.linalg.norm(quat, -1, keepdims=True)
            gauss[:, 10:13] = rng.uniform(0.2, 1.0, (n_gaussians, 3))
            gauss[:, 13] = rng.uniform(0.5, 1.0, n_gaussians)

            vox = np.unique(((pos + 1) / 2 * 63).astype(np.int32), axis=0)
            coords = np.concatenate(
                [np.zeros((len(vox), 1), np.int32), vox], -1)
            # Add unoccupied distractor voxels.
            extra = rng.integers(0, 64, size=(len(vox) // 2, 3)).astype(np.int32)
            coords = np.concatenate(
                [coords,
                 np.concatenate([np.zeros((len(extra), 1), np.int32), extra], -1)])
            feats = rng.normal(size=(num_patches, feature_dim)).astype(np.float32)
            self._samples.append(self._pad(feats, coords, gauss))
