"""Novel-view evaluation: orbit cameras, per-view SSIM/coverage,
view-consistency.

Port of the reference evaluator semantics (reference:
scripts/evaluation/novel_view_eval.py:30-290): 8 azimuth cameras around the
subject, frontal SSIM vs target, per-view coverage = fraction of pixels with
mean channel > 0.01, view_consistency = mean over samples of the std of
coverage across angles (lower = better).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.evaluation.spectrum import band_labels, band_power_ratio
from fresnel_tpu.evaluation.visual_eval import compute_psnr, compute_ssim
from fresnel_tpu.render.tile import TileRendererConfig, render_tiled

DEFAULT_AZIMUTHS_DEG = (0, 45, 90, 135, 180, 225, 270, 315)


def render_views(gaussians: Dict[str, jax.Array], render_size: int = 256,
                 azimuths_deg: Sequence[float] = DEFAULT_AZIMUTHS_DEG,
                 elevation_deg: float = 0.0, distance: float = 2.0,
                 max_per_tile: int = 256) -> jnp.ndarray:
    """Render (V, 3, S, S) orbit views of a Gaussian dict."""
    cfg = TileRendererConfig(max_per_tile=max_per_tile)
    views = []
    for az in azimuths_deg:
        cam = Camera.from_pose(np.radians(elevation_deg), np.radians(az),
                               render_size, distance=distance)
        views.append(render_tiled(
            gaussians["positions"], gaussians["scales"],
            gaussians["rotations"], gaussians["colors"],
            gaussians["opacities"], cam, config=cfg))
    return jnp.stack(views)


def evaluate_novel_views(
    samples: List[Dict],                 # each: {"gaussians": dict, "target": (3,S,S)}
    render_size: int = 256,
    azimuths_deg: Sequence[float] = DEFAULT_AZIMUTHS_DEG,
    output_json: Optional[str] = None,
    max_per_tile: int = 256,
) -> Dict:
    """Returns {"per_view": {az: {...}}, "frontal_ssim", "view_consistency"}.

    When a sample carries GT orbit views (corpus_v2 — key "views",
    (V, 3, S, S) at the same azimuths), per-view SSIM/PSNR are computed
    against them: the full novel-view metric the reference could never
    produce (its photo corpora have no side-view ground truth, so its
    exp-011 scores side views by coverage % only)."""
    per_view: Dict[str, List[float]] = {str(az): [] for az in azimuths_deg}
    pv_ssim: Dict[str, List[float]] = {str(az): [] for az in azimuths_deg}
    pv_psnr: Dict[str, List[float]] = {str(az): [] for az in azimuths_deg}
    frontal_ssim, frontal_psnr = [], []
    spec_ratios: List[np.ndarray] = []   # frontal per-band power ratios
    coverage_matrix = []                 # (samples, views)

    for s in samples:
        views = render_views(s["gaussians"], render_size, azimuths_deg,
                             max_per_tile=max_per_tile)
        coverages = [float(jnp.mean((jnp.mean(v, 0) > 0.01).astype(jnp.float32)))
                     for v in views]
        coverage_matrix.append(coverages)
        for az, cov in zip(azimuths_deg, coverages):
            per_view[str(az)].append(cov)
        target = jnp.asarray(s["target"])
        if target.shape[-1] != render_size:
            target = jax.image.resize(target, (3, render_size, render_size),
                                      "linear")
        frontal_ssim.append(compute_ssim(views[0], target))
        frontal_psnr.append(compute_psnr(views[0], target))
        # Spectral texture diagnostic (see evaluation/spectrum.py): the
        # per-octave render/target power ratio localizes WHICH spatial
        # scales the decoder reproduces (T-038: the loss cliff sits at the
        # patch-grid Nyquist).
        spec_edges, ratio = band_power_ratio(np.asarray(views[0]),
                                             np.asarray(target))
        spec_ratios.append(ratio)
        gt_views = s.get("views")
        if gt_views is not None:
            gt_views = jnp.asarray(gt_views)
            if gt_views.shape[-1] != render_size:
                gt_views = jax.image.resize(
                    gt_views, gt_views.shape[:2] + (render_size, render_size),
                    "linear")
            for az, rv, gv in zip(azimuths_deg, views, gt_views):
                pv_ssim[str(az)].append(compute_ssim(rv, gv))
                pv_psnr[str(az)].append(compute_psnr(rv, gv))

    cov = np.asarray(coverage_matrix)
    results = {
        "per_view_coverage": {k: float(np.mean(v)) for k, v in per_view.items()},
        "frontal_ssim": float(np.mean(frontal_ssim)),
        "frontal_psnr": float(np.mean(frontal_psnr)),
        "view_consistency": float(np.mean(np.std(cov, axis=1)))
        if len(cov) else 0.0,
        "num_samples": len(samples),
    }
    if spec_ratios:
        results["spectrum_band_ratio"] = {
            k: round(float(v), 4)
            for k, v in zip(band_labels(spec_edges),
                            np.mean(spec_ratios, axis=0))}
    if any(pv_ssim[k] for k in pv_ssim):
        results["per_view_ssim"] = {
            k: float(np.mean(v)) for k, v in pv_ssim.items() if v}
        results["per_view_psnr"] = {
            k: float(np.mean(v)) for k, v in pv_psnr.items() if v}
        side = [np.mean(pv_ssim[k]) for k in ("90.0", "270.0")
                if pv_ssim.get(k)] or \
               [np.mean(pv_ssim[k]) for k in ("90", "270") if pv_ssim.get(k)]
        nonfrontal = [v for k, v in results["per_view_ssim"].items()
                      if float(k) != 0.0]
        results["side_view_ssim"] = float(np.mean(side)) if side else None
        results["novel_view_ssim"] = (float(np.mean(nonfrontal))
                                      if nonfrontal else None)
    if output_json:
        Path(output_json).parent.mkdir(parents=True, exist_ok=True)
        Path(output_json).write_text(json.dumps(results, indent=2))
    return results
