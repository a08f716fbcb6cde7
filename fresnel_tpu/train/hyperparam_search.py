"""Hyperparameter search trial runner.

Rebuild of the reference's trial runner (reference:
scripts/training/hyperparam_search.py:94-141): short training trials scored
by a Chamfer metric between decoder outputs and a geometric target cloud
(the reference monkey-patched position_offset_scale per trial; here the
searched parameters flow through the config).  Complements
fresnel_tpu.train.auto_tune (SSIM objective, successive halving) with the
Chamfer objective.

Run:  python -m fresnel_tpu.train.hyperparam_search --synthetic --trials 4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path

import numpy as np

from fresnel_tpu.train.auto_tune import sample_params


def chamfer_score(trainer, state, dataset) -> float:
    """Negative symmetric Chamfer distance between decoder outputs and the
    SAAG cloud derived from each sample's depth (higher = better)."""
    import jax.numpy as jnp
    from fresnel_tpu.losses.matching import gaussian_matching_loss
    from fresnel_tpu.train.harness import saag_prior_from_depth

    rng = np.random.default_rng(0)
    scores = []
    for batch in dataset.batches(1, rng, shuffle=False):
        feats = jnp.asarray(batch["features"])
        depth = jnp.asarray(batch["depth"])
        out = trainer.model.apply(state["params"]["model"], feats, depth)
        saag = saag_prior_from_depth(depth)
        pred = jnp.concatenate(
            [out["positions"], out["scales"], out["rotations"],
             out["colors"], out["opacities"][..., None]], -1)
        tgt = jnp.concatenate(
            [saag["saag_positions"], saag["saag_scales"],
             saag["saag_rotations"], saag["saag_colors"],
             saag["saag_opacities"][..., None]], -1)
        ld = gaussian_matching_loss(pred, tgt, max_match_points=1024)
        scores.append(-float(ld["position"] + ld["coverage"]))
        if len(scores) >= 4:
            break
    return float(np.mean(scores))


def run_search(base_config, dataset, n_trials: int = 8,
               trial_epochs: int = 2, output_dir: str = "hyperparam_search"):
    from fresnel_tpu.train.config import HFGSConfig, HFTSConfig, PhysicsConfig
    from fresnel_tpu.train.harness import Trainer

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    results = []
    for t in range(n_trials):
        params = sample_params(t)
        cfg = dataclasses.replace(
            base_config, lr=params["lr"],
            ssim_weight=params["ssim_weight"],
            depth_weight=params["depth_weight"],
            output_dir=str(out / f"trial_{t}"), epochs=trial_epochs,
            save_interval=10_000)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(use_phase_retrieval_loss=False,
                                     use_frequency_loss=False,
                                     learnable_wavelengths=False),
                          HFTSConfig())
        state = trainer.fit(dataset, epochs=trial_epochs,
                            log_fn=lambda *_: None)
        score = chamfer_score(trainer, state, dataset)
        results.append({"trial": t, "params": params, "chamfer": score})
        print(f"trial {t}: chamfer={score:.4f} lr={params['lr']:.2e}")
    best = max(results, key=lambda r: r["chamfer"])
    (out / "results.json").write_text(json.dumps(
        {"trials": results, "best": best}, indent=2))
    print(f"best: {best}")
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="images")
    p.add_argument("--output_dir", default="hyperparam_search")
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--trial_epochs", type=int, default=2)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args(argv)

    from fresnel_tpu.train.config import TrainingConfig

    cfg = TrainingConfig(experiment=2, image_size=args.image_size,
                         batch_size=2, gaussians_per_patch=1,
                         lpips_weight=0.0)
    if args.synthetic:
        from fresnel_tpu.data.dataset import SyntheticGaussianDataset
        dataset = SyntheticGaussianDataset(n_samples=4,
                                           image_size=args.image_size)
    else:
        from fresnel_tpu.data.dataset import ImageDataset
        dataset = ImageDataset(args.data_dir, image_size=args.image_size)
    run_search(cfg, dataset, args.trials, args.trial_epochs, args.output_dir)


if __name__ == "__main__":
    main()
