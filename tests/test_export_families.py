"""ONNX-export parity across ALL decoder families (VERDICT r3 #8).

The reference exports every experiment family + the physics decoder
(reference: scripts/training/train_gaussian_decoder.py:2060-2143,
export/export_physics_decoder.py); each family here gets a torch mirror
(export/mirrors.py) verified numerically against the Flax forward, then
round-tripped through export_onnx (TorchScript fallback when the onnx
serializer is absent, as in this image).
"""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytest.importorskip("torch")

from fresnel_tpu.export.export_decoder import (  # noqa: E402
    export_onnx,
    flatten_params,
)


def _init_params(config):
    """Init the exact decoder the harness builds for this config."""
    from fresnel_tpu.train.config import PhysicsConfig, TrainingConfig
    from fresnel_tpu.train.harness import build_decoder

    import dataclasses

    known = {f.name for f in dataclasses.fields(TrainingConfig)}
    cfg = TrainingConfig(**{k: v for k, v in config.items() if k in known})
    phys = PhysicsConfig(
        use_wave_rendering=bool(config.get("use_wave_rendering", False)),
        wavelength=float(config.get("physics_wavelength", 0.05)),
        focal_depth=float(config.get("physics_focal_depth", 0.5)),
        learnable_wavelength=bool(
            config.get("physics_learnable_wavelength", True)))
    model = build_decoder(cfg, phys)

    feats = jnp.zeros((1, 37, 37, 384))
    depth = jnp.zeros((1, 64, 64))
    exp = config.get("experiment", 2)
    if exp == 1:
        n = 200
        rot = jnp.zeros((1, n, 4)).at[..., 0].set(1.0)
        return model.init(jax.random.PRNGKey(0), feats,
                          jnp.zeros((1, n, 3)), jnp.ones((1, n, 3)) * 0.05,
                          rot, jnp.zeros((1, n, 3)), jnp.ones((1, n)))
    if exp == 3:
        return model.init(jax.random.PRNGKey(0), feats)
    return model.init(jax.random.PRNGKey(0), feats, depth)


def _randomize(params, seed=7):
    """Random weights everywhere so mirror bugs cannot hide at init."""
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    out = [jnp.asarray(rng.normal(0, 0.2, np.shape(l)).astype(np.float32))
           for l in leaves]
    return jax.tree.unflatten(treedef, out)


CASES = [
    ("exp1_saag_refine", {"experiment": 1}),
    ("exp2_direct", {"experiment": 2, "gaussians_per_patch": 2}),
    ("exp2_surface_init", {"experiment": 2, "gaussians_per_patch": 2,
                           "scale_bias": -2.6, "opacity_bias": 1.5}),
    ("exp2_finer_lattice", {"experiment": 2, "gaussians_per_patch": 1,
                            "feature_upsample": 2}),
    ("exp2_phase_output", {"experiment": 2, "gaussians_per_patch": 2,
                           "use_phase_output": True}),
    ("exp3_feature_guided", {"experiment": 3}),
    ("exp4_fibonacci", {"experiment": 4, "n_spiral_points": 89}),
    ("exp5_nca", {"experiment": 5, "n_spiral_points": 55, "nca_steps": 4,
                  "nca_neighbors": 6}),
    ("physics", {"experiment": 2, "gaussians_per_patch": 2,
                 "use_wave_rendering": True,
                 "physics_wavelength": 0.05, "physics_focal_depth": 0.5,
                 "physics_learnable_wavelength": True}),
]


@pytest.mark.parametrize("name,config", CASES, ids=[c[0] for c in CASES])
def test_family_export_verifies_and_serializes(name, config, tmp_path):
    params = _randomize(_init_params(config))
    out = tmp_path / f"{name}.onnx"
    ok = export_onnx(params, config, str(out), verify=True)
    assert ok, f"{name}: torch mirror disagrees with the Flax forward"
    # ONNX proper, or the TorchScript fallback when onnx is unavailable.
    assert out.exists() or Path(str(out) + ".pt").exists()


def test_nca_randomized_weights_have_all_leaves():
    # Guard: the NCA mirror must consume every NCA parameter (update_out,
    # step_size, ... ) — a missing key would KeyError in the builder.
    from fresnel_tpu.export.mirrors import build_nca_mirror

    config = {"experiment": 5, "n_spiral_points": 34, "nca_steps": 2,
              "nca_neighbors": 4}
    flat = flatten_params(_randomize(_init_params(config)))
    m = build_nca_mirror(flat, config)
    import torch
    with torch.no_grad():
        g = m(torch.randn(1, 384, 37, 37), torch.rand(1, 1, 64, 64))
    assert g.shape == (34, 14)
