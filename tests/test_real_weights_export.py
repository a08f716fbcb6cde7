"""The full real-weights path, end to end, in the EXACT HF export format.

Round-3 verdict: the strict converters had been parity-tested against torch
module mirrors, but never against a checkpoint in the exact format
`save_pretrained` ships for `facebook/dinov2-small` (reference:
scripts/export/export_dinov2_model.py:38) and
`Depth-Anything-V2-Small-hf` (export_depth_model.py:15).  Zero egress means
no pretrained values, but the FORMAT is fully reproducible offline: these
tests fabricate random-init HF models at the exact V2-small sizes, export
with `save_pretrained` (model.safetensors + config.json), and push them
through the complete production path — safetensors loader -> converter ->
strict apply -> out_indices config override -> numerical parity vs the
torch forward (<=1e-4).
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from fresnel_tpu.models.vit import (  # noqa: E402
    DA_OUT_INDICES,
    IMAGENET_MEAN,
    IMAGENET_STD,
    VIT_CONFIGS,
    DepthAnything,
    load_depth_anything,
    load_dinov2,
)


def _perturb(model, seed=1):
    """Give constant-init leaves (LayerScale=1.0 etc.) real diversity so a
    transposition bug cannot hide behind symmetric weights."""
    sd = model.state_dict()
    gen = torch.Generator().manual_seed(seed)
    for v in sd.values():
        if v.ndim >= 1 and v.is_floating_point():
            v.add_(0.05 * torch.randn(v.shape, generator=gen))
    model.load_state_dict(sd)
    return model


class TestDinov2SmallExport:
    def test_save_pretrained_roundtrip_parity(self, tmp_path):
        from transformers import Dinov2Config, Dinov2Model

        cfg = Dinov2Config(
            hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
            mlp_ratio=4, image_size=518, patch_size=14,
            layerscale_value=1.0, attn_implementation="eager")
        torch.manual_seed(0)
        hf = _perturb(Dinov2Model(cfg)).eval()
        out_dir = tmp_path / "dinov2-small"
        hf.save_pretrained(out_dir)                 # exact HF export format
        weights = out_dir / "model.safetensors"
        assert weights.exists()                     # transformers >= 4.35

        fn, params = load_dinov2("small", str(weights), image_size=518)
        n_leaves = len(jax.tree.leaves(params))
        assert n_leaves > 0

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(1, 518, 518, 3)).astype(np.float32)
        px = (img - IMAGENET_MEAN) / IMAGENET_STD
        with torch.no_grad():
            t_out = hf(torch.from_numpy(px.transpose(0, 3, 1, 2)))
        t_feats = t_out.last_hidden_state[:, 1:].reshape(1, 37, 37, 384)

        j_feats = np.asarray(fn(jnp.asarray(img)))
        err = float(np.max(np.abs(j_feats - t_feats.numpy())))
        assert err <= 1e-4, f"dinov2-small export parity error {err}"


class TestDepthAnythingSmallExport:
    def test_save_pretrained_roundtrip_parity(self, tmp_path):
        from transformers import (DepthAnythingConfig,
                                  DepthAnythingForDepthEstimation)

        # The REAL Depth-Anything-V2-Small-hf config: out_indices [3,6,9,12]
        # in config.json (the bare DepthAnythingConfig default is [9,10,11,
        # 12] — the sidecar must win, vit.py:_checkpoint_out_indices).
        backbone = dict(
            model_type="dinov2", hidden_size=384, num_hidden_layers=12,
            num_attention_heads=6, mlp_ratio=4, image_size=518,
            patch_size=14, layerscale_value=1.0,
            out_indices=[3, 6, 9, 12], apply_layernorm=True,
            reshape_hidden_states=False, attn_implementation="eager")
        cfg = DepthAnythingConfig(
            backbone_config=backbone, reassemble_hidden_size=384,
            patch_size=14, neck_hidden_sizes=[48, 96, 192, 384],
            fusion_hidden_size=64, head_hidden_size=32,
            depth_estimation_type="relative")
        torch.manual_seed(0)
        hf = _perturb(DepthAnythingForDepthEstimation(cfg)).eval()
        out_dir = tmp_path / "depth-anything-v2-small"
        hf.save_pretrained(out_dir)
        weights = out_dir / "model.safetensors"
        assert weights.exists()
        saved_cfg = json.loads((out_dir / "config.json").read_text())
        assert saved_cfg["backbone_config"]["out_indices"] == [3, 6, 9, 12]

        # Production loader: reads config.json next to the weights, builds
        # the model with the checkpoint's taps, strictly applies every leaf.
        fn, params = load_depth_anything("small", str(weights), out_size=256)
        d = fn(jnp.asarray(np.zeros((1, 518, 518, 3), np.float32)))
        assert d.shape == (1, 256, 256)

        # Numerical parity on the raw (pre-normalization) head output.
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(1, 518, 518, 3)).astype(np.float32)
        px = (img - IMAGENET_MEAN) / IMAGENET_STD
        with torch.no_grad():
            t_depth = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))
                         ).predicted_depth.numpy()

        model = DepthAnything(out_size=256, out_indices=DA_OUT_INDICES,
                              **VIT_CONFIGS["small"])
        j_depth = np.asarray(
            model.apply(params, jnp.asarray(img), raw=True))
        assert j_depth.shape == t_depth.shape
        scale = max(1.0, float(np.max(np.abs(t_depth))))
        err = float(np.max(np.abs(j_depth - t_depth))) / scale
        assert err <= 1e-4, f"depth-anything export parity error {err}"

    def test_default_out_indices_would_differ(self, tmp_path):
        """Guard: if the config.json is ABSENT the loader must fall back to
        DA_OUT_INDICES (3,6,9,12) — which matches the real checkpoint — and
        never to transformers' bare default (9,10,11,12)."""
        from fresnel_tpu.models.vit import _checkpoint_out_indices

        assert _checkpoint_out_indices(str(tmp_path / "w.safetensors")) is None
        assert DA_OUT_INDICES == (3, 6, 9, 12)
