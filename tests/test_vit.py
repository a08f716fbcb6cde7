"""DINOv2/DepthAnything architecture + weight-converter tests.

The converters' ground truth is the HF torch implementations the reference
exports from (reference: scripts/export/export_dinov2_model.py:38,
export_depth_model.py:15).  The parity tests below build those exact torch
modules (random init — no downloads), convert their state dicts, and require
the Flax forward to match torch to <=1e-4, including the bicubic pos-embed
interpolation path for 224-grid checkpoints evaluated at 518².
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.models.vit import (
    DINOv2, DepthAnything, VIT_CONFIGS, convert_dinov2_torch,
    convert_depth_anything_torch, interpolate_pos_embed, _apply_flat)


class TestDINOv2:
    def test_forward_shape(self):
        # Tiny config for test speed; same architecture.
        model = DINOv2(width=64, depth=2, heads=2, image_size=56)
        x = jnp.zeros((1, 56, 56, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 4, 4, 64)   # 56/14 = 4 grid

    def test_param_count_small_config(self):
        model = DINOv2(image_size=56, **VIT_CONFIGS["small"])
        x = jnp.zeros((1, 56, 56, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        n = sum(p.size for p in jax.tree.leaves(params))
        # DINOv2-small is ~22M params (pos embed differs with image size).
        assert 18e6 < n < 26e6

    def test_taps_shapes(self):
        model = DINOv2(width=64, depth=4, heads=2, image_size=56)
        x = jnp.zeros((2, 56, 56, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        taps = model.apply(params, x, out_indices=(1, 2, 3, 4))
        assert len(taps) == 4
        for t in taps:
            assert t.shape == (2, 17, 64)   # 4*4 patches + CLS

    def test_bf16_compute_matches_f32(self):
        """dtype=bfloat16 (the TPU inference configuration used by bench.py
        and the real-weights factories) must agree with f32 to bf16
        precision: params/softmax/outputs stay f32, only block compute is
        cast."""
        kw = dict(width=64, depth=2, heads=2, image_size=56)
        m32 = DINOv2(**kw)
        m16 = DINOv2(dtype=jnp.bfloat16, **kw)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            size=(1, 56, 56, 3)).astype(np.float32))
        params = m32.init(jax.random.PRNGKey(0), x)
        f32 = np.asarray(m32.apply(params, x))
        f16 = np.asarray(m16.apply(params, x))   # same f32 params
        assert f16.dtype == np.float32           # outputs cast back
        # Feature-level agreement: high correlation, bounded rel error.
        denom = np.maximum(np.abs(f32).max(), 1e-6)
        assert np.abs(f16 - f32).max() / denom < 0.05
        c = np.corrcoef(f32.ravel(), f16.ravel())[0, 1]
        assert c > 0.999

    def test_depth_anything_bf16_matches_f32(self):
        kw = dict(width=64, depth=4, heads=2, out_size=32, image_size=56,
                  out_indices=(1, 2, 3, 4), neck_channels=(8, 16, 32, 64),
                  fusion=16, head_hidden=8)
        m32 = DepthAnything(**kw)
        m16 = DepthAnything(dtype=jnp.bfloat16, **kw)
        x = jnp.asarray(np.random.default_rng(1).uniform(
            size=(1, 56, 56, 3)).astype(np.float32))
        params = m32.init(jax.random.PRNGKey(0), x)
        d32 = np.asarray(m32.apply(params, x))
        d16 = np.asarray(m16.apply(params, x))
        assert d16.dtype == np.float32
        # Depth is min-max normalized to [0,1]; absolute agreement.
        assert np.abs(d16 - d32).max() < 0.1
        assert np.corrcoef(d32.ravel(), d16.ravel())[0, 1] > 0.99

    def test_depth_anything_output(self):
        model = DepthAnything(width=64, depth=4, heads=2, out_size=32,
                              image_size=56, out_indices=(1, 2, 3, 4),
                              neck_channels=(8, 16, 32, 64), fusion=16,
                              head_hidden=8)
        x = jnp.zeros((1, 56, 56, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 32, 32)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_fused_trunk_matches_sequential(self):
        """fused_features_and_depth (one vmapped trunk over stacked weights)
        must reproduce DINOv2.__call__ and DepthAnything.__call__ exactly —
        the fused path is pure restructuring, not an approximation."""
        from fresnel_tpu.models.vit import (
            fused_features_and_depth, stack_trunk_params)

        kw = dict(width=64, depth=4, heads=2)
        dino = DINOv2(image_size=56, **kw)
        depth_model = DepthAnything(
            out_size=32, image_size=56, out_indices=(1, 2, 4),
            neck_channels=(8, 16, 32), fusion=16, head_hidden=8, **kw)
        x = jnp.asarray(np.random.default_rng(2).uniform(
            size=(2, 56, 56, 3)).astype(np.float32))
        dino_params = dino.init(jax.random.PRNGKey(1), x)
        depth_params = depth_model.init(jax.random.PRNGKey(2), x)

        feats_ref = np.asarray(dino.apply(dino_params, x))
        depth_ref = np.asarray(depth_model.apply(depth_params, x))

        stacked = stack_trunk_params(dino_params, depth_params)
        feats, depth = jax.jit(
            lambda s, p, im: fused_features_and_depth(
                depth_model, s, p, im))(stacked, depth_params, x)
        assert feats.dtype == jnp.float32 and depth.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(feats), feats_ref,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), depth_ref,
                                   rtol=1e-5, atol=1e-5)

    def test_fused_trunk_adds_missing_final_tap(self):
        """out_indices that omit the final layer still yield correct DINOv2
        features (the fused path unions in the `depth` tap)."""
        from fresnel_tpu.models.vit import (
            fused_features_and_depth, stack_trunk_params)

        kw = dict(width=64, depth=4, heads=2)
        dino = DINOv2(image_size=56, **kw)
        depth_model = DepthAnything(
            out_size=32, image_size=56, out_indices=(1, 2, 3),
            neck_channels=(8, 16, 32), fusion=16, head_hidden=8, **kw)
        x = jnp.asarray(np.random.default_rng(3).uniform(
            size=(1, 56, 56, 3)).astype(np.float32))
        dino_params = dino.init(jax.random.PRNGKey(3), x)
        depth_params = depth_model.init(jax.random.PRNGKey(4), x)
        stacked = stack_trunk_params(dino_params, depth_params)
        feats, depth = fused_features_and_depth(
            depth_model, stacked, depth_params, x)
        np.testing.assert_allclose(
            np.asarray(feats), np.asarray(dino.apply(dino_params, x)),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(depth), np.asarray(depth_model.apply(depth_params, x)),
            rtol=1e-5, atol=1e-5)


def _tiny_hf_dinov2(torch, width=64, depth=2, heads=2, image_size=224):
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=width, num_hidden_layers=depth,
        num_attention_heads=heads, mlp_ratio=4, image_size=image_size,
        patch_size=14, layerscale_value=1.0, attn_implementation="eager")
    torch.manual_seed(0)
    model = Dinov2Model(cfg)
    model.eval()
    # Random init leaves layerscale at 1.0 and pos embeds ~N(0,1): give the
    # weights realistic diversity so a transposition bug cannot hide.
    sd = model.state_dict()
    gen = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if v.ndim >= 1:
            v.add_(0.05 * torch.randn(v.shape, generator=gen))
    model.load_state_dict(sd)
    return model


class TestHFParity:
    """Flax forward == HF torch forward after conversion (<=1e-4)."""

    def test_dinov2_matches_hf_with_pos_interp(self, tmp_path):
        torch = pytest.importorskip("torch")
        pytest.importorskip("transformers")

        width, depth, heads = 64, 2, 2
        # Checkpoint trained at 224 (17x... 16x16 grid, 257 tokens);
        # evaluated at 518 (37x37 grid) -> exercises bicubic interpolation.
        hf = _tiny_hf_dinov2(torch, width, depth, heads, image_size=224)
        assert hf.embeddings.position_embeddings.shape[1] == 16 * 16 + 1

        ckpt = tmp_path / "dinov2_hf.pth"
        torch.save(hf.state_dict(), ckpt)

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(1, 518, 518, 3)).astype(np.float32)

        from fresnel_tpu.models.vit import IMAGENET_MEAN, IMAGENET_STD
        px = (img - IMAGENET_MEAN) / IMAGENET_STD
        with torch.no_grad():
            t_out = hf(torch.from_numpy(px.transpose(0, 3, 1, 2)))
        t_feats = t_out.last_hidden_state[:, 1:].reshape(1, 37, 37, width)

        model = DINOv2(width=width, depth=depth, heads=heads, image_size=518)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
        import fresnel_tpu.models.vit as vit
        backup = dict(vit.VIT_CONFIGS)
        vit.VIT_CONFIGS["tiny"] = dict(width=width, depth=depth, heads=heads)
        try:
            flat = convert_dinov2_torch(str(ckpt), "tiny", image_size=518)
        finally:
            vit.VIT_CONFIGS.clear()
            vit.VIT_CONFIGS.update(backup)
        params, applied = _apply_flat(params, flat)
        assert applied == len(flat)

        j_feats = model.apply(params, jnp.asarray(img))
        err = float(np.max(np.abs(np.asarray(j_feats) - t_feats.numpy())))
        assert err <= 1e-4, f"DINOv2 parity error {err}"

    def test_depth_anything_matches_hf(self, tmp_path):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from transformers import (DepthAnythingConfig,
                                  DepthAnythingForDepthEstimation)

        width, depth, heads = 64, 4, 2
        size = 224  # grid 16
        backbone = dict(
            model_type="dinov2", hidden_size=width, num_hidden_layers=depth,
            num_attention_heads=heads, mlp_ratio=4, image_size=size,
            patch_size=14, layerscale_value=1.0,
            out_indices=[1, 2, 3, 4], apply_layernorm=True,
            reshape_hidden_states=False, attn_implementation="eager")
        cfg = DepthAnythingConfig(
            backbone_config=backbone, reassemble_hidden_size=width,
            patch_size=14, neck_hidden_sizes=[16, 32, 64, 128],
            fusion_hidden_size=32, head_hidden_size=16,
            depth_estimation_type="relative")
        torch.manual_seed(0)
        hf = DepthAnythingForDepthEstimation(cfg)
        hf.eval()
        sd = hf.state_dict()
        gen = torch.Generator().manual_seed(1)
        for k, v in sd.items():
            if v.ndim >= 1:
                v.add_(0.05 * torch.randn(v.shape, generator=gen))
        hf.load_state_dict(sd)
        ckpt = tmp_path / "depth_anything.pth"
        torch.save(hf.state_dict(), ckpt)

        rng = np.random.default_rng(1)
        img = rng.uniform(size=(1, size, size, 3)).astype(np.float32)
        from fresnel_tpu.models.vit import IMAGENET_MEAN, IMAGENET_STD
        px = (img - IMAGENET_MEAN) / IMAGENET_STD
        with torch.no_grad():
            t_depth = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))
                         ).predicted_depth.numpy()

        model = DepthAnything(
            width=width, depth=depth, heads=heads, image_size=size,
            out_indices=(1, 2, 3, 4), neck_channels=(16, 32, 64, 128),
            fusion=32, head_hidden=16)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
        import fresnel_tpu.models.vit as vit
        backup = dict(vit.VIT_CONFIGS)
        vit.VIT_CONFIGS["tiny"] = dict(width=width, depth=depth, heads=heads)
        try:
            flat = convert_depth_anything_torch(str(ckpt), "tiny",
                                                image_size=size)
        finally:
            vit.VIT_CONFIGS.clear()
            vit.VIT_CONFIGS.update(backup)
        params, applied = _apply_flat(params, flat)
        assert applied == len(flat)

        j_depth = np.asarray(model.apply(params, jnp.asarray(img), raw=True))
        assert j_depth.shape == t_depth.shape
        scale = max(1.0, float(np.max(np.abs(t_depth))))
        err = float(np.max(np.abs(j_depth - t_depth))) / scale
        assert err <= 1e-4, f"DepthAnything parity error {err}"

    def test_bicubic_pos_interp_matches_torch(self):
        torch = pytest.importorskip("torch")

        rng = np.random.default_rng(2)
        pos = rng.normal(size=(1, 16 * 16 + 1, 32)).astype(np.float32)
        ours = interpolate_pos_embed(pos, 37)
        grid = torch.from_numpy(
            pos[:, 1:].reshape(1, 16, 16, 32).transpose(0, 3, 1, 2))
        ref = torch.nn.functional.interpolate(
            grid.double(), size=(37, 37), mode="bicubic",
            align_corners=False).float()
        ref = ref.permute(0, 2, 3, 1).reshape(1, 37 * 37, 32).numpy()
        np.testing.assert_allclose(ours[:, 1:], ref, atol=2e-5)
        np.testing.assert_allclose(ours[:, :1], pos[:, :1], atol=0)


class TestStrictApply:
    def _setup(self):
        model = DINOv2(width=32, depth=1, heads=2, image_size=28)
        x = jnp.zeros((1, 28, 28, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        from fresnel_tpu.models.vit import _flatten_params
        import flax
        flat = {k: np.asarray(v) for k, v in _flatten_params(
            flax.core.unfreeze(params)["params"]).items()}
        return params, flat

    def test_full_load_ok(self):
        params, flat = self._setup()
        out, applied = _apply_flat(params, flat)
        assert applied == len(flat)

    def test_missing_key_raises(self):
        params, flat = self._setup()
        flat.pop("norm/scale")
        with pytest.raises(ValueError, match="not in checkpoint"):
            _apply_flat(params, flat)

    def test_unexpected_key_raises(self):
        params, flat = self._setup()
        flat["bogus/key"] = np.zeros((3,), np.float32)
        with pytest.raises(ValueError, match="no parameter"):
            _apply_flat(params, flat)

    def test_shape_mismatch_raises(self):
        params, flat = self._setup()
        flat["cls_token"] = np.zeros((1, 1, 64), np.float32)
        with pytest.raises(ValueError, match="shape mismatch"):
            _apply_flat(params, flat)


class TestWeightConverter:
    def test_torch_roundtrip_facebook_naming(self, tmp_path):
        """Fabricate a facebook-research-style (fused qkv) torch DINOv2
        state dict, convert, and check strict full application."""
        torch = pytest.importorskip("torch")

        width, depth, heads, g = 64, 2, 2, 4
        sd = {}
        rng = np.random.default_rng(0)

        def t(shape):
            return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

        sd["patch_embed.proj.weight"] = t((width, 3, 14, 14))
        sd["patch_embed.proj.bias"] = t((width,))
        sd["cls_token"] = t((1, 1, width))
        sd["pos_embed"] = t((1, g * g + 1, width))
        for i in range(depth):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = t((width,))
            sd[p + "norm1.bias"] = t((width,))
            sd[p + "attn.qkv.weight"] = t((3 * width, width))
            sd[p + "attn.qkv.bias"] = t((3 * width,))
            sd[p + "attn.proj.weight"] = t((width, width))
            sd[p + "attn.proj.bias"] = t((width,))
            sd[p + "ls1.gamma"] = t((width,))
            sd[p + "norm2.weight"] = t((width,))
            sd[p + "norm2.bias"] = t((width,))
            sd[p + "mlp.fc1.weight"] = t((4 * width, width))
            sd[p + "mlp.fc1.bias"] = t((4 * width,))
            sd[p + "mlp.fc2.weight"] = t((width, 4 * width))
            sd[p + "mlp.fc2.bias"] = t((width,))
            sd[p + "ls2.gamma"] = t((width,))
        sd["norm.weight"] = t((width,))
        sd["norm.bias"] = t((width,))
        ckpt = tmp_path / "dinov2.pth"
        torch.save(sd, ckpt)

        import fresnel_tpu.models.vit as vit
        vit_cfgs_backup = dict(vit.VIT_CONFIGS)
        vit.VIT_CONFIGS["tiny"] = dict(width=width, depth=depth, heads=heads)
        try:
            flat = convert_dinov2_torch(str(ckpt), "tiny", image_size=56)
        finally:
            vit.VIT_CONFIGS.clear()
            vit.VIT_CONFIGS.update(vit_cfgs_backup)

        model = DINOv2(width=width, depth=depth, heads=heads, image_size=56)
        x = jnp.asarray(rng.uniform(size=(1, 56, 56, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        out_random = model.apply(params, x)
        params2, applied = _apply_flat(params, flat)
        assert applied == len(flat), f"only {applied}/{len(flat)} applied"
        out_loaded = model.apply(params2, x)
        # Loaded weights produce different output than random init.
        assert float(jnp.max(jnp.abs(out_loaded - out_random))) > 1e-3
        # And the qkv kernel matches the transposed torch weight.
        k = np.asarray(
            params2["params"]["block_0"]["attn"]["qkv"]["kernel"])
        np.testing.assert_allclose(
            k, sd["blocks.0.attn.qkv.weight"].numpy().T, atol=1e-6)

    def test_backbone_only_checkpoint_refused_for_depth(self, tmp_path):
        torch = pytest.importorskip("torch")
        sd = {"patch_embed.proj.weight": torch.zeros((64, 3, 14, 14))}
        ckpt = tmp_path / "backbone_only.pth"
        torch.save(sd, ckpt)
        with pytest.raises(ValueError, match="no DPT neck"):
            convert_depth_anything_torch(str(ckpt), "small")


class TestOutIndices:
    """Backbone tap pinning (ADVICE r2 high): the DA-V2-small checkpoint's
    backbone_config.out_indices is [3, 6, 9, 12] (official DA repo taps
    layers [2, 5, 8, 11] 0-based for vits) — NOT the bare HF
    DepthAnythingConfig default (9, 10, 11, 12)."""

    def test_v2_small_tap_set_pinned(self):
        from fresnel_tpu.models.vit import DA_OUT_INDICES
        assert DA_OUT_INDICES == (3, 6, 9, 12)
        assert DepthAnything().out_indices == (3, 6, 9, 12)

    def test_config_json_out_indices_read(self, tmp_path):
        import json
        from fresnel_tpu.models.vit import _checkpoint_out_indices
        w = tmp_path / "model.pth"
        w.write_bytes(b"")
        assert _checkpoint_out_indices(str(w)) is None
        (tmp_path / "config.json").write_text(json.dumps(
            {"backbone_config": {"out_indices": [3, 6, 9, 12]}}))
        assert _checkpoint_out_indices(str(w)) == (3, 6, 9, 12)
        # Malformed config -> None, not a crash.
        (tmp_path / "config.json").write_text("{not json")
        assert _checkpoint_out_indices(str(w)) is None

    def test_taps_change_output(self):
        """Different tap sets must produce different depth maps — guards
        against taps being silently ignored."""
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(size=(1, 56, 56, 3)).astype(np.float32))
        kw = dict(width=32, depth=4, heads=2, out_size=16, image_size=56,
                  neck_channels=(8, 8, 8, 8), fusion=8, head_hidden=8)
        m1 = DepthAnything(out_indices=(1, 2, 3, 4), **kw)
        m2 = DepthAnything(out_indices=(2, 3, 4), **kw)
        params = m1.init(jax.random.PRNGKey(0), img)
        d1 = m1.apply(params, img, raw=True)
        with pytest.raises(Exception):
            # 3 taps vs 4 neck levels must fail loudly, not mis-wire.
            m2.init(jax.random.PRNGKey(0), img)
        assert np.isfinite(np.asarray(d1)).all()
