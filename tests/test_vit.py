"""DINOv2/DepthAnything architecture + weight-converter tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.models.vit import (
    DINOv2, DepthAnything, VIT_CONFIGS, convert_dinov2_torch, _apply_flat)


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

    def test_depth_anything_output(self):
        model = DepthAnything(width=64, depth=2, heads=2, out_size=32)
        x = jnp.zeros((1, 518, 518, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 32, 32)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestWeightConverter:
    def test_torch_roundtrip(self, tmp_path):
        """Fabricate a torch DINOv2 state dict, convert, and check the
        weights actually land in the Flax params."""
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
            flat = convert_dinov2_torch(str(ckpt), "tiny")
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
