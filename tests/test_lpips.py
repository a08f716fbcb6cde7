"""LPIPS converter parity: Flax LPIPS == torch lpips-alex computation.

Builds a torch AlexNet-feature mirror with lpips-package state-dict naming
(random weights — no downloads), computes the LPIPS distance the way
`lpips.LPIPS(net='alex', spatial=False)` does, and requires the converted
Flax model to match to <=1e-5.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fresnel_tpu.losses.lpips import (
    LPIPS, _ALEX_CFG, _SHIFT, _SCALE, convert_torch_lpips, load_lpips)


def _build_torch_sd(torch, rng):
    """lpips.LPIPS(net='alex') style state dict with random weights."""
    sd = {}
    tv_idx = [0, 3, 6, 8, 10]          # torchvision alexnet conv indices
    slices = [1, 2, 3, 4, 5]
    in_c = 3
    for (out_c, k, s, p), j, sl in zip(_ALEX_CFG, tv_idx, slices):
        w = rng.normal(size=(out_c, in_c, k, k)).astype(np.float32) * 0.05
        b = rng.normal(size=(out_c,)).astype(np.float32) * 0.05
        sd[f"net.slice{sl}.{j}.weight"] = torch.from_numpy(w)
        sd[f"net.slice{sl}.{j}.bias"] = torch.from_numpy(b)
        in_c = out_c
    for i, (out_c, _, _, _) in enumerate(_ALEX_CFG):
        lw = np.abs(rng.normal(size=(1, out_c, 1, 1))).astype(np.float32)
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(lw)
    return sd


def _torch_lpips_forward(torch, sd, img1, img2):
    """Reference computation (mirrors lpips/lpips.py forward, spatial=False)."""
    F = torch.nn.functional
    shift = torch.from_numpy(_SHIFT).reshape(1, 3, 1, 1)
    scale = torch.from_numpy(_SCALE).reshape(1, 3, 1, 1)

    def features(x):
        feats = []
        tv_idx = [0, 3, 6, 8, 10]
        slices = [1, 2, 3, 4, 5]
        for i, ((c, k, s, p), j, sl) in enumerate(
                zip(_ALEX_CFG, tv_idx, slices)):
            x = F.conv2d(x, sd[f"net.slice{sl}.{j}.weight"],
                         sd[f"net.slice{sl}.{j}.bias"], stride=s, padding=p)
            x = F.relu(x)
            feats.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, stride=2)
        return feats

    x1 = (torch.from_numpy(img1) - shift) / scale
    x2 = (torch.from_numpy(img2) - shift) / scale
    f1, f2 = features(x1), features(x2)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / (torch.sqrt(torch.sum(a * a, dim=1, keepdim=True)) + 1e-10)
        b = b / (torch.sqrt(torch.sum(b * b, dim=1, keepdim=True)) + 1e-10)
        diff = (a - b) ** 2
        w = sd[f"lin{i}.model.1.weight"].reshape(-1)
        lin = torch.einsum("bchw,c->bhw", diff, w)
        total = total + lin.mean(dim=(1, 2))
    return total.numpy()


class TestLPIPSParity:
    def test_matches_torch_mirror(self, tmp_path):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        sd = _build_torch_sd(torch, rng)
        ckpt = tmp_path / "lpips_alex.pth"
        torch.save(sd, ckpt)

        img1 = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
        img2 = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = _torch_lpips_forward(torch, sd, img1, img2)

        apply_fn, params = load_lpips(str(ckpt))
        ours = np.asarray(apply_fn(params, jnp.asarray(img1),
                                   jnp.asarray(img2)))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)

    def test_identical_images_zero(self, tmp_path):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        sd = _build_torch_sd(torch, rng)
        ckpt = tmp_path / "lpips_alex.pth"
        torch.save(sd, ckpt)
        apply_fn, params = load_lpips(str(ckpt))
        img = jnp.asarray(
            rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32))
        d = float(apply_fn(params, img, img)[0])
        assert abs(d) < 1e-6

    def test_missing_lin_raises(self, tmp_path):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        sd = _build_torch_sd(torch, rng)
        del sd["lin3.model.1.weight"]
        ckpt = tmp_path / "broken.pth"
        torch.save(sd, ckpt)
        with pytest.raises(ValueError, match="lin0..lin4"):
            convert_torch_lpips(str(ckpt))

    def test_wrong_conv_count_raises(self, tmp_path):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        sd = _build_torch_sd(torch, rng)
        del sd["net.slice5.10.weight"], sd["net.slice5.10.bias"]
        ckpt = tmp_path / "broken2.pth"
        torch.save(sd, ckpt)
        with pytest.raises(ValueError, match="5 AlexNet convs"):
            convert_torch_lpips(str(ckpt))
