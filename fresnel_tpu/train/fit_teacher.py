"""Decoder-space per-scene Gaussian fitting — distillation teacher generator.

T-023 showed a free per-scene fit at the exp-2 budget reaches SSIM 0.987
while render-loss decoder training plateaus at ~0.70: the gap is decoder
OPTIMIZATION, not representation.  The reference closed analogous gaps with
its v2 distillation trainer (reference: scripts/training/
train_direct_decoder.py — regress decoder outputs onto per-scene-optimized
targets).  This module produces such targets for the DirectPatchDecoder
family, with one crucial difference from the T-023 free fit: the teacher is
optimized IN THE DECODER'S OWN OUTPUT SPACE — raw head values
(B, 37, 37, K, 16) pushed through the exact `head_transform` the decoder
uses (Z locked to depth, shared per-patch z, edge-aware modulation, the
same activation chain).  Every teacher is therefore expressible by the
decoder BY CONSTRUCTION, and the distillation loss is plain regression on
raw head outputs — no Chamfer matching, no activation inverses, no
unreachable targets.

Teachers are saved as `{scene}_teacher.npz` next to each image, the same
sidecar-cache contract as the depth/feature caches (data/dataset.py).

Run:
  python -m fresnel_tpu.train.fit_teacher --data_dir data/corpus_v1
  python -m fresnel_tpu.train.fit_teacher --data_dir data/corpus_v1 \
      --scenes 3 --no_save        # ceiling probe only
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

OPG = 16                     # outputs per Gaussian (no phase head)
IDENTITY_6D = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


def teacher_path(img_path: Path, experiment: int = 2) -> Path:
    """Sidecar path; exp-2 keeps the round-2 name, other experiments get a
    numbered suffix so both teacher sets can coexist per scene."""
    suffix = "_teacher.npz" if experiment == 2 else f"_teacher{experiment}.npz"
    return img_path.with_name(img_path.stem + suffix)


def init_raw(image: np.ndarray, depth: np.ndarray, camera, *,
             grid: int = 37, K: int = 4,
             head_kwargs: Optional[dict] = None) -> np.ndarray:
    """Surface init in raw head space: K Gaussians per patch spread on a
    sub-grid, sigma ~= sub-grid pitch, opacity ~0.8, colors sampled from the
    image at each Gaussian's actual projected pixel (convention-proof: uses
    the camera's own projection on head_transform's positions)."""
    import jax.numpy as jnp

    from fresnel_tpu.models.decoders import head_transform

    raw = np.zeros((1, grid, grid, K, OPG), np.float32)
    # 2x2 sub-grid XY offsets within each patch.  Patch pitch in the base
    # grid is 2/(grid-1); raw offsets are scaled by 0.25.
    pitch = 2.0 / (grid - 1)
    side = int(np.ceil(np.sqrt(K)))
    offs = (np.arange(side) - (side - 1) / 2.0) * (pitch / side)
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    sub = np.stack([ox.ravel(), oy.ravel()], -1)[:K]            # (K, 2)
    raw[..., 0] = sub[:, 0] / 0.25
    raw[..., 1] = sub[:, 1] / 0.25
    # sigma = softplus(raw_scale + 1) * 0.15  ->  raw for sigma = pitch/side.
    target_sigma = pitch / side
    raw[..., 3:6] = np.log(np.expm1(target_sigma / 0.15)) - 1.0
    raw[..., 6:12] = IDENTITY_6D
    raw[..., 15] = 1.5                                          # op ~0.82

    # Colors: project the init positions, sample the image there.
    out = head_transform(jnp.asarray(raw), jnp.asarray(depth)[None],
                         jnp.asarray(-2.0), **(head_kwargs or {}))
    uv, _ = camera.project(out["positions"][0])
    uv = np.asarray(uv)
    u = np.clip(uv[:, 0].round().astype(int), 0, image.shape[2] - 1)
    v = np.clip(uv[:, 1].round().astype(int), 0, image.shape[1] - 1)
    col = image[:, v, u].T                                      # (N, 3)
    logit = np.log(np.clip(col, 1e-3, 1 - 1e-3)
                   / np.clip(1 - col, 1e-3, 1.0))
    raw[..., 12:15] = logit.reshape(grid, grid, K, 3)
    return raw


def init_raw_fib(image: np.ndarray, depth: np.ndarray, camera, *,
                 n_points: int = 377, K: int = 1,
                 head_kwargs: Optional[dict] = None) -> np.ndarray:
    """Exp-4 surface init in SPIRAL head space (fib_head_transform):
    zero XY offsets (points sit on the Vogel spiral), sigma ~= the mean
    spiral spacing 2/sqrt(N), opacity ~0.82, colors sampled at the
    projected spiral positions."""
    import jax.numpy as jnp

    from fresnel_tpu.models.fibonacci import fib_head_transform

    raw = np.zeros((1, n_points, K, OPG), np.float32)
    target_sigma = 2.0 / np.sqrt(n_points)
    raw[..., 3:6] = np.log(np.expm1(target_sigma / 0.15)) - 1.0
    raw[..., 6:12] = IDENTITY_6D
    raw[..., 15] = 1.5                                          # op ~0.82

    out = fib_head_transform(jnp.asarray(raw), jnp.asarray(depth)[None],
                             jnp.asarray(-2.0), **(head_kwargs or {}))
    uv, _ = camera.project(out["positions"][0])
    uv = np.asarray(uv)
    u = np.clip(uv[:, 0].round().astype(int), 0, image.shape[2] - 1)
    v = np.clip(uv[:, 1].round().astype(int), 0, image.shape[1] - 1)
    col = image[:, v, u].T                                      # (N*K, 3)
    logit = np.log(np.clip(col, 1e-3, 1 - 1e-3)
                   / np.clip(1 - col, 1e-3, 1.0))
    raw[..., 12:15] = logit.reshape(n_points, K, 3)
    return raw


def fit_scene(image: np.ndarray, depth: np.ndarray, *,
              steps: int = 800, lr: float = 1e-2, grid: int = 37, K: int = 4,
              res: int = 256, fixed_depth_offset: Optional[float] = None,
              head_kwargs: Optional[dict] = None,
              max_per_tile: int = 1024,
              step_fn_cache: Optional[dict] = None,
              experiment: int = 2,
              freeze_geometry: bool = False,
              geometry_prox: float = 0.0,
              depth_offset_init: float = -2.0,
              ) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Fit raw head values (+ depth_offset unless fixed) to one scene by
    Adam through the experiment's head transform + the tiled rasterizer.

    experiment 2 fits in DirectPatchDecoder grid space (grid x grid x K);
    experiment 4 in FibonacciPatchDecoder spiral space (`grid` is then the
    spiral point count N, K the gaussians per point).  Returns (teacher
    dict for npz, metrics dict).  Pass a shared `step_fn_cache` dict
    across scenes to reuse the compiled step.

    freeze_geometry pins XY offsets (ch 0:3) and 6D rotations (ch 6:12)
    at their surface init — an IDENTIFIABLE teacher: free fits are
    non-unique per scene (any raw config rendering the image is a valid
    optimum), so their raws are not a function of local appearance and a
    feedforward decoder regressing them can only learn the conditional
    mean (T-028).  Pinning the geometric channels makes the remaining
    scale/color/opacity targets appearance-determined.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.losses.ssim import ssim
    from fresnel_tpu.render.tile import TileRendererConfig, render_tiled

    if experiment == 4:
        from fresnel_tpu.models.fibonacci import fib_head_transform as head_fn
    else:
        from fresnel_tpu.models.decoders import head_transform as head_fn

    hk = dict(head_kwargs or {})
    camera = Camera.default_training(res)
    cfg = TileRendererConfig(max_per_tile=max_per_tile)
    target = jnp.asarray(image)
    depth_j = jnp.asarray(depth)[None]

    if experiment == 4:
        raw0 = init_raw_fib(image, depth, camera, n_points=grid, K=K,
                            head_kwargs=hk)
    else:
        raw0 = init_raw(image, depth, camera, grid=grid, K=K, head_kwargs=hk)
    params = {"raw": jnp.asarray(raw0)}
    if fixed_depth_offset is None:
        # -2.0 is reference parity but FAR from the per-scene optimum
        # (~-0.13 at the training camera): Adam moves a lone scalar ~lr
        # per step, so short fits stall entirely on this travel (T-027).
        # Callers doing few-hundred-step fits should init near consensus.
        params["do"] = jnp.asarray(depth_offset_init, jnp.float32)

    # The fixed offset VALUE is baked into the jitted closure, so it must be
    # part of the key — `is None` alone would silently reuse a step compiled
    # for a different fixed value (ADVICE r2).
    cache_key = (experiment, steps, lr, grid, K, res,
                 None if fixed_depth_offset is None
                 else float(fixed_depth_offset),
                 tuple(sorted(hk.items())), max_per_tile, freeze_geometry,
                 float(geometry_prox))

    if step_fn_cache is None or cache_key not in step_fn_cache:
        opt = optax.adam(lr)
        geo_mask = jnp.zeros((OPG,), bool).at[0:3].set(True).at[6:12].set(
            True)
        # The geometric channels of the surface init (sub-grid XY offsets,
        # identity 6D rotations) are SCENE-INDEPENDENT, so closing over
        # the masked init is safe across the shared step cache (the
        # scene-dependent color/opacity channels are masked out).
        raw0_geo = jnp.asarray(raw0) * geo_mask

        def render(p, d):
            fixed = -2.0 if fixed_depth_offset is None else fixed_depth_offset
            do = p.get("do", jnp.asarray(float(fixed)))
            out = head_fn(p["raw"], d, do, **hk)
            return render_tiled(out["positions"][0], out["scales"][0],
                                out["rotations"][0], out["colors"][0],
                                out["opacities"][0], camera, config=cfg)

        def loss_fn(p, d, t):
            img = render(p, d)
            loss = (jnp.mean(jnp.abs(img - t))
                    + 0.5 * (1.0 - ssim(img[None], t[None])))
            if geometry_prox > 0:
                # Proximal geometry: keep the (otherwise non-identifiable)
                # XY offsets and rotations near their deterministic surface
                # init, so the teacher stays a smooth function of the
                # scene (T-028) while sub-pixel alignment is still allowed.
                dgeo = p["raw"] * geo_mask - raw0_geo
                loss = loss + geometry_prox * jnp.mean(dgeo * dgeo)
            return loss

        @jax.jit
        def step(p, o, d, t):
            l, g = jax.value_and_grad(loss_fn)(p, d, t)
            if freeze_geometry:
                g = dict(g, raw=jnp.where(geo_mask, 0.0, g["raw"]))
            up, o = opt.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        entry = {"step": step, "render": jax.jit(render), "opt": opt}
        if step_fn_cache is None:
            step_fn_cache = {}
        step_fn_cache[cache_key] = entry
    entry = step_fn_cache[cache_key]

    o = entry["opt"].init(params)
    for _ in range(steps):
        params, o, l = entry["step"](params, o, depth_j, target)
    l.block_until_ready()

    img = entry["render"](params, depth_j)
    sv = float(ssim(img[None], target[None]))
    mse = float(jnp.mean((img - target) ** 2))
    teacher = {
        "raw": np.asarray(params["raw"][0], np.float32),        # (g, g, K, 16)
        "depth_offset": np.float32(
            params["do"] if "do" in params else fixed_depth_offset),
        "ssim": np.float32(sv),
        "psnr": np.float32(-10 * np.log10(max(mse, 1e-10))),
    }
    return teacher, {"ssim": sv, "psnr": float(teacher["psnr"])}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_dir", default="data/corpus_v1")
    ap.add_argument("--scenes", type=int, default=None,
                    help="Limit scene count (default: all)")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--experiment", type=int, default=2, choices=[2, 4],
                    help="2 = DirectPatch grid head space; 4 = Fibonacci "
                         "spiral head space (grid/K become N points and "
                         "gaussians per point)")
    ap.add_argument("--grid", type=int, default=None,
                    help="grid side (exp 2, default 37) or spiral point "
                         "count (exp 4, default 377)")
    ap.add_argument("--K", type=int, default=None,
                    help="gaussians per patch (exp 2, default 4) or per "
                         "point (exp 4, default 1)")
    ap.add_argument("--geometry_prox", type=float, default=0.0,
                    help="L2 pull of XY-offset/rotation channels toward "
                         "the deterministic surface init — identifiable "
                         "teachers (T-028); 1.0 costs ~0.01 SSIM vs free")
    ap.add_argument("--fixed_do", type=float, default=None,
                    help="Freeze depth_offset at this value (default: fit "
                         "a free per-scene scalar and report the spread)")
    ap.add_argument("--no_save", action="store_true")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from fresnel_tpu.data.dataset import ImageDataset

    # NOTE: no edge-aware modulation in the teacher fit — the decoder's
    # FresnelEdgeDetector is a LEARNED conv net, so its modulation cannot be
    # anticipated per scene; and the distillation loss compares raw
    # PRE-modulation head outputs, where it cancels anyway.
    hk: dict = {}
    grid = args.grid if args.grid else (377 if args.experiment == 4 else 37)
    K = args.K if args.K else (1 if args.experiment == 4 else 4)
    ds = ImageDataset(args.data_dir, image_size=args.res,
                      use_augmentation=False, max_images=args.scenes)
    cache: dict = {}
    ssims, psnrs, dos = [], [], []
    for i, (path, s) in enumerate(zip(ds.paths, ds._samples)):
        tpath = teacher_path(path, args.experiment)
        if tpath.exists() and not args.overwrite and not args.no_save:
            print(f"[{i + 1}/{len(ds.paths)}] {path.name}: teacher exists")
            continue
        t0 = time.perf_counter()
        teacher, m = fit_scene(
            np.transpose(s.image, (2, 0, 1)), s.depth,
            steps=args.steps, lr=args.lr, grid=grid,
            K=K, res=args.res, fixed_depth_offset=args.fixed_do,
            head_kwargs=hk, step_fn_cache=cache,
            experiment=args.experiment,
            geometry_prox=args.geometry_prox)
        dos.append(float(teacher["depth_offset"]))
        ssims.append(m["ssim"])
        psnrs.append(m["psnr"])
        if not args.no_save:
            np.savez(tpath, **teacher)
        print(f"[{i + 1}/{len(ds.paths)}] {path.name}: "
              f"SSIM {m['ssim']:.4f} PSNR {m['psnr']:.2f} dB "
              f"do={teacher['depth_offset']:.3f} "
              f"({time.perf_counter() - t0:.1f}s)")
    if ssims:
        print(f"fitted {len(ssims)} scenes: SSIM {np.mean(ssims):.4f} "
              f"(min {np.min(ssims):.4f})  PSNR {np.mean(psnrs):.2f} dB  "
              f"depth_offset mean {np.mean(dos):.3f} sd {np.std(dos):.3f}")


if __name__ == "__main__":
    main()
