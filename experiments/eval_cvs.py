"""One-step CVS novel-view eval: SSIM/PSNR + qualitative grid.

Loads a CVS checkpoint (train/train_cvs.py) and the cached teacher-
multiview pairs, generates the target view in ONE step from (input
features, relative pose), and reports SSIM/PSNR against the rendered
ground-truth view plus an [input | generated | target] grid PNG.

Reference claim this adjudicates: one-step view synthesis quality
(reference scripts/models/consistency_view_synthesis.py:804 claims
~3 ms/view but ships no quality number; its exp-001 bootstrap was
abandoned).  Pairs come from the training distribution (the corpus has
no second multiview source) — stated as train-pair SSIM, not held-out.

Run:  python -u experiments/eval_cvs.py --ckpt checkpoints_cvs/cvs.msgpack \
          --cache data/cvs_multiview_cache.npz --n 24 --grid logs/cvs_grid.png
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints_cvs/cvs.msgpack")
    ap.add_argument("--cache", default="data/cvs_multiview_cache.npz")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--grid", default="logs/cvs_grid.png")
    ap.add_argument("--grid_rows", type=int, default=6)
    ap.add_argument("--out_json", default="logs/eval_cvs.json")
    ap.add_argument("--steps", type=int, default=1,
                    help="sampler steps (reference supports 1-4; >1 = "
                         "deterministic refinement at decreasing t)")
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import flax.serialization as ser
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.losses.ssim import ssim
    from fresnel_tpu.train.train_cvs import CVSTrainConfig, CVSTrainer

    meta = json.loads(Path(args.ckpt + ".json").read_text())
    cfg = CVSTrainConfig(**meta["config"])
    trainer = CVSTrainer(cfg)

    with np.load(args.cache) as z:
        keys = ("input_image", "features", "R_rel", "t_rel", "target_image")
        data = {k: z[k] for k in keys}
    n = min(args.n, data["input_image"].shape[0])
    # Spread the eval across scenes (pairs are stored scene-major).
    idx = np.linspace(0, data["input_image"].shape[0] - 1, n).astype(int)
    data = {k: v[idx] for k, v in data.items()}

    batch0 = {k: data[k][:1] for k in keys}
    batch0["target_depth"] = np.zeros(
        (1, cfg.image_size, cfg.image_size), np.float32)
    template = trainer.init_state(batch0)
    state = ser.from_bytes(template, Path(args.ckpt).read_bytes())
    print(f"loaded {args.ckpt} (epoch {meta['epoch']}, "
          f"base={cfg.base_channels}, {cfg.image_size}²)")

    gen_fn = jax.jit(lambda ii, ft, Rr, tr, rng: trainer.generate(
        state, ft, Rr, tr, rng, num_steps=args.steps, input_image=ii))

    ssims, psnrs, gens = [], [], []
    rng = jax.random.PRNGKey(0)
    B = args.batch
    for i in range(0, n - B + 1, B):
        rng, srng = jax.random.split(rng)
        ii = jnp.asarray(data["input_image"][i:i + B])
        ft = jnp.asarray(data["features"][i:i + B])
        Rr = jnp.asarray(data["R_rel"][i:i + B])
        tr = jnp.asarray(data["t_rel"][i:i + B])
        gen = jnp.clip(gen_fn(ii, ft, Rr, tr, srng), 0.0, 1.0)
        tgt = jnp.asarray(data["target_image"][i:i + B])
        s = ssim(gen, tgt, size_average=False)
        mse = jnp.mean((gen - tgt) ** 2, axis=(1, 2, 3))
        p = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        ssims += [float(x) for x in s]
        psnrs += [float(x) for x in p]
        gens.append(np.asarray(gen))
    gens = np.concatenate(gens)

    result = {
        "n_pairs": len(ssims),
        "steps": args.steps,
        "one_step_view_ssim": float(np.mean(ssims)),
        "one_step_view_psnr": float(np.mean(psnrs)),
        "ssim_p10_p90": [float(np.percentile(ssims, 10)),
                         float(np.percentile(ssims, 90))],
    }
    print(json.dumps(result, indent=2))
    Path(args.out_json).write_text(json.dumps(result, indent=2))

    rows = []
    for r in range(min(args.grid_rows, gens.shape[0])):
        j = r * (gens.shape[0] // max(args.grid_rows, 1))
        row = np.concatenate([data["input_image"][j], gens[j],
                              data["target_image"][j]], axis=2)
        rows.append(row)
    grid = np.concatenate(rows, axis=1)  # (3, rows*S, 3*S)
    from PIL import Image
    arr = (np.clip(grid.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(args.grid)
    print(f"grid [input | one-step generated | target] -> {args.grid}")


if __name__ == "__main__":
    main()
