"""CVS diagnostic: x0-prediction SSIM as a function of timestep t.

Adjudicates WHERE the consistency U-Net works: at low/mid t the noisy
input still contains the target and the net acts as a denoiser; at
t=max the input is pure noise and the prediction must come entirely
from the cross-attention conditioning (input-view features + relative
pose).  A curve that collapses toward the conditional mean at high t
explains a mushy one-step sample despite a low training L1 (which is
averaged over uniform t).

Run:  python -u experiments/cvs_denoise_curve.py \
          --ckpt checkpoints_cvs_fw/cvs_final.msgpack \
          --cache data/cvs_multiview_cache.npz --n 16
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints_cvs_fw/cvs_final.msgpack")
    ap.add_argument("--cache", default="data/cvs_multiview_cache.npz")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out_json", default="results/cvs_denoise_curve.json")
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
    idx = np.linspace(0, data["input_image"].shape[0] - 1, n).astype(int)
    data = {k: v[idx] for k, v in data.items()}

    batch0 = {k: data[k][:1] for k in keys}
    batch0["target_depth"] = np.zeros(
        (1, cfg.image_size, cfg.image_size), np.float32)
    template = trainer.init_state(batch0)
    state = ser.from_bytes(template, Path(args.ckpt).read_bytes())
    model = trainer.model
    nt = trainer.model_config.num_timesteps
    print(f"loaded {args.ckpt} (nt={nt}, base={cfg.base_channels})")

    @jax.jit
    def pred_at_t(ii, ft, Rr, tr, ti, t, noise):
        out = model.apply(state["ema_params"], ii, ft, Rr, tr,
                          target_image=ti, timestep=t, noise=noise)
        return jnp.clip(out["x0_pred"], 0.0, 1.0)

    rng = jax.random.PRNGKey(0)
    B = args.batch
    # Sample the curve densely near the top where collapse happens.
    fracs = [0.25, 0.5, 0.75, 0.9, 0.97, 1.0]
    curve = {}
    for frac in fracs:
        tval = min(int(round(frac * (nt - 1))), nt - 1)
        ssims = []
        for i in range(0, n - B + 1, B):
            rng, srng = jax.random.split(rng)
            ii = jnp.asarray(data["input_image"][i:i + B])
            ft = jnp.asarray(data["features"][i:i + B])
            Rr = jnp.asarray(data["R_rel"][i:i + B])
            tr = jnp.asarray(data["t_rel"][i:i + B])
            ti = jnp.asarray(data["target_image"][i:i + B])
            t = jnp.full((B,), tval, jnp.int32)
            noise = jax.random.normal(srng, ti.shape, jnp.float32)
            pred = pred_at_t(ii, ft, Rr, tr, ti, t, noise)
            s = ssim(pred, ti, size_average=False)
            ssims += [float(x) for x in s]
        curve[str(tval)] = float(np.mean(ssims))
        print(f"t={tval:4d} ({frac:.2f} nt)  x0-pred SSIM {curve[str(tval)]:.4f}")

    Path(args.out_json).write_text(json.dumps(
        {"nt": nt, "n_pairs": n, "x0_pred_ssim_by_t": curve}, indent=2))
    print(f"-> {args.out_json}")


if __name__ == "__main__":
    main()
