"""Tabulate `fresnel eval` JSONs side by side (markdown).

Usage:
    python experiments/compare_evals.py exp2_enc exp2_k8 v2combo
    python experiments/compare_evals.py --files results/eval_a.json ...

For each tag, reads results/eval_<tag>_train.json and
results/eval_<tag>_eval.json (missing halves are skipped) and prints one
markdown row per run with frontal SSIM/PSNR and the per-octave
render/target spectral power ratios (evaluation/spectrum.py) — the
texture-gap diagnostic from the T-038 addendum, so capacity arms can be
compared band by band without re-deriving anything from the grids.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

RESULTS = Path(__file__).resolve().parent.parent / "results"


def _fmt(d: dict) -> str:
    ssim, psnr = d.get("frontal_ssim"), d.get("frontal_psnr")
    return f"{ssim:.3f} / {psnr:.2f}" if ssim is not None else "—"


def _bands(d: dict) -> str:
    b = d.get("spectrum_band_ratio") or {}
    return " ".join(f"{v:.2f}" for v in b.values()) or "—"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tags", nargs="*", help="run tags under results/")
    ap.add_argument("--files", nargs="*", default=[],
                    help="explicit eval-JSON paths (one row each)")
    args = ap.parse_args(argv)

    rows = []
    for tag in args.tags:
        row = {"run": tag}
        for half in ("train", "eval"):
            p = RESULTS / f"eval_{tag}_{half}.json"
            if p.exists():
                row[half] = json.loads(p.read_text())
        if len(row) > 1:
            rows.append(row)
        else:
            print(f"(no eval JSONs for tag {tag!r})")
    for f in args.files:
        rows.append({"run": Path(f).stem, "train": json.loads(Path(f).read_text())})

    if not rows:
        print("nothing to compare")
        return 1

    bands = None
    for r in rows:
        d = r.get("train") or r.get("eval")
        if d.get("spectrum_band_ratio"):
            bands = list(d["spectrum_band_ratio"])
            break

    print("| run | train SSIM / PSNR | eval SSIM / PSNR | train band ratios"
          + (f" ({', '.join(bands)} cyc/img)" if bands else "") + " |")
    print("|---|---|---|---|")
    for r in rows:
        t, e = r.get("train", {}), r.get("eval", {})
        print(f"| {r['run']} | {_fmt(t)} | {_fmt(e)} | {_bands(t)} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
