"""Radial-spectrum texture-gap analysis from saved eval grid PNGs.

Quantifies WHERE (in spatial frequency) a trained decoder loses energy
vs ground truth, directly from the `fresnel eval --save_grid` artifacts
(rows = scenes, columns = [render | target]).  This backs the T-038
adjudication — "stripes/dots render as mean color" — with numbers: the
per-octave ratio of rendered to GT spectral power, averaged over scenes.

Usage: python experiments/spectrum_gap.py results/exp2_ftfreq_eval_grid.png ...
Prints one line per grid: band-edge frequencies (cycles/image) and the
render/GT power ratio per band (1.0 = texture fully reproduced).
"""
import sys

import numpy as np
from PIL import Image

from fresnel_tpu.evaluation.spectrum import radial_power


def grid_band_ratios(path: str, n_bands: int = 8):
    g = np.asarray(Image.open(path), np.float32) / 255.0
    h, w = g.shape[:2]
    s = w // 2                      # [render | target] columns
    ratios = []
    for y in range(0, h - s + 1, s):
        render, target = g[y:y + s, :s], g[y:y + s, s:2 * s]
        edges, pr = radial_power(render, n_bands)
        _, pt = radial_power(target, n_bands)
        ratios.append(pr / np.maximum(pt, 1e-12))
    return edges, np.mean(ratios, axis=0)


def main(argv):
    for path in argv:
        edges, ratio = grid_band_ratios(path)
        bands = " ".join(f"{lo:5.1f}-{hi:5.1f}:{q:5.2f}"
                         for lo, hi, q in zip(edges[:-1], edges[1:], ratio))
        print(f"{path}\n  render/GT power per band (cycles/image): {bands}")


if __name__ == "__main__":
    main(sys.argv[1:])
