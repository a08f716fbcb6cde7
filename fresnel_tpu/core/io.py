"""Gaussian interchange I/O: 14-float binary and 3DGS PLY.

Byte-compatible with the reference formats so clouds round-trip between the
two systems for parity checks:
  * Binary: N x 14 little-endian float32 [pos3, scale3, quat_wxyz4, rgb3, op1]
    (reference: src/core/renderer/renderer.cpp:557-647,
    scripts/models/differentiable_renderer.py:1461-1497).
  * PLY: binary_little_endian, properties x y z scale_0..2 rot_0..3
    f_dc_0..2 opacity; scales are log-space, color is SH-DC
    f_dc = (c - 0.5) / C0 with C0 = 0.28209479177387814, opacity is logit
    (reference: src/core/renderer/renderer.cpp:649-793).

This module is host-side (numpy); it is data plumbing, not compute path.
"""

from __future__ import annotations

import io as _io
from pathlib import Path
from typing import Union

import jax.numpy as jnp
import numpy as np

from fresnel_tpu.core.gaussians import GaussianCloud

SH_C0 = 0.28209479177387814

_PLY_PROPS = [
    "x", "y", "z",
    "scale_0", "scale_1", "scale_2",
    "rot_0", "rot_1", "rot_2", "rot_3",
    "f_dc_0", "f_dc_1", "f_dc_2",
    "opacity",
]


def _to_numpy_flat(cloud: GaussianCloud) -> np.ndarray:
    flat = np.asarray(cloud.to_flat(), dtype=np.float32)
    if flat.ndim != 2:
        raise ValueError(f"expected unbatched cloud, got flat shape {flat.shape}")
    return flat


def save_binary(path: Union[str, Path], cloud: GaussianCloud) -> None:
    flat = _to_numpy_flat(cloud)
    from fresnel_tpu import native
    if not native.save_gaussians(str(path), flat):
        flat.tofile(str(path))


def load_binary(path: Union[str, Path]) -> GaussianCloud:
    from fresnel_tpu import native
    flat = native.load_gaussians(str(path))
    if flat is None:
        data = np.fromfile(str(path), dtype=np.float32)
        n = len(data) // 14
        flat = data[: n * 14].reshape(n, 14)
    return GaussianCloud.from_flat(jnp.asarray(flat))


def save_ply(path: Union[str, Path], cloud: GaussianCloud) -> None:
    flat = _to_numpy_flat(cloud)
    n = flat.shape[0]
    out = flat.copy()
    out[:, 3:6] = np.log(np.maximum(flat[:, 3:6], 1e-7))           # log scales
    out[:, 10:13] = (flat[:, 10:13] - 0.5) / SH_C0                 # SH-DC color
    op = np.clip(flat[:, 13], 1e-7, 1.0 - 1e-7)
    out[:, 13] = np.log(op / (1.0 - op))                           # logit opacity

    # Fast path: the native writer produces byte-identical files.
    from fresnel_tpu import native
    if native.save_ply(str(path), flat):
        return

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {p}" for p in _PLY_PROPS]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(out.astype("<f4").tobytes())


def load_ply(path: Union[str, Path]) -> GaussianCloud:
    """Load a 3DGS PLY.  Handles the reference's own 14-property layout and
    (leniently) standard 3DGS exports with extra properties by selecting the
    named fields from the property list."""
    with open(path, "rb") as f:
        raw = f.read()

    header_end = raw.find(b"end_header")
    if header_end < 0:
        raise ValueError("not a PLY file (no end_header)")
    header = raw[:header_end].decode("ascii", errors="replace")
    body = raw[header_end + len(b"end_header") :]
    # Skip the newline terminating end_header
    if body[:1] in (b"\n", b"\r"):
        body = body[1:] if body[:1] == b"\n" else body[2:] if body[:2] == b"\r\n" else body[1:]

    n = 0
    props = []
    for line in header.splitlines():
        line = line.strip()
        if line.startswith("element vertex"):
            n = int(line.split()[-1])
        elif line.startswith("property float"):
            props.append(line.split()[-1])
        elif line.startswith("format") and "binary_little_endian" not in line:
            raise ValueError(f"unsupported PLY format: {line}")

    p = len(props)
    data = np.frombuffer(body, dtype="<f4", count=n * p).reshape(n, p)
    col = {name: data[:, i] for i, name in enumerate(props)}

    def stack(names):
        return np.stack([col[nm] for nm in names], axis=-1)

    positions = stack(["x", "y", "z"])
    scales = np.exp(stack(["scale_0", "scale_1", "scale_2"]))
    rotations = stack(["rot_0", "rot_1", "rot_2", "rot_3"])
    colors = np.clip(stack(["f_dc_0", "f_dc_1", "f_dc_2"]) * SH_C0 + 0.5, 0.0, 1.0)
    opacities = 1.0 / (1.0 + np.exp(-col["opacity"]))
    return GaussianCloud(
        positions=jnp.asarray(positions),
        scales=jnp.asarray(scales),
        rotations=jnp.asarray(rotations),
        colors=jnp.asarray(colors),
        opacities=jnp.asarray(opacities),
    )
