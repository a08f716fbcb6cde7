"""VLM semantic guidance client (LM Studio / OpenAI-compatible endpoint).

Rebuild of the reference's VLM integration (reference:
scripts/utils/vlm_guidance.py:56-770 and vlm_evaluator.py): grid density
guidance for loss weighting, depth hints, and image-quality scoring via an
OpenAI-compatible chat endpoint with vision.  Availability-gated: every call
degrades gracefully when no endpoint is reachable (offline TPU pods), exactly
like the reference's LM Studio dependency.

Uses urllib only (no extra deps).
"""

from __future__ import annotations

import base64
import json
import re
import urllib.error
import urllib.request
from pathlib import Path
from typing import Dict, Optional

import numpy as np

DEFAULT_ENDPOINT = "http://localhost:1234/v1"


class VLMGuidance:
    def __init__(self, endpoint: str = DEFAULT_ENDPOINT,
                 model: str = "local-model", timeout: float = 30.0,
                 grid_size: int = 8):
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.timeout = timeout
        self.grid_size = grid_size
        self._available: Optional[bool] = None

    # ------------------------------------------------------------------
    def is_available(self) -> bool:
        if self._available is None:
            try:
                req = urllib.request.Request(f"{self.endpoint}/models")
                with urllib.request.urlopen(req, timeout=3.0):
                    self._available = True
            except Exception:
                self._available = False
        return self._available

    def _chat(self, prompt: str, image_path: Optional[str] = None,
              max_tokens: int = 512) -> Optional[str]:
        if not self.is_available():
            return None
        content = [{"type": "text", "text": prompt}]
        if image_path is not None:
            b64 = base64.b64encode(Path(image_path).read_bytes()).decode()
            content.append({"type": "image_url",
                            "image_url": {"url": f"data:image/png;base64,{b64}"}})
        payload = json.dumps({
            "model": self.model,
            "messages": [{"role": "user", "content": content}],
            "max_tokens": max_tokens,
            "temperature": 0.1,
        }).encode()
        req = urllib.request.Request(
            f"{self.endpoint}/chat/completions", data=payload,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                data = json.loads(r.read())
            return data["choices"][0]["message"]["content"]
        except Exception:
            return None

    # ------------------------------------------------------------------
    def get_density_grid(self, image_path) -> Optional[np.ndarray]:
        """Ask the VLM for an importance grid; returns (g, g) in [0, 1] or
        None when unavailable."""
        g = self.grid_size
        prompt = (
            f"Look at this image. Output a {g}x{g} grid of importance values "
            f"0-9 describing where fine visual detail is (9 = most detail, "
            f"0 = uniform background). Output ONLY {g} lines of {g} digits.")
        text = self._chat(prompt, str(image_path))
        if text is None:
            return None
        rows = []
        for line in text.splitlines():
            digits = re.findall(r"\d", line)
            if len(digits) >= g:
                rows.append([int(d) for d in digits[:g]])
            if len(rows) == g:
                break
        if len(rows) != g:
            return None
        return np.asarray(rows, np.float32) / 9.0

    def score_quality(self, image_path) -> Optional[float]:
        """Image-quality score in [0, 1] (used by auto-tune), or None."""
        text = self._chat(
            "Rate the visual quality of this 3D reconstruction render from 0 "
            "to 100. Consider sharpness, coverage, and artifacts. Reply with "
            "ONLY the number.", str(image_path), max_tokens=8)
        if text is None:
            return None
        m = re.search(r"\d+(?:\.\d+)?", text)
        return min(float(m.group()) / 100.0, 1.0) if m else None

    def get_depth_hints(self, image_path) -> Optional[str]:
        return self._chat(
            "Describe the depth structure of this image: what is closest to "
            "the camera, what is farthest, and where the strongest depth "
            "discontinuities are.", str(image_path))

    # -- image-type detection + face landmarks -------------------------
    # (reference: scripts/utils/vlm_guidance.py:455-601)

    def detect_image_type(self, image_path) -> str:
        """'face' | 'object' | 'scene' | 'animal' (default 'object')."""
        text = self._chat(
            "What is the main subject of this image? Reply with ONE word: "
            "face, object, scene, or animal", str(image_path), max_tokens=10)
        if text:
            low = text.strip().lower()
            for kw in ("face", "object", "scene", "animal"):
                if kw in low:
                    return kw
        return "object"

    def get_face_landmarks(self, image_path) -> Optional[Dict]:
        """Face region centers + importances as {name: [x, y, importance]}
        with fractional coords (reference vlm_guidance.py:474-516)."""
        text = self._chat(
            "This image contains a face. For each region give fractional "
            "coordinates (0-1, origin top-left) and importance 0-1 "
            "(eyes 1.0, mouth 0.9, nose 0.8, face_outline 0.7, hair 0.5). "
            'Output ONLY JSON like {"left_eye": [0.35, 0.35, 1.0], '
            '"right_eye": [0.65, 0.35, 1.0], "nose": [0.5, 0.5, 0.8], '
            '"mouth": [0.5, 0.65, 0.9], "face_outline": [0.5, 0.45, 0.7], '
            '"hair": [0.5, 0.15, 0.5]}', str(image_path))
        if text is None:
            return None
        m = re.search(r"\{[\s\S]*\}", text)
        if not m:
            return None
        try:
            parsed = json.loads(m.group())
        except json.JSONDecodeError:
            return None
        return parsed if isinstance(parsed, dict) else None

    def get_smart_density_guidance(self, image_path) -> Optional[np.ndarray]:
        """Type-aware density: faces get landmark-based continuous density
        downsampled to the grid; everything else the plain grid
        (reference vlm_guidance.py:569-601)."""
        if self.detect_image_type(image_path) == "face":
            landmarks = self.get_face_landmarks(image_path)
            if landmarks:
                dense = face_landmarks_to_density(landmarks, size=256)
                from PIL import Image

                img = Image.fromarray((dense * 255).astype(np.uint8))
                g = self.grid_size
                small = np.asarray(img.resize((g, g), Image.BILINEAR),
                                   np.float32) / 255.0
                return small
        return self.get_density_grid(image_path)

    # -- segmentation hints ---------------------------------------------

    def get_segmentation_hints(self, image_path) -> "Optional[list]":
        """Semantic regions for region-aware loss weighting: a list of
        {label, importance, bbox=[x0, y0, x1, y1] fractional}
        (reference vlm_guidance.py:371-413)."""
        text = self._chat(
            "Identify the main semantic regions in this image. For each "
            "give a label, an importance for 3D reconstruction "
            "(critical/high/medium/low), and a fractional bounding box "
            "[x_min, y_min, x_max, y_max] with origin top-left. Output "
            'ONLY a JSON array like [{"label": "face", "importance": '
            '"critical", "bbox": [0.3, 0.1, 0.7, 0.5]}]',
            str(image_path), max_tokens=1024)
        if text is None:
            return None
        m = re.search(r"\[[\s\S]*\]", text)
        if not m:
            return None
        try:
            parsed = json.loads(m.group())
        except json.JSONDecodeError:
            return None
        return parsed if isinstance(parsed, list) else None


def face_landmarks_to_density(landmarks: Dict, size: int = 256) -> np.ndarray:
    """{name: [x, y, importance]} -> (size, size) density in [0, 1]: a sum
    of Gaussian bumps with region-specific sigmas (eyes tight, hair broad),
    max-normalized (reference vlm_guidance.py:518-567)."""
    sigmas = {"left_eye": 15, "right_eye": 15, "nose": 25, "mouth": 20,
              "face_outline": 40, "hair": 50}
    density = np.zeros((size, size), np.float32)
    yy, xx = np.ogrid[:size, :size]
    for name, vals in landmarks.items():
        if not isinstance(vals, (list, tuple)) or len(vals) < 3:
            continue
        x, y, importance = float(vals[0]), float(vals[1]), float(vals[2])
        cx, cy = int(x * size), int(y * size)
        sigma = sigmas.get(name, 30) * (size / 256.0)
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        density += importance * np.exp(-d2 / (2.0 * sigma * sigma))
    if density.max() > 0:
        density = density / density.max()
    return density


def segments_to_weight_map(segments: "list", size: int = 256) -> np.ndarray:
    """Region list -> (size, size) loss-weight map: each bbox painted with
    its importance weight (critical 1.5, high 1.25, medium 1.0, low 0.75),
    later regions layered over earlier ones; background weight 1.0."""
    weights = {"critical": 1.5, "high": 1.25, "medium": 1.0, "low": 0.75}
    out = np.ones((size, size), np.float32)
    for seg in segments:
        bbox = seg.get("bbox", [0.0, 0.0, 1.0, 1.0])
        w = weights.get(str(seg.get("importance", "medium")).lower(), 1.0)
        x0 = int(np.clip(bbox[0], 0, 1) * size)
        y0 = int(np.clip(bbox[1], 0, 1) * size)
        x1 = int(np.clip(bbox[2], 0, 1) * size)
        y1 = int(np.clip(bbox[3], 0, 1) * size)
        out[y0:y1, x0:x1] = w
    return out


# ----------------------------------------------------------------------
# Visualizations (reference vlm_guidance.py:604-770) — PIL only.
# ----------------------------------------------------------------------

def _jet(t: np.ndarray) -> np.ndarray:
    """Minimal jet colormap (H, W) in [0,1] -> (H, W, 3) uint8."""
    t = np.clip(t, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def visualize_density(image_path, density_grid: np.ndarray,
                      output_path=None):
    """Overlay a density heatmap (40% jet blend) on the image."""
    from PIL import Image

    img = Image.open(image_path).convert("RGB")
    w, h = img.size
    dens = Image.fromarray((np.clip(density_grid, 0, 1) * 255)
                           .astype(np.uint8))
    full = np.asarray(dens.resize((w, h), Image.BILINEAR), np.float32) / 255.0
    heat = _jet(full)
    blended = (np.asarray(img, np.float32) * 0.6
               + heat.astype(np.float32) * 0.4).astype(np.uint8)
    out = Image.fromarray(blended)
    if output_path:
        out.save(output_path)
    return out


def visualize_segmentation(image_path, segments: "list", output_path=None):
    """Draw importance-colored bounding boxes + labels on the image."""
    from PIL import Image, ImageDraw

    colors = {"critical": "red", "high": "orange", "medium": "yellow",
              "low": "gray"}
    img = Image.open(image_path).convert("RGB")
    draw = ImageDraw.Draw(img)
    w, h = img.size
    for seg in segments:
        bbox = seg.get("bbox", [0, 0, 1, 1])
        importance = str(seg.get("importance", "medium"))
        color = colors.get(importance, "white")
        x0, y0, x1, y1 = (bbox[0] * w, bbox[1] * h, bbox[2] * w, bbox[3] * h)
        draw.rectangle([x0, y0, x1, y1], outline=color, width=3)
        draw.text((x0 + 2, max(0, y0 - 14)),
                  f"{seg.get('label', '')} ({importance})", fill=color)
    if output_path:
        img.save(output_path)
    return img


def visualize_all(vlm: VLMGuidance, image_path, output_dir) -> Dict[str, str]:
    """Run every analysis and save visualizations; returns {name: path}
    for whatever succeeded (availability-gated like everything else)."""
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    saved: Dict[str, str] = {}
    density = vlm.get_smart_density_guidance(image_path)
    if density is not None:
        p = str(out_dir / "density_overlay.png")
        visualize_density(image_path, density, p)
        saved["density"] = p
    segments = vlm.get_segmentation_hints(image_path)
    if segments:
        p = str(out_dir / "segmentation.png")
        visualize_segmentation(image_path, segments, p)
        saved["segmentation"] = p
    return saved


def density_to_weight_map(density: np.ndarray, vlm_weight: float = 0.5,
                          out_size: int = 256) -> np.ndarray:
    """(g, g) density -> (out, out) loss-weight map in [1-w, 1+w]-ish range
    (reference maps density to [0.5, 1.5] weights)."""
    from PIL import Image

    img = Image.fromarray((density * 255).astype(np.uint8))
    up = np.asarray(img.resize((out_size, out_size), Image.BILINEAR),
                    np.float32) / 255.0
    return 0.5 + up  # [0.5, 1.5]
