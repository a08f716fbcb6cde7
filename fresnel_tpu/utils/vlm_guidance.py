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


def density_to_weight_map(density: np.ndarray, vlm_weight: float = 0.5,
                          out_size: int = 256) -> np.ndarray:
    """(g, g) density -> (out, out) loss-weight map in [1-w, 1+w]-ish range
    (reference maps density to [0.5, 1.5] weights)."""
    from PIL import Image

    img = Image.fromarray((density * 255).astype(np.uint8))
    up = np.asarray(img.resize((out_size, out_size), Image.BILINEAR),
                    np.float32) / 255.0
    return 0.5 + up  # [0.5, 1.5]
