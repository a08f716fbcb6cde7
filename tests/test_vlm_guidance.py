"""Protocol-level VLM guidance tests against a real local HTTP mock that
speaks the OpenAI-compatible chat contract (the reference talks to LM
Studio the same way, reference: scripts/utils/vlm_guidance.py:97-154)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from fresnel_tpu.utils.vlm_guidance import (
    VLMGuidance, face_landmarks_to_density, segments_to_weight_map,
    visualize_all, visualize_density, visualize_segmentation)

LANDMARKS = {"left_eye": [0.35, 0.35, 1.0], "right_eye": [0.65, 0.35, 1.0],
             "nose": [0.5, 0.5, 0.8], "mouth": [0.5, 0.65, 0.9],
             "face_outline": [0.5, 0.45, 0.7], "hair": [0.5, 0.15, 0.5]}
SEGMENTS = [
    {"label": "face", "importance": "critical", "bbox": [0.3, 0.1, 0.7, 0.5]},
    {"label": "background", "importance": "low", "bbox": [0.0, 0.0, 1.0, 1.0]},
]


class _MockVLM(BaseHTTPRequestHandler):
    """Answers by keyword-matching the prompt, like a tiny scripted VLM."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b'{"data": []}')

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        prompt = body["messages"][0]["content"][0]["text"]
        self.server.prompts.append(prompt)
        if "ONE word" in prompt:
            text = self.server.image_type
        elif "contains a face" in prompt:
            text = "Here you go:\n" + json.dumps(LANDMARKS)
        elif "semantic regions" in prompt:
            text = json.dumps(SEGMENTS)
        elif "grid of importance" in prompt:
            text = "\n".join(["12345678", "23456789", "34567890", "45678901",
                              "56789012", "67890123", "78901234", "89012345"])
        elif "Rate the visual quality" in prompt:
            text = "87"
        else:
            text = "the sphere is closest, the wall is farthest"
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(json.dumps(
            {"choices": [{"message": {"content": text}}]}).encode())


@pytest.fixture()
def mock_vlm():
    server = HTTPServer(("127.0.0.1", 0), _MockVLM)
    server.prompts = []
    server.image_type = "object"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    vlm = VLMGuidance(endpoint=f"http://127.0.0.1:{server.server_port}/v1",
                      timeout=5.0)
    yield vlm, server
    server.shutdown()


@pytest.fixture()
def image_file(tmp_path):
    from PIL import Image

    p = tmp_path / "img.png"
    Image.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(p)
    return p


class TestProtocol:
    def test_density_quality_depth(self, mock_vlm, image_file):
        vlm, _ = mock_vlm
        assert vlm.is_available()
        grid = vlm.get_density_grid(image_file)
        assert grid.shape == (8, 8) and grid.max() <= 1.0
        assert vlm.score_quality(image_file) == pytest.approx(0.87)
        assert "closest" in vlm.get_depth_hints(image_file)

    def test_image_type_and_landmarks(self, mock_vlm, image_file):
        vlm, server = mock_vlm
        server.image_type = "face"
        assert vlm.detect_image_type(image_file) == "face"
        lm = vlm.get_face_landmarks(image_file)
        assert lm == LANDMARKS

    def test_smart_density_routes_by_type(self, mock_vlm, image_file):
        vlm, server = mock_vlm
        server.image_type = "face"
        dens_face = vlm.get_smart_density_guidance(image_file)
        assert dens_face.shape == (8, 8)
        # Landmark density peaks around the eye rows, not the bottom edge.
        assert dens_face[2:4].sum() > dens_face[7:].sum()
        assert any("contains a face" in p for p in server.prompts)
        server.prompts.clear()
        server.image_type = "scene"
        dens_grid = vlm.get_smart_density_guidance(image_file)
        assert dens_grid.shape == (8, 8)
        assert not any("contains a face" in p for p in server.prompts)

    def test_segmentation_hints(self, mock_vlm, image_file):
        vlm, _ = mock_vlm
        segs = vlm.get_segmentation_hints(image_file)
        assert segs == SEGMENTS

    def test_offline_degrades_to_none(self, image_file):
        vlm = VLMGuidance(endpoint="http://127.0.0.1:1/v1", timeout=0.5)
        assert not vlm.is_available()
        assert vlm.get_density_grid(image_file) is None
        assert vlm.get_face_landmarks(image_file) is None
        assert vlm.get_segmentation_hints(image_file) is None
        assert vlm.detect_image_type(image_file) == "object"


class TestPureHelpers:
    def test_landmark_density(self):
        d = face_landmarks_to_density(LANDMARKS, size=128)
        assert d.shape == (128, 128)
        assert d.max() == pytest.approx(1.0)
        # Density concentrates on the face (overlapping bumps), not corners.
        peak = np.unravel_index(np.argmax(d), d.shape)
        assert 0.2 * 128 < peak[0] < 0.75 * 128
        eye = d[int(0.35 * 128), int(0.35 * 128)]
        assert eye > 5 * d[0, 0] and eye > 0.5

    def test_landmark_density_skips_malformed(self):
        d = face_landmarks_to_density({"nose": [0.5], "x": "bad"}, size=32)
        assert d.max() == 0.0

    def test_segments_weight_map(self):
        w = segments_to_weight_map(SEGMENTS[::-1], size=64)  # low then crit
        assert w.shape == (64, 64)
        assert w[int(0.3 * 64), int(0.5 * 64)] == pytest.approx(1.5)
        assert w[60, 60] == pytest.approx(0.75)

    def test_visualizations(self, tmp_path, image_file):
        dens = np.random.default_rng(0).random((8, 8)).astype(np.float32)
        img1 = visualize_density(image_file, dens,
                                 str(tmp_path / "d.png"))
        img2 = visualize_segmentation(image_file, SEGMENTS,
                                      str(tmp_path / "s.png"))
        assert img1.size == (64, 64) and img2.size == (64, 64)
        assert (tmp_path / "d.png").exists() and (tmp_path / "s.png").exists()

    def test_visualize_all(self, mock_vlm, image_file, tmp_path):
        vlm, _ = mock_vlm
        saved = visualize_all(vlm, image_file, tmp_path / "viz")
        assert set(saved) == {"density", "segmentation"}
