"""Self-contained interactive HTML splat viewer.

The reference ships a native ImGui/GLFW/OpenGL viewer with orbit camera and
quality panels (reference: src/viewer/).  The TPU rebuild's interactive
equivalent is a dependency-free HTML file: the Gaussian cloud is embedded as
base64 float32 and rendered client-side on a <canvas> with an orbit/zoom
camera, painter's-algorithm depth sort, and alpha-composited elliptical
sprites — open it in any browser, no server, no external JS.

Run:  python -m fresnel_tpu.viewer.html_viewer CLOUD.ply OUT.html
(or `fresnel view CLOUD.ply OUT.html`)
"""

from __future__ import annotations

import argparse
import base64
from pathlib import Path

import numpy as np

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>fresnel-tpu viewer</title>
<style>
 body {{ margin:0; background:#111; color:#ccc; font-family:monospace; overflow:hidden; }}
 #hud {{ position:fixed; top:8px; left:8px; font-size:12px; user-select:none; }}
 canvas {{ display:block; }}
</style></head>
<body>
<div id="hud">fresnel-tpu &middot; {n} gaussians &middot; drag=orbit wheel=zoom shift-drag=pan<br>
<span id="fps"></span></div>
<canvas id="c"></canvas>
<script>
const DATA_B64 = "{data_b64}";
const N = {n};
const raw = Uint8Array.from(atob(DATA_B64), ch => ch.charCodeAt(0));
const g = new Float32Array(raw.buffer);  // N x 8: x,y,z,size,r,gc,b,op

const canvas = document.getElementById('c');
const ctx = canvas.getContext('2d');
let W, H;
function resize() {{ W = canvas.width = innerWidth; H = canvas.height = innerHeight; }}
resize(); addEventListener('resize', resize);

let az = 0.0, el = 0.0, dist = {distance}, panX = 0, panY = 0;
let dragging = false, panning = false, lx = 0, ly = 0;
canvas.addEventListener('mousedown', e => {{
  dragging = true; panning = e.shiftKey; lx = e.clientX; ly = e.clientY; }});
addEventListener('mouseup', () => dragging = false);
addEventListener('mousemove', e => {{
  if (!dragging) return;
  const dx = e.clientX - lx, dy = e.clientY - ly;
  if (panning) {{ panX += dx * 0.002 * dist; panY -= dy * 0.002 * dist; }}
  else {{ az += dx * 0.01; el = Math.max(-1.5, Math.min(1.5, el + dy * 0.01)); }}
  lx = e.clientX; ly = e.clientY;
}});
canvas.addEventListener('wheel', e => {{
  dist *= Math.exp(e.deltaY * 0.001); e.preventDefault(); }}, {{passive: false}});

const order = new Array(N);
const depth = new Float32Array(N);
let frames = 0, t0 = performance.now();

function draw() {{
  // Orbit camera looking at origin (matches the framework's from_pose).
  const ce = Math.cos(el), se = Math.sin(el);
  const ca = Math.cos(az), sa = Math.sin(az);
  const cx = dist * ce * sa, cy = dist * se, cz = dist * ce * ca;
  // forward = -cam/|cam|; basis rows [right, up, -forward]
  const fl = Math.hypot(cx, cy, cz);
  const fx = -cx/fl, fy = -cy/fl, fz = -cz/fl;
  let rx = fz, ry = 0, rz = -fx;            // cross(fwd, worldUp) simplified
  const rl = Math.hypot(rx, ry, rz) || 1;
  rx/=rl; ry/=rl; rz/=rl;
  const ux = ry*fz - rz*fy, uy = rz*fx - rx*fz, uz = rx*fy - ry*fx;
  const focal = Math.min(W, H) * 0.8;

  for (let i = 0; i < N; i++) {{
    const x = g[i*8] - cx, y = g[i*8+1] - cy, z = g[i*8+2] - cz;
    depth[i] = -(x*(-fx) + y*(-fy) + z*(-fz));   // view-space -z
    order[i] = i;
  }}
  order.sort((a, b) => depth[a] - depth[b]);     // back-to-front paint

  ctx.fillStyle = '#000'; ctx.fillRect(0, 0, W, H);
  ctx.globalCompositeOperation = 'source-over';
  for (let k = N - 1; k >= 0; k--) {{
    const i = order[k];
    const d = depth[i];
    if (d <= 0.05) continue;
    const x = g[i*8] - cx, y = g[i*8+1] - cy, z = g[i*8+2] - cz;
    const vx = x*rx + y*ry + z*rz;
    const vy = x*ux + y*uy + z*uz;
    const sx = focal * vx / d + W/2 + panX * focal / dist;
    const sy = -focal * vy / d + H/2 + panY * focal / dist;
    const r = Math.max(0.6, g[i*8+3] * focal / d);
    if (sx < -r || sx > W+r || sy < -r || sy > H+r) continue;
    const a = g[i*8+7];
    ctx.fillStyle = `rgba(${{g[i*8+4]*255|0}},${{g[i*8+5]*255|0}},${{g[i*8+6]*255|0}},${{a}})`;
    ctx.beginPath(); ctx.arc(sx, sy, r, 0, 6.2832); ctx.fill();
  }}
  frames++;
  const now = performance.now();
  if (now - t0 > 500) {{
    document.getElementById('fps').textContent =
      (frames * 1000 / (now - t0)).toFixed(1) + ' fps';
    frames = 0; t0 = now;
  }}
  requestAnimationFrame(draw);
}}
draw();
</script></body></html>
"""


def export_html(cloud, out_path: str, max_gaussians: int = 30000,
                distance: float = 2.0) -> int:
    """GaussianCloud -> self-contained HTML viewer.  Caps at max_gaussians,
    keeping the highest-opacity splats (the reference viewer similarly caps
    interactive previews, viewer.cpp:543-560)."""
    pos = np.asarray(cloud.positions, np.float32)
    scale = np.mean(np.asarray(cloud.scales, np.float32), -1)
    col = np.asarray(cloud.colors, np.float32)
    op = np.asarray(cloud.opacities, np.float32)

    live = op > 1e-3
    pos, scale, col, op = pos[live], scale[live], col[live], op[live]
    if len(op) > max_gaussians:
        idx = np.argsort(-op)[:max_gaussians]
        pos, scale, col, op = pos[idx], scale[idx], col[idx], op[idx]

    packed = np.concatenate(
        [pos, scale[:, None] * 2.0, col, op[:, None]], -1).astype("<f4")
    data_b64 = base64.b64encode(packed.tobytes()).decode()
    html = _TEMPLATE.format(n=len(op), data_b64=data_b64, distance=distance)
    Path(out_path).write_text(html)
    return len(op)


def main(argv=None):
    p = argparse.ArgumentParser(description="Export HTML splat viewer")
    p.add_argument("cloud", help=".ply or .bin")
    p.add_argument("output", help="output .html")
    p.add_argument("--max_gaussians", type=int, default=30000)
    p.add_argument("--distance", type=float, default=2.0)
    args = p.parse_args(argv)

    from fresnel_tpu.core import io as gio

    cloud = (gio.load_ply(args.cloud) if args.cloud.endswith(".ply")
             else gio.load_binary(args.cloud))
    n = export_html(cloud, args.output, args.max_gaussians, args.distance)
    print(f"viewer with {n} gaussians -> {args.output}")


if __name__ == "__main__":
    main()
