"""Interactive viewer — browser-based progressive render display.

Role parity (headless-first redesign) with the reference's GLFW/ImGui window +
DisplayViewSystem (src/UI/RenderWindow.cpp frame loop, display views,
parameter panels): a small HTTP server streams the current render as PNG and
exposes the main runtime settings; the render loop runs in a background
thread, accumulating continuously, with interaction (camera orbit/zoom) going
through the same reset-accumulation path as the reference
(RenderWindow::reset_render).

Display views (reference: 9 GLSL display programs, DisplayViewSystem.cpp:28-74)
map to server endpoints: /image (tonemapped beauty), /image?view=denoised,
/image?view=albedo, /image?view=normal, /image?view=heatmap (per-pixel sample
count / convergence).
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np
import jax

_PAGE = """<!doctype html><html><head><title>hiprt_pt_tpu viewer</title></head>
<body style="background:#111;color:#ddd;font-family:monospace">
<h3>hiprt_pt_tpu — progressive render</h3>
<div id="stats"></div>
<select id="view" onchange="refresh()">
 <option value="beauty">beauty</option><option value="denoised">denoised</option>
 <option value="albedo">albedo</option><option value="normal">normal</option>
 <option value="heatmap">sample heatmap</option></select>
 bounces <input id="bounces" type="number" min="1" max="16" value="4" style="width:3em"
  onchange="setp('nb_bounces', this.value)"/>
 spp/frame <input id="spf" type="number" min="1" max="64" value="1" style="width:3em"
  onchange="setp('samples_per_frame', this.value)"/>
 clamp <input id="clamp" type="number" min="0" step="0.5" value="0" style="width:4em"
  onchange="setp('clamp', this.value)"/>
 <button onclick="cam('orbit',15)">orbit</button>
 <button onclick="cam('zoom',0.3)">zoom+</button>
 <button onclick="cam('zoom',-0.3)">zoom-</button>
 <button onclick="fetch('/control?cmd=reset')">reset</button>
<br/><img id="img" style="max-width:95vw"/>
<script>
function setp(k,v){ fetch('/control?cmd=set&key='+k+'&value='+v); }
function cam(k,v){ fetch('/control?cmd='+k+'&value='+v); }
async function refresh(){
  const v=document.getElementById('view').value;
  document.getElementById('img').src='/image?view='+v+'&t='+Date.now();
  const s=await fetch('/stats'); document.getElementById('stats').innerText=await s.text();
}
setInterval(refresh, 1500); refresh();
</script></body></html>"""


class ViewerServer:
    """Serve a Renderer's progressive output over HTTP."""

    def __init__(self, renderer, host: str = "127.0.0.1", port: int = 8000):
        self.renderer = renderer
        self.host = host
        self.port = port
        self._stop = threading.Event()
        self._render_thread = None
        self._httpd = None

    # --- render loop (background) ---

    def _render_loop(self):
        while not self._stop.is_set():
            if self.renderer.is_rendering_done():
                time.sleep(0.05)  # reference: 3ms sleep when converged
                continue
            self.renderer.step(block=True)

    def _image_png(self, view: str) -> bytes:
        import imageio.v3 as iio

        r = self.renderer
        if view == "denoised":
            from ..render.denoise import denoise
            from ..ops.tonemap import tonemap_gamma
            import jax.numpy as jnp

            img = np.asarray(tonemap_gamma(jnp.asarray(denoise(r))))
        elif view == "albedo":
            img = np.clip(r.aov_images()[0], 0, 1)
        elif view == "normal":
            img = np.clip(r.aov_images()[1] * 0.5 + 0.5, 0, 1)
        elif view == "heatmap":
            import jax

            from ..ops.pixel_order import unscramble

            counts = unscramble(
                np.asarray(jax.device_get(r.state.pixel_sample_count)),
                r.width, r.height,
            )[::-1].astype(np.float32)
            c = counts / max(counts.max(), 1.0)
            img = np.stack([c, 1.0 - c, np.zeros_like(c)], axis=-1)
        else:
            img = r.ldr_image()
        buf = io.BytesIO()
        iio.imwrite(buf, (img * 255).astype(np.uint8), extension=".png")
        return buf.getvalue()

    def _control(self, q) -> str:
        """Runtime parameter edits + camera interaction (reference: ImGui
        settings window writing tier-2 settings + interactors; every edit
        resets accumulation like RenderWindow::reset_render)."""
        import jax.numpy as jnp

        cmd = q.get("cmd", [""])[0]
        r = self.renderer
        if cmd == "reset":
            r.reset()
        elif cmd == "orbit":
            from ..render.animation import CameraOrbitAnimation

            deg = float(q.get("value", ["15"])[0])
            anim = CameraOrbitAnimation(
                target=tuple(map(float, jax.device_get(r.camera.position) * 0)),
                degrees_per_frame=deg,
            )
            r.set_camera(anim.step(r.camera))
        elif cmd == "zoom":
            from ..core.camera import camera_zoom

            r.set_camera(camera_zoom(r.camera, float(q.get("value", ["0.3"])[0])))
        elif cmd == "set":
            key = q.get("key", [""])[0]
            val = float(q.get("value", ["0"])[0])
            if key == "nb_bounces":
                r.settings = r.settings.replace(nb_bounces=jnp.int32(int(val)))
            elif key == "samples_per_frame":
                r.settings = r.settings.replace(
                    samples_per_frame=jnp.int32(int(val))
                )
            elif key == "clamp":
                r.settings = r.settings.replace(
                    direct_contribution_clamp=jnp.float32(val),
                    indirect_contribution_clamp=jnp.float32(val),
                )
            r.reset()
        return json.dumps({"ok": True, "cmd": cmd})

    def _stats(self) -> str:
        import jax

        r = self.renderer
        sc = int(jax.device_get(r.state.sample_count))
        rays = float(jax.device_get(r.state.rays_traced))
        return json.dumps(
            {
                "samples": sc,
                "resolution": [r.width, r.height],
                "rays_traced": rays,
                "frame_ms_avg": round(r.metrics.get_average("frame_ms"), 2),
                "samples_per_s": round(
                    r.metrics.get_average("samples_per_s"), 3
                ),
            }
        )

    def serve(self, blocking: bool = True):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.encode()
                    ctype = "text/html"
                elif u.path == "/image":
                    view = parse_qs(u.query).get("view", ["beauty"])[0]
                    body = viewer._image_png(view)
                    ctype = "image/png"
                elif u.path == "/stats":
                    body = viewer._stats().encode()
                    ctype = "application/json"
                elif u.path == "/control":
                    body = viewer._control(parse_qs(u.query)).encode()
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._render_thread = threading.Thread(
            target=self._render_loop, daemon=True
        )
        self._render_thread.start()
        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        if blocking:
            try:
                self._httpd.serve_forever()
            finally:
                self.stop()
        else:
            threading.Thread(
                target=self._httpd.serve_forever, daemon=True
            ).start()
        return self

    def stop(self):
        self._stop.set()
        if self._httpd:
            self._httpd.shutdown()
