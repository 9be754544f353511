"""Interactive viewer — browser-based progressive render display.

Role parity (headless-first redesign) with the reference's GLFW/ImGui window +
DisplayViewSystem (src/UI/RenderWindow.cpp frame loop, display views,
parameter panels): a small HTTP server streams the current render as PNG and
exposes the full runtime-settings tree and per-material editor; the render
loop runs in a background thread, accumulating continuously, with interaction
(camera orbit/zoom) going through the same reset-accumulation path as the
reference (RenderWindow::reset_render).

Display views (reference: 9 GLSL display programs,
src/UI/DisplayView/DisplayViewSystem.cpp:28-74) map to /image?view=...:
  beauty           default tonemapped accumulation
  denoised         à-trous denoise result
  denoise_blend    beauty↔denoised blend (reference: blend-2 shader,
                   factor via /control?cmd=set&key=denoise_blend)
  albedo           denoiser albedo AOV
  normal           denoiser normal AOV
  heatmap          per-pixel sample-count heatmap (convergence)
  boolmap          converged boolean map (white = converged)
  furnace          white-furnace threshold view (|L - 1| > threshold,
                   reference: white_furnace_threshold.frag)
  nan              NaN highlight view (render/debug.py, bright pink)

Parameter panels (reference: ImGuiSettingsWindow ~2300 LoC +
ImGuiObjectsWindow material editor, 78-1238):
  /settings        JSON of every runtime-settings leaf (tier 2)
  /materials       JSON of every material's editable parameters
  /control?cmd=set&key=<leaf>&value=v          — generic settings edit
  /control?cmd=material&index=i&key=k&value=v  — live material edit
Both reset accumulation exactly like the reference's edits do.

Tier-3 static options + introspection (reference: per-option macro editing
with recompile, the "Shader kernels" panel ImGuiSettingsWindow.cpp:2206,
and the ReSTIR bias explainer :1639):
  /options                                     — every tier-3 option + choices
  /control?cmd=option&key=k&value=v            — one option edit → recompile
  /kernels                                     — AOT cost/memory analysis
  /bias                                        — live ReSTIR bias status

Camera interactors (reference: mouse/keyboard interactors,
src/UI/Interaction/):
  /control?cmd=rotate&yaw=r&pitch=r    — first-person look (left drag)
  /control?cmd=pan&dx=d&dy=d           — camera-plane pan (middle drag)
  /control?cmd=walk&dx=&dy=&dz=        — WASD-style walk
  /control?cmd=orbit|zoom|reset

Modal windows (reference: ImGuiBakingWindow.cpp + ImGuiAnimationWindow.cpp):
  /bake?what=conductor|glossy_base|fresnel|glass|...&res=&samples=[&out=]
  /animate?frames=N&spp=S&out=dir[&orbit_deg=][&envmap_deg=][&denoise=1]
Both run on background threads; poll the bare endpoint for status. The
animation job owns the renderer while it runs (progressive loop yields).
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
 <option>beauty</option><option>denoised</option><option>denoise_blend</option>
 <option>albedo</option><option>normal</option><option>heatmap</option>
 <option>boolmap</option><option>furnace</option><option>nan</option></select>
 <button onclick="cam('orbit',15)">orbit</button>
 <button onclick="cam('zoom',0.3)">zoom+</button>
 <button onclick="cam('zoom',-0.3)">zoom-</button>
 <button onclick="fetch('/control?cmd=reset')">reset</button>
<br/><img id="img" style="max-width:60vw;float:left;margin-right:1em"/>
<div id="panel" style="overflow:auto;max-height:80vh"></div>
<script>
function setp(k,v){ fetch('/control?cmd=set&key='+k+'&value='+v); }
function setm(i,k,v){ fetch('/control?cmd=material&index='+i+'&key='+k+'&value='+v); }
function cam(k,v){ fetch('/control?cmd='+k+'&value='+v); }
function seto(k,v){ fetch('/control?cmd=option&key='+k+'&value='+v).then(buildPanel); }
async function kern(){ document.getElementById('kern').innerText =
  await (await fetch('/kernels')).text(); }
async function buildPanel(){
  const s = await (await fetch('/settings')).json();
  let h = '<b>render settings</b><table>';
  for (const [k,v] of Object.entries(s)) {
    h += `<tr><td>${k}</td><td><input style="width:6em" value="${v}"
          onchange="setp('${k}', this.value)"/></td></tr>`;
  }
  h += '</table><b>materials</b> <select id="mat" onchange="buildMat()"></select><div id="matp"></div>';
  const o = await (await fetch('/options')).json();
  h += '<b>kernel options (tier 3 — edits recompile)</b><table>';
  for (const [k,v] of Object.entries(o)) {
    if (v.choices) {
      h += `<tr><td>${k}</td><td><select onchange="seto('${k}', this.value)">` +
           v.choices.map(c=>`<option ${c===v.value?'selected':''}>${c}</option>`).join('') +
           '</select></td></tr>';
    } else {
      h += `<tr><td>${k}</td><td><input style="width:6em" value="${v.value}"
            onchange="seto('${k}', this.value)"/></td></tr>`;
    }
  }
  h += '</table><div id="bias"></div><button onclick="kern()">kernel stats</button><pre id="kern"></pre>';
  document.getElementById('panel').innerHTML = h;
  const b = await (await fetch('/bias')).json();
  if (b.active) {
    document.getElementById('bias').innerHTML = '<b>ReSTIR status:</b> ' +
      (b.biased ? 'BIASED<br/>' + b.reasons.map(x=>'- '+x.title).join('<br/>')
                : 'Unbiased');
  }
  const m = await (await fetch('/materials')).json();
  window._mats = m;
  const sel = document.getElementById('mat');
  m.forEach((_,i)=>{ sel.innerHTML += `<option value="${i}">material ${i}</option>`; });
  buildMat();
}
function buildMat(){
  const i = +document.getElementById('mat').value || 0;
  const m = window._mats[i]; let h = '<table>';
  for (const [k,v] of Object.entries(m)) {
    h += `<tr><td>${k}</td><td><input style="width:10em" value="${v}"
          onchange="setm(${i}, '${k}', this.value)"/></td></tr>`;
  }
  document.getElementById('matp').innerHTML = h + '</table>';
}
async function refresh(){
  const v=document.getElementById('view').value;
  document.getElementById('img').src='/image?view='+v+'&t='+Date.now();
  const s=await fetch('/stats'); document.getElementById('stats').innerText=await s.text();
}
buildPanel(); setInterval(refresh, 1500); refresh();
</script></body></html>"""


# runtime-settings leaves exposed in the panel (tier-2; the reference edits
# these through ImGuiSettingsWindow without recompiling)
_SETTINGS_KEYS = (
    "nb_bounces", "samples_per_frame", "accumulate", "freeze_random",
    "do_russian_roulette", "rr_min_depth", "rr_throughput_clamp",
    "direct_contribution_clamp", "indirect_contribution_clamp",
    "envmap_contribution_clamp", "minimum_light_contribution",
    "number_of_light_samples", "enable_adaptive_sampling",
    "adaptive_sampling_min_samples", "adaptive_sampling_noise_threshold",
    "stop_noise_threshold", "stop_pixel_percentage_converged",
    "render_low_resolution", "low_resolution_scale", "do_alpha_testing",
    "rr_method",
)


class ViewerServer:
    """Serve a Renderer's progressive output over HTTP."""

    def __init__(self, renderer, host: str = "127.0.0.1", port: int = 8000):
        self.renderer = renderer
        # true low-resolution interaction renderers (reference: the low-res
        # interaction mode renders a REDUCED grid, RenderWindow's resolution
        # scaling — masking pixels on a full-size wavefront still paid the
        # full shading/traversal dispatch, measured 1.79 FPS at 540p r5)
        self._base_renderer = renderer
        self._scaled_renderers = {}
        self.host = host
        self.port = port
        self.denoise_blend = 0.5
        self.furnace_threshold = 0.02
        # application-level perf knobs (reference: ApplicationSettings —
        # auto_sample_per_frame + target_GPU_framerate drive the samples-per-
        # frame auto-tuner, RenderWindow.cpp:798-805; GPU_stall_percentage
        # inserts idle time between frames, RenderWindow.cpp:660-671)
        self.auto_samples_per_frame = False
        self.target_framerate = 10.0
        self.stall_percentage = 0.0
        self._stop = threading.Event()
        self._render_thread = None
        self._httpd = None
        # busy = a modal job (animation sequence) owns the renderer; the
        # progressive loop yields, like the reference's animation mode
        # taking over the frame loop (ImGuiAnimationWindow)
        self._busy = threading.Event()
        # serializes renderer ownership between the progressive loop and
        # modal jobs (render_step donates its state — concurrent steps
        # would execute on a donated buffer)
        self._step_lock = threading.Lock()
        self._bake_status = {"state": "idle"}
        self._anim_status = {"state": "idle"}

    # --- render loop (background) ---

    def _render_loop(self):
        while not self._stop.is_set():
            if self._busy.is_set() or self.renderer.is_rendering_done():
                time.sleep(0.05)  # reference: 3ms sleep when converged
                continue
            with self._step_lock:
                if not self._busy.is_set():
                    self.renderer.step(block=True)
            self._post_frame_tuning()

    def _post_frame_tuning(self):
        """Auto samples-per-frame + render-stall throttle (reference:
        RenderWindow.cpp:798-805 and compute_GPU_stall_duration,
        RenderWindow.cpp:660-671)."""
        import jax.numpy as jnp

        r = self.renderer
        frame_hist = r.metrics.values("frame_ms")
        if not frame_hist:
            return
        frame_ms = frame_hist[-1]
        if self.auto_samples_per_frame:
            low_res = bool(np.asarray(
                jax.device_get(r.settings.render_low_resolution)))
            if low_res:
                spf = 1  # one sample per frame while interacting
            else:
                spf_cur = max(
                    1, int(jax.device_get(r.settings.samples_per_frame)))
                samples_per_s = 1000.0 / max(frame_ms / spf_cur, 1e-3)
                spf = min(
                    max(1, int(samples_per_s / max(self.target_framerate,
                                                   1e-3))),
                    65536,
                )
            r.settings = r.settings.replace(samples_per_frame=jnp.int32(spf))
        if self.stall_percentage > 0.0:
            p = min(self.stall_percentage, 95.0)
            stall_s = (frame_ms / 1000.0) * (1.0 / (1.0 - p / 100.0) - 1.0)
            time.sleep(min(stall_s, 2.0))

    def _image_png(self, view: str) -> bytes:
        import imageio.v3 as iio
        import jax.numpy as jnp

        from ..ops.pixel_order import unscramble

        r = self.renderer
        if view in ("denoised", "denoise_blend"):
            from ..render.denoise import denoise
            from ..ops.tonemap import tonemap_gamma

            den = np.asarray(tonemap_gamma(jnp.asarray(denoise(r))))
            if view == "denoised":
                img = den
            else:
                # reference: blend_2_display.frag — beauty↔denoised mix
                img = (
                    (1.0 - self.denoise_blend) * r.ldr_image()
                    + self.denoise_blend * den
                )
        elif view == "albedo":
            img = np.clip(r.aov_images()[0], 0, 1)
        elif view == "normal":
            img = np.clip(r.aov_images()[1] * 0.5 + 0.5, 0, 1)
        elif view == "heatmap":
            counts = unscramble(
                np.asarray(jax.device_get(r.state.pixel_sample_count)),
                r.width, r.height,
            )[::-1].astype(np.float32)
            c = counts / max(counts.max(), 1.0)
            img = np.stack([c, 1.0 - c, np.zeros_like(c)], axis=-1)
        elif view == "boolmap":
            # reference: converged boolean map (boolmap_display.frag)
            conv = unscramble(
                np.asarray(jax.device_get(r.state.pixel_converged)),
                r.width, r.height,
            )[::-1].astype(np.float32)
            img = np.repeat(conv[..., None], 3, axis=-1)
        elif view == "furnace":
            # reference: white_furnace_threshold.frag — pixels whose mean
            # radiance deviates from 1 by more than the threshold light up
            hdr = r.hdr_image()
            dev = np.abs(hdr.mean(-1) - 1.0)
            bad = (dev > self.furnace_threshold).astype(np.float32)
            img = np.stack([bad, 1.0 - bad, np.zeros_like(bad)], axis=-1)
        elif view == "nan":
            from ..render.debug import nan_view

            img = np.asarray(nan_view(r))
        else:
            img = r.ldr_image()
        buf = io.BytesIO()
        iio.imwrite(buf, (np.clip(img, 0, 1) * 255).astype(np.uint8),
                    extension=".png")
        return buf.getvalue()

    # --- parameter panels ---

    def _settings_json(self) -> str:
        r = self.renderer
        out = {}
        for k in _SETTINGS_KEYS:
            v = getattr(r.settings, k, None)
            if v is None:
                continue
            val = np.asarray(jax.device_get(v)).item()
            out[k] = val
        out["denoise_blend"] = self.denoise_blend
        out["furnace_threshold"] = self.furnace_threshold
        out["auto_samples_per_frame"] = self.auto_samples_per_frame
        out["target_framerate"] = self.target_framerate
        out["stall_percentage"] = self.stall_percentage
        return json.dumps(out)

    def _materials_json(self) -> str:
        from ..core.material import _COLOR_FIELDS, _SCALAR_FIELDS

        bank = self.renderer.scene.materials
        n = int(np.asarray(bank.base_color).shape[0])
        rows = []
        for i in range(n):
            row = {}
            for name, _d in _SCALAR_FIELDS:
                row[name] = float(np.asarray(getattr(bank, name))[i])
            for name, _d in _COLOR_FIELDS:
                row[name] = [
                    round(float(x), 5)
                    for x in np.asarray(getattr(bank, name))[i]
                ]
            rows.append(row)
        return json.dumps(rows)

    def _set_material(self, index: int, key: str, raw: str) -> bool:
        """Live material edit (reference: ImGuiObjectsWindow material editor
        writing through to RendererMaterial + render reset)."""
        import jax.numpy as jnp

        from ..core.material import _COLOR_FIELDS, _SCALAR_FIELDS

        bank = self.renderer.scene.materials
        scalar_names = {n for n, _ in _SCALAR_FIELDS}
        color_names = {n for n, _ in _COLOR_FIELDS}
        if key in scalar_names:
            arr = np.asarray(jax.device_get(getattr(bank, key))).copy()
            arr[index] = float(raw)
        elif key in color_names:
            arr = np.asarray(jax.device_get(getattr(bank, key))).copy()
            vals = [float(x) for x in raw.replace("[", "").replace(
                "]", "").split(",")]
            arr[index] = np.asarray(vals[:3], np.float32)
        else:
            return False
        new_bank = bank.replace(**{key: jnp.asarray(arr)})
        self.renderer.scene = self.renderer.scene.replace(materials=new_bank)
        return True

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
        elif cmd in ("walk", "pan"):
            # pan = middle-drag translate in the camera plane; walk = WASD
            # (reference: mouse pan + keyboard walk interactors)
            from ..core.camera import camera_translate

            dx = float(q.get("dx", ["0"])[0])
            dy = float(q.get("dy", ["0"])[0])
            dz = float(q.get("dz", ["0"])[0]) if cmd == "walk" else 0.0
            r.set_camera(camera_translate(r.camera, dx, dy, dz))
        elif cmd == "rotate":
            # first-person look (reference: left-drag mouse rotation,
            # LinuxRenderWindowMouseInteractor)
            from ..core.camera import camera_rotate

            yaw = float(q.get("yaw", ["0"])[0])
            pitch = float(q.get("pitch", ["0"])[0])
            r.set_camera(camera_rotate(r.camera, yaw, pitch))
        elif cmd == "material":
            idx = int(q.get("index", ["0"])[0])
            key = q.get("key", [""])[0]
            if self._set_material(idx, key, q.get("value", ["0"])[0]):
                r.reset()
        elif cmd == "option":
            # tier-3 static-option edit → recompile (reference: an ImGui
            # macro edit writing through get_raw_pointer_to_macro_value →
            # GPURenderer::recompile_kernels; per-option, not just presets)
            key = q.get("key", [""])[0]
            raw = q.get("value", [""])[0]
            err = self._set_option(key, raw)
            if err:
                return json.dumps({"ok": False, "cmd": cmd, "error": err})
        elif cmd == "preset":
            name = q.get("value", ["none"])[0]
            if self._apply_performance_preset(name):
                r.reset()
            else:
                return json.dumps({"ok": False, "cmd": cmd,
                                   "error": f"unknown preset {name!r}"})
        elif cmd == "benchmark":
            # reference: "Apply benchmark settings" button
            # (ImGuiSettingsWindow.cpp:2062-2069)
            r.settings = r.settings.replace(
                freeze_random=jnp.bool_(True),
                enable_adaptive_sampling=jnp.bool_(False),
                samples_per_frame=jnp.int32(1),
            )
            self.auto_samples_per_frame = False
            r.reset()
        elif cmd == "set":
            key = q.get("key", [""])[0]
            raw = q.get("value", ["0"])[0]
            if key == "auto_samples_per_frame":
                self.auto_samples_per_frame = raw.lower() in ("1", "true", "on")
                return json.dumps({"ok": True, "cmd": cmd})
            if key == "target_framerate":
                self.target_framerate = float(raw)
                return json.dumps({"ok": True, "cmd": cmd})
            if key == "stall_percentage":
                self.stall_percentage = float(raw)
                return json.dumps({"ok": True, "cmd": cmd})
            if key == "denoise_blend":
                self.denoise_blend = float(raw)
                return json.dumps({"ok": True, "cmd": cmd})
            if key == "furnace_threshold":
                self.furnace_threshold = float(raw)
                return json.dumps({"ok": True, "cmd": cmd})
            if key == "clamp":  # legacy combined alias
                r.settings = r.settings.replace(
                    direct_contribution_clamp=jnp.float32(float(raw)),
                    indirect_contribution_clamp=jnp.float32(float(raw)),
                )
            elif key in _SETTINGS_KEYS:
                cur = getattr(r.settings, key)
                dt = np.asarray(jax.device_get(cur)).dtype
                if dt == np.bool_:
                    val = jnp.bool_(raw.lower() in ("1", "true", "on"))
                elif np.issubdtype(dt, np.integer):
                    val = jnp.int32(int(float(raw)))
                else:
                    val = jnp.float32(float(raw))
                r.settings = r.settings.replace(**{key: val})
            r.reset()
        return json.dumps({"ok": True, "cmd": cmd})

    # performance presets (reference: ImGuiSettingsWindow::
    # apply_performance_preset, ImGuiSettingsWindow.cpp:498-580 — each preset
    # sets resolution scaling, target framerate, bounce count, RIS candidate
    # counts and the direct-light-sampling strategy macro, then recompiles)
    _PRESETS = {
        "fastest": dict(scale=0.5, fps=25.0, bounces=1, bsdf_cand=0,
                        light_cand=1, strategy="RIS_BSDF_LIGHT"),
        "fast": dict(scale=0.75, fps=15.0, bounces=2, bsdf_cand=1,
                     light_cand=4, strategy="RIS_BSDF_LIGHT"),
        "medium": dict(scale=1.0, fps=5.0, bounces=2, bsdf_cand=1,
                       light_cand=8, strategy="RIS_BSDF_LIGHT"),
        "high_quality": dict(scale=1.0, fps=5.0, bounces=4, bsdf_cand=1,
                             light_cand=8, strategy="RESTIR_DI"),
    }

    def _renderer_at_scale(self, scale: float):
        """A renderer whose WAVEFRONT is scaled (true low-res interaction):
        scale < 1 renders a smaller grid sharing the base scene/BVH, so a
        0.5 preset does ~1/4 the traversal+shading work instead of masking
        pixels on the full-size wavefront."""
        cur = self.renderer
        if scale >= 1.0:
            r = self._base_renderer
        else:
            key = round(scale, 3)
            if key not in self._scaled_renderers:
                from ..render.renderer import Renderer

                b = self._base_renderer
                w2 = max(16, (int(b.width * scale) // 8) * 8)
                h2 = max(16, (int(b.height * scale) // 8) * 8)
                self._scaled_renderers[key] = Renderer(
                    b.scene, b.camera, w2, h2, options=b.options,
                    bvh=b.bvh, seed=b.seed,
                )
            r = self._scaled_renderers[key]
        if r is not cur:
            r.camera = cur.camera
            r.world = cur.world
            r.settings = cur.settings
            r.reset()
        return r

    def _apply_performance_preset(self, name: str) -> bool:
        import dataclasses

        import jax.numpy as jnp

        from ..core.settings import LightSamplingStrategy

        if name in ("none", ""):
            return True
        p = self._PRESETS.get(name)
        if p is None:
            return False
        self.target_framerate = p["fps"]
        with self._step_lock:
            r = self._renderer_at_scale(p["scale"])
            self.renderer = r
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(p["bounces"]),
            # the wavefront itself is scaled (see _renderer_at_scale);
            # pixel masking stays off
            render_low_resolution=jnp.bool_(False),
            low_resolution_scale=jnp.float32(1.0),
            ris=r.settings.ris.replace(
                number_of_bsdf_candidates=jnp.int32(p["bsdf_cand"]),
                number_of_light_candidates=jnp.int32(p["light_cand"]),
            ),
        )
        strategy = getattr(LightSamplingStrategy, p["strategy"])
        if strategy != r.options.direct_light_sampling:
            with self._step_lock:
                r.recompile(dataclasses.replace(
                    r.options, direct_light_sampling=strategy))
        return True

    # --- tier-3 options panel (reference: per-option macro editing in the
    # ImGui settings window; each edit = recompile_kernels) ---

    def _options_json(self) -> str:
        import dataclasses
        import enum

        opts = self.renderer.options
        out = {}
        for f in dataclasses.fields(opts):
            v = getattr(opts, f.name)
            if isinstance(v, enum.Enum):
                out[f.name] = {
                    "value": v.name,
                    "choices": [m.name for m in type(v)],
                }
            else:
                out[f.name] = {"value": v}
        return json.dumps(out)

    def _set_option(self, key: str, raw: str):
        """Parse + apply one tier-3 option; returns an error string or None.
        Enum fields accept member names; bools accept 0/1/true/false."""
        import dataclasses
        import enum

        opts = self.renderer.options
        field = {f.name: f for f in dataclasses.fields(opts)}.get(key)
        if field is None:
            return f"unknown option {key!r}"
        cur = getattr(opts, key)
        try:
            if isinstance(cur, enum.Enum):
                val = type(cur)[raw]
            elif isinstance(cur, bool):
                val = raw.strip().lower() in ("1", "true", "yes", "on")
            elif isinstance(cur, int):
                val = int(raw)
            else:
                val = type(cur)(raw)
        except (KeyError, ValueError) as e:
            return f"bad value for {key}: {e!r}"
        with self._step_lock:
            self.renderer.recompile(opts.replace(**{key: val}))
        return None

    def _kernels_json(self) -> str:
        """Compiled-kernel introspection (reference: "Shader kernels" panel
        with per-kernel register counts, ImGuiSettingsWindow.cpp:2206)."""
        with self._step_lock:
            return json.dumps(self.renderer.kernel_stats())

    def _bias_json(self) -> str:
        from ..restir.bias import bias_status

        return json.dumps(
            bias_status(self.renderer.options, self.renderer.settings)
        )

    def _stats(self) -> str:
        r = self.renderer
        sc = int(jax.device_get(r.state.sample_count))
        rays = float(jax.device_get(r.state.rays_traced))
        conv = int(jax.device_get(r.state.nb_pixels_converged))
        return json.dumps(
            {
                "samples": sc,
                "resolution": [r.width, r.height],
                "rays_traced": rays,
                "pixels_converged": conv,
                "frame_ms_avg": round(r.metrics.get_average("frame_ms"), 2),
                "frame_ms_stddev": round(r.metrics.get_stddev("frame_ms"), 2)
                if hasattr(r.metrics, "get_stddev") else 0.0,
                "samples_per_s": round(
                    r.metrics.get_average("samples_per_s"), 3
                ),
            }
        )

    def _perf_json(self, query) -> str:
        """Performance panel data (reference: ImGuiSettingsWindow performance
        plots + per-kernel event times, GPUKernel.cpp:180-189): windowed
        series histories for plotting plus, with ?passes=1, a fresh per-pass
        delta-timed breakdown (Renderer.profile — costs a few extra steps)."""
        r = self.renderer
        out = {
            "series": {
                name: {
                    "values": r.metrics.values(name),
                    "avg": round(r.metrics.get_average(name), 3),
                    "stddev": round(r.metrics.get_stddev(name), 3),
                    "min": round(r.metrics.get_min(name), 3),
                    "max": round(r.metrics.get_max(name), 3),
                }
                for name in r.metrics.names()
            }
        }
        if parse_qs(query).get("passes", ["0"])[0] in ("1", "true"):
            # profile() steps a private copy of the state; concurrent viewer
            # rendering only skews the timings, it cannot corrupt state
            out["passes_ms"] = {
                k: round(v, 2) for k, v in r.profile(frames=1).items()
            }
        return json.dumps(out)

    def _bake(self, q) -> str:
        """Baking window parity (reference: ImGuiBakingWindow.cpp:24-366 —
        launch a LUT bake on a side stream, poll completion). ?what= one of
        conductor|glossy_dielectric|glossy_base|fresnel|glass|glass_inv|
        thin_glass, optional res=/samples=/out=. No args -> status JSON."""
        what = q.get("what", [""])[0]
        if not what:
            return json.dumps(self._bake_status)
        if self._bake_status.get("state") == "running":
            return json.dumps({"error": "bake already running",
                               **self._bake_status})
        res = int(q.get("res", ["16"])[0])
        samples = int(q.get("samples", ["2048"])[0])
        out = q.get("out", [""])[0]

        def run():
            from ..bake import baker

            fns = {
                "conductor": baker.bake_ggx_conductor_ess,
                "glossy_dielectric": baker.bake_ggx_glossy_dielectric_ess,
                "glossy_base": baker.bake_glossy_base_ess,
                "fresnel": baker.bake_ggx_fresnel_ess,
                "glass": baker.bake_ggx_glass_ess,
                "glass_inv": baker.bake_ggx_glass_inv_ess,
                "thin_glass": baker.bake_ggx_thin_glass_ess,
            }
            try:
                fn = fns[what]
                table = fn(res=res, n_samples=samples)
                if out:
                    baker.save_lut(np.asarray(table), out)
                self._bake_status = {
                    "state": "done", "what": what,
                    "shape": list(np.asarray(table).shape),
                    "out": out or None,
                }
            except Exception as e:  # surfaced via status poll
                self._bake_status = {"state": "error", "what": what,
                                     "error": str(e)}

        self._bake_status = {"state": "running", "what": what, "res": res,
                             "samples": samples}
        threading.Thread(target=run, daemon=True).start()
        return json.dumps(self._bake_status)

    def _animate(self, q) -> str:
        """Animation window parity (reference: ImGuiAnimationWindow.cpp:20-266
        — frame-sequence rendering with camera/envmap animation). ?frames=N&
        spp=S&out=dir [&orbit_deg=D][&envmap_deg=D][&denoise=1]. The modal
        job owns the renderer; the progressive loop yields until it's done.
        No args -> status JSON."""
        if "frames" not in q:
            return json.dumps(self._anim_status)
        if self._anim_status.get("state") == "running":
            return json.dumps({"error": "animation already running",
                               **self._anim_status})
        frames = int(q.get("frames", ["4"])[0])
        spp = int(q.get("spp", ["4"])[0])
        out = q.get("out", ["/tmp/hiprt_pt_anim"])[0]
        orbit_deg = float(q.get("orbit_deg", ["0"])[0])
        envmap_deg = float(q.get("envmap_deg", ["0"])[0])
        do_denoise = q.get("denoise", ["0"])[0] in ("1", "true")

        def run():
            from ..render.animation import (
                CameraOrbitAnimation,
                EnvmapRotationAnimation,
                render_frame_sequence,
            )

            self._busy.set()
            # wait out any in-flight progressive step before taking over
            with self._step_lock:
                pass
            try:
                cam_anim = (
                    CameraOrbitAnimation(
                        target=(0.0, 0.0, 0.0), degrees_per_frame=orbit_deg
                    )
                    if orbit_deg else None
                )
                env_anim = (
                    EnvmapRotationAnimation(degrees_per_frame=envmap_deg)
                    if envmap_deg else None
                )
                paths = render_frame_sequence(
                    self.renderer, frames, spp, out,
                    camera_animation=cam_anim, envmap_animation=env_anim,
                    denoise_frames=do_denoise,
                )
                self._anim_status = {"state": "done", "frames": len(paths),
                                     "out": out, "paths": paths}
            except Exception as e:
                self._anim_status = {"state": "error", "error": str(e)}
            finally:
                self._busy.clear()

        self._anim_status = {"state": "running", "frames": frames,
                             "spp": spp, "out": out}
        threading.Thread(target=run, daemon=True).start()
        return json.dumps(self._anim_status)

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
                elif u.path == "/settings":
                    body = viewer._settings_json().encode()
                    ctype = "application/json"
                elif u.path == "/options":
                    body = viewer._options_json().encode()
                    ctype = "application/json"
                elif u.path == "/kernels":
                    body = viewer._kernels_json().encode()
                    ctype = "application/json"
                elif u.path == "/bias":
                    body = viewer._bias_json().encode()
                    ctype = "application/json"
                elif u.path == "/materials":
                    body = viewer._materials_json().encode()
                    ctype = "application/json"
                elif u.path == "/perf":
                    body = viewer._perf_json(u.query).encode()
                    ctype = "application/json"
                elif u.path == "/control":
                    body = viewer._control(parse_qs(u.query)).encode()
                    ctype = "application/json"
                elif u.path == "/bake":
                    body = viewer._bake(parse_qs(u.query)).encode()
                    ctype = "application/json"
                elif u.path == "/animate":
                    body = viewer._animate(parse_qs(u.query)).encode()
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
