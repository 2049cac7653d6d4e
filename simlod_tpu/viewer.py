"""Minimal live viewer: frames over HTTP with browser-side orbit controls.

The reference is an interactive GLFW window with ImGui stats and mouse orbit
controls (src/GLRenderer.cpp, include/OrbitControls.h:100-138). This environment
is headless, so the interactive equivalent serves rendered frames over HTTP:

  - `GET /`           a self-contained HTML page: canvas + mouse handlers that
                      mirror OrbitControls (drag = yaw/pitch, wheel = radius,
                      shift-drag = pan) and live stats readout,
  - `GET /frame?...`  renders one frame for the requested camera and streams it
                      as PNG (stdlib zlib encoder — no image library needed),
  - `GET /stats`      the engine's stats table as JSON (the ImGui stats window).

Camera state lives in the BROWSER and rides the query string, so the server is
stateless per request and any number of clients can orbit independently.

Start with `simlod --serve [--port 8642] cloud.las` (app.py) against a loaded
engine; construction continues between frames if the stream still has batches
(the reference's simultaneous update+render loop).
"""
from __future__ import annotations

import json
import struct
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .render.render import image_to_rgba8


def encode_png(rgb: np.ndarray) -> bytes:
    """[H, W, 3] uint8 -> PNG bytes (stdlib only)."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


_PAGE = """<!doctype html><html><head><title>simlod_tpu</title><style>
body{margin:0;background:#111;color:#ddd;font:13px monospace;overflow:hidden}
#hud{position:fixed;top:8px;left:8px;background:#000a;padding:8px;white-space:pre}
#set{position:fixed;top:8px;right:8px;background:#000a;padding:8px}
#set label{display:block;margin:2px 0}
#set input[type=range]{vertical-align:middle;width:110px}
canvas{display:block;cursor:grab}
</style></head><body>
<canvas id=c></canvas><div id=hud>loading...</div>
<div id=set>
 <b>settings</b>
 <label><input type=checkbox id=hqs checked> high-quality shading</label>
 <label><input type=checkbox id=edl checked> eye-dome lighting</label>
 <label>EDL strength <input type=range id=edls min=0 max=2 step=0.05 value=0.4>
  <span id=edlsv>0.4</span></label>
 <label>minNodeSize <input type=range id=mns min=32 max=1024 step=8 value=64>
  <span id=mnsv>64</span></label>
 <label>point size <input type=range id=psz min=1 max=10 step=1 value=1>
  <span id=pszv>1</span></label>
 <label>point budget <input type=range id=pbud min=0 max=4 step=0.25 value=1>
  <span id=pbudv>1</span></label>
 <label><input type=checkbox id=boxes> node boxes</label>
 <label><input type=checkbox id=freeze> freeze LOD cut</label>
 <label>color <select id=cmode><option value=0>rgb</option>
  <option value=1>by node</option><option value=2>by LOD</option>
  <option value=3>white</option></select></label>
</div>
<script>
const cv=document.getElementById('c'),hud=document.getElementById('hud');
let yaw=%YAW%,pitch=%PITCH%,radius=%RADIUS%,tx=%TX%,ty=%TY%,tz=%TZ%;
let drag=null,busy=false,dirty=true;
cv.width=%W%;cv.height=%H%;
const el=id=>document.getElementById(id);
for(const id of['hqs','edl','edls','mns','psz','pbud','boxes','freeze','cmode'])
 el(id).oninput=()=>{el('edlsv').textContent=el('edls').value;
  el('mnsv').textContent=el('mns').value;
  el('pszv').textContent=el('psz').value;
  el('pbudv').textContent=el('pbud').value;dirty=true};
cv.onmousedown=e=>{drag={x:e.clientX,y:e.clientY,pan:e.shiftKey||e.button==2};e.preventDefault()};
window.onmouseup=()=>drag=null;
cv.oncontextmenu=e=>e.preventDefault();
window.onmousemove=e=>{if(!drag)return;
 const dx=e.clientX-drag.x,dy=e.clientY-drag.y;drag.x=e.clientX;drag.y=e.clientY;
 if(drag.pan){const s=radius*0.001;  // OrbitControls pan scale
  tx+=-s*(dx*Math.cos(yaw)-dy*Math.sin(yaw)*Math.sin(pitch));
  ty+=-s*(-dx*Math.sin(yaw)-dy*Math.cos(yaw)*Math.sin(pitch));
  tz+=s*dy*Math.cos(pitch);}
 else{yaw+=dx*0.01;pitch+=dy*0.01;
  pitch=Math.max(-1.55,Math.min(1.55,pitch));}
 dirty=true};
window.onwheel=e=>{radius*=e.deltaY>0?1.1:0.9;dirty=true};
async function loop(){
 if(dirty&&!busy){dirty=false;busy=true;
  const q=`yaw=${yaw}&pitch=${pitch}&radius=${radius}&tx=${tx}&ty=${ty}&tz=${tz}`+
   `&hqs=${el('hqs').checked?1:0}&edl=${el('edl').checked?1:0}`+
   `&edls=${el('edls').value}&mns=${el('mns').value}&psz=${el('psz').value}`+
   `&boxes=${el('boxes').checked?1:0}&freeze=${el('freeze').checked?1:0}`+
   `&cmode=${el('cmode').value}&pbud=${el('pbud').value}`;
  try{
   const t0=performance.now();
   const r=await fetch('/frame?'+q);const b=await r.blob();
   const img=await createImageBitmap(b);
   cv.getContext('2d').drawImage(img,0,0);
   const s=await (await fetch('/stats')).json();
   hud.textContent=`frame ${(performance.now()-t0).toFixed(0)} ms  `+
    `nodes ${s.num_nodes}  points ${s.num_points}  voxels ${s.num_voxels_stored}\\n`+
    `visible pts ${s.num_visible_points} vox ${s.num_visible_voxels}`+
    (s.streaming?`\\nstreaming... ${s.num_points_processed} pts`:'');
   if(s.streaming)dirty=true;   // keep refreshing while construction runs
  }catch(e){hud.textContent='error: '+e}
  busy=false}
 requestAnimationFrame(loop)}
loop();
</script></body></html>"""


class ViewerServer:
    """Serves an Engine's frames; single render lock (one TPU)."""

    def __init__(self, engine, width: int = 1280, height: int = 720,
                 port: int = 8642):
        self.engine = engine
        self.width, self.height = width, height
        self.port = port
        self._lock = threading.Lock()
        self._last_stats = {}

    def _render(self, q) -> bytes:
        eng = self.engine
        g = lambda k, d: float(q.get(k, [d])[0])
        with self._lock:
            o = eng.orbit
            o.yaw = g("yaw", o.yaw)
            o.pitch = g("pitch", o.pitch)
            o.radius = g("radius", o.radius)
            o.target = np.array([g("tx", o.target[0]), g("ty", o.target[1]),
                                 g("tz", o.target[2])], np.float64)
            eng.camera.world = o.world()
            # settings panel (reference ImGui widgets,
            # main_progressive_octree.cpp:1237-1368): all values ride Uniforms
            # scalars, so toggling never retraces a program
            s = eng.settings
            s.use_high_quality_shading = g("hqs", s.use_high_quality_shading) > 0
            s.enable_edl = g("edl", s.enable_edl) > 0
            s.edl_strength = g("edls", s.edl_strength)
            s.min_node_size = g("mns", s.min_node_size)
            s.point_size = min(int(g("psz", s.point_size)),
                               eng.cfg.max_point_size)
            # screen-budgeted decimation (render/drawpool.py): frame cost
            # tracks screen coverage; 0 restores exact reference semantics
            s.point_budget = g("pbud", s.point_budget)
            s.show_bounding_box = g("boxes", s.show_bounding_box) > 0
            s.do_update_visibility = g("freeze", 0) == 0
            cmode = int(g("cmode", 0))
            s.color_by_node = cmode == 1
            s.color_by_lod = cmode == 2
            s.color_white = cmode == 3
            if (eng.stream is not None and not eng.last_batch_finished):
                img, stats = eng.frame(self.width, self.height)   # simultaneous
            else:
                img, stats = eng.render(self.width, self.height)
            import dataclasses as _dc
            import jax
            self._last_stats = {
                k: (v.item() if hasattr(v, "item") else v)
                for k, v in _dc.asdict(jax.tree.map(np.asarray, stats)).items()}
            self._last_stats["streaming"] = bool(
                eng.stream is not None and not eng.last_batch_finished)
        rgb = image_to_rgba8(img)[::-1, :, :3]
        return encode_png(np.ascontiguousarray(rgb))

    def page(self) -> str:
        o = self.engine.orbit
        return (_PAGE.replace("%YAW%", f"{o.yaw}").replace("%PITCH%", f"{o.pitch}")
                .replace("%RADIUS%", f"{o.radius}")
                .replace("%TX%", f"{o.target[0]}").replace("%TY%", f"{o.target[1]}")
                .replace("%TZ%", f"{o.target[2]}")
                .replace("%W%", str(self.width)).replace("%H%", str(self.height)))

    def serve_forever(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                try:
                    if u.path == "/":
                        self._send(200, "text/html",
                                   viewer.page().encode())
                    elif u.path == "/frame":
                        png = viewer._render(parse_qs(u.query))
                        self._send(200, "image/png", png)
                    elif u.path == "/stats":
                        self._send(200, "application/json",
                                   json.dumps(viewer._last_stats).encode())
                    else:
                        self._send(404, "text/plain", b"not found")
                except BrokenPipeError:
                    pass
                except Exception as e:  # surface render errors to the client
                    self._send(500, "text/plain", repr(e).encode())

        httpd = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        print(f"viewer: http://localhost:{self.port}/ "
              f"({self.width}x{self.height})", flush=True)
        httpd.serve_forever()
