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
canvas{display:block;cursor:grab}
</style></head><body>
<canvas id=c></canvas><div id=hud>loading...</div>
<script>
const cv=document.getElementById('c'),hud=document.getElementById('hud');
let yaw=%YAW%,pitch=%PITCH%,radius=%RADIUS%,tx=%TX%,ty=%TY%,tz=%TZ%;
let drag=null,busy=false,dirty=true;
cv.width=%W%;cv.height=%H%;
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
  const q=`yaw=${yaw}&pitch=${pitch}&radius=${radius}&tx=${tx}&ty=${ty}&tz=${tz}`;
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
