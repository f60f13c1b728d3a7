"""Live avatar viewer: a tiny HTTP server rendering the current gaussians.

Replaces the reference's SIBR network viewer socket (reference:
gaussiansplatting/gaussian_renderer/network_gui.py:1-92) with a
dependency-free HTTP endpoint: GET /render?azimuth=30&elevation=10&radius=1.8
&size=512 returns a PNG of the current state; GET / returns a minimal
orbit-viewer page. `update(gaussians)` swaps the state atomically from the
training loop."""

from __future__ import annotations

import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><title>gaussianip-tpu viewer</title>
<body style="margin:0;background:#111;color:#eee;font-family:monospace">
<div style="padding:8px">azimuth <input id=a type=range min=-180 max=180 value=0>
elevation <input id=e type=range min=-89 max=89 value=5>
radius <input id=r type=range min=5 max=40 value=18></div>
<img id=v width=512 height=512>
<script>
const v=document.getElementById('v');
function refresh(){v.src='/render?azimuth='+a.value+'&elevation='+e.value+
'&radius='+(r.value/10)+'&t='+Date.now();}
for (const el of [a,e,r]) el.oninput=refresh;
setInterval(refresh, 2000); refresh();
</script></body>"""


class ViewerState:
    def __init__(self):
        self.lock = threading.Lock()
        self.gaussians = None

    def update(self, gaussians):
        with self.lock:
            self.gaussians = gaussians

    def render(self, azimuth, elevation, radius, size):
        import jax
        import jax.numpy as jnp

        from ..data.cameras import camera_from_c2w
        from ..ops.camera_math import look_at_c2w
        from ..render.render import RenderConfig, render

        with self.lock:
            g = self.gaussians
        if g is None:
            return np.zeros((size, size, 3), np.uint8)
        el, az = np.deg2rad(elevation), np.deg2rad(azimuth)
        eye = radius * np.array(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)])
        c2w = look_at_c2w(jnp.asarray(eye, jnp.float32)[None],
                          jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]))
        cams = jax.vmap(
            lambda m: camera_from_c2w(m, jnp.float32(0.9), size, size))(c2w)
        out = render(g, cams, jnp.zeros(3), RenderConfig())
        return (np.asarray(out.rgb[0]).clip(0, 1) * 255).astype(np.uint8)


def start_viewer(state: ViewerState, host: str = "127.0.0.1",
                 port: int = 6009):
    """Returns the server (daemon thread); reference uses port 6009 too."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/render":
                q = parse_qs(u.query)

                def f(name, default):
                    return float(q.get(name, [default])[0])

                img = state.render(f("azimuth", 0), f("elevation", 5),
                                   f("radius", 1.8), int(f("size", 512)))
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    server = ThreadingHTTPServer((host, port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
