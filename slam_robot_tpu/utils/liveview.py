"""Interactive live view: the reference's GUI loop analog, served over
HTTP (main.cpp:609-638 draws the debug overlay into an OpenCV window and
polls keys; a headless TPU host has no X server, so the rebuild streams
the same DrawDebug overlay as MJPEG to any browser instead).

Design: the SLAM loop publishes (overlay, status) at its own cadence;
clients pull. Publishing never blocks the robot loop — the newest frame
simply replaces the last one, and slow clients skip frames (each streamer
always encodes from the latest published overlay).

    view = LiveView(port=8089)
    view.start()
    ...
    view.publish(overlay_u8_rgb, {"frame": fid, "matches": 87, ...})

Endpoints:
    /        HTML page: <img> bound to /stream + status line polling /status
    /stream  multipart/x-mixed-replace MJPEG of the latest overlay
    /status  latest status dict as JSON
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = b"""<!doctype html>
<html><head><title>slam_robot_tpu live</title><style>
body { background:#111; color:#ddd; font-family:monospace; margin:1em }
img { border:1px solid #444; max-width:100% }
#status { margin:0.5em 0; white-space:pre }
</style></head><body>
<h3>slam_robot_tpu live view</h3>
<div id="status">waiting...</div>
<img src="/stream">
<script>
setInterval(async () => {
  try {
    const r = await fetch('/status');
    const s = await r.json();
    document.getElementById('status').textContent =
      Object.entries(s).map(([k, v]) => k + '=' + v).join('  ');
  } catch (e) {}
}, 500);
</script>
</body></html>
"""


class LiveView:
    """Thread-backed MJPEG/status server over the latest published frame."""

    def __init__(self, port: int = 8089, host: str = "0.0.0.0",
                 quality: int = 85):
        self.port = port
        self.host = host
        self.quality = quality
        self._cond = threading.Condition()
        self._jpeg: bytes | None = None
        self._status: dict = {}
        self._seq = 0
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ---- producer side (the SLAM loop) ----

    def publish(self, overlay, status: dict | None = None) -> None:
        """Publish a new frame: ``overlay`` is a HxWx3 uint8 array (or
        anything PIL.Image.fromarray accepts). Encoding happens here, once
        per publish, so N stream clients cost no extra encodes."""
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(overlay).save(buf, format="JPEG",
                                      quality=self.quality)
        with self._cond:
            self._jpeg = buf.getvalue()
            if status is not None:
                self._status = dict(status)
            self._seq += 1
            self._cond.notify_all()

    # ---- server lifecycle ----

    def start(self) -> "LiveView":
        view = self

        class Handler(BaseHTTPRequestHandler):
            daemon_threads = True

            def log_message(self, *a):  # quiet: the SLAM loop owns stdout
                pass

            def do_GET(self):
                if self.path == "/" or self.path == "/index.html":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(_PAGE)))
                    self.end_headers()
                    self.wfile.write(_PAGE)
                elif self.path == "/status":
                    body = json.dumps(view._status).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame")
                    self.end_headers()
                    last = -1
                    try:
                        while True:
                            with view._cond:
                                view._cond.wait_for(
                                    lambda: view._seq != last, timeout=2.0)
                                jpeg, last = view._jpeg, view._seq
                            if jpeg is None:
                                continue
                            self.wfile.write(b"--frame\r\n")
                            self.wfile.write(b"Content-Type: image/jpeg\r\n")
                            self.wfile.write(
                                f"Content-Length: {len(jpeg)}\r\n\r\n"
                                .encode())
                            self.wfile.write(jpeg)
                            self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        return  # client went away
                else:
                    self.send_error(404)

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_address[1]  # resolve port=0
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True,
            name="liveview-http")
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
