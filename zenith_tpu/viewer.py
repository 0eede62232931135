"""Interactive HTTP viewer — the winit front-end analog.

The reference is an interactive windowed renderer: winit creates the OS
window, delivers keyboard/mouse events, and the app redraws continuously
(/root/reference/zenith/src/main_loop.rs:21-62,107-138). This framework is
headless (frames are device arrays; "present" is a host readback), so the
front-end half lives here instead: a tiny stdlib HTTP server that

- streams presented frames to any browser as MJPEG
  (``multipart/x-mixed-replace``; JPEG via PIL when available, PNG
  fallback), and
- receives keyboard/mouse input from the browser page and feeds it into
  the ``Window`` event queue as the typed events of ``core.events`` —
  the same contract scripted replays and tests use.

So the full interactive loop is: browser keydown → POST /events →
``Window.push_window_event(KeyboardInput(...))`` → ``EngineLoop._pump_events``
→ ``InputActionMapper``/``CameraController`` → camera moves → frame renders
on the TPU → swapchain readback → ``Window.present`` → MJPEG part → browser.

Run:  python -m zenith_tpu.sandbox.fly --serve 8089
then open http://127.0.0.1:8089/ and fly with WASD/QE + drag-to-look
(click the view to grab the pointer, Esc to release, Shift to sprint).

Threading: the engine loop owns the main thread; the HTTP server runs
daemon threads. ``deque.append`` / the present hook are GIL-atomic, so the
queue handoff needs no locks; the stream handler waits on a Condition the
present hook notifies.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from zenith_tpu.core import log
from zenith_tpu.core.events import (
    CloseRequested,
    ElementState,
    KeyboardInput,
    KeyCode,
    MouseButton,
    MouseInput,
    MouseMotion,
    Resized,
)
from zenith_tpu.window import Window

logger = log.get(__name__)

# JS KeyboardEvent.code → KeyCode (winit::keyboard::KeyCode parity — the
# browser uses the same physical-key naming, "KeyW"/"ShiftLeft"/"ArrowUp").
_JS_KEYMAP = {
    "KeyW": KeyCode.KEY_W,
    "KeyA": KeyCode.KEY_A,
    "KeyS": KeyCode.KEY_S,
    "KeyD": KeyCode.KEY_D,
    "KeyQ": KeyCode.KEY_Q,
    "KeyE": KeyCode.KEY_E,
    "KeyR": KeyCode.KEY_R,
    "KeyF": KeyCode.KEY_F,
    "Space": KeyCode.SPACE,
    "ShiftLeft": KeyCode.SHIFT_LEFT,
    "ControlLeft": KeyCode.CONTROL_LEFT,
    "AltLeft": KeyCode.ALT_LEFT,
    "MetaLeft": KeyCode.SUPER_LEFT,
    "Escape": KeyCode.ESCAPE,
    "Tab": KeyCode.TAB,
    "Enter": KeyCode.ENTER,
    "ArrowUp": KeyCode.ARROW_UP,
    "ArrowDown": KeyCode.ARROW_DOWN,
    "ArrowLeft": KeyCode.ARROW_LEFT,
    "ArrowRight": KeyCode.ARROW_RIGHT,
}

_JS_BUTTONS = {0: MouseButton.LEFT, 1: MouseButton.MIDDLE, 2: MouseButton.RIGHT}


def keycode_from_js(code: str) -> Optional[KeyCode]:
    """Map a JS ``KeyboardEvent.code`` to the framework KeyCode (None =
    key not in the contract; the page just drops it)."""
    return _JS_KEYMAP.get(code)


def decode_event(msg: dict):
    """One JSON wire event → a typed core.events event, or None.

    Wire format (the page's half of the contract):
      {"type": "key",    "code": "KeyW", "state": "down"|"up", "repeat": bool}
      {"type": "button", "button": 0|1|2, "state": "down"|"up"}
      {"type": "motion", "dx": float, "dy": float}
      {"type": "resize", "width": int, "height": int}
      {"type": "close"}
    """
    kind = msg.get("type")
    if kind == "key":
        key = keycode_from_js(str(msg.get("code", "")))
        if key is None:
            return None
        state = (
            ElementState.PRESSED
            if msg.get("state") == "down"
            else ElementState.RELEASED
        )
        return KeyboardInput(key, state, repeat=bool(msg.get("repeat", False)))
    if kind == "button":
        button = _JS_BUTTONS.get(int(msg.get("button", 0)))
        if button is None:
            return None
        state = (
            ElementState.PRESSED
            if msg.get("state") == "down"
            else ElementState.RELEASED
        )
        return MouseInput(button, state)
    if kind == "motion":
        return MouseMotion(dx=float(msg.get("dx", 0.0)), dy=float(msg.get("dy", 0.0)))
    if kind == "resize":
        return Resized(int(msg["width"]), int(msg["height"]))
    if kind == "close":
        return CloseRequested()
    return None


def encode_jpeg(frame: np.ndarray, quality: int = 85) -> "tuple[bytes, str]":
    """Encoded image bytes + MIME for one presented host frame.

    Frames arrive in the swapchain channel order (BGRA, like
    ``Window.write_png``); JPEG via PIL when installed, lossless PNG via
    the native encoder otherwise.
    """
    arr = np.asarray(frame)
    if arr.ndim == 3 and arr.shape[-1] == 4:
        arr = arr[..., [2, 1, 0]]  # BGRA → RGB
    if arr.dtype != np.uint8:
        if arr.dtype.kind == "f":
            arr = np.clip(arr, 0.0, 1.0) * 255.0 + 0.5
        arr = arr.astype(np.uint8)
    try:
        from PIL import Image
    except ImportError:
        from zenith_tpu.native import encode_png

        return encode_png(np.ascontiguousarray(arr)), "image/png"
    buf = io.BytesIO()
    Image.fromarray(np.ascontiguousarray(arr)).save(buf, "JPEG", quality=quality)
    return buf.getvalue(), "image/jpeg"


_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>zenith viewer</title><style>
  html,body { margin:0; background:#111; color:#9a9; font:12px monospace;
              height:100%; overflow:hidden; }
  #view { display:block; margin:0 auto; max-width:100vw; max-height:94vh;
          image-rendering:auto; cursor:crosshair; }
  #bar { height:6vh; display:flex; align-items:center; justify-content:center;
         gap:2em; user-select:none; }
</style></head><body>
<img id="view" src="/stream" draggable="false">
<div id="bar"><span>zenith — WASD/QE move, click to grab mouse-look,
Esc releases, Shift sprints</span><span id="stat"></span></div>
<script>
const view = document.getElementById('view');
const stat = document.getElementById('stat');
let queue = [];
function push(ev) { queue.push(ev); }
setInterval(() => {
  if (!queue.length) return;
  const batch = queue; queue = [];
  fetch('/events', {method: 'POST', body: JSON.stringify(batch),
                    keepalive: true}).catch(() => {});
}, 16);
window.addEventListener('keydown', e => {
  if (e.repeat) { push({type:'key', code:e.code, state:'down', repeat:true}); }
  else push({type:'key', code:e.code, state:'down'});
  if (e.code !== 'Escape') e.preventDefault();
});
window.addEventListener('keyup', e => {
  push({type:'key', code:e.code, state:'up'}); e.preventDefault();
});
view.addEventListener('click', () => view.requestPointerLock());
window.addEventListener('mousedown', e =>
  push({type:'button', button:e.button, state:'down'}));
window.addEventListener('mouseup', e =>
  push({type:'button', button:e.button, state:'up'}));
window.addEventListener('mousemove', e => {
  if (document.pointerLockElement === view)
    push({type:'motion', dx:e.movementX, dy:e.movementY});
});
document.addEventListener('pointerlockchange', () => {
  // Pointer grab doubles as the look button (CameraController grabs on
  // LMB, camera.rs:232-269 parity) — hold it for the lock's duration.
  const locked = document.pointerLockElement === view;
  push({type:'button', button:0, state: locked ? 'down' : 'up'});
});
window.addEventListener('beforeunload', () => {
  navigator.sendBeacon('/events', JSON.stringify([{type:'close'}]));
});
setInterval(async () => {
  try { stat.textContent = await (await fetch('/stats')).text(); }
  catch (e) {}
}, 1000);
</script></body></html>
"""

_BOUNDARY = "zenithframe"


def make_pace(fps_cap: float = 60.0):
    """Frame callback that paces the engine loop to ``fps_cap`` — an
    interactive session must not spin the chip (and the MJPEG encoder)
    for frames nobody sees. Device readback back-pressure may pace lower
    still (e.g. ~39 FPS at 480x270 through a network tunnel)."""
    import time

    min_dt = 1.0 / max(fps_cap, 1e-3)
    last = [0.0]

    def pace(_frame: int, _window) -> None:
        now = time.perf_counter()
        if now - last[0] < min_dt:
            time.sleep(min_dt - (now - last[0]))
        last[0] = time.perf_counter()

    return pace


class ViewerServer:
    """Serve a ``Window`` over HTTP: MJPEG stream out, input events in."""

    def __init__(
        self,
        window: Window,
        host: str = "127.0.0.1",
        port: int = 8089,
        quality: int = 85,
        max_stream_fps: float = 60.0,
    ):
        self.window = window
        self.host = host
        self.port = port
        self.quality = quality
        self.max_stream_fps = max_stream_fps
        self._cond = threading.Condition()
        self._frame_seq = 0
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        self._prev_on_present = window.on_present
        window.on_present = self._on_present

    # -- present hook (render thread) ----------------------------------------

    def _on_present(self, image: np.ndarray, frame_index: int) -> None:
        if self._prev_on_present is not None:
            self._prev_on_present(image, frame_index)
        with self._cond:
            self._frame_seq += 1
            self._cond.notify_all()

    def wait_frame(self, seen: int, timeout: float = 1.0) -> int:
        """Block until a frame newer than ``seen`` was presented; returns
        the current sequence number (== ``seen`` on timeout)."""
        with self._cond:
            self._cond.wait_for(lambda: self._frame_seq > seen, timeout)
            return self._frame_seq

    # -- lifecycle -------------------------------------------------------------

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/"

    def start(self) -> "ViewerServer":
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # route through our logger
                logger.debug("http: " + fmt, *args)

            def _send(self, code: int, body: bytes, mime: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", mime)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
                elif self.path == "/frame":
                    frame = viewer.window.last_frame
                    if frame is None:
                        self._send(503, b"no frame presented yet", "text/plain")
                        return
                    body, mime = encode_jpeg(frame, viewer.quality)
                    self._send(200, body, mime)
                elif self.path == "/stats":
                    w = viewer.window
                    body = json.dumps(
                        {
                            "presented_frames": w.presented_frames,
                            "width": w.width,
                            "height": w.height,
                            "closed": w.closed,
                        }
                    ).encode()
                    self._send(200, body, "application/json")
                elif self.path == "/stream":
                    self._stream()
                else:
                    self._send(404, b"not found", "text/plain")

            def _stream(self):
                import time as _time

                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    f"multipart/x-mixed-replace; boundary={_BOUNDARY}",
                )
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                seen = 0
                min_dt = 1.0 / max(viewer.max_stream_fps, 1e-3)
                last = 0.0
                try:
                    while not viewer.window.closed:
                        seen = viewer.wait_frame(seen)
                        frame = viewer.window.last_frame
                        if frame is None:
                            continue
                        now = _time.perf_counter()
                        if now - last < min_dt:
                            _time.sleep(min_dt - (now - last))
                        last = _time.perf_counter()
                        body, mime = encode_jpeg(frame, viewer.quality)
                        self.wfile.write(
                            (
                                f"--{_BOUNDARY}\r\nContent-Type: {mime}\r\n"
                                f"Content-Length: {len(body)}\r\n\r\n"
                            ).encode()
                        )
                        self.wfile.write(body)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass  # viewer tab closed

            def do_POST(self):
                if self.path != "/events":
                    self._send(404, b"not found", "text/plain")
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    batch = json.loads(self.rfile.read(n) or b"[]")
                except json.JSONDecodeError:
                    self._send(400, b"bad json", "text/plain")
                    return
                if isinstance(batch, dict):
                    batch = [batch]
                accepted = 0
                for msg in batch:
                    event = decode_event(msg)
                    if event is None:
                        continue
                    accepted += 1
                    if isinstance(event, MouseMotion):
                        viewer.window.push_device_event(event)
                    else:
                        viewer.window.push_window_event(event)
                self._send(
                    200, json.dumps({"accepted": accepted}).encode(),
                    "application/json",
                )

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self._httpd.daemon_threads = True
        self.port = self._httpd.server_address[1]  # resolve port 0
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="zenith-viewer", daemon=True
        )
        self._thread.start()
        logger.info("viewer serving at %s", self.url)
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            # Wake any /stream handlers blocked on the frame condition so
            # their daemon threads exit promptly.
            with self._cond:
                self._cond.notify_all()
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
