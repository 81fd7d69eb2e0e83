"""Minimal HTTP serving front-end over serve.Enhancer.

The reference has no serving story at all (SURVEY.md — inference means
re-running the eval script). `Enhancer` already encodes the TPU serving
rules (compile once, fixed shapes, weights resident); this module puts a
network protocol in front of it with zero extra dependencies:

  POST /enhance   body: JPEG/PNG bytes → enhanced PNG bytes
                  (?size=WxH to override the output size)
  GET  /healthz   {"status": "ok", "requests": N}
  GET  /stats     model/config + latency counters

Requests are decoded with the native C++ JPEG/PNG path when built
(data/native.py) and batched per-request through the warm jitted sampler.
The stdlib ThreadingHTTPServer is intentionally boring: the device work
is serialized through a lock (one sampler, one chip) and the host-side
decode/encode overlaps across request threads.

Usage:
    python -m hybrid_diffusion_tpu.serve_http --port 8787 \
        --pretrained_path .../ckpt_1000_Underwater_final_HICRDLoLI
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _encode_png(img: np.ndarray) -> bytes:
    """RGB uint8 HWC → PNG bytes (cv2, PIL fallback)."""
    try:
        import cv2

        ok, buf = cv2.imencode(".png", img[..., ::-1])
        if not ok:
            raise RuntimeError("png encode failed")
        return buf.tobytes()
    except ImportError:  # pragma: no cover
        from PIL import Image

        out = io.BytesIO()
        Image.fromarray(img).save(out, format="PNG")
        return out.getvalue()


def _decode_any(data: bytes) -> Optional[np.ndarray]:
    from .data.native import decode_image

    img = decode_image(data)  # native JPEG/PNG fast path
    if img is not None:
        return img
    try:
        import cv2

        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        return None if arr is None else arr[..., ::-1].copy()
    except ImportError:  # pragma: no cover
        try:
            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        except Exception:
            return None


class EnhancerServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr, enhancer):
        self.enhancer = enhancer
        self.device_lock = threading.Lock()  # one chip, one sampler
        self.stats_lock = threading.Lock()   # handler threads mutate stats
        self.stats = {"requests": 0, "errors": 0, "total_ms": 0.0}
        super().__init__(addr, _Handler)

    def bump(self, *, errors: int = 0, requests: int = 0,
             total_ms: float = 0.0) -> None:
        with self.stats_lock:
            self.stats["errors"] += errors
            self.stats["requests"] += requests
            self.stats["total_ms"] += total_ms

    def snapshot(self) -> dict:
        with self.stats_lock:
            return dict(self.stats)


class _Handler(BaseHTTPRequestHandler):
    server: EnhancerServer

    def log_message(self, *a):  # quiet; stats carry the signal
        pass

    def _reply(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj) -> None:
        self._reply(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):
        s = self.server.snapshot()
        if self.path.startswith("/healthz"):
            self._json(200, {"status": "ok", "requests": s["requests"]})
        elif self.path.startswith("/stats"):
            e = self.server.enhancer
            self._json(200, {
                **s,
                "mean_ms": round(s["total_ms"] / max(s["requests"], 1), 1),
                "model_size": e.size,
                "max_batch": e.max_batch,
            })
        else:
            self._json(404, {"error": "unknown path"})

    def _parse_size(self) -> Optional[tuple]:
        """?size=WxH → (W, H), None when absent; raises ValueError on junk."""
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query).get("size")
        if not q:
            return None
        w, _, h = q[0].lower().partition("x")
        size = (int(w), int(h))
        if size[0] <= 0 or size[1] <= 0:
            raise ValueError(q[0])
        return size

    def do_POST(self):
        if not self.path.startswith("/enhance"):
            self._json(404, {"error": "unknown path"})
            return
        try:
            size = self._parse_size()
        except ValueError:
            self.server.bump(errors=1)
            self._json(400, {"error": "bad size= parameter (want WxH)"})
            return
        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n)
        img = _decode_any(data)
        if img is None:
            self.server.bump(errors=1)
            self._json(400, {"error": "undecodable image"})
            return
        t0 = time.time()
        with self.server.device_lock:
            out = self.server.enhancer.enhance([img])[0]
        ms = (time.time() - t0) * 1000
        if size is not None and (out.shape[1], out.shape[0]) != size:
            # Output-size override: host-side resize of the enhanced image
            # (the model's compiled resolution stays fixed — serving rule).
            from .data.registry import resize_image_wh

            out = resize_image_wh(out, size[0], size[1])
        self.server.bump(requests=1, total_ms=ms)
        self._reply(200, _encode_png(out), "image/png")


def serve(enhancer, host: str = "127.0.0.1", port: int = 8787,
          block: bool = True) -> EnhancerServer:
    """Start serving; block=False returns the running server (tests)."""
    server = EnhancerServer((host, port), enhancer)
    if block:  # pragma: no cover - interactive path
        print(f"[serve_http] listening on http://{host}:{port}")
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def main(argv=None) -> int:  # pragma: no cover - thin CLI shim
    import argparse

    from .config import parse_config
    from .serve import Enhancer

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--max_batch", type=int, default=1)
    args, rest = p.parse_known_args(argv)
    cfg = parse_config(rest)
    serve(Enhancer(cfg, max_batch=args.max_batch),
          host=args.host, port=args.port)
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main())
