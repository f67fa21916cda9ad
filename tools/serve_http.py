#!/usr/bin/env python
"""Minimal HTTP inference server over an exported .actx artifact.

Stdlib-only (http.server): the serving side needs jax + numpy + this file —
no model code, config, or checkpoint (the artifact is self-contained, see
tools/export_model.py).

  python tools/serve_http.py --src model.actx --port 8080

  POST /predict   {"points": [[[x,y,z], ...], ...]}   # (B, N, 3)
      -> classifier:   {"logits": [...], "argmax": [...]}
         features:     {"features": [...]}
         dvae:         {"recon": [...]}        # (B, N, 3) reconstruction
         tokenize:     {"tokens": [...]}       # (B, G) int codebook ids
         segmentation: {"labels": [...]}       # (B, N) per-point classes
             (+"log_probs" with "return_log_probs": true; partseg artifacts
              additionally require "cls_label": (B,) ids or (B,16) one-hot)
  GET  /healthz   -> {"ok": true, ...sidecar meta}
"""
import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_handler(fn, meta, lock):
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, **meta})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                pts = np.asarray(req["points"], np.float32)
                if pts.ndim != 3 or pts.shape[-1] != 3:
                    raise ValueError(f"points must be (B, N, 3), "
                                     f"got {pts.shape}")
                kind = meta.get("kind", "classifier")
                extra = ()
                if kind == "segmentation" and \
                        len(meta.get("in_shapes", [])) > 1:
                    # partseg: the request must carry the object-category
                    # one-hot (or an int label per cloud)
                    n_cat = int(meta["in_shapes"][1][-1])
                    lab = np.asarray(req["cls_label"])
                    if lab.ndim == 1:  # int category ids -> one-hot
                        ids = lab.astype(np.int64)
                        if ((ids < 0) | (ids >= n_cat)).any():
                            # negatives would silently wrap via fancy indexing
                            raise ValueError(
                                f"cls_label ids must be in [0, {n_cat}), "
                                f"got {ids.min()}..{ids.max()}")
                        lab = np.eye(n_cat, dtype=np.float32)[ids]
                    if lab.shape != (pts.shape[0], n_cat):
                        raise ValueError(
                            f"cls_label must be (B,) ids or (B, {n_cat}) "
                            f"one-hot, got {lab.shape}")
                    extra = (lab.astype(np.float32),)
                with lock:  # one compiled program, serialized dispatch
                    out = np.asarray(fn(pts, *extra))
                if kind == "classifier":
                    resp = {"logits": out.tolist(),
                            "argmax": out.argmax(-1).tolist()}
                elif kind == "features":
                    resp = {"features": out.tolist()}
                elif kind == "tokenize":
                    resp = {"tokens": out.tolist()}
                elif kind == "segmentation":
                    # per-point labels by default; (B, N, C) log-probs are
                    # large, so only on request
                    resp = {"labels": out.argmax(-1).tolist()}
                    if req.get("return_log_probs"):
                        resp["log_probs"] = out.tolist()
                else:
                    resp = {"recon": out.tolist()}
                self._send(200, resp)
            except Exception as e:  # client errors become 400s, not crashes
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet default access log
            pass

    return Handler


def serve(src: str, host: str = "127.0.0.1", port: int = 8080):
    from act_tpu.engine.export import load_exported

    fn = load_exported(src)
    meta = {}
    if os.path.exists(src + ".json"):
        with open(src + ".json") as f:
            meta = json.load(f)
    server = ThreadingHTTPServer((host, port),
                                 make_handler(fn, meta, threading.Lock()))
    print(f"serving {src} ({meta.get('kind', 'classifier')}) "
          f"on http://{host}:{server.server_address[1]}")
    return server


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help=".actx artifact")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()
    serve(args.src, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
