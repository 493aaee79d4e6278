"""Minimal HTTP inference service — the Triton (TIS) role.

Reference: tis/ — Triton config (onnxruntime+TensorRT accelerator, 2 model
instances, tis/models/bisenetv1/config.pbtxt) with python gRPC raw-tensor
client (tis/client.py:31-88) and a C++ client. Here: a stdlib HTTP server
wrapping an exported StableHLO graph (mds_tpu.deploy.export), raw-tensor
protocol:

  POST /v2/models/<name>/infer
    body  = raw uint8 NHWC bytes (shape fixed by the exported graph)
    reply = raw int32 label-map bytes, shape in the X-Shape header
  GET /v2/health/ready → 200

A pool of `instances` worker threads serializes device access (the Triton
instance-group analog). cpp/tis_client.cpp is the native client.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class InferenceServer:
    def __init__(self, engine_path: str, name: str = "bisenetv2",
                 instances: int = 2):
        from jax import export as jexport

        with open(engine_path, "rb") as f:
            exported = jexport.deserialize(f.read())
        self.call = exported.call
        self.in_shape = tuple(exported.in_avals[0].shape)
        self.name = name
        self.sem = threading.Semaphore(instances)

    def infer(self, raw: bytes) -> np.ndarray:
        im = np.frombuffer(raw, np.uint8).reshape(self.in_shape)
        with self.sem:
            out = np.asarray(self.call(im))
        return out.astype(np.int32)

    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path.startswith("/v2/health"):
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"READY")
                elif self.path.startswith(f"/v2/models/{server_self.name}"):
                    meta = {
                        "name": server_self.name,
                        "inputs": [{"name": "input_image",
                                     "shape": list(server_self.in_shape),
                                     "datatype": "UINT8"}],
                        "outputs": [{"name": "preds", "datatype": "INT32"}],
                    }
                    body = json.dumps(meta).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                if not self.path.startswith(f"/v2/models/{server_self.name}/infer"):
                    self.send_response(404)
                    self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                try:
                    out = server_self.infer(raw)
                except Exception as e:  # bad shape etc.
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(str(e).encode())
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Shape", json.dumps(list(out.shape)))
                self.end_headers()
                self.wfile.write(out.tobytes())

        return Handler

    def serve(self, port: int = 8000):
        httpd = ThreadingHTTPServer(("0.0.0.0", port), self.make_handler())
        httpd.serve_forever()

    def serve_background(self, port: int = 8000):
        httpd = ThreadingHTTPServer(("127.0.0.1", port), self.make_handler())
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
