#!/usr/bin/env python
"""Inference server: persistent estimator with cached support contexts.

Production counterpart of the reference's per-request gradio demo
(gradio_utils/utils.py builds the model per request): one process keeps the
jitted estimator warm; support episodes are registered once and their
device-resident context (pooled keypoint tokens, learned adjacency, Markov
bias) is reused by every subsequent query — the serving analogue of the
eval-time support caching.

Stdlib-only HTTP (no framework dependency):

  POST /support   {"images": [<b64 png/jpg>, ...],          # S shots
                   "keypoints": [[x, y], ...],              # on shot 0
                   "skeleton": [[i, j], ...]}
                -> {"context_id": "..."}
  POST /predict   {"context_id": "...", "image": <b64>}
                -> {"keypoints": [[x, y, score], ...],
                    "edge_weights": [[i, j, w], ...]}
  GET  /healthz -> {"ok": true}

Keypoints are given in original support-image pixels; predictions return
original query-image pixels (square-pad geometry inverted server-side).
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class PoseService:
    """Model state + support-context registry (thread-safe)."""

    def __init__(self, checkpoint=None, backbone_ckpt=None, size=224,
                 max_kpt=100):
        import jax

        from edgecape_tpu.api import PoseEstimator
        from edgecape_tpu.config import Config, ModelConfig
        from edgecape_tpu.models.convert import load_backbone
        from edgecape_tpu.train import checkpoint as ck

        mcfg = ModelConfig(image_size=size, max_kpt=max_kpt,
                           learn_skeleton=True, attn_bias=True,
                           use_bias_attn_module=True)
        head_params = None
        if checkpoint:
            tree = ck.load_checkpoint(checkpoint)
            head_params = tree.get("params", tree)
        self.size = size
        self.max_kpt = max_kpt
        self.est = PoseEstimator(
            Config(model=mcfg),
            backbone_params=load_backbone(backbone_ckpt, size),
            head_params=head_params, rng=jax.random.PRNGKey(0))
        self.contexts: dict = {}
        self.lock = threading.Lock()

    @staticmethod
    def _decode_image(b64: str) -> np.ndarray:
        import cv2
        buf = np.frombuffer(base64.b64decode(b64), np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("could not decode image")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def _prep(self, img: np.ndarray):
        from demo import square_pad_resize

        from edgecape_tpu.ops.warp import IMAGENET_MEAN, IMAGENET_STD
        padded, scale = square_pad_resize(img, self.size)
        norm = (padded.astype(np.float32) / 255.0
                - IMAGENET_MEAN) / IMAGENET_STD
        return norm, scale

    def register_support(self, payload: dict) -> str:
        import jax.numpy as jnp

        kpts = np.asarray(payload["keypoints"], np.float32)
        skeleton = [[int(i), int(j)]
                    for i, j in payload.get("skeleton", [])]
        k_real = len(kpts)
        K = self.max_kpt
        imgs, joints, vis = [], [], []
        for b64 in payload["images"]:
            img, scale = self._prep(self._decode_image(b64))
            imgs.append(img)
            j = np.zeros((K, 2), np.float32)
            j[:k_real] = kpts * scale
            joints.append(j)
            v = np.zeros(K, np.float32)
            v[:k_real] = 1.0
            vis.append(v)
        adj = np.zeros((K, K), np.float32)
        for i, j in skeleton:
            if i < K and j < K:
                adj[i, j] = adj[j, i] = 1.0

        if getattr(self.est, "_cached_fns", None) is None:
            self.est._cached_fns = self.est._build_cached_fns()
        sup_fn, _, _ = self.est._cached_fns
        ctx = sup_fn(self.est.backbone_params, self.est.head_params,
                     jnp.asarray(np.stack(imgs)[None]),
                     jnp.asarray(np.stack(joints)[None]),
                     jnp.asarray(np.stack(vis)[None]),
                     jnp.asarray(adj[None]))
        cid = uuid.uuid4().hex[:12]
        with self.lock:
            self.contexts[cid] = (ctx, skeleton, k_real)
        return cid

    def predict(self, payload: dict) -> dict:
        import jax.numpy as jnp

        with self.lock:
            if payload["context_id"] not in self.contexts:
                raise KeyError("unknown context_id")
            ctx, skeleton, k_real = self.contexts[payload["context_id"]]
        raw = self._decode_image(payload["image"])
        img, scale = self._prep(raw)
        _, q_fn, _ = self.est._cached_fns
        pred, raw_adj = q_fn(self.est.backbone_params, self.est.head_params,
                             ctx, jnp.zeros((1,), jnp.int32),
                             jnp.asarray(img[None]))
        pts = np.asarray(pred)[0] * self.size / scale  # original pixels
        adj = np.asarray(raw_adj)[0]
        edges = [[int(i), int(j), float(adj[i, j])]
                 for i, j in skeleton]
        kp = [[float(x), float(y), 1.0] for x, y in pts[:k_real]]
        return {"keypoints": kp, "edge_weights": edges}


def make_handler(service: PoseService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True,
                                  "contexts": len(service.contexts)})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n))
                if self.path == "/support":
                    cid = service.register_support(payload)
                    self._reply(200, {"context_id": cid})
                elif self.path == "/predict":
                    self._reply(200, service.predict(payload))
                else:
                    self._reply(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001 — report to client
                self._reply(400, {"error": str(e)})

        def log_message(self, *args):
            pass

    return Handler


def main():
    p = argparse.ArgumentParser(description="EdgeCape-TPU inference server")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--backbone-ckpt", default=None)
    p.add_argument("--port", type=int, default=8300)
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args()
    service = PoseService(args.checkpoint, args.backbone_ckpt, args.size)
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(service))
    print(f"serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
