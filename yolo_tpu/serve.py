"""Minimal production-style serving endpoint: HTTP in, boxes out.

POST /detect with JPEG/PNG bytes -> JSON detections (detection
models); POST /classify -> top-k labels (classifier models — darknet19/
darknet53; the preprocess runs host-side per request, so every queued
item shares the net shape and micro-batches perfectly). Requests are
micro-batched: a collector thread groups same-shape images arriving
within ``batch_window_ms`` (up to ``max_batch``) into one device call,
so concurrent clients ride the batched-throughput curve (docs/PERF.md)
instead of paying batch-1 latency each. GET /healthz for liveness.

The collection window adapts to load (``adaptive_window``): queued
backlog is always drained greedily without waiting, and the timed wait
engages only when the recent average batch size (EWMA) says traffic is
actually concurrent — a lone client keeps the raw batch-1 latency floor
(1.45 ms on v5e, docs/PERF.md) instead of paying the window on every
request. Under heavy load the queue backs up while the device runs, so
the greedy drain alone forms large batches and the window mostly
smooths the moderate-concurrency middle.

Stdlib-only (http.server + threads); the device work is the same jitted
detector as the CLI (models/predict.make_detector).
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple

import numpy as np


class _Pending:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None


class DetectionServer:
    def __init__(self, cfg, params, *, compute_dtype=None,
                 host: str = "127.0.0.1", port: int = 8000,
                 batch_window_ms: float = 5.0, max_batch: int = 32,
                 adaptive_window: bool = True,
                 conf_threshold: Optional[float] = None,
                 request_timeout: float = 120.0, mesh=None,
                 resize: str = "letterbox",
                 use_tree_map: bool = False,
                 hier_thresh: Optional[float] = None):
        """``mesh``: a 1-D jax Mesh to scale serving data-parallel —
        micro-batches are padded to a devices-multiple bucket and
        batch-sharded over the mesh (no collectives on the hot path,
        SURVEY.md §2.3); params are replicated once at startup."""
        import jax.numpy as jnp

        from yolo_tpu.models.predict import make_detector

        self.cfg = cfg
        self.host, self.port = host, port
        self.batch_window = batch_window_ms / 1000.0
        self.max_batch = max_batch
        self.adaptive_window = adaptive_window
        self._ewma_batch = 1.0  # recent average batch size
        self.request_timeout = request_timeout
        self.mesh = mesh
        self._min_bucket = 1
        self.is_classifier = cfg.head_kind == "softmax"
        if self.is_classifier:
            self._detector = None
            if mesh is None:
                from yolo_tpu.models.classify import make_classifier

                self.params = params
                self._classifier = make_classifier(
                    cfg, compute_dtype=compute_dtype or jnp.bfloat16)
            else:
                # DP classify: replicated params, batch-sharded
                # preprocessed images, no collectives (same shape as
                # DP detection serving)
                from yolo_tpu.parallel import sharding as shd

                self._min_bucket = int(mesh.devices.size)
                self.max_batch = max(self.max_batch, self._min_bucket)
                self.params = shd.replicate(mesh, params)
                self._classifier = shd.make_dp_classifier(
                    cfg, mesh, compute_dtype=compute_dtype or jnp.bfloat16)
        elif mesh is None:
            self.params = params
            self._detector = make_detector(
                cfg, compute_dtype=compute_dtype or jnp.bfloat16,
                conf_threshold=conf_threshold, resize=resize,
                use_tree_map=use_tree_map, hier_thresh=hier_thresh)
        else:
            from yolo_tpu.parallel import sharding as shd

            self._min_bucket = int(mesh.devices.size)
            self.max_batch = max(self.max_batch, self._min_bucket)
            self.params = shd.replicate(mesh, params)
            self._detector = shd.make_dp_detector(
                cfg, mesh, compute_dtype=compute_dtype or jnp.bfloat16,
                conf_threshold=(conf_threshold if conf_threshold is not None
                                else cfg.conf_threshold),
                resize=resize, use_tree_map=use_tree_map,
                hier_thresh=hier_thresh)
        # round max_batch UP to the power-of-two pad grid so every
        # bucket the worker's pad loop can produce is one prewarm
        # compiles — a max_batch off the grid (e.g. 24) let a 17-24
        # item batch pad to an un-prewarmed 32 and pay the ~30 s lazy
        # compile under load (code-review finding)
        size = self._min_bucket
        while size < self.max_batch:
            size *= 2
        self.max_batch = size
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._stop = threading.Event()
        # detection class indices map onto the projected vocabulary
        # under the tree-map mode (cfg.detection_names)
        self._det_names = cfg.detection_names(use_tree_map)
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "max_batch_seen": 0, "window_skips": 0,
                      "ewma_batch": 1.0}

    def prewarm(self, height: int, width: int) -> None:
        """Compile every power-of-two batch bucket for one source shape
        up front. On backends with slow first compiles (~30 s each here),
        lazy compilation under concurrent load queues requests behind
        sequential compiles and times them out."""
        import jax.numpy as jnp

        size = self._min_bucket
        while size <= self.max_batch:
            if self.is_classifier:
                net_h, net_w = self.cfg.input_hw
                imgs = jnp.zeros((size, net_h, net_w,
                                  self.cfg.in_channels), jnp.float32)
                out = self._classifier(self.params, imgs)
                np.asarray(out[0, 0])  # sync
            else:
                imgs = jnp.zeros((size, height, width,
                                  self.cfg.in_channels), jnp.uint8)
                out = self._detector(self.params, imgs)
                np.asarray(out["scores"][0, 0])  # sync
            size *= 2

    # -- batching ----------------------------------------------------------

    def _window(self) -> float:
        """Collection wait for the CURRENT batch. Adaptive policy: wait
        only when recent traffic was actually concurrent; a lone client
        must not pay the window on every request."""
        if not self.adaptive_window:
            return self.batch_window
        return self.batch_window if self._ewma_batch >= 1.5 else 0.0

    def _collect(self) -> List[_Pending]:
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        # greedy drain: queued backlog batches immediately, no timer
        while len(batch) < self.max_batch:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is None:
                self._q.put(None)
                return batch
            batch.append(item)

        window = self._window()
        if window > 0 and len(batch) < self.max_batch:
            # exact deadline via q.get timeouts — the previous
            # Timer+Event+quarter-window polling spawned a thread per
            # windowed batch and could overshoot by window/4
            # (code-review finding)
            import time as _time

            deadline_t = _time.monotonic() + window
            while len(batch) < self.max_batch:
                remaining = deadline_t - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._q.put(None)
                    break
                batch.append(item)
        elif window == 0:
            self.stats["window_skips"] += 1

        self._ewma_batch += 0.2 * (len(batch) - self._ewma_batch)
        self.stats["ewma_batch"] = round(self._ewma_batch, 3)
        return batch

    def _worker(self) -> None:
        import jax.numpy as jnp

        try:
            self._worker_loop(jnp)
        finally:
            # fail any requests still queued when the worker exits
            while True:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    item.error = "server shutting down"
                    item.event.set()

    def _worker_loop(self, jnp) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                return
            # one device call per source-shape bucket
            buckets: Dict[Tuple[int, int], List[_Pending]] = {}
            for item in batch:
                buckets.setdefault(item.image.shape[:2], []).append(item)
            for items in buckets.values():
                self.stats["batches"] += 1
                self.stats["requests"] += len(items)
                self.stats["max_batch_seen"] = max(
                    self.stats["max_batch_seen"], len(items))
                try:
                    # pad to the next power of two: bounds jit compiles to
                    # log2(max_batch)+1 per source shape (each distinct
                    # batch size is otherwise a fresh ~30s TPU compile).
                    # Under a mesh, buckets start at the device count so
                    # every shard is non-empty.
                    n = len(items)
                    size = self._min_bucket
                    while size < n:
                        size *= 2
                    arrays = [i.image for i in items]
                    arrays += [items[-1].image] * (size - n)
                    images = jnp.asarray(np.stack(arrays))
                    if self.is_classifier:
                        from yolo_tpu.models.classify import (
                            hierarchy_leaf_probs, top_k)

                        probs = np.asarray(
                            self._classifier(self.params, images))
                        if self.cfg.softmax_tree is not None:
                            # darknet9000 classifier: conditionals ->
                            # leaf-masked absolute probs for top-k
                            probs = hierarchy_leaf_probs(
                                probs, self.cfg.softmax_tree)
                        for bi, item in enumerate(items):
                            item.result = [
                                {"class": name, "prob": round(pr, 6)}
                                for name, pr in top_k(
                                    probs[bi], self.cfg.class_names)]
                        for item in items:
                            item.event.set()
                        continue
                    out = self._detector(self.params, images)
                    # ONE device->host fetch per output array — the
                    # relay pays a round trip per fetch, and per-
                    # detection element pulls made latency scale with
                    # detections x RTT (code-review finding; same fix
                    # as eval/runner.py)
                    valid_np = np.asarray(out["valid"])
                    classes_np = np.asarray(out["classes"])
                    scores_np = np.asarray(out["scores"])
                    boxes_np = np.asarray(out["boxes"])
                    for bi, item in enumerate(items):
                        item.result = [{
                            "class": self._det_names[
                                int(classes_np[bi][i])],
                            "score": round(float(scores_np[bi][i]), 4),
                            "box_xyxy": [round(float(v), 1) for v in
                                         boxes_np[bi][i]],
                        } for i in np.nonzero(valid_np[bi])[0]]
                except Exception as e:  # surface to the waiting request
                    self.stats["errors"] += len(items)
                    for item in items:
                        item.error = str(e)
                for item in items:
                    item.event.set()

    # -- http --------------------------------------------------------------

    def _handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok",
                                     "model": server.cfg.name})
                elif self.path == "/stats":
                    self._send(200, dict(server.stats))
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                want = "/classify" if server.is_classifier else "/detect"
                if self.path != want:
                    if self.path in ("/detect", "/classify"):
                        self._send(400, {"error": f"{server.cfg.name} "
                                         f"serves {want}"})
                    else:
                        self._send(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    self._send(400, {"error": "bad Content-Length"})
                    return
                data = self.rfile.read(length)
                rgb = None
                gray = server.cfg.in_channels == 1
                from yolo_tpu.data.pipeline import get_decoder

                if get_decoder() == "native":
                    # first-party C++ decode for uploads (--decoder
                    # native), at the model's channel count; parity
                    # declines (e.g. color PNGs at channels=1) and
                    # other formats fall through to cv2
                    from yolo_tpu.native.preproc import decode_image_bytes

                    rgb = decode_image_bytes(
                        data, channels=1 if gray else 3)
                if rgb is None:
                    import cv2

                    img = cv2.imdecode(
                        np.frombuffer(data, np.uint8),
                        cv2.IMREAD_GRAYSCALE if gray
                        else cv2.IMREAD_COLOR)
                    if img is None:
                        self._send(400, {"error": "cannot decode image"})
                        return
                    rgb = (img[..., None] if gray
                           else cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
                if server.is_classifier:
                    from yolo_tpu.models.classify import classifier_preprocess

                    rgb = classifier_preprocess(rgb,
                                                server.cfg.input_hw)
                pending = _Pending(rgb)
                server._q.put(pending)
                # bounded wait: a dead/stopped worker must yield 503,
                # not a forever-blocked handler thread
                if not pending.event.wait(timeout=server.request_timeout):
                    self._send(503, {"error": "detection timed out"})
                elif pending.error is not None:
                    self._send(500, {"error": pending.error})
                elif server.is_classifier:
                    self._send(200, {"classes": pending.result})
                else:
                    self._send(200, {"detections": pending.result})

        return Handler

    def start(self) -> None:
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._handler_class())
        self.port = self._httpd.server_address[1]  # resolve port 0
        self._worker_thread = threading.Thread(target=self._worker,
                                               daemon=True)
        self._worker_thread.start()
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._serve_thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._q.put(None)
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()

    def serve_forever(self) -> None:
        self.start()
        try:
            self._serve_thread.join()
        except KeyboardInterrupt:
            self.stop()
