"""Serving endpoint e2e: HTTP request in, JSON boxes out, with
concurrent requests micro-batched (yolo_tpu/serve.py)."""

import concurrent.futures as cf
import json
import urllib.request

import numpy as np
import pytest

from yolo_tpu.configs import get_variant
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.serve import DetectionServer


@pytest.fixture(scope="module")
def server():
    import dataclasses
    import jax.numpy as jnp

    cfg = dataclasses.replace(get_variant("tiny-voc"), input_size=96,
                              conf_threshold=0.1)
    params = graph.params_to_jax(graph.fold_params(
        cfg.layers, dw.random_params(cfg.layers, np.random.default_rng(0)),
        cfg.bn_eps))
    srv = DetectionServer(cfg, params, compute_dtype=jnp.float32, port=0)
    srv.start()
    yield srv
    srv.stop()


def _post_image(srv, seed=0, shape=(80, 100)):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/detect", data=buf.tobytes(),
        method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_healthz(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_detect_roundtrip(server):
    out = _post_image(server)
    assert "detections" in out
    for d in out["detections"]:
        assert set(d) == {"class", "score", "box_xyxy"}
        assert 0 <= d["score"] <= 1


def test_concurrent_requests_batched(server):
    with cf.ThreadPoolExecutor(8) as pool:
        results = list(pool.map(lambda s: _post_image(server, seed=s),
                                range(8)))
    assert len(results) == 8
    assert all("detections" in r for r in results)


def test_bad_payload(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/detect", data=b"not an image",
        method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_stats_endpoint(server):
    _post_image(server, seed=42)
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1
    assert stats["batches"] >= 1
    assert stats["max_batch_seen"] >= 1
