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


class TestAdaptiveWindow:
    """Collection-policy unit tests on a bare server object (no HTTP,
    no device calls — _collect is pure queue/thread logic)."""

    @pytest.fixture()
    def bare(self):
        import dataclasses

        cfg = dataclasses.replace(get_variant("tiny-voc"), input_size=96)
        params = graph.params_to_jax(graph.fold_params(
            cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)),
            cfg.bn_eps))
        # huge window so an accidental wait is unmistakable in timings
        return DetectionServer(cfg, params, port=0, max_batch=4,
                               batch_window_ms=2000.0)

    def test_solo_request_skips_window(self, bare):
        import time

        from yolo_tpu.serve import _Pending

        bare._q.put(_Pending(np.zeros((8, 8, 3), np.uint8)))
        t0 = time.perf_counter()
        batch = bare._collect()
        assert len(batch) == 1
        assert time.perf_counter() - t0 < 1.0  # nowhere near 2000 ms
        assert bare.stats["window_skips"] == 1

    def test_backlog_drained_greedily(self, bare):
        import time

        from yolo_tpu.serve import _Pending

        for _ in range(4):
            bare._q.put(_Pending(np.zeros((8, 8, 3), np.uint8)))
        t0 = time.perf_counter()
        batch = bare._collect()
        assert len(batch) == 4  # == max_batch, no timer involved
        assert time.perf_counter() - t0 < 1.0

    def test_window_engages_under_concurrency(self, bare):
        from yolo_tpu.serve import _Pending

        assert bare._window() == 0.0  # ewma starts at 1
        for _ in range(3):  # a few 4-deep batches raise the EWMA
            for _ in range(4):
                bare._q.put(_Pending(np.zeros((8, 8, 3), np.uint8)))
            bare._collect()
        assert bare._ewma_batch > 1.5
        assert bare._window() == bare.batch_window

    def test_adaptive_off_always_waits(self, bare):
        bare.adaptive_window = False
        assert bare._window() == bare.batch_window

    def test_ewma_tracks_batch_size(self, bare):
        from yolo_tpu.serve import _Pending

        bare._q.put(_Pending(np.zeros((8, 8, 3), np.uint8)))
        bare._collect()
        # ewma = 1 + 0.2*(1-1) = 1.0
        assert bare.stats["ewma_batch"] == 1.0
        for _ in range(2):
            bare._q.put(_Pending(np.zeros((8, 8, 3), np.uint8)))
        bare._collect()
        # 1 + 0.2*(2-1) = 1.2
        assert abs(bare.stats["ewma_batch"] - 1.2) < 1e-9


def test_dp_mesh_serving():
    """DP serving on the fake-8-device mesh: micro-batches pad to a
    devices-multiple bucket, shard over 'data', and answers match the
    unsharded server's for the same image."""
    import dataclasses
    import jax.numpy as jnp

    from yolo_tpu.parallel import sharding as shd

    cfg = dataclasses.replace(get_variant("tiny-voc"), input_size=96,
                              conf_threshold=0.1)
    params = graph.params_to_jax(graph.fold_params(
        cfg.layers, dw.random_params(cfg.layers, np.random.default_rng(0)),
        cfg.bn_eps))
    mesh = shd.make_mesh()
    assert mesh.devices.size == 8  # conftest fake devices

    dp = DetectionServer(cfg, params, compute_dtype=jnp.float32, port=0,
                         max_batch=4, mesh=mesh)
    assert dp._min_bucket == 8
    assert dp.max_batch == 8  # raised to the device count
    ref = DetectionServer(cfg, params, compute_dtype=jnp.float32, port=0)
    dp.start()
    ref.start()
    try:
        with cf.ThreadPoolExecutor(3) as pool:
            dp_out = list(pool.map(
                lambda s: _post_image(dp, seed=s), range(3)))
        ref_out = [_post_image(ref, seed=s) for s in range(3)]
        assert dp_out == ref_out
        assert dp.stats["errors"] == 0
    finally:
        dp.stop()
        ref.stop()


def test_serve_stretch_resize():
    """resize='stretch' server: boxes come back within the source frame
    under the AlexeyAB plain-resize geometry."""
    import dataclasses
    import jax.numpy as jnp

    cfg = dataclasses.replace(get_variant("tiny-voc"), input_size=96,
                              conf_threshold=0.1)
    params = graph.params_to_jax(graph.fold_params(
        cfg.layers, dw.random_params(cfg.layers, np.random.default_rng(1)),
        cfg.bn_eps))
    srv = DetectionServer(cfg, params, compute_dtype=jnp.float32, port=0,
                          resize="stretch")
    srv.start()
    try:
        out = _post_image(srv, seed=3, shape=(60, 110))
        assert "detections" in out
        for d in out["detections"]:
            x1, y1, x2, y2 = d["box_xyxy"]
            assert 0 <= x1 <= x2 <= 110 and 0 <= y1 <= y2 <= 60
    finally:
        srv.stop()


class TestClassifierServing:
    @pytest.fixture(scope="class")
    def cls_server(self):
        import jax.numpy as jnp

        from tests.test_classifier import MICRO_CLS

        params = graph.params_to_jax(graph.fold_params(
            MICRO_CLS.layers,
            dw.random_params(MICRO_CLS.layers,
                             np.random.default_rng(3)),
            MICRO_CLS.bn_eps))
        srv = DetectionServer(MICRO_CLS, params,
                              compute_dtype=jnp.float32, port=0)
        srv.start()
        yield srv
        srv.stop()

    def _post(self, srv, path, seed=0):
        import cv2

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{path}", data=buf.tobytes(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    def test_classify_roundtrip(self, cls_server):
        out = self._post(cls_server, "/classify")
        assert "classes" in out
        ranked = out["classes"]
        assert len(ranked) == 5
        probs = [r["prob"] for r in ranked]
        assert probs == sorted(probs, reverse=True)
        # top-5 of 6 classes: all but the smallest class's mass
        assert 0.5 < sum(probs) <= 1.0 + 1e-6
        for r in ranked:
            assert r["class"] in cls_server.cfg.class_names

    def test_detect_rejected_on_classifier(self, cls_server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(cls_server, "/detect")
        assert ei.value.code == 400

    def test_classify_rejected_on_detector(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(server, "/classify")
        assert ei.value.code == 400

    def test_dp_mesh_classify_matches_single_device(self, cls_server):
        """DP classifier serving over the fake 8-device mesh returns
        the same top-k as the single-device server."""
        import jax
        import jax.numpy as jnp

        from tests.test_classifier import MICRO_CLS
        from yolo_tpu.parallel import sharding as shd

        params = graph.params_to_jax(graph.fold_params(
            MICRO_CLS.layers,
            dw.random_params(MICRO_CLS.layers,
                             np.random.default_rng(3)),
            MICRO_CLS.bn_eps))
        mesh = shd.make_mesh(len(jax.devices()))
        dp = DetectionServer(MICRO_CLS, params,
                             compute_dtype=jnp.float32, port=0,
                             mesh=mesh)
        dp.start()
        try:
            got = self._post(dp, "/classify", seed=4)
            want = self._post(cls_server, "/classify", seed=4)
            assert got == want
        finally:
            dp.stop()

    def test_concurrent_classify_batched(self, cls_server):
        before = dict(cls_server.stats)
        with cf.ThreadPoolExecutor(8) as ex:
            outs = list(ex.map(
                lambda s: self._post(cls_server, "/classify", seed=s),
                range(8)))
        assert all("classes" in o for o in outs)
        made = cls_server.stats["batches"] - before["batches"]
        assert made < 8  # preprocessed shapes all match -> micro-batched


class TestNewFamiliesServe:
    def _post(self, srv, path="/detect", seed=1, shape=(60, 80)):
        import cv2

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{path}", data=buf.tobytes(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    def test_tree_model_serves_tree_names(self, tmp_path):
        """A YOLO9000 tree model serves /detect with the hierarchy
        traversal: detection class names come from the tree vocabulary."""
        import dataclasses
        import jax.numpy as jnp

        from tests.test_tree import _write_tree_model
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        cfg = dataclasses.replace(
            config_from_cfg(_write_tree_model(tmp_path)),
            conf_threshold=0.05)
        params = graph.params_to_jax(graph.fold_params(
            cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)),
            cfg.bn_eps))
        srv = DetectionServer(cfg, params, compute_dtype=jnp.float32,
                              port=0)
        srv.start()
        try:
            out = self._post(srv)
            vocab = set(cfg.tree.names)
            assert all(d["class"] in vocab for d in out["detections"])
        finally:
            srv.stop()

    def test_v1_model_serves(self, tmp_path):
        import dataclasses
        import jax.numpy as jnp

        from tests.test_yolov1 import _write_v1
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        cfg = dataclasses.replace(config_from_cfg(_write_v1(tmp_path)),
                                  conf_threshold=0.05)
        params = graph.params_to_jax(graph.fold_params(
            cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)),
            cfg.bn_eps))
        srv = DetectionServer(cfg, params, compute_dtype=jnp.float32,
                              port=0)
        srv.start()
        try:
            out = self._post(srv)
            assert all(d["class"] in ("class0", "class1", "class2")
                       for d in out["detections"])
        finally:
            srv.stop()

    def test_tree_map_mode_serves_projected_names(self, tmp_path):
        """DetectionServer(use_tree_map=True): /detect classes come
        from the map-projected vocabulary (code-review: the flags must
        actually reach the detector)."""
        import dataclasses
        import jax.numpy as jnp

        from tests.test_tree import _write_tree_model
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        cfg = dataclasses.replace(
            config_from_cfg(_write_tree_model(tmp_path)),
            conf_threshold=0.05)
        params = graph.params_to_jax(graph.fold_params(
            cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)),
            cfg.bn_eps))
        srv = DetectionServer(cfg, params, compute_dtype=jnp.float32,
                              port=0, use_tree_map=True)
        srv.start()
        try:
            out = self._post(srv)
            mapped = {"cat", "collie", "car", "truck"}
            assert out["detections"], "expected low-conf detections"
            assert all(d["class"] in mapped for d in out["detections"])
        finally:
            srv.stop()


def test_detect_native_decoder_grayscale_matches_cv2(tmp_path):
    """--decoder native serving of a GRAYSCALE net: gray-source PNG
    uploads decode natively (passthrough == cv2.IMREAD_GRAYSCALE),
    color PNGs decline to cv2's BT.601 conversion — responses identical
    to the pure-cv2 run either way (code-review finding: the handler
    used to skip the native decoder whenever in_channels == 1)."""
    import dataclasses

    import cv2
    import jax.numpy as jnp

    from yolo_tpu.configs.darknet_cfg import cfg_to_string, config_from_cfg
    from yolo_tpu.data import pipeline
    from yolo_tpu.native import preproc

    if not preproc.available():
        pytest.skip("native library unavailable")
    base = dataclasses.replace(get_variant("tiny-voc"), input_size=96)
    (tmp_path / "g.cfg").write_text(
        cfg_to_string(base).replace("channels=3", "channels=1"))
    cfg = dataclasses.replace(config_from_cfg(str(tmp_path / "g.cfg")),
                              conf_threshold=0.05)
    params = graph.params_to_jax(graph.fold_params(
        cfg.layers,
        dw.random_params(cfg.layers, np.random.default_rng(0),
                         input_channels=1),
        cfg.bn_eps))
    srv = DetectionServer(cfg, params, compute_dtype=jnp.float32, port=0)
    srv.start()
    try:
        rng = np.random.default_rng(21)
        payloads = []
        ok, buf = cv2.imencode(
            ".png", rng.integers(0, 256, (60, 90), dtype=np.uint8))
        assert ok
        payloads.append(buf.tobytes())          # gray-source: native
        ok, buf = cv2.imencode(
            ".png", rng.integers(0, 256, (60, 90, 3), dtype=np.uint8))
        assert ok
        payloads.append(buf.tobytes())          # color: declines to cv2

        def post_all():
            outs = []
            for data in payloads:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/detect", data=data,
                    method="POST")
                with urllib.request.urlopen(req, timeout=120) as resp:
                    outs.append(json.loads(resp.read()))
            return outs

        want = post_all()
        pipeline.set_decoder("native")
        try:
            got = post_all()
        finally:
            pipeline.set_decoder("cv2")
        assert got == want
        assert any(o["detections"] is not None for o in got)
    finally:
        srv.stop()


def test_detect_native_decoder_matches_cv2(server):
    """--decoder native serving path: the same upload decodes through
    native/decode.cpp (in-memory libpng) and yields identical
    detections to the cv2 run (PNG decode is exact)."""
    from yolo_tpu.data import pipeline
    from yolo_tpu.native import preproc

    if not preproc.available():
        pytest.skip("native library unavailable")
    want = _post_image(server, seed=11)
    pipeline.set_decoder("native")
    try:
        got = _post_image(server, seed=11)
    finally:
        pipeline.set_decoder("cv2")
    assert got == want
