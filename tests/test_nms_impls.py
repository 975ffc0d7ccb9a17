"""Cross-checks for the NMS backends and the fused detection head
(SURVEY.md §4.2.1): all implementations must agree with the exact
per-class XLA path (and hence the numpy oracle) at thresholds where the
candidate caps don't bind."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast inner-loop tier (CLAUDE.md)

import jax.numpy as jnp

from yolo_tpu.configs.variants import TINY_YOLOV2_VOC
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.models.predict import detect
from yolo_tpu.ops.nms import nms_batch


def _scene(seed, b=2, n=60, c=5, sparse=True):
    rng = np.random.default_rng(seed)
    boxes = np.stack([
        rng.uniform(0.1, 0.9, (b, n)), rng.uniform(0.1, 0.9, (b, n)),
        rng.uniform(0.05, 0.3, (b, n)), rng.uniform(0.05, 0.3, (b, n)),
    ], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n, c)).astype(np.float32)
    if sparse:
        scores = scores ** 3  # push most below threshold
    return jnp.asarray(boxes), jnp.asarray(scores)


@pytest.mark.parametrize("impl", ["fused_xla", "pallas", "fused"])
def test_impls_match_exact_xla(impl):
    boxes, scores = _scene(0)
    kw = dict(conf_threshold=0.4, iou_threshold=0.45,
              top_k=scores.shape[1], max_detections=64)
    want = nms_batch(boxes, scores, impl="xla", **kw)
    # pallas kernels run in interpreter mode on CPU
    if impl in ("pallas", "fused"):
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            got = nms_batch(boxes, scores, impl=impl, **kw)
    else:
        got = nms_batch(boxes, scores, impl=impl, **kw)
    _assert_dets_equal(want, got, atol=1e-6)


@pytest.mark.parametrize("kind", ["greedy", "diou"])
def test_row_chunked_suppression_bitwise_exact(monkeypatch, kind):
    """The row-chunked XLA suppression (the path that makes 9k-class
    tree eval fit in HBM — docs/PERF.md) must be BITWISE identical to
    the monolithic matrix: rows are independent, padding is sliced
    off. Forced here by shrinking the chunk budget so a 5-class scene
    chunks with a non-divisible tail."""
    from yolo_tpu.ops import nms as nms_mod

    boxes, scores = _scene(3, b=3, c=5)
    kw = dict(conf_threshold=0.25, iou_threshold=0.45,
              top_k=scores.shape[1], max_detections=64, impl="xla",
              kind=kind)
    want = nms_batch(boxes, scores, **kw)
    k = scores.shape[1]
    # rows-per-chunk = 7; G = 3*5 = 15 -> 3 chunks with pad 6
    monkeypatch.setattr(nms_mod, "_CHUNK_ELEMS", 7 * k * k)
    got = nms_batch(boxes, scores, **kw)
    _assert_dets_equal(want, got)


def test_chunked_suppression_property_sweep(monkeypatch):
    """Seeded sweep over random (batch, classes, candidates, budget)
    draws: the chunked exact path must stay bitwise identical to the
    monolithic matrix for EVERY partition geometry (divisible and
    ragged tails, cc floored to 1, budgets above/below G)."""
    from yolo_tpu.ops import nms as nms_mod

    rng = np.random.default_rng(42)
    for _ in range(12):
        b = int(rng.integers(1, 5))
        n = int(rng.integers(8, 40))
        c = int(rng.integers(2, 9))
        boxes, scores = _scene(int(rng.integers(1e6)), b=b, n=n, c=c)
        k = int(rng.integers(4, n + 1))
        kw = dict(conf_threshold=float(rng.uniform(0.1, 0.5)),
                  iou_threshold=float(rng.uniform(0.3, 0.6)),
                  top_k=k, max_detections=32, impl="xla")
        monkeypatch.setattr(nms_mod, "_CHUNK_ELEMS", 10**9)
        want = nms_batch(boxes, scores, **kw)
        budget = int(rng.integers(1, b * c + 2)) * k * k
        monkeypatch.setattr(nms_mod, "_CHUNK_ELEMS", budget)
        got = nms_batch(boxes, scores, **kw)
        _assert_dets_equal(want, got)


def test_class_chunked_suppression_pallas_backend(monkeypatch):
    """impl='pallas' must ride the class-chunked path too (the chunk
    body routes through _suppress, keeping the kernel usable per
    chunk) and stay identical to the exact XLA result — code-review
    finding: an early cut bypassed chunking for pallas entirely."""
    from jax.experimental.pallas import tpu as pltpu

    from yolo_tpu.ops import nms as nms_mod

    boxes, scores = _scene(5, b=3, c=5)
    kw = dict(conf_threshold=0.25, iou_threshold=0.45,
              top_k=scores.shape[1], max_detections=64)
    want = nms_batch(boxes, scores, impl="xla", **kw)
    k = scores.shape[1]
    monkeypatch.setattr(nms_mod, "_CHUNK_ELEMS", 7 * k * k)
    with pltpu.force_tpu_interpret_mode():
        got = nms_batch(boxes, scores, impl="pallas", **kw)
    _assert_dets_equal(want, got, atol=1e-6)


def test_row_chunked_suppression_single_row_chunks(monkeypatch):
    """Degenerate budget (rows=1): every suppression row is its own
    lax.map step — still bitwise identical."""
    from yolo_tpu.ops import nms as nms_mod

    boxes, scores = _scene(4, b=2, c=4)
    kw = dict(conf_threshold=0.3, iou_threshold=0.5,
              top_k=scores.shape[1], max_detections=32, impl="xla")
    want = nms_batch(boxes, scores, **kw)
    monkeypatch.setattr(nms_mod, "_CHUNK_ELEMS", 1)
    got = nms_batch(boxes, scores, **kw)
    _assert_dets_equal(want, got)


def _assert_dets_equal(want, got, rtol=0.0, atol=0.0):
    """Compare detection dicts; classes/boxes only on valid slots
    (invalid slots carry arbitrary payload)."""
    v = np.asarray(want["valid"])
    np.testing.assert_array_equal(v, np.asarray(got["valid"]))
    np.testing.assert_array_equal(np.asarray(want["scores"]),
                                  np.asarray(got["scores"]))
    np.testing.assert_array_equal(np.asarray(want["classes"])[v],
                                  np.asarray(got["classes"])[v])
    np.testing.assert_allclose(np.asarray(want["boxes"])[v],
                               np.asarray(got["boxes"])[v],
                               rtol=rtol, atol=atol)


def test_fused_head_matches_reference_path():
    cfg = dataclasses.replace(TINY_YOLOV2_VOC, input_size=160,
                              conf_threshold=0.4)
    rng = np.random.default_rng(3)
    params = graph.params_to_jax(dw.random_params(cfg.layers, rng, scale=0.05))
    x = jnp.asarray(rng.uniform(0, 1, (2, 160, 160, 3)).astype(np.float32))
    want = detect(cfg, params, x, head="reference", nms_impl="xla")
    got = detect(cfg, params, x, head="fused")  # use_pallas=False on CPU
    _assert_dets_equal(want, got, rtol=1e-5, atol=1e-6)


def test_fused_head_matches_reference_path_yolov3():
    """detect_head_yolo (objectness-prefiltered multi-head) is
    box/score-identical to decode_yolo + exact per-class NMS at
    production thresholds."""
    from tests.test_yolov3 import MICRO_V3

    cfg = dataclasses.replace(MICRO_V3, conf_threshold=0.4)
    rng = np.random.default_rng(5)
    params = graph.params_to_jax(dw.random_params(cfg.layers, rng,
                                                  scale=0.05))
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    want = detect(cfg, params, x, head="reference", nms_impl="xla")
    got = detect(cfg, params, x, head="fused")
    _assert_dets_equal(want, got, rtol=1e-5, atol=1e-6)


def test_detect_honors_cfg_nms_kind():
    """A ModelConfig carrying nms_kind=diou (e.g. parsed from an
    AlexeyAB cfg) flows through detect()'s reference path and can keep
    boxes that greedy IoU would suppress."""
    import dataclasses

    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph
    from yolo_tpu.models.predict import detect

    base = dataclasses.replace(TINY_YOLOV2_VOC, input_size=96)
    rng = np.random.default_rng(12)
    params = graph.params_to_jax(graph.fold_params(
        base.layers, dw.random_params(base.layers, rng, scale=0.05),
        base.bn_eps))
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)
                                   ).astype(np.float32))
    out_g = detect(base, params, imgs, conf_threshold=0.1,
                   head="reference", nms_impl="xla")
    diou_cfg = dataclasses.replace(base, nms_kind="diou", beta_nms=0.6)
    out_d = detect(diou_cfg, params, imgs, conf_threshold=0.1,
                   head="reference", nms_impl="xla")
    # DIoU's metric is <= IoU, so it never suppresses MORE
    assert (int(np.asarray(out_d["valid"]).sum())
            >= int(np.asarray(out_g["valid"]).sum()))
