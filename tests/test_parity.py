"""Golden parity tests (the judge gate, SURVEY.md §4.2.3): JAX stack vs the
independent TF oracle, seeded darknet weights, layer semantics end-to-end.
Plus letterbox parity vs the cv2 oracle."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_tpu.configs.variants import TINY_YOLOV2_VOC, YOLOV2_COCO
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.models.predict import detect
from yolo_tpu.ops import numpy_ref as npr
from yolo_tpu.ops.letterbox import letterbox, letterbox_geometry


def _small(cfg, size=160):
    return dataclasses.replace(cfg, input_size=size)


@pytest.mark.parametrize("variant", ["tiny", "full"])
def test_logits_parity_vs_tf_oracle(variant):
    from tests import tf_oracle

    cfg = _small(TINY_YOLOV2_VOC if variant == "tiny" else YOLOV2_COCO)
    rng = np.random.default_rng(42)
    params = dw.random_params(cfg.layers, rng)
    x = rng.uniform(0, 1, (2, cfg.input_size, cfg.input_size, 3)).astype(np.float32)

    want = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    got = np.asarray(graph.apply_layers(
        cfg.layers, graph.params_to_jax(params), jnp.asarray(x), eps=cfg.bn_eps))
    assert got.shape == want.shape
    # two independent fp32 graphs: tolerance relative to output magnitude
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())


def test_folded_bn_matches_unfolded():
    cfg = _small(TINY_YOLOV2_VOC, 128)
    rng = np.random.default_rng(1)
    params = dw.random_params(cfg.layers, rng)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    raw = np.asarray(graph.apply_layers(cfg.layers, graph.params_to_jax(params), x))
    folded = graph.fold_params(cfg.layers, params, eps=cfg.bn_eps)
    fast = np.asarray(graph.apply_layers(cfg.layers, graph.params_to_jax(folded), x))
    np.testing.assert_allclose(fast, raw, rtol=1e-3, atol=2e-4)


def test_end_to_end_boxes_parity():
    """frame -> boxes through the jitted pipeline vs the numpy oracle chain
    on TF-oracle logits (SURVEY.md §4.2.6)."""
    from tests import tf_oracle

    cfg = dataclasses.replace(_small(TINY_YOLOV2_VOC, 160),
                              conf_threshold=0.25)
    rng = np.random.default_rng(7)
    # bias the head so some boxes clear the threshold
    params = dw.random_params(cfg.layers, rng, scale=0.15)
    x = rng.uniform(0, 1, (1, 160, 160, 3)).astype(np.float32)

    tf_logits = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    wb, ws = npr.decode(tf_logits[0], cfg.anchors, cfg.num_classes)
    want = npr.nms_per_class(wb, ws, cfg.conf_threshold, cfg.nms_threshold)

    dets = detect(cfg, graph.params_to_jax(params), jnp.asarray(x),
                  top_k=wb.shape[0], max_detections=100)
    got = [(np.asarray(dets["boxes"][0][i]), float(dets["scores"][0][i]),
            int(dets["classes"][0][i]))
           for i in range(100) if bool(dets["valid"][0][i])]

    assert len(got) == len(want)
    got.sort(key=lambda r: (-r[1], r[2]))
    for (gb, gs, gc), (bb, bs, bc) in zip(got, want):
        assert gc == bc
        assert gs == pytest.approx(bs, abs=1e-4)
        np.testing.assert_allclose(gb, bb, rtol=1e-3, atol=1e-4)


class TestLetterbox:
    @pytest.mark.parametrize("shape", [(480, 640), (640, 480), (416, 416), (100, 300)])
    def test_matches_cv2_oracle(self, shape):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        want, scale, px, py = npr.letterbox(img, 416, 416)
        got = np.asarray(letterbox(jnp.asarray(img[None]), 416))[0]
        gscale, rh, rw, gpx, gpy = letterbox_geometry(*shape, 416)
        assert (gpx, gpy) == (px, py)
        assert gscale == pytest.approx(scale)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_upscale(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (100, 80, 3), dtype=np.uint8)
        want, *_ = npr.letterbox(img, 416, 416)
        got = np.asarray(letterbox(jnp.asarray(img[None]), 416))[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("shape", [(480, 640), (100, 300), (416, 416)])
    def test_stretch_matches_cv2_oracle(self, shape):
        """AlexeyAB-style plain resize (letter_box=0) vs cv2 oracle."""
        from yolo_tpu.ops.letterbox import stretch_resize

        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        want = npr.stretch_resize(img, 416, 416)
        got = np.asarray(stretch_resize(jnp.asarray(img[None]), 416))[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_stretch_equals_letterbox_on_square(self):
        """For square sources the two geometries coincide, so the full
        detect_raw pipelines must produce identical boxes."""
        from yolo_tpu.models.predict import detect_raw

        cfg = dataclasses.replace(_small(TINY_YOLOV2_VOC, 160),
                                  conf_threshold=0.25)
        rng = np.random.default_rng(9)
        params = graph.params_to_jax(
            dw.random_params(cfg.layers, rng, scale=0.15))
        img = rng.integers(0, 256, (1, 200, 200, 3), dtype=np.uint8)
        a = detect_raw(cfg, params, jnp.asarray(img))
        b = detect_raw(cfg, params, jnp.asarray(img), resize="stretch")
        np.testing.assert_array_equal(np.asarray(a["valid"]),
                                      np.asarray(b["valid"]))
        v = np.asarray(a["valid"])
        np.testing.assert_allclose(np.asarray(a["boxes"])[v],
                                   np.asarray(b["boxes"])[v],
                                   rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("variant", ["tiny", "full"])
def test_layer_by_layer_parity_vs_tf_oracle(variant):
    """Per-layer outputs match the TF oracle (SURVEY.md §4.2.3
    'layer-by-layer'), localizing any future numeric drift."""
    from tests import tf_oracle

    cfg = _small(TINY_YOLOV2_VOC if variant == "tiny" else YOLOV2_COCO, 128)
    rng = np.random.default_rng(21)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)

    want = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps,
                                return_all=True)
    got = graph.apply_layers(cfg.layers, graph.params_to_jax(params),
                             jnp.asarray(x), eps=cfg.bn_eps,
                             return_all=True)
    assert len(want) == len(got)
    for li, (w, g) in enumerate(zip(want, got)):
        g = np.asarray(g, np.float32)
        assert g.shape == w.shape, f"layer {li}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-4, atol=max(1e-5 * np.abs(w).max(), 1e-6),
            err_msg=f"layer {li} ({cfg.layers[li]})")


def test_voc_variant_shapes():
    """The yolov2-voc variant (125-channel head) runs and matches the
    TF oracle too (the third SPEC config)."""
    from tests import tf_oracle
    from yolo_tpu.configs.variants import YOLOV2_VOC

    cfg = _small(YOLOV2_VOC, 128)
    rng = np.random.default_rng(33)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    want = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    got = np.asarray(graph.apply_layers(
        cfg.layers, graph.params_to_jax(params), jnp.asarray(x),
        eps=cfg.bn_eps))
    assert got.shape == (1, 4, 4, 125)
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())


def test_tiny_coco_variant_shapes():
    """The yolov2-tiny (COCO, 425-channel head) variant runs and matches
    the TF oracle (darknet yolov2-tiny.cfg: tiny topology + COCO
    anchors/classes)."""
    from tests import tf_oracle
    from yolo_tpu.configs.variants import COCO_ANCHORS, TINY_YOLOV2_COCO

    cfg = _small(TINY_YOLOV2_COCO, 128)
    assert cfg.num_classes == 80 and cfg.anchors == COCO_ANCHORS
    rng = np.random.default_rng(34)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    want = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    got = np.asarray(graph.apply_layers(
        cfg.layers, graph.params_to_jax(params), jnp.asarray(x),
        eps=cfg.bn_eps))
    assert got.shape == (1, 4, 4, 425)
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())
