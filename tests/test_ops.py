"""Kernel unit tests vs the numpy oracles (SURVEY.md §4.2.1)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast inner-loop tier (CLAUDE.md)

import jax.numpy as jnp

from yolo_tpu.ops import numpy_ref as npr
from yolo_tpu.ops.decode import decode
from yolo_tpu.ops.nms import nms, pairwise_iou_xywh
from yolo_tpu.ops.pool import maxpool_nhwc
from yolo_tpu.ops.reorg import reorg_nchw, reorg_nhwc


class TestReorg:
    def test_matches_darknet_oracle_yolov2_shape(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 64, 26, 26)).astype(np.float32)
        got = np.asarray(reorg_nchw(jnp.asarray(x), 2))
        want = npr.reorg_nchw(x, 2)
        assert got.shape == (2, 256, 13, 13)
        np.testing.assert_array_equal(got, want)

    def test_matches_oracle_other_shapes(self):
        rng = np.random.default_rng(1)
        for (c, h, w, s) in [(8, 4, 4, 2), (18, 6, 6, 3), (4, 8, 6, 2)]:
            x = rng.normal(size=(1, c, h, w)).astype(np.float32)
            got = np.asarray(reorg_nchw(jnp.asarray(x), s))
            np.testing.assert_array_equal(got, npr.reorg_nchw(x, s))

    def test_nhwc_wrapper(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 26, 26, 64)).astype(np.float32)
        got = np.asarray(reorg_nhwc(jnp.asarray(x), 2))
        np.testing.assert_array_equal(got, npr.reorg_nhwc(x, 2))

    def test_is_not_space_to_depth(self):
        # The parity trap (SURVEY.md §7.2): darknet reorg != space_to_depth.
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 26, 26, 64)).astype(np.float32)
        got = np.asarray(reorg_nhwc(jnp.asarray(x), 2))
        # space_to_depth in NHWC
        s2d = x.reshape(1, 13, 2, 13, 2, 64).transpose(0, 1, 3, 2, 4, 5)
        s2d = s2d.reshape(1, 13, 13, 256)
        assert not np.array_equal(got, s2d)


class TestMaxPool:
    @pytest.mark.parametrize("size,stride,hw", [(2, 2, 8), (2, 1, 13), (2, 1, 5)])
    def test_matches_oracle(self, size, stride, hw):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, hw, hw, 6)).astype(np.float32)
        got = np.asarray(maxpool_nhwc(jnp.asarray(x), size, stride))
        want = npr.maxpool_nhwc(x, size, stride)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_stride1_corner_pixels(self):
        # bottom-right corner must see only real values, not padding
        x = np.full((1, 3, 3, 1), -5.0, dtype=np.float32)
        got = np.asarray(maxpool_nhwc(jnp.asarray(x), 2, 1))
        assert got.shape == (1, 3, 3, 1)
        np.testing.assert_array_equal(got, np.full((1, 3, 3, 1), -5.0))


class TestDecode:
    def test_matches_oracle(self):
        rng = np.random.default_rng(5)
        anchors = ((1.08, 1.19), (3.42, 4.41), (6.63, 11.38))
        c = 7
        logits = rng.normal(size=(2, 5, 5, 3 * (5 + c))).astype(np.float32) * 2
        boxes, scores = decode(jnp.asarray(logits), anchors, c)
        for b in range(2):
            wb, ws = npr.decode(logits[b], anchors, c)
            np.testing.assert_allclose(np.asarray(boxes[b]), wb, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(scores[b]), ws, rtol=0, atol=1e-6)


class TestIoU:
    def test_pairwise_matches_oracle(self):
        rng = np.random.default_rng(6)
        boxes = np.abs(rng.normal(size=(20, 4))).astype(np.float32)
        got = np.asarray(pairwise_iou_xywh(jnp.asarray(boxes)))
        for i in range(20):
            for j in range(20):
                assert got[i, j] == pytest.approx(
                    npr.iou_xywh(boxes[i], boxes[j]), abs=1e-5)

    def test_zero_area(self):
        boxes = np.array([[0.5, 0.5, 0.0, 0.0], [0.5, 0.5, 1.0, 1.0]],
                         dtype=np.float32)
        got = np.asarray(pairwise_iou_xywh(jnp.asarray(boxes)))
        assert got[0, 0] == 0.0 and got[0, 1] == 0.0


def _run_both(boxes, scores, conf_t, iou_t):
    want = npr.nms_per_class(boxes, scores, conf_t, iou_t)
    got = nms(jnp.asarray(boxes), jnp.asarray(scores),
              conf_threshold=conf_t, iou_threshold=iou_t,
              top_k=boxes.shape[0], max_detections=boxes.shape[0] * scores.shape[1])
    kept = [(tuple(np.asarray(got["boxes"][i]).round(5)),
             round(float(got["scores"][i]), 5), int(got["classes"][i]))
            for i in range(len(got["valid"])) if got["valid"][i]]
    want_set = [(tuple(np.asarray(b).round(5)), round(s, 5), c) for b, s, c in want]
    assert sorted(kept) == sorted(want_set)


class TestNMS:
    def test_random_boxes(self):
        rng = np.random.default_rng(7)
        for seed in range(5):
            rng = np.random.default_rng(seed)
            n, c = 40, 3
            boxes = np.stack([
                rng.uniform(0.1, 0.9, n), rng.uniform(0.1, 0.9, n),
                rng.uniform(0.05, 0.4, n), rng.uniform(0.05, 0.4, n),
            ], axis=-1).astype(np.float32)
            scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
            _run_both(boxes, scores, 0.3, 0.45)

    def test_containment_and_ties(self):
        boxes = np.array([
            [0.5, 0.5, 0.4, 0.4],
            [0.5, 0.5, 0.2, 0.2],   # contained, IoU=0.25 < 0.45 -> kept
            [0.5, 0.5, 0.4, 0.4],   # duplicate of 0 -> suppressed
            [0.9, 0.9, 0.1, 0.1],   # far away -> kept
        ], dtype=np.float32)
        scores = np.array([[0.9], [0.8], [0.9], [0.7]], dtype=np.float32)
        _run_both(boxes, scores, 0.5, 0.45)

    def test_zero_area_boxes(self):
        boxes = np.array([[0.5, 0.5, 0.0, 0.0], [0.5, 0.5, 0.3, 0.3]],
                         dtype=np.float32)
        scores = np.array([[0.9, 0.1], [0.8, 0.6]], dtype=np.float32)
        _run_both(boxes, scores, 0.5, 0.45)

    def test_below_threshold_does_not_suppress(self):
        # box 0 high-overlap but below conf threshold: must not kill box 1
        boxes = np.array([[0.5, 0.5, 0.4, 0.4], [0.5, 0.5, 0.4, 0.4]],
                         dtype=np.float32)
        scores = np.array([[0.2], [0.9]], dtype=np.float32)
        _run_both(boxes, scores, 0.5, 0.45)


class TestRouteResolution:
    def test_absolute_and_relative(self):
        from yolo_tpu.configs.specs import resolve_route

        assert resolve_route(10, -3) == 7   # darknet relative
        assert resolve_route(10, 4) == 4    # darknet absolute


class TestDiouNMS:
    """AlexeyAB nms_kind=diounms (box.c box_diounms): suppression on
    IoU - (d/c)^beta_nms instead of plain IoU."""

    def _run_both_diou(self, boxes, scores, conf_t, iou_t, beta=0.6):
        want = npr.nms_per_class(boxes, scores, conf_t, iou_t,
                                 kind="diou", beta=beta)
        got = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  conf_threshold=conf_t, iou_threshold=iou_t,
                  top_k=boxes.shape[0],
                  max_detections=boxes.shape[0] * scores.shape[1],
                  kind="diou", beta=beta)
        kept = [(tuple(np.asarray(got["boxes"][i]).round(5)),
                 round(float(got["scores"][i]), 5), int(got["classes"][i]))
                for i in range(len(got["valid"])) if got["valid"][i]]
        want_set = [(tuple(np.asarray(b).round(5)), round(s, 5), c)
                    for b, s, c in want]
        assert sorted(kept) == sorted(want_set)

    def test_random_boxes_match_oracle(self):
        for seed in range(5):
            rng = np.random.default_rng(seed)
            n, c = 40, 3
            boxes = np.stack([
                rng.uniform(0.1, 0.9, n), rng.uniform(0.1, 0.9, n),
                rng.uniform(0.05, 0.4, n), rng.uniform(0.05, 0.4, n),
            ], axis=-1).astype(np.float32)
            scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
            self._run_both_diou(boxes, scores, 0.3, 0.45)

    def test_offset_centers_survive_diou_but_not_greedy(self):
        """Two overlapping boxes whose centers are apart: greedy IoU
        (0.47 > 0.45) suppresses the second; the DIoU term (d/c)^0.6
        drops the metric below threshold, so diounms keeps both — the
        feature's whole point (crowded-scene recall)."""
        boxes = np.array([[0.45, 0.5, 0.4, 0.4],
                          [0.57, 0.5, 0.4, 0.4]], dtype=np.float32)
        scores = np.array([[0.9], [0.8]], dtype=np.float32)
        from yolo_tpu.ops.numpy_ref import diou_nms_metric, iou_xywh

        assert iou_xywh(boxes[0], boxes[1]) > 0.45
        assert diou_nms_metric(boxes[0], boxes[1], 0.6) < 0.45
        greedy = nms(jnp.asarray(boxes), jnp.asarray(scores),
                     conf_threshold=0.5, iou_threshold=0.45, top_k=2)
        diou = nms(jnp.asarray(boxes), jnp.asarray(scores),
                   conf_threshold=0.5, iou_threshold=0.45, top_k=2,
                   kind="diou")
        assert int(np.asarray(greedy["valid"]).sum()) == 1
        assert int(np.asarray(diou["valid"]).sum()) == 2

    def test_unknown_kind_rejected(self):
        import pytest

        boxes = np.zeros((2, 4), np.float32)
        scores = np.ones((2, 1), np.float32)
        with pytest.raises(ValueError, match="unknown NMS kind"):
            nms(jnp.asarray(boxes), jnp.asarray(scores),
                conf_threshold=0.5, iou_threshold=0.45, kind="soft")
