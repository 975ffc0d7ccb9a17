"""Darknet-style augmentation tests (data/augment.py)."""

import numpy as np

from yolo_tpu.data.augment import (AugmentConfig, augment, flip_horizontal,
                                   jitter_crop)


def _scene():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (100, 120, 3), dtype=np.uint8)
    boxes = np.array([[0.5, 0.5, 0.3, 0.4], [0.1, 0.1, 0.08, 0.08]],
                     np.float32)
    classes = np.array([1, 3], np.int32)
    return img, boxes, classes


def test_flip():
    img, boxes, _ = _scene()
    fimg, fboxes = flip_horizontal(img, boxes)
    np.testing.assert_array_equal(fimg, img[:, ::-1])
    assert fboxes[0, 0] == np.float32(0.5)
    assert fboxes[1, 0] == np.float32(1.0 - 0.1)
    np.testing.assert_array_equal(fboxes[:, 1:], boxes[:, 1:])


def test_jitter_boxes_stay_normalized():
    img, boxes, classes = _scene()
    for seed in range(20):
        rng = np.random.default_rng(seed)
        cimg, cboxes, ccls = jitter_crop(img, boxes, classes, rng,
                                         AugmentConfig())
        assert len(cboxes) == len(ccls)
        if len(cboxes):
            assert (cboxes[:, 2:] > 0).all()
            x1 = cboxes[:, 0] - cboxes[:, 2] / 2
            x2 = cboxes[:, 0] + cboxes[:, 2] / 2
            assert (x1 >= -1e-6).all() and (x2 <= 1 + 1e-6).all()


def test_full_augment_deterministic_and_valid():
    img, boxes, classes = _scene()
    a1 = augment(img, boxes, classes, np.random.default_rng(7))
    a2 = augment(img, boxes, classes, np.random.default_rng(7))
    np.testing.assert_array_equal(a1[0], a2[0])
    np.testing.assert_array_equal(a1[1], a2[1])
    assert a1[0].dtype == np.uint8


def test_crop_drops_mostly_hidden_boxes():
    img = np.zeros((100, 100, 3), np.uint8)
    # box hugging the left edge; crop that removes most of it
    boxes = np.array([[0.05, 0.5, 0.1, 0.2]], np.float32)
    classes = np.array([0], np.int32)
    cfg = AugmentConfig(min_box_visibility=0.5)
    found_drop = False
    for seed in range(40):
        _, cboxes, _ = jitter_crop(img, boxes, classes,
                                   np.random.default_rng(seed), cfg)
        if len(cboxes) == 0:
            found_drop = True
            break
    assert found_drop
