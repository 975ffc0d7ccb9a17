"""Darknet-style augmentation tests (data/augment.py)."""

import numpy as np
import pytest

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


class TestMosaic:
    def _samples(self):
        """4 solid-color images, each with one centered box."""
        samples = []
        for k, color in enumerate([(255, 0, 0), (0, 255, 0),
                                   (0, 0, 255), (255, 255, 0)]):
            img = np.full((50, 60, 3), color, np.uint8)
            samples.append((img, np.array([[0.5, 0.5, 0.4, 0.4]]),
                            np.array([k])))
        return samples

    def test_quadrants_come_from_sources(self):
        from yolo_tpu.data.augment import AugmentConfig, mosaic4

        rng = np.random.default_rng(0)
        canvas, boxes, classes = mosaic4(self._samples(), 64, rng,
                                         AugmentConfig())
        assert canvas.shape == (64, 64, 3) and canvas.dtype == np.uint8
        # corners carry each source's solid color (stretch preserves it)
        assert tuple(canvas[0, 0]) == (255, 0, 0)
        assert tuple(canvas[0, 63]) == (0, 255, 0)
        assert tuple(canvas[63, 0]) == (0, 0, 255)
        assert tuple(canvas[63, 63]) == (255, 255, 0)

    def test_quadrant_sampling_matches_full_stretch(self):
        """The per-quadrant warpAffine must reproduce whole-image
        cv2.resize + crop (same half-pixel-center mapping), so box
        coordinates and pixels stay aligned for any source size."""
        import cv2

        from yolo_tpu.data.augment import AugmentConfig, mosaic4

        rng = np.random.default_rng(9)
        # deliberately small, non-divisible source sizes
        samples = [(rng.integers(0, 255, (37, 53, 3), dtype=np.uint8),
                    np.zeros((0, 4)), np.zeros((0,), np.int64))
                   for _ in range(4)]
        n = 96
        canvas, _, _ = mosaic4(samples, n, np.random.default_rng(3),
                               AugmentConfig())
        rng2 = np.random.default_rng(3)
        cx = int(n * rng2.uniform(0.25, 0.75))
        cy = int(n * rng2.uniform(0.25, 0.75))
        regions = ((0, 0, cx, cy), (cx, 0, n, cy),
                   (0, cy, cx, n), (cx, cy, n, n))
        for (img, _, _), (x1, y1, x2, y2) in zip(samples, regions):
            want = cv2.resize(img, (n, n),
                              interpolation=cv2.INTER_LINEAR)[y1:y2, x1:x2]
            got = canvas[y1:y2, x1:x2]
            # warpAffine and resize use the same mapping; fixed-point
            # interpolation may differ by 1 LSB
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_boxes_clipped_to_quadrants(self):
        from yolo_tpu.data.augment import AugmentConfig, mosaic4

        rng = np.random.default_rng(1)
        canvas, boxes, classes = mosaic4(self._samples(), 64, rng,
                                         AugmentConfig(
                                             min_box_visibility=0.0))
        assert len(boxes) == len(classes) <= 4
        # cut point for this seed
        rng2 = np.random.default_rng(1)
        cx = int(64 * rng2.uniform(0.25, 0.75))
        cy = int(64 * rng2.uniform(0.25, 0.75))
        for (bx, by, bw, bh), cls in zip(boxes, classes):
            x1, y1 = (bx - bw / 2) * 64, (by - bh / 2) * 64
            x2, y2 = (bx + bw / 2) * 64, (by + bh / 2) * 64
            qx1, qy1, qx2, qy2 = [(0, 0, cx, cy), (cx, 0, 64, cy),
                                  (0, cy, cx, 64),
                                  (cx, cy, 64, 64)][int(cls)]
            assert qx1 - 1e-6 <= x1 <= x2 <= qx2 + 1e-6
            assert qy1 - 1e-6 <= y1 <= y2 <= qy2 + 1e-6

    def test_low_visibility_boxes_dropped(self):
        from yolo_tpu.data.augment import AugmentConfig, mosaic4

        # tiny box in a far corner of each source: after the aligned
        # quadrant crop, boxes outside their quadrant vanish
        samples = []
        for k in range(4):
            img = np.full((50, 60, 3), 128, np.uint8)
            # all sources put the box at the bottom-right corner
            samples.append((img, np.array([[0.95, 0.95, 0.08, 0.08]]),
                            np.array([k])))
        rng = np.random.default_rng(2)
        canvas, boxes, classes = mosaic4(samples, 64, rng,
                                         AugmentConfig())
        # only quadrant 3 (bottom-right) can retain its corner box
        assert set(classes.tolist()) <= {3}

    def test_train_batches_mosaic(self, tmp_path):
        from tests.test_data_eval import make_voc_root
        from yolo_tpu.data import pipeline as pipe
        from yolo_tpu.data.augment import AugmentConfig
        from yolo_tpu.data.voc import list_split

        root = make_voc_root(tmp_path, n_images=6)
        pairs = list_split(root, "train")
        batches = list(pipe.train_batches(
            pairs, class_names=("cat", "dog"), anchors=((1, 1), (3, 3)),
            num_classes=2, net_size=64, batch_size=2,
            rng=np.random.default_rng(0),
            augment_cfg=AugmentConfig(mosaic=True)))
        assert len(batches) == 3
        for b in batches:
            assert b["images"].shape == (2, 64, 64, 3)
            assert b["images"].dtype == np.float32
            assert 0.0 <= b["images"].min() and b["images"].max() <= 1.0
        # mosaics generally contain multiple GTs per image
        total_obj = sum(b["obj_mask"].sum() for b in batches)
        assert total_obj >= 6


class TestMixup:
    def test_train_batches_mixup_blends_and_unions(self, tmp_path):
        """AlexeyAB mixup=1: every training image is a 0.5/0.5 blend of
        two geometry-processed samples with truths concatenated —
        verified by rebuilding the blend from an unaugmented run over
        the same (seeded) index picks."""
        from tests.test_data_eval import make_voc_root
        from yolo_tpu.data import pipeline as pipe
        from yolo_tpu.data.augment import AugmentConfig
        from yolo_tpu.data.voc import list_split

        root = make_voc_root(tmp_path, n_images=6)
        pairs = list_split(root, "train")
        # flip/jitter/HSV off so the only transform is the blend itself
        aug = AugmentConfig(mixup=True, flip=False, jitter=0.0, hue=0.0,
                            saturation=1.0, exposure=1.0)
        batches = list(pipe.train_batches(
            pairs, class_names=("cat", "dog"), anchors=((1, 1), (3, 3)),
            num_classes=2, net_size=64, batch_size=2,
            rng=np.random.default_rng(0), augment_cfg=aug))
        plain = list(pipe.train_batches(
            pairs, class_names=("cat", "dog"), anchors=((1, 1), (3, 3)),
            num_classes=2, net_size=64, batch_size=2,
            rng=np.random.default_rng(0), augment_cfg=None))
        assert len(batches) == len(plain) == 3
        # a blend's pixel histogram can't exceed either source's max;
        # structurally: every mixed image must differ from the plain
        # one (a second image was blended in) yet stay in [0, 1]
        diff = 0.0
        for b, p in zip(batches, plain):
            assert b["images"].shape == p["images"].shape
            assert 0.0 <= b["images"].min() and b["images"].max() <= 1.0
            diff += float(np.abs(b["images"] - p["images"]).mean())
        assert diff > 1e-3
        # unions: mixup batches carry at least as many assigned anchors
        assert (sum(b["obj_mask"].sum() for b in batches)
                >= sum(p["obj_mask"].sum() for p in plain))

    def test_exact_blend_of_two_known_images(self, tmp_path):
        """Pin the 0.5 blend arithmetic with two solid-color images."""
        import cv2

        from yolo_tpu.data import pipeline as pipe

        root = tmp_path / "VOC"
        (root / "JPEGImages").mkdir(parents=True)
        (root / "Annotations").mkdir()
        (root / "ImageSets" / "Main").mkdir(parents=True)
        names = []
        for i, val in enumerate((40, 200)):
            img = np.full((64, 64, 3), val, np.uint8)
            cv2.imwrite(str(root / "JPEGImages" / f"i{i}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 100])
            (root / "Annotations" / f"i{i}.xml").write_text(
                "<annotation><size><width>64</width><height>64</height>"
                "</size><object><name>cat</name><bndbox>"
                "<xmin>10</xmin><ymin>10</ymin><xmax>30</xmax>"
                "<ymax>30</ymax></bndbox></object></annotation>")
            names.append(f"i{i}")
        (root / "ImageSets" / "Main" / "train.txt").write_text(
            "\n".join(names))
        from yolo_tpu.data.augment import AugmentConfig
        from yolo_tpu.data.voc import list_split

        pairs = list_split(str(root), "train")
        aug = AugmentConfig(mixup=True, flip=False, jitter=0.0, hue=0.0,
                            saturation=1.0, exposure=1.0)
        # batch of 2 over a 2-image dataset: each output blends two of
        # the solid images -> every pixel is one of the 3 possible
        # 0.5-blends of {40, 200} (jpeg quality 100 is near-lossless)
        (batch,) = list(pipe.train_batches(
            pairs, class_names=("cat",), anchors=((1, 1),),
            num_classes=1, net_size=64, batch_size=2, shuffle=False,
            rng=np.random.default_rng(1), augment_cfg=aug))
        allowed = np.array([40 / 255, 120 / 255, 200 / 255])
        px = batch["images"].reshape(-1, 3).mean(axis=-1)
        dist = np.abs(px[:, None] - allowed[None, :]).min(axis=1)
        assert dist.max() < 0.03  # jpeg tolerance

    def test_mixup_cfg_key_flows(self):
        from yolo_tpu.data.augment import config_from_net_params

        assert config_from_net_params({"mixup": 1}).mixup is True
        assert config_from_net_params({}).mixup is False
        assert config_from_net_params({}, mixup=True).mixup is True


class TestCfgDrivenAugment:
    def test_net_training_params_returns_augment_keys(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import net_training_params

        p = tmp_path / "a.cfg"
        p.write_text(
            "[net]\nwidth=64\nsaturation = 1.5\nexposure = 1.2\n"
            "hue=.05\nmosaic=1\nflip=0\n"
            "[convolutional]\nfilters=10\nsize=1\nactivation=linear\n"
            "[region]\nanchors=1,1,2,2\nclasses=0\nnum=2\njitter=.2\n")
        hp = net_training_params(str(p))
        assert hp["saturation"] == 1.5 and hp["exposure"] == 1.2
        assert hp["hue"] == 0.05 and hp["mosaic"] == 1 and hp["flip"] == 0
        assert hp["jitter"] == 0.2

    def test_config_from_net_params(self):
        from yolo_tpu.data.augment import (AugmentConfig,
                                           config_from_net_params)

        cfg = config_from_net_params(
            {"jitter": 0.2, "saturation": 1.5, "exposure": 1.2,
             "hue": 0.05, "flip": 0, "mosaic": 1})
        assert cfg.jitter == 0.2 and cfg.saturation == 1.5
        assert cfg.exposure == 1.2 and cfg.hue == 0.05
        assert cfg.flip is False and cfg.mosaic is True
        # empty cfg fills with darknet PARSE defaults (no HSV
        # distortion); force_defaults keeps the classic values
        d = config_from_net_params({})
        assert d.saturation == 1.0 and d.hue == 0.0
        assert config_from_net_params(
            {}, force_defaults=True) == AugmentConfig()
        assert config_from_net_params({}, mosaic=True).mosaic is True


@pytest.mark.quick
def test_cfg_driven_fill_uses_darknet_parse_defaults():
    """A cfg that sets ONLY flip=0 must not gain HSV distortion: absent
    keys fill with darknet's parse defaults (sat/exp 1, hue 0), while
    force_defaults=True (bare --augment) keeps the classic values
    (code-review regression)."""
    from yolo_tpu.data.augment import config_from_net_params

    cfg = config_from_net_params({"flip": 0})
    assert cfg.flip is False
    assert cfg.saturation == 1.0 and cfg.exposure == 1.0
    assert cfg.hue == 0.0 and cfg.jitter == 0.2

    forced = config_from_net_params({}, force_defaults=True)
    assert forced.saturation == 1.5 and forced.exposure == 1.5
    assert forced.hue == 0.1 and forced.flip is True


class TestClassifierGeometry:
    """darknet data.c random_augment_image (classifier [net]
    angle/aspect/min_crop/max_crop): rotate_scale_crop implements
    rotate_crop_image's inverse map; linear-gradient images make
    bilinear sampling analytically exact away from the clamped
    borders."""

    def _gradient(self, w=32, h=32):
        img = np.zeros((h, w, 3), np.uint8)
        img[..., 0] = np.arange(w, dtype=np.uint8)[None, :] * 4
        img[..., 1] = np.arange(h, dtype=np.uint8)[:, None] * 4
        return img

    @pytest.mark.quick
    def test_identity(self):
        from yolo_tpu.data.augment import rotate_scale_crop

        img = self._gradient()
        out = rotate_scale_crop(img, 32, rad=0.0, scale=1.0,
                                aspect=1.0, dx=0.0, dy=0.0)
        np.testing.assert_array_equal(out, img)

    @pytest.mark.quick
    def test_pure_scale_matches_formula(self):
        from yolo_tpu.data.augment import rotate_scale_crop

        img = self._gradient()
        out = rotate_scale_crop(img, 32, rad=0.0, scale=2.0,
                                aspect=1.0, dx=0.0, dy=0.0)
        # output x samples input at (x - 16)/2 + 16; channel 0 is 4*ix
        x = np.arange(32, dtype=np.float64)
        want = ((x - 16.0) / 2.0 + 16.0) * 4.0
        got = out[16, :, 0].astype(np.float64)
        np.testing.assert_allclose(got, want, atol=1.0)

    @pytest.mark.quick
    def test_rotation_90deg_matches_formula(self):
        from yolo_tpu.data.augment import rotate_scale_crop

        img = self._gradient()
        out = rotate_scale_crop(img, 32, rad=np.pi / 2, scale=1.0,
                                aspect=1.0, dx=0.0, dy=0.0)
        # rx = -(y - 16) + 16 -> channel 0 value 4*(32 - y); compare
        # away from the replicated border
        y = np.arange(2, 30, dtype=np.float64)
        want = (32.0 - y) * 4.0
        got = out[2:30, 16, 0].astype(np.float64)
        np.testing.assert_allclose(got, want, atol=1.5)

    @pytest.mark.quick
    def test_random_augment_deterministic(self):
        from yolo_tpu.data.augment import random_augment_classifier

        cfg = AugmentConfig(angle=15.0, aspect=1.2, min_crop=20,
                            max_crop=40)
        assert cfg.classifier_geometry
        img = self._gradient(48, 40)
        a = random_augment_classifier(
            img, np.random.default_rng(7), cfg, 32)
        b = random_augment_classifier(
            img, np.random.default_rng(7), cfg, 32)
        c = random_augment_classifier(
            img, np.random.default_rng(8), cfg, 32)
        assert a.shape == (32, 32, 3) and a.dtype == np.uint8
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    @pytest.mark.quick
    def test_degenerate_range_is_whole_image_resize(self):
        from yolo_tpu.data.augment import (random_augment_classifier,
                                           rotate_scale_crop)

        # square input, min=max=size, no angle/aspect: scale maps the
        # short side exactly to size and both offsets collapse to 0
        cfg = AugmentConfig(min_crop=32, max_crop=32)
        img = self._gradient(40, 40)
        out = random_augment_classifier(
            img, np.random.default_rng(0), cfg, 32)
        want = rotate_scale_crop(img, 32, rad=0.0, scale=32 / 40,
                                 aspect=1.0, dx=0.0, dy=0.0)
        np.testing.assert_array_equal(out, want)

    @pytest.mark.quick
    def test_config_from_net_params_keys(self):
        from yolo_tpu.data.augment import config_from_net_params

        cfg = config_from_net_params({"angle": 7.0, "aspect": 1.5,
                                      "min_crop": 20, "max_crop": 40})
        assert (cfg.angle, cfg.aspect, cfg.min_crop, cfg.max_crop) == (
            7.0, 1.5, 20, 40)
        assert cfg.classifier_geometry
        bare = config_from_net_params({"saturation": 1.5})
        assert not bare.classifier_geometry
        # bare --augment (force_defaults) keeps geometry disabled —
        # the classic yolov2 HSV+flip behavior
        forced = config_from_net_params({}, force_defaults=True)
        assert not forced.classifier_geometry


@pytest.mark.quick
def test_jitter_crop_zoom_out_pads_with_replication():
    """darknet crop_image lets the jitter window extend beyond the
    image (edge-replicated zoom-out); the clamped version collapsed
    every expansion draw onto a no-op (code-review finding). With
    jitter=0.5 some draws must produce crops LARGER than the source,
    and boxes must stay consistent."""
    from yolo_tpu.data.augment import AugmentConfig, jitter_crop

    img = np.zeros((40, 40, 3), np.uint8)
    img[:, :, 0] = np.arange(40, dtype=np.uint8)[None, :] * 6
    boxes = np.array([[0.5, 0.5, 0.3, 0.3]], np.float32)
    classes = np.array([0])
    cfg = AugmentConfig(jitter=0.5)
    grew = 0
    for s in range(40):
        crop, b, c = jitter_crop(img, boxes, classes,
                                 np.random.default_rng(s), cfg)
        ch, cw = crop.shape[:2]
        if ch > 40 or cw > 40:
            grew += 1
        if len(b):
            assert (b[:, :2] >= 0).all() and (b[:, :2] <= 1).all()
            assert (b[:, 2:] > 0).all() and (b[:, 2:] <= 1).all()
    assert grew > 0


@pytest.mark.quick
def test_distort_hsv_sub_one_saturation_active():
    """[net] saturation=0.7 (below 1) still distorts in darknet
    (rand_scale over the reversed range) — the <=1 gate silently
    disabled it (code-review finding)."""
    from yolo_tpu.data.augment import AugmentConfig, distort_hsv

    rng = np.random.default_rng(0)
    img = rng.integers(30, 220, (24, 24, 3), dtype=np.uint8)
    cfg = AugmentConfig(hue=0.0, saturation=0.7, exposure=1.0)
    outs = [distort_hsv(img, np.random.default_rng(s), cfg)
            for s in range(6)]
    assert any(not np.array_equal(o, img) for o in outs)
    # exact parse defaults stay a no-op
    noop = AugmentConfig(hue=0.0, saturation=1.0, exposure=1.0)
    np.testing.assert_array_equal(
        distort_hsv(img, np.random.default_rng(0), noop), img)


class TestBlurNoise:
    """[net] blur / gaussian_noise (round 5 — formerly noop-warned
    keys; cv2-formula-pinned, draw gates recall-grade)."""

    def _img(self, rng=None, h=64, w=64):
        rng = rng or np.random.default_rng(0)
        return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)

    def test_off_by_default_and_at_zero(self):
        from yolo_tpu.data.augment import (AugmentConfig, apply_blur,
                                           apply_gaussian_noise)

        img = self._img()
        cfg = AugmentConfig()
        assert cfg.blur == 0 and cfg.gaussian_noise == 0.0
        rng = np.random.default_rng(1)
        np.testing.assert_array_equal(
            apply_blur(img, np.zeros((0, 4)), rng, cfg), img)
        np.testing.assert_array_equal(
            apply_gaussian_noise(img, rng, cfg), img)
        # and the zero paths consumed NO rng draws (determinism of the
        # surrounding stream doesn't shift when the keys are absent)
        assert rng.integers(0, 2 ** 31) == np.random.default_rng(
            1).integers(0, 2 ** 31)

    def test_blur_full_mode_matches_cv2_formula(self):
        import cv2

        from yolo_tpu.data.augment import AugmentConfig, apply_blur

        img = self._img()
        cfg = AugmentConfig(blur=10)     # ksize = (10//2)*2+1 = 11
        # find a seed whose tri-state draw picks FULL (mode 2)
        for seed in range(20):
            rng = np.random.default_rng(seed)
            if np.random.default_rng(seed).integers(0, 3) == 2:
                got = apply_blur(img, np.zeros((0, 4)), rng, cfg)
                break
        else:
            pytest.fail("no full-blur seed found")
        want = cv2.GaussianBlur(img, (11, 11), 0)
        np.testing.assert_array_equal(got, want)

    def test_blur_background_mode_keeps_truth_sharp(self):
        import cv2

        from yolo_tpu.data.augment import AugmentConfig, apply_blur

        img = self._img()
        boxes = np.array([[0.5, 0.5, 0.4, 0.4]])
        cfg = AugmentConfig(blur=1)      # blur=1: background mode
        for seed in range(20):
            if np.random.default_rng(seed).integers(0, 3) == 1:
                rng = np.random.default_rng(seed)
                got = apply_blur(img, boxes, rng, cfg)
                break
        else:
            pytest.fail("no background-blur seed found")
        want = cv2.GaussianBlur(img, (17, 17), 0)
        h = w = 64
        x1, x2 = int(0.3 * w), int(0.7 * w) + 1
        y1, y2 = int(0.3 * h), int(0.7 * h) + 1
        # truth region: the ORIGINAL pixels; outside: the blurred ones
        np.testing.assert_array_equal(got[y1:y2, x1:x2],
                                      img[y1:y2, x1:x2])
        np.testing.assert_array_equal(got[:y1], want[:y1])
        np.testing.assert_array_equal(got[y2:], want[y2:])
        assert np.abs(got[:y1].astype(int)
                      - img[:y1].astype(int)).max() > 0

    def test_gaussian_noise_distribution_and_clamp(self):
        from yolo_tpu.data.augment import (AugmentConfig,
                                           apply_gaussian_noise)

        img = np.full((200, 200, 3), 128, np.uint8)
        cfg = AugmentConfig(gaussian_noise=20)
        # find a seed whose coin flip APPLIES the noise
        for seed in range(20):
            if np.random.default_rng(seed).integers(0, 2) == 1:
                rng = np.random.default_rng(seed)
                got = apply_gaussian_noise(img, rng, cfg)
                break
        else:
            pytest.fail("no apply seed found")
        d = got.astype(np.float64) - 128.0
        assert abs(d.mean()) < 1.0
        assert abs(d.std() - 20.0) < 1.0
        # sigma clamps at 127 (darknet's min(gaussian_noise, 127))
        big = AugmentConfig(gaussian_noise=500)
        rng = np.random.default_rng(seed)
        got2 = apply_gaussian_noise(img, rng, big)
        # saturation at 0/255 shrinks the observed std below 127
        assert got2.std() < 127.0 and got2.min() == 0 \
            and got2.max() == 255

    def test_seeded_determinism_in_full_augment(self):
        from yolo_tpu.data.augment import AugmentConfig, augment

        img = self._img()
        boxes = np.array([[0.5, 0.5, 0.3, 0.3]])
        classes = np.array([0])
        cfg = AugmentConfig(blur=5, gaussian_noise=10)
        a = augment(img, boxes, classes, np.random.default_rng(3), cfg)
        b = augment(img, boxes, classes, np.random.default_rng(3), cfg)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        # and the keys actually change the stream vs blur/noise off
        c = augment(img, boxes, classes, np.random.default_rng(3),
                    AugmentConfig())
        assert a[0].shape != c[0].shape or not np.array_equal(a[0],
                                                              c[0])

    def test_cfg_keys_flow_and_leave_noop_list(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (_NOOP_KEYS,
                                                  net_training_params)
        from yolo_tpu.data.augment import config_from_net_params

        assert "blur" not in _NOOP_KEYS["net"]
        assert "gaussian_noise" not in _NOOP_KEYS["net"]
        p = tmp_path / "a.cfg"
        p.write_text(
            "[net]\nwidth=64\nblur=10\ngaussian_noise=25\n"
            "[convolutional]\nfilters=10\nsize=1\nactivation=linear\n"
            "[region]\nanchors=1,1,2,2\nclasses=0\nnum=2\n")
        hp = net_training_params(str(p))
        assert hp["blur"] == 10 and hp["gaussian_noise"] == 25.0
        cfg = config_from_net_params(hp)
        assert cfg.blur == 10 and cfg.gaussian_noise == 25.0
        assert config_from_net_params({}).blur == 0

    def test_grain_resume_reproduces_blur_noise(self, tmp_path):
        """The new draws travel with grain's iterator state like every
        other augmentation: restoring mid-stream regenerates the SAME
        blurred/noised batches ([dropout]-style resume determinism)."""
        pytest.importorskip("grain")
        import cv2

        from yolo_tpu.data.augment import AugmentConfig
        from yolo_tpu.data.grain_pipeline import grain_train_batches

        rng = np.random.default_rng(0)
        pairs = []
        for i in range(6):
            p = str(tmp_path / f"i{i}.jpg")
            cv2.imwrite(p, rng.integers(0, 255, (60, 80, 3),
                                        dtype=np.uint8))
            pairs.append((p, {
                "boxes": np.array([[0.5, 0.5, 0.3, 0.4]], np.float32),
                "classes": np.array([0], np.int32),
                "difficult": np.array([0], np.int32),
                "width": 80, "height": 60, "filename": f"i{i}.jpg"}))
        kw = dict(class_names=("cat",),
                  anchors=np.array([[1.0, 1.0]], np.float32),
                  num_classes=1, net_size=64, batch_size=2,
                  num_epochs=2, seed=5,
                  augment_cfg=AugmentConfig(blur=5, gaussian_noise=15))
        it = grain_train_batches(pairs, **kw)
        _ = [next(it) for _ in range(2)]
        snap = it.get_state()
        want = [next(it) for _ in range(2)]
        it2 = grain_train_batches(pairs, **kw)
        it2.set_state(snap)
        got = [next(it2) for _ in range(2)]
        for x, y in zip(want, got):
            np.testing.assert_array_equal(x["images"], y["images"])


@pytest.mark.slow
def test_cli_blur_only_cfg_enables_augmentation(tmp_path, capsys):
    """Code-review r5: a cfg whose ONLY [net] augmentation keys are
    blur/gaussian_noise must enable augmentation (the _AUG_KEYS gate
    in cmd_train) — before the fix such cfgs silently trained with no
    augmentation at all while the docs claimed support."""
    import os

    import cv2

    from yolo_tpu import cli
    from yolo_tpu.configs.darknet_cfg import config_from_cfg
    from yolo_tpu.io import darknet_weights as dw

    conv = ("[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n")
    cfg_text = ("[net]\nwidth=64\nheight=64\nchannels=3\n"
                "learning_rate=0.0001\nblur=10\ngaussian_noise=25\n"
                + conv * 5
                + "[convolutional]\nfilters=12\nsize=1\n"
                  "activation=linear\n"
                  "[region]\nanchors=1,1, 2,2\nnum=2\nclasses=1\n")
    cfg_p = tmp_path / "m.cfg"
    cfg_p.write_text(cfg_text)
    names_p = tmp_path / "m.names"
    names_p.write_text("cat\n")

    root = tmp_path / "voc"
    os.makedirs(root / "JPEGImages")
    os.makedirs(root / "Annotations")
    os.makedirs(root / "ImageSets" / "Main")
    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        cv2.imwrite(str(root / "JPEGImages" / f"i{i}.jpg"),
                    rng.integers(0, 255, (80, 90, 3), dtype=np.uint8))
        (root / "Annotations" / f"i{i}.xml").write_text(
            f"<annotation><filename>i{i}.jpg</filename>"
            "<size><width>90</width><height>80</height>"
            "<depth>3</depth></size>"
            "<object><name>cat</name><difficult>0</difficult>"
            "<bndbox><xmin>20</xmin><ymin>20</ymin><xmax>60</xmax>"
            "<ymax>60</ymax></bndbox></object></annotation>")
        names.append(f"i{i}")
    (root / "ImageSets" / "Main" / "train.txt").write_text(
        "\n".join(names))

    cfg = config_from_cfg(str(cfg_p), str(names_p))
    w = tmp_path / "init.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    cli.main(["train", "--cfg", str(cfg_p), "--names", str(names_p),
              "--weights", str(w), "--voc-root", str(root),
              "--split", "train", "--batch", "8", "--epochs", "1",
              "--precision", "fp32", "--seed", "3"])
    err = capsys.readouterr().err
    assert "augmentation keys present" in err, err[-800:]
