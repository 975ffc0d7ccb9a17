"""COCO JSON loading + COCO-style mAP@[.5:.95] tests (SURVEY.md §3.5
extension; full-YOLOv2 is COCO-80, BASELINE.json:8)."""

import json

import numpy as np
import pytest

from yolo_tpu.data.coco import load_coco
from yolo_tpu.eval.coco_map import COCO_IOU_THRESHOLDS, evaluate_coco
from yolo_tpu.eval.voc_map import evaluate

CLASS_NAMES = ("cat", "dog", "bird")


def _write_coco(path, images, annotations, categories=None):
    doc = {
        "images": images,
        "annotations": annotations,
        # deliberately non-contiguous ids, shuffled order (real COCO)
        "categories": categories or [
            {"id": 7, "name": "dog"},
            {"id": 2, "name": "cat"},
            {"id": 99, "name": "zebra"},  # not in CLASS_NAMES -> skipped
            {"id": 13, "name": "bird"},
        ],
    }
    path.write_text(json.dumps(doc))


class TestLoadCoco:
    def test_schema_and_mapping(self, tmp_path):
        p = tmp_path / "inst.json"
        _write_coco(
            p,
            images=[
                {"id": 10, "file_name": "a.jpg", "width": 200, "height": 100},
                {"id": 11, "file_name": "b.jpg", "width": 100, "height": 100},
            ],
            annotations=[
                {"image_id": 10, "category_id": 7,
                 "bbox": [20, 30, 40, 20], "iscrowd": 0},
                {"image_id": 10, "category_id": 99,  # zebra: skipped
                 "bbox": [0, 0, 10, 10], "iscrowd": 0},
                {"image_id": 11, "category_id": 2,
                 "bbox": [10, 10, 50, 80], "iscrowd": 1},
            ])
        samples = load_coco(str(p), CLASS_NAMES, image_root="/imgs")
        assert [s[0] for s in samples] == ["/imgs/a.jpg", "/imgs/b.jpg"]

        ann_a = samples[0][1]
        assert ann_a["width"] == 200 and ann_a["height"] == 100
        assert list(ann_a["classes"]) == [1]  # dog -> class 1 by NAME
        # bbox [20,30,40,20] px -> center (40,40), wh (40,20), normalized
        np.testing.assert_allclose(
            ann_a["boxes"][0], [40 / 200, 40 / 100, 40 / 200, 20 / 100],
            rtol=1e-6)
        assert list(ann_a["difficult"]) == [0]

        ann_b = samples[1][1]
        assert list(ann_b["classes"]) == [0]
        assert list(ann_b["difficult"]) == [1]  # iscrowd -> difficult

    def test_empty_image_kept(self, tmp_path):
        p = tmp_path / "inst.json"
        _write_coco(p, images=[{"id": 1, "file_name": "e.jpg",
                                "width": 10, "height": 10}],
                    annotations=[])
        samples = load_coco(str(p), CLASS_NAMES)
        assert len(samples) == 1
        assert samples[0][1]["boxes"].shape == (0, 4)

    def test_feeds_train_batches(self, tmp_path):
        """COCO samples drive the training pipeline directly (crowd
        boxes excluded from the encoded targets)."""
        import cv2

        from yolo_tpu.data.pipeline import train_batches

        cv2.imwrite(str(tmp_path / "a.jpg"),
                    np.random.default_rng(0).integers(
                        0, 255, (60, 80, 3), dtype=np.uint8))
        p = tmp_path / "inst.json"
        _write_coco(
            p,
            images=[{"id": 1, "file_name": "a.jpg",
                     "width": 80, "height": 60}],
            annotations=[
                {"image_id": 1, "category_id": 7,
                 "bbox": [10, 10, 30, 30], "iscrowd": 0},
                {"image_id": 1, "category_id": 2,
                 "bbox": [0, 0, 80, 60], "iscrowd": 1},  # crowd: dropped
            ])
        pairs = load_coco(str(p), CLASS_NAMES, image_root=str(tmp_path))
        anchors = np.array([[1.0, 1.0], [2.0, 2.0]], np.float32)
        batches = list(train_batches(
            pairs, class_names=CLASS_NAMES, anchors=anchors,
            num_classes=3, net_size=64, batch_size=1,
            rng=np.random.default_rng(0), workers=1, shuffle=False))
        assert len(batches) == 1
        b = batches[0]
        assert b["images"].shape == (1, 64, 64, 3)
        # exactly ONE encoded object (the crowd box was dropped)
        assert int(b["obj_mask"].sum()) == 1


def _det(cls, score, x1, y1, x2, y2):
    return (cls, score, x1, y1, x2, y2)


class TestEvaluateCoco:
    def test_perfect_detections(self):
        gt = {0: {"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 50]]),
                  "classes": np.array([0, 1]),
                  "difficult": np.zeros(2)}}
        dets = {0: [_det(0, 0.9, 0, 0, 10, 10),
                    _det(1, 0.8, 20, 20, 40, 50)]}
        r = evaluate_coco(dets, gt, num_classes=3)
        assert r["map"] == 1.0 and r["map50"] == 1.0 and r["map75"] == 1.0
        assert set(r["ap"]) == {0, 1}  # class 2 has no GT -> excluded

    def test_iou_ladder(self):
        """A det with IoU 0.8 vs its GT is TP at thresholds <= 0.8 only:
        mAP = 7/10 thresholds x AP 1.0."""
        gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
                  "classes": np.array([0]), "difficult": np.zeros(1)}}
        dets = {0: [_det(0, 0.9, 0, 0, 10, 8)]}  # IoU = 0.8
        r = evaluate_coco(dets, gt, num_classes=1)
        assert r["map50"] == 1.0 and r["map75"] == 1.0
        np.testing.assert_allclose(r["map"], 0.7, atol=1e-9)
        assert np.isclose((COCO_IOU_THRESHOLDS <= 0.8).mean(), 0.7)

    def test_crowd_not_false_positive(self):
        """A high-scoring det whose only overlap is a crowd region must
        not poison the PR curve."""
        gt = {0: {"boxes": np.array([[0, 0, 10, 10], [50, 50, 90, 90]]),
                  "classes": np.array([0, 0]),
                  "difficult": np.array([0, 1])}}  # second box is crowd
        dets = {0: [_det(0, 0.95, 55, 55, 70, 70),  # inside crowd: ignored
                    _det(0, 0.90, 0, 0, 10, 10)]}   # TP
        r = evaluate_coco(dets, gt, num_classes=1)
        assert r["map"] == 1.0
        # sanity: without the crowd flag the first det would be a
        # mid-IoU false positive ranked above the TP
        gt_nocrowd = {0: {"boxes": gt[0]["boxes"],
                          "classes": gt[0]["classes"],
                          "difficult": np.zeros(2)}}
        r2 = evaluate_coco(dets, gt_nocrowd, num_classes=1)
        assert r2["map"] < r["map"]

    def test_duplicate_detection_is_fp(self):
        gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
                  "classes": np.array([0]), "difficult": np.zeros(1)}}
        dets = {0: [_det(0, 0.9, 0, 0, 10, 10),
                    _det(0, 0.8, 0, 0, 10, 10)]}  # duplicate -> FP
        r = evaluate_coco(dets, gt, num_classes=1, iou_thresholds=[0.5])
        # recall hits 1.0 at precision 1.0 before the duplicate: AP 1.0
        assert r["map"] == 1.0
        # duplicate ranked FIRST costs precision at every recall point
        dets_rev = {0: [_det(0, 0.9, 0, 0, 10.2, 10.2),
                        _det(0, 0.8, 0, 0, 10.2, 10.2)]}
        gt2 = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0],
                                      [30.0, 30.0, 40.0, 40.0]]),
                   "classes": np.array([0, 0]), "difficult": np.zeros(2)}}
        r2 = evaluate_coco(dets_rev, gt2, num_classes=1,
                           iou_thresholds=[0.5])
        assert 0.0 < r2["map"] < 1.0

    def test_max_dets_cap(self):
        gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
                  "classes": np.array([0]), "difficult": np.zeros(1)}}
        # the TP is the LOWEST-scoring det; with max_dets=2 it is cut
        dets = {0: [_det(0, 0.9, 100, 100, 110, 110),
                    _det(0, 0.8, 200, 200, 210, 210),
                    _det(0, 0.1, 0, 0, 10, 10)]}
        full = evaluate_coco(dets, gt, 1, iou_thresholds=[0.5])
        capped = evaluate_coco(dets, gt, 1, iou_thresholds=[0.5],
                               max_dets=2)
        assert full["map"] > 0.0 and capped["map"] == 0.0

    def test_map50_close_to_voc_auc(self):
        """101-point interpolation at IoU .5 tracks the VOC continuous
        AUC on a mixed scene (they differ only by recall-grid
        quantization)."""
        rng = np.random.default_rng(3)
        gt, dets = {}, {}
        for img in range(6):
            boxes = rng.uniform(0, 80, (3, 2))
            boxes = np.concatenate([boxes, boxes + rng.uniform(
                10, 30, (3, 2))], axis=1)
            gt[img] = {"boxes": boxes, "classes": np.array([0, 0, 1]),
                       "difficult": np.zeros(3)}
            d = []
            for b, c in zip(boxes, (0, 0, 1)):
                if rng.uniform() < 0.8:  # jittered hit
                    j = b + rng.uniform(-2, 2, 4)
                    d.append(_det(c, float(rng.uniform(0.5, 1)), *j))
            d.append(_det(int(rng.integers(0, 2)),
                          float(rng.uniform(0, 0.5)),
                          *rng.uniform(0, 100, 4)))  # noise
            dets[img] = d
        coco = evaluate_coco(dets, gt, num_classes=2)
        voc = evaluate(dets, gt, num_classes=2, use_07_metric=False)
        assert abs(coco["map50"] - voc["map"]) < 0.03
        assert coco["map"] <= coco["map50"]


def test_cli_eval_coco_metric(tmp_path):
    """e2e: eval --coco-json --metric coco on a synthetic dataset."""
    import contextlib
    import io as _io

    import cv2

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    rng = np.random.default_rng(0)
    images, anns = [], []
    for i, (h, w) in enumerate([(100, 120), (90, 140)]):
        name = f"img{i}.jpg"
        cv2.imwrite(str(tmp_path / name),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        anns.append({"image_id": i, "category_id": 1,
                     "bbox": [20, 20, 50, 40], "iscrowd": 0})
    cfg = get_variant("tiny-voc")
    cats = [{"id": 1, "name": cfg.class_names[0]}]
    (tmp_path / "inst.json").write_text(json.dumps(
        {"images": images, "annotations": anns, "categories": cats}))

    wpath = str(tmp_path / "w.weights")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(1)))

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", wpath, "--coco-json",
                  str(tmp_path / "inst.json"), "--metric", "coco",
                  "--batch", "2", "--precision", "fp32"])
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert set(res) == {"map", "map50", "map75", "map_small",
                        "map_medium", "map_large", "ar1", "ar10", "ar",
                        "ar_small", "ar_medium", "ar_large", "ap"}
    assert 0.0 <= res["map"] <= res["map50"] <= 1.0


def test_max_dets_per_image_per_class():
    """pycocotools' actual implementation (COCOeval.evaluateImg runs per
    category and truncates dt[0:maxDet] there): a flood of high-scoring
    class-1 dets must NOT evict a lower-scoring class-0 TP — each class
    gets its own per-image budget."""
    gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
              "classes": np.array([0]), "difficult": np.zeros(1)}}
    dets = {0: [_det(1, 0.9, 50, 50, 60, 60),
                _det(1, 0.8, 70, 70, 80, 80),
                _det(0, 0.5, 0, 0, 10, 10)]}  # class-0 TP, lowest score
    r = evaluate_coco(dets, gt, 2, iou_thresholds=[0.5], max_dets=2)
    assert r["ap"][0] == 1.0  # class-1 flood doesn't consume class-0 budget
    # but WITHIN a class the cap still bites (the TP is the 3rd class-0 det)
    dets2 = {0: [_det(0, 0.9, 50, 50, 60, 60),
                 _det(0, 0.8, 70, 70, 80, 80),
                 _det(0, 0.5, 0, 0, 10, 10)]}
    r2 = evaluate_coco(dets2, gt, 2, iou_thresholds=[0.5], max_dets=2)
    assert r2["ap"][0] == 0.0


def test_average_recall():
    """AR@maxDets: the iou_ladder scene recalls its GT at 7/10
    thresholds -> AR 0.7; perfect detections -> AR 1.0."""
    gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
              "classes": np.array([0]), "difficult": np.zeros(1)}}
    r = evaluate_coco({0: [_det(0, 0.9, 0, 0, 10, 8)]}, gt, 1)
    np.testing.assert_allclose(r["ar"], 0.7, atol=1e-9)
    r2 = evaluate_coco({0: [_det(0, 0.9, 0, 0, 10, 10)]}, gt, 1)
    assert r2["ar"] == 1.0
    # recall is capped by max_dets: TP ranked below two FPs, max_dets=2
    dets = {0: [_det(0, 0.9, 50, 50, 60, 60), _det(0, 0.8, 70, 70, 80, 80),
                _det(0, 0.1, 0, 0, 10, 10)]}
    assert evaluate_coco(dets, gt, 1, max_dets=2)["ar"] == 0.0


def test_category_ids_inverse():
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "i.json")
        _write_coco(type("P", (), {"write_text": lambda self, s: open(p, "w").write(s)})(),
                    images=[], annotations=[])
        from yolo_tpu.data.coco import category_ids

        m = category_ids(p, CLASS_NAMES)
        assert m == {0: 2, 1: 7, 2: 13}  # cat/dog/bird -> COCO ids


def test_cli_eval_save_detections(tmp_path):
    """--save-detections writes a pycocotools-loadRes-style results
    list with ORIGINAL image and category ids."""
    import contextlib
    import io as _io

    import cv2

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    rng = np.random.default_rng(0)
    cfg = get_variant("tiny-voc")
    images, anns = [], []
    for i, img_id in enumerate([101, 205]):  # non-contiguous originals
        name = f"img{i}.jpg"
        cv2.imwrite(str(tmp_path / name),
                    rng.integers(0, 255, (100, 120, 3), dtype=np.uint8))
        images.append({"id": img_id, "file_name": name,
                       "width": 120, "height": 100})
        anns.append({"image_id": img_id, "category_id": 100,
                     "bbox": [20, 20, 50, 40], "iscrowd": 0})
    # all 20 VOC classes, original ids 100+i (non-contiguous base)
    cats = [{"id": 100 + i, "name": n}
            for i, n in enumerate(cfg.class_names)]
    anns = [dict(a, category_id=100) for a in anns]
    (tmp_path / "inst.json").write_text(json.dumps(
        {"images": images, "annotations": anns, "categories": cats}))
    wpath = str(tmp_path / "w.weights")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(1)))

    out_json = str(tmp_path / "results.json")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", wpath, "--coco-json",
                  str(tmp_path / "inst.json"), "--metric", "coco",
                  "--batch", "2", "--precision", "fp32", "--conf", "0.1",
                  "--eval-conf", "0.1", "--save-detections", out_json])
    results = json.loads(open(out_json).read())
    assert isinstance(results, list) and results
    for r in results:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert r["image_id"] in (101, 205)
        assert 100 <= r["category_id"] < 120  # original ids, not 0..19
        assert len(r["bbox"]) == 4 and r["bbox"][2] >= 0


def test_cli_eval_from_detections_roundtrip(tmp_path):
    """save-detections -> from-detections round trip: scoring the saved
    file (no model run) reproduces the live mAP exactly; a hand-written
    perfect results file scores 1.0."""
    import contextlib
    import io as _io

    import cv2

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    rng = np.random.default_rng(0)
    cfg = get_variant("tiny-voc")
    images, anns = [], []
    for i, img_id in enumerate([7, 9]):
        name = f"img{i}.jpg"
        cv2.imwrite(str(tmp_path / name),
                    rng.integers(0, 255, (100, 120, 3), dtype=np.uint8))
        images.append({"id": img_id, "file_name": name,
                       "width": 120, "height": 100})
        anns.append({"image_id": img_id, "category_id": 100,
                     "bbox": [20, 20, 50, 40], "iscrowd": 0})
    cats = [{"id": 100 + i, "name": n}
            for i, n in enumerate(cfg.class_names)]
    cj = str(tmp_path / "inst.json")
    (tmp_path / "inst.json").write_text(json.dumps(
        {"images": images, "annotations": anns, "categories": cats}))
    wpath = str(tmp_path / "w.weights")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(1)))

    res_file = str(tmp_path / "results.json")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", wpath, "--coco-json", cj,
                  "--metric", "coco", "--batch", "2",
                  "--precision", "fp32", "--eval-conf", "0.1",
                  "--save-detections", res_file])
    live = json.loads(buf.getvalue().strip().splitlines()[-1])

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
                  "--coco-json", cj, "--metric", "coco",
                  "--from-detections", res_file])
    replay = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert replay == live  # byte-identical scoring

    # perfect hand-written detections -> mAP 1.0, no weights needed
    perfect = [{"image_id": i, "category_id": 100,
                "bbox": [20, 20, 50, 40], "score": 0.9} for i in (7, 9)]
    pf = str(tmp_path / "perfect.json")
    open(pf, "w").write(json.dumps(perfect))
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["eval", "--model", "tiny-voc", "--coco-json", cj,
                  "--metric", "coco", "--from-detections", pf])
    assert json.loads(buf.getvalue().strip().splitlines()[-1])["map"] == 1.0


class TestMetricInvariances:
    """Properties any correct mAP implementation must satisfy."""

    def _scene(self, seed):
        rng = np.random.default_rng(seed)
        gt, dets = {}, {}
        for img in range(4):
            b = rng.uniform(0, 80, (3, 2))
            boxes = np.concatenate([b, b + rng.uniform(5, 30, (3, 2))], 1)
            gt[img] = {"boxes": boxes,
                       "classes": rng.integers(0, 2, 3),
                       "difficult": np.zeros(3)}
            dets[img] = [_det(int(rng.integers(0, 2)),
                              float(rng.uniform()),
                              *rng.uniform(0, 100, 4)) for _ in range(5)]
        return gt, dets

    def test_detection_order_irrelevant(self):
        gt, dets = self._scene(0)
        r1 = evaluate_coco(dets, gt, 2)
        shuffled = {i: list(reversed(d)) for i, d in dets.items()}
        r2 = evaluate_coco(shuffled, gt, 2)
        assert r1 == r2

    def test_image_id_relabeling_irrelevant(self):
        gt, dets = self._scene(1)
        remap = {0: 100, 1: 7, 2: 55, 3: 3}
        gt2 = {remap[i]: g for i, g in gt.items()}
        dets2 = {remap[i]: d for i, d in dets.items()}
        assert evaluate_coco(dets, gt, 2) == evaluate_coco(dets2, gt2, 2)

    def test_coordinate_scaling_irrelevant(self):
        """IoU is scale-free: multiplying every coordinate by a
        constant cannot change any AP."""
        gt, dets = self._scene(2)
        s = 7.3
        gt2 = {i: {"boxes": g["boxes"] * s, "classes": g["classes"],
                   "difficult": g["difficult"]} for i, g in gt.items()}
        dets2 = {i: [(c, sc, x1 * s, y1 * s, x2 * s, y2 * s)
                     for (c, sc, x1, y1, x2, y2) in d]
                 for i, d in dets.items()}
        r1, r2 = evaluate_coco(dets, gt, 2), evaluate_coco(dets2, gt2, 2)
        np.testing.assert_allclose(r1["map"], r2["map"], rtol=1e-12)

    def test_extra_empty_images_irrelevant(self):
        """Images with neither GT nor detections contribute nothing."""
        gt, dets = self._scene(3)
        gt2 = dict(gt)
        gt2[999] = {"boxes": np.zeros((0, 4)), "classes": np.zeros(0),
                    "difficult": np.zeros(0)}
        assert evaluate_coco(dets, gt, 2) == evaluate_coco(dets, gt2, 2)


class TestAreaRanges:
    """pycocotools areaRng breakdowns (small <32^2, medium 32^2..96^2,
    large >96^2 px^2) with the real COCOeval ignore semantics."""

    def _one(self, side, det_side=None):
        det_side = det_side or side
        gt = {0: {"boxes": np.array([[0.0, 0.0, side, side]]),
                  "classes": np.array([0]),
                  "difficult": np.array([0])}}
        dets = {0: [(0, 0.9, 0.0, 0.0, det_side, det_side)]}
        return dets, gt

    def test_perfect_per_range(self):
        for side, rng in ((20, "small"), (50, "medium"), (200, "large")):
            dets, gt = self._one(side)
            r = evaluate_coco(dets, gt, 1)
            assert r[f"map_{rng}"] == 1.0, (side, rng)
            assert r[f"ar_{rng}"] == 1.0
            # the other two ranges have no GT: excluded from the mean
            others = [n for n in ("small", "medium", "large") if n != rng]
            for o in others:
                assert r[f"map_{o}"] == 0.0  # no classes had GT -> 0.0

    def test_out_of_range_gt_is_ignored_not_fp(self):
        """A detection matched to an out-of-range GT is DROPPED from
        that range's PR curve (ignored), not counted as a false
        positive — the COCOeval._ignore semantics."""
        # one small GT (20x20, area 400) + one large GT, each detected
        gt = {0: {"boxes": np.array([[0, 0, 20, 20], [40, 40, 240, 240]],
                                    np.float64),
                  "classes": np.array([0, 0]),
                  "difficult": np.array([0, 0])}}
        dets = {0: [(0, 0.9, 0, 0, 20, 20), (0, 0.8, 40, 40, 240, 240)]}
        r = evaluate_coco(dets, gt, 1)
        # small range: the large GT + its detection are both ignored ->
        # perfect AP on the one small GT
        assert r["map_small"] == 1.0
        assert r["map_large"] == 1.0
        assert r["map"] == 1.0

    def test_unmatched_det_outside_range_ignored(self):
        """An unmatched detection whose own area is out of range must
        not poison that range's precision."""
        gt = {0: {"boxes": np.array([[0, 0, 20, 20]], np.float64),
                  "classes": np.array([0]),
                  "difficult": np.array([0])}}
        # perfect small det + a spurious LARGE det far away
        dets = {0: [(0, 0.9, 0, 0, 20, 20),
                    (0, 0.95, 300, 300, 500, 500)]}
        r = evaluate_coco(dets, gt, 1)
        assert r["map_small"] == 1.0  # large spurious det ignored here
        assert r["map"] < 1.0         # but it IS an FP for 'all'

    def test_ar_maxdets_ladder(self):
        """AR@1 < AR@10 = AR@100 when one image has two GTs and the
        top-scoring detection covers only one of them."""
        gt = {0: {"boxes": np.array([[0, 0, 50, 50], [100, 100, 150, 150]],
                                    np.float64),
                  "classes": np.array([0, 0]),
                  "difficult": np.array([0, 0])}}
        dets = {0: [(0, 0.9, 0, 0, 50, 50),
                    (0, 0.8, 100, 100, 150, 150)]}
        r = evaluate_coco(dets, gt, 1, iou_thresholds=[0.5])
        assert r["ar1"] == 0.5
        assert r["ar10"] == 1.0
        assert r["ar"] == 1.0


def test_detection_on_image_missing_from_gt_is_fp():
    """A detection on an image the GT dict does not mention must count
    as a false positive, matching voc_map.evaluate's schema tolerance
    (review r2: iterating GT images only silently inflated mAP)."""
    gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
              "classes": np.array([0]), "difficult": np.zeros(1)}}
    dets_clean = {0: [_det(0, 0.9, 0, 0, 10, 10)]}
    # same TP plus a higher-scoring FP on an image with no GT entry
    dets_extra = {0: [_det(0, 0.9, 0, 0, 10, 10)],
                  7: [_det(0, 0.95, 0, 0, 10, 10)]}
    r_clean = evaluate_coco(dets_clean, gt, 1, iou_thresholds=[0.5])
    r_extra = evaluate_coco(dets_extra, gt, 1, iou_thresholds=[0.5])
    assert r_clean["map"] == 1.0
    assert r_extra["map"] < 1.0  # the stray detection costs precision


def test_area_ranges_validated():
    import pytest

    gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
              "classes": np.array([0]), "difficult": np.zeros(1)}}
    dets = {0: [_det(0, 0.9, 0, 0, 10, 10)]}
    with pytest.raises(ValueError, match="unknown area range"):
        evaluate_coco(dets, gt, 1, area_ranges=["all", "tiny"])
    with pytest.raises(ValueError, match="must include 'all'"):
        evaluate_coco(dets, gt, 1, area_ranges=["small"])


@pytest.mark.quick
def test_area_buckets_use_segmentation_areas():
    """pycocotools areaRng buckets GTs by ann['area'] (segmentation
    area) — a thin/diagonal object with a big bbox but small seg area
    is 'small' to pycocotools; bbox-area bucketing was a silent
    divergence (code-review finding). Without 'areas' the evaluator
    falls back to bbox area."""
    det = [(0, 0.9, 0.0, 0.0, 200.0, 60.0)]
    gt_base = {"boxes": np.array([[0.0, 0.0, 200.0, 60.0]]),
               "classes": np.array([0]),
               "difficult": np.array([0])}
    # seg area 800 < 32^2: the GT is small despite the 12000 px bbox
    gt_seg = dict(gt_base, areas=np.array([800.0]))
    r = evaluate_coco({0: det}, {0: gt_seg}, 1, iou_thresholds=[0.5])
    assert r["map_small"] == pytest.approx(1.0)
    # bbox fallback: 12000 px^2 > 96^2 -> large
    r2 = evaluate_coco({0: det}, {0: dict(gt_base)}, 1,
                       iou_thresholds=[0.5])
    assert r2["map_large"] == pytest.approx(1.0)
    assert r2["map_small"] == 0.0


@pytest.mark.quick
def test_map50_75_only_for_present_thresholds():
    det = [(0, 0.9, 0.0, 0.0, 10.0, 10.0)]
    gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
              "classes": np.array([0]), "difficult": np.array([0])}}
    r = evaluate_coco({0: det}, gt, 1, iou_thresholds=[0.6, 0.7])
    assert "map50" not in r and "map75" not in r
    r2 = evaluate_coco({0: det}, gt, 1)
    assert r2["map50"] == pytest.approx(1.0)
    assert r2["map75"] == pytest.approx(1.0)


@pytest.mark.quick
def test_wrong_names_tripwire(tmp_path, capsys):
    """A class list matching NO category silently drops every
    annotation — detector training would fit pure background; the
    loader must warn loudly (code-review finding: only the VOC path
    had the tripwire)."""
    doc = {"images": [{"id": 1, "width": 64, "height": 64,
                       "file_name": "a.jpg"}],
           "annotations": [{"id": 1, "image_id": 1, "category_id": 5,
                            "bbox": [1, 1, 10, 10], "area": 100}],
           "categories": [{"id": 5, "name": "zebra"}]}
    p = tmp_path / "i.json"
    p.write_text(json.dumps(doc))
    load_coco(str(p), ("cat", "dog"), str(tmp_path))
    assert "all 1 annotations dropped" in capsys.readouterr().err
    # matching names stay silent
    load_coco(str(p), ("zebra",), str(tmp_path))
    assert "dropped" not in capsys.readouterr().err
