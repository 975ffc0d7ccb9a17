"""VOC parsing, pipeline, mAP evaluator tests (SURVEY.md §4.2.6 fixtures)."""

import os
import textwrap

import numpy as np
import pytest

from yolo_tpu.data import pipeline as pipe
from yolo_tpu.data.voc import list_split, parse_annotation
from yolo_tpu.eval.voc_map import average_precision, evaluate
from yolo_tpu.ops.letterbox import letterbox_geometry


def _write_xml(path, objects, w=200, h=100):
    objs = "".join(textwrap.dedent(f"""
        <object><name>{name}</name><difficult>{diff}</difficult>
        <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
        </object>""") for name, diff, x1, y1, x2, y2 in objects)
    path.write_text(f"<annotation><filename>f.jpg</filename>"
                    f"<size><width>{w}</width><height>{h}</height><depth>3</depth></size>"
                    f"{objs}</annotation>")


class TestVOCParse:
    def test_basic(self, tmp_path):
        xml = tmp_path / "a.xml"
        _write_xml(xml, [("dog", 0, 21, 11, 121, 61), ("unknown", 0, 1, 1, 9, 9),
                         ("cat", 1, 1, 1, 50, 50)])
        ann = parse_annotation(str(xml), ("cat", "dog"))
        # difficult skipped by default, unknown class skipped
        assert ann["classes"].tolist() == [1]
        # 1-based inclusive -> x1=20,x2=120 -> cx=70/200
        np.testing.assert_allclose(ann["boxes"][0],
                                   [70 / 200, 35 / 100, 100 / 200, 50 / 100])
        assert (ann["width"], ann["height"]) == (200, 100)

    def test_keep_difficult(self, tmp_path):
        xml = tmp_path / "a.xml"
        _write_xml(xml, [("cat", 1, 1, 1, 50, 50)])
        ann = parse_annotation(str(xml), ("cat",), keep_difficult=True)
        assert ann["classes"].tolist() == [0]
        assert ann["difficult"].tolist() == [1]

    def test_all_names_mismatch_warns_once(self, tmp_path, capsys):
        """A class list that matches NO annotation (the wrong --names
        footgun) would silently train on background — the pipeline
        warns once; a matching list stays quiet."""
        root = make_voc_root(tmp_path, n_images=4)
        pairs = list_split(root, "train")
        kw = dict(anchors=((1.0, 1.0),), num_classes=2, net_size=64,
                  batch_size=2, rng=np.random.default_rng(0), workers=2)
        list(pipe.train_batches(pairs, class_names=("nope", "nada"),
                                **kw))
        err = capsys.readouterr().err
        assert err.count("ALL dropped") == 1
        # correct names: no warning (make_voc_root uses VOC names)
        from yolo_tpu.configs import get_variant

        names = get_variant("tiny-voc").class_names
        list(pipe.train_batches(pairs, class_names=names, **kw))
        assert "ALL dropped" not in capsys.readouterr().err


class TestLetterboxBoxes:
    def test_geometry_roundtrip(self):
        src_w, src_h, net = 640, 480, 416
        boxes = np.array([[0.5, 0.5, 0.4, 0.2], [0.1, 0.9, 0.05, 0.1]])
        net_boxes = pipe.letterbox_boxes(boxes, src_w, src_h, net)
        scale, rh, rw, px, py = letterbox_geometry(src_h, src_w, net)
        # invert: net-normalized -> source pixels -> source-normalized
        cx = (net_boxes[:, 0] * net - px) / scale / src_w
        cy = (net_boxes[:, 1] * net - py) / scale / src_h
        bw = net_boxes[:, 2] * net / scale / src_w
        bh = net_boxes[:, 3] * net / scale / src_h
        np.testing.assert_allclose(np.stack([cx, cy, bw, bh], -1), boxes,
                                   rtol=1e-5, atol=1e-7)


class TestAveragePrecision:
    def test_perfect(self):
        r = np.array([0.5, 1.0])
        p = np.array([1.0, 1.0])
        assert average_precision(r, p, True) == pytest.approx(1.0)
        assert average_precision(r, p, False) == pytest.approx(1.0)

    def test_known_value(self):
        # one TP then one FP: recall [1, 1], precision [1, 0.5]
        r = np.array([1.0, 1.0])
        p = np.array([1.0, 0.5])
        assert average_precision(r, p, True) == pytest.approx(1.0)


class TestEvaluate:
    def test_perfect_detections(self):
        gt = {0: {"boxes": np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
                  "classes": np.array([0, 1]),
                  "difficult": np.array([0, 0])}}
        dets = {0: [(0, 0.9, 10, 10, 50, 50), (1, 0.8, 60, 60, 90, 90)]}
        res = evaluate(dets, gt, 2)
        assert res["map"] == pytest.approx(1.0)

    def test_fp_and_duplicate(self):
        gt = {0: {"boxes": np.array([[10, 10, 50, 50]]),
                  "classes": np.array([0]),
                  "difficult": np.array([0])}}
        dets = {0: [(0, 0.9, 10, 10, 50, 50),
                    (0, 0.8, 11, 11, 50, 50),   # duplicate -> FP
                    (0, 0.7, 200, 200, 300, 300)]}  # miss -> FP
        res = evaluate(dets, gt, 1)
        assert res["map"] == pytest.approx(1.0)  # TP ranked first

        dets = {0: [(0, 0.95, 200, 200, 300, 300),  # FP ranked first
                    (0, 0.9, 10, 10, 50, 50)]}
        res = evaluate(dets, gt, 1)
        # 11-point: p at recall>=t is 0.5 for all t -> wait, max precision
        # at recall 1.0 is 1/2; AP = 0.5
        assert res["map"] == pytest.approx(0.5)

    def test_difficult_ignored(self):
        gt = {0: {"boxes": np.array([[10, 10, 50, 50]]),
                  "classes": np.array([0]),
                  "difficult": np.array([1])}}
        dets = {0: [(0, 0.9, 10, 10, 50, 50)]}
        res = evaluate(dets, gt, 1)
        assert np.isnan(res["ap"][0])  # no non-difficult GT -> undefined


class TestInferenceBatches:
    def _imgs(self, tmp_path, shapes):
        import cv2

        paths = []
        for i, (h, w) in enumerate(shapes):
            p = str(tmp_path / f"img{i}.png")
            cv2.imwrite(p, np.full((h, w, 3), i * 10, np.uint8))
            paths.append(p)
        return paths

    def test_bucketing_and_padding(self, tmp_path):
        paths = self._imgs(tmp_path, [(100, 200)] * 3 + [(50, 60)] * 2)
        batches = list(pipe.inference_batches(paths, batch_size=2))
        shapes = sorted(b["images"].shape for b in batches)
        assert shapes == [(2, 50, 60, 3), (2, 100, 200, 3), (2, 100, 200, 3)]
        padded = [b for b in batches if "pad" in b]
        assert len(padded) == 1 and padded[0]["pad"] == 1
        assert len(padded[0]["paths"]) == 1


def make_voc_root(tmp_path, n_images=16, size=(100, 120)):
    import cv2

    root = tmp_path / "VOC"
    for d in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (root / d).mkdir(parents=True, exist_ok=True)
    ids = []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        name = f"{i:06d}"
        ids.append(name)
        img = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "JPEGImages" / f"{name}.jpg"), img)
        _write_xml(root / "Annotations" / f"{name}.xml",
                   [("dog", 0, 20, 20, 80, 70)], w=size[1], h=size[0])
    (root / "ImageSets/Main/train.txt").write_text("\n".join(ids) + "\n")
    return str(root)


class TestTrainBatches:
    def test_shapes_and_multiscale(self, tmp_path):
        root = make_voc_root(tmp_path, n_images=6)
        pairs = list_split(root, "train")
        assert len(pairs) == 6
        sizes = {0: 64, 1: 96, 2: 64}
        batches = list(pipe.train_batches(
            pairs, class_names=("cat", "dog"), anchors=((1, 1), (3, 3)),
            num_classes=2, net_size=64, batch_size=2,
            rng=np.random.default_rng(0),
            size_for_batch=lambda bi: sizes[bi]))
        assert [b["images"].shape[1] for b in batches] == [64, 96, 64]
        b0 = batches[0]
        assert b0["obj_mask"].shape == (2, 2, 2, 2)
        assert b0["images"].dtype == np.float32
        assert b0["obj_mask"].sum() == 2  # one GT per image


class TestHostPreprocessMode:
    def test_uniform_batches_from_mixed_shapes(self, tmp_path):
        import cv2

        paths = []
        rng = np.random.default_rng(5)
        for i, (h, w) in enumerate([(100, 200), (50, 60), (80, 80),
                                    (120, 90), (33, 77)]):
            p = str(tmp_path / f"m{i}.png")
            cv2.imwrite(p, rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            paths.append(p)
        batches = list(pipe.inference_batches(paths, batch_size=2,
                                              net_size=96))
        # mixed shapes -> uniform (96, 96) float batches, order preserved
        assert [b["images"].shape for b in batches] == [(2, 96, 96, 3)] * 3
        assert all(b["images"].dtype == np.float32 for b in batches)
        got_paths = [p for b in batches for p in b["paths"]]
        assert got_paths == paths
        assert batches[-1]["pad"] == 1
        assert len(batches[0]["shapes"]) == 2


def test_cli_eval_mixed_image_sizes(tmp_path):
    """Real-VOC shape heterogeneity: eval must produce one batch shape
    (one jit bucket) and valid mAP output."""
    import cv2
    import json as _json

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    root = tmp_path / "VOC"
    for d in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (root / d).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    ids = []
    for i, (h, w) in enumerate([(100, 120), (90, 140), (130, 100),
                                (110, 110)]):
        name = f"{i:06d}"
        ids.append(name)
        cv2.imwrite(str(root / "JPEGImages" / f"{name}.jpg"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        _write_xml(root / "Annotations" / f"{name}.xml",
                   [("dog", 0, 20, 20, 70, 60)], w=w, h=h)
    (root / "ImageSets/Main/val.txt").write_text("\n".join(ids) + "\n")

    wpath = str(tmp_path / "w.weights")
    cfg = get_variant("tiny-voc")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(1)))

    import io as _io
    import contextlib

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", wpath, "--voc-root", str(root),
                  "--split", "val", "--batch", "3", "--precision", "fp32"])
    res = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert 0.0 <= res["map"] <= 1.0


class TestPRCurves:
    def test_return_curves(self):
        gt = {0: {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
                  "classes": np.array([0]), "difficult": np.zeros(1)}}
        dets = {0: [(0, 0.9, 0, 0, 10, 10),      # TP
                    (0, 0.5, 50, 50, 60, 60)]}   # FP
        r = evaluate(dets, gt, 1, return_curves=True)
        c = r["curves"][0]
        assert c["scores"] == [0.9, 0.5]
        assert c["recall"] == [1.0, 1.0]
        assert c["precision"] == [1.0, 0.5]
        # default path stays curve-free
        assert "curves" not in evaluate(dets, gt, 1)


class TestStretchTraining:
    def test_train_batches_stretch_geometry(self, tmp_path):
        """resize="stretch" (AlexeyAB letter_box=0 training): the image
        is plain-resized and the normalized GT boxes pass through
        unchanged (stretch-invariant), unlike letterbox which shifts
        them into the padded frame."""
        root = make_voc_root(tmp_path, n_images=2, size=(60, 120))
        pairs = list_split(root, "train")
        kw = dict(class_names=("cat", "dog"),
                  anchors=np.array([[1.0, 1.0], [2.0, 2.0]], np.float32),
                  num_classes=2, net_size=64, batch_size=2, workers=1,
                  shuffle=False)
        lb = next(pipe.train_batches(pairs, rng=np.random.default_rng(0),
                                     **kw))
        st = next(pipe.train_batches(pairs, rng=np.random.default_rng(0),
                                     resize="stretch", **kw))
        assert st["images"].shape == lb["images"].shape == (2, 64, 64, 3)
        # letterbox pads a 120x60 image top+bottom: gray rows at y=0;
        # stretch fills the full frame with image content
        assert np.allclose(lb["images"][0, 0], 0.5, atol=1e-3)
        assert not np.allclose(st["images"][0, 0], 0.5, atol=1e-3)
        # the GT box: make_voc_root puts a dog at pixels (20,20)-(80,70)
        # of a (h=60,w=120) image -> normalized center (0.4167, 0.75)
        iy, ix = np.nonzero(st["obj_mask"][0].sum(-1))
        # stretch: cell = floor(norm * grid); grid=2 -> cell (1, 0)
        assert (iy[0], ix[0]) == (1, 0)

    def test_grain_stretch_matches_thread_loader(self, tmp_path):
        import pytest

        pytest.importorskip("grain")
        from yolo_tpu.data.grain_pipeline import grain_train_batches

        root = make_voc_root(tmp_path, n_images=2, size=(60, 120))
        pairs = list_split(root, "train")
        kw = dict(class_names=("cat", "dog"),
                  anchors=np.array([[1.0, 1.0], [2.0, 2.0]], np.float32),
                  num_classes=2, net_size=64, batch_size=2)
        gb = next(iter(grain_train_batches(pairs, seed=1,
                                           resize="stretch", **kw)))
        tb = next(pipe.train_batches(pairs,
                                     rng=np.random.default_rng(1),
                                     workers=1, shuffle=False,
                                     resize="stretch", **kw))
        # same schema and the same stretch geometry (order may differ:
        # compare as sets of per-image tensors)
        assert gb["images"].shape == tb["images"].shape
        g0 = {gb["images"][i].tobytes() for i in range(2)}
        t0 = {tb["images"][i].tobytes() for i in range(2)}
        assert g0 == t0


@pytest.mark.quick
def test_voc_iou_plus_one_convention():
    """VOC matching uses the devkit's +1 pixel-inclusive IoU
    (VOCevaldet.m): a det at continuous IoU 0.475 / devkit IoU 0.515
    must match at the 0.5 threshold (code-review finding: the
    continuous convention flipped small-box matches vs published
    VOC2007 numbers)."""
    from yolo_tpu.eval.voc_map import (_iou_xyxy, _iou_xyxy_voc,
                                       evaluate)

    gt_box = np.array([[0.0, 0.0, 9.0, 9.0]])
    det_box = np.array([3.2, 0.0, 12.2, 9.0])
    cont = float(_iou_xyxy(det_box, gt_box)[0])
    voc = float(_iou_xyxy_voc(det_box, gt_box)[0])
    assert cont < 0.5 < voc
    r = evaluate({0: [(0, 0.9, *det_box)]},
                 {0: {"boxes": gt_box, "classes": np.array([0]),
                      "difficult": np.array([0])}}, 1)
    assert r["ap"][0] == pytest.approx(1.0, abs=1e-6)


def test_collect_detections_duplicate_paths():
    """Two sample ids sharing one image path (a COCO json with
    duplicate file_names) must BOTH receive the decoded detections —
    the last-wins dict left earlier ids undetected, silently deflating
    mAP (code-review finding)."""
    import cv2
    import jax.numpy as jnp

    from yolo_tpu.configs import get_variant
    from yolo_tpu.eval.runner import collect_detections
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph as g

    import tempfile

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
    p = f"{d}/one.png"
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    cfg = get_variant("tiny-voc", input_size=64)
    params = g.params_to_jax(g.fold_params(
        cfg.layers, dw.random_params(cfg.layers, np.random.default_rng(0)),
        cfg.bn_eps))
    samples = [(p, None), (p, None)]  # duplicate path, two ids
    dets = collect_detections(cfg, params, samples, batch=2,
                              eval_conf=0.05,
                              compute_dtype=jnp.float32)
    assert set(dets) == {0, 1}
    assert dets[0] == dets[1] and len(dets[0]) > 0
