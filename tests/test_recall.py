"""darknet `detector recall` (eval/recall.py): objectness NMS +
proposal-recall accounting pinned against an independent loop
transcription of validate_detector_recall / do_nms_obj, decode
consistency with the production decode paths, GT geometry mapping,
and the CLI e2e."""

import json
import os
import re

import numpy as np
import pytest

from yolo_tpu.eval import recall as rc


# ---------------------------------------------------------------------------
# loop reference: literal validate_detector_recall over (box, obj)
# candidates, center-format box_iou math, NO pre-filter (the [region]
# path feeds all boxes into do_nms_obj)
# ---------------------------------------------------------------------------

def _box_iou_xywh(a, b):
    """box.c box_iou on (cx, cy, w, h)."""
    def overlap(x1, w1, x2, w2):
        l1, l2 = x1 - w1 / 2, x2 - w2 / 2
        r1, r2 = x1 + w1 / 2, x2 + w2 / 2
        return min(r1, r2) - max(l1, l2)
    iw = overlap(a[0], a[2], b[0], b[2])
    ih = overlap(a[1], a[3], b[1], b[3])
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def _reference_recall(boxes_xywh, obj, gt_xywh, thresh, nms, iou_thresh):
    """validate_detector_recall's per-image loop, transcribed: do_nms_obj
    over ALL candidates (descending stable sort, strict > suppression),
    then proposals/correct/total/sum_best_iou over obj > thresh."""
    boxes = [tuple(map(float, b)) for b in boxes_xywh]
    obj = [float(o) for o in obj]
    order = sorted(range(len(obj)), key=lambda i: -obj[i])
    for ii in range(len(order)):
        i = order[ii]
        if obj[i] == 0:
            continue
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            if obj[j] == 0:
                continue
            if _box_iou_xywh(boxes[i], boxes[j]) > nms:
                obj[j] = 0.0
    proposals = sum(1 for o in obj if o > thresh)
    correct, total, sum_iou = 0, 0, 0.0
    for t in gt_xywh:
        total += 1
        best = 0.0
        for i in range(len(boxes)):
            if obj[i] > thresh:
                best = max(best, _box_iou_xywh(boxes[i], tuple(t)))
        sum_iou += best
        if best > iou_thresh:
            correct += 1
    return proposals, correct, total, sum_iou


def _xywh_to_xyxy(b):
    b = np.asarray(b, np.float64)
    return np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                     b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], -1)


class TestNmsObjectness:
    def test_greedy_hand_case(self):
        # three stacked boxes + one far box: the top-objectness box
        # suppresses its two >0.4-IoU overlaps, the far one survives
        boxes = np.array([[0.5, 0.5, 0.2, 0.2],
                          [0.51, 0.5, 0.2, 0.2],
                          [0.5, 0.52, 0.2, 0.2],
                          [0.9, 0.9, 0.1, 0.1]])
        obj = np.array([0.6, 0.9, 0.5, 0.3])
        out = rc.nms_objectness(_xywh_to_xyxy(boxes), obj, 0.4)
        assert out[1] == 0.9 and out[3] == 0.3  # winners untouched
        assert out[0] == 0.0 and out[2] == 0.0  # overlaps zeroed

    def test_strict_greater_boundary(self):
        # IoU exactly == nms threshold must NOT suppress (strict >)
        boxes = np.array([[0.0, 0.0, 2.0, 1.0],   # xyxy [-1,-.5,1,.5]
                          [1.0, 0.0, 2.0, 1.0]])  # IoU = 1/3
        obj = np.array([0.9, 0.8])
        out = rc.nms_objectness(_xywh_to_xyxy(boxes), obj, 1.0 / 3.0)
        assert out[1] == 0.8
        out = rc.nms_objectness(_xywh_to_xyxy(boxes), obj,
                                1.0 / 3.0 - 1e-9)
        assert out[1] == 0.0

    def test_matches_loop_reference_random(self):
        rng = np.random.default_rng(7)
        for trial in range(20):
            n = int(rng.integers(1, 40))
            boxes = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                              rng.uniform(0.05, 0.5, n),
                              rng.uniform(0.05, 0.5, n)], -1)
            obj = rng.uniform(0, 1, n)
            got = rc.nms_objectness(_xywh_to_xyxy(boxes), obj, 0.4)
            # reference: loop do_nms_obj only (no GT)
            _, _, _, _ = 0, 0, 0, 0.0
            ref_obj = [float(o) for o in obj]
            order = sorted(range(n), key=lambda i: -ref_obj[i])
            for ii in range(n):
                i = order[ii]
                if ref_obj[i] == 0:
                    continue
                for jj in range(ii + 1, n):
                    j = order[jj]
                    if ref_obj[j] == 0:
                        continue
                    if _box_iou_xywh(boxes[i], boxes[j]) > 0.4:
                        ref_obj[j] = 0.0
            np.testing.assert_allclose(got, ref_obj, atol=1e-12)


class TestRecallImage:
    def test_hand_case_perfect_proposals(self):
        # proposals exactly on the GT -> recall 1.0, avg IoU 1.0
        gt = np.array([[0.1, 0.1, 0.4, 0.5], [0.6, 0.6, 0.9, 0.9]])
        boxes = np.array([[0.25, 0.3, 0.3, 0.4],   # == gt[0] in xywh
                          [0.75, 0.75, 0.3, 0.3]])  # == gt[1]
        obj = np.array([0.8, 0.7])
        p, c, t, s = rc.recall_image(boxes, obj, gt)
        assert (p, c, t) == (2, 2, 2)
        assert s == pytest.approx(2.0)

    def test_below_thresh_boxes_ignored(self):
        gt = np.array([[0.1, 0.1, 0.4, 0.5]])
        boxes = np.array([[0.25, 0.3, 0.3, 0.4]])
        p, c, t, s = rc.recall_image(boxes, np.array([0.0005]), gt,
                                     thresh=0.001)
        assert (p, c, t, s) == (0, 0, 1, 0.0)

    def test_no_gt_counts_proposals_only(self):
        boxes = np.array([[0.5, 0.5, 0.2, 0.2]])
        p, c, t, s = rc.recall_image(boxes, np.array([0.9]),
                                     np.zeros((0, 4)))
        assert (p, c, t, s) == (1, 0, 0, 0.0)

    def test_prefilter_equivalence_vs_reference(self):
        """recall_image pre-filters to obj > thresh before NMS; the
        literal darknet [region] path NMSes ALL boxes first. The module
        docstring argues equivalence — verify it on random draws with
        many below-threshold candidates."""
        rng = np.random.default_rng(3)
        for trial in range(15):
            n = int(rng.integers(5, 60))
            boxes = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                              rng.uniform(0.05, 0.6, n),
                              rng.uniform(0.05, 0.6, n)], -1)
            # half the candidates land below threshold
            obj = np.where(rng.uniform(0, 1, n) < 0.5,
                           rng.uniform(0, 0.3, n), rng.uniform(0.3, 1, n))
            m = int(rng.integers(1, 5))
            gt_xywh = np.stack([rng.uniform(0.2, 0.8, m),
                                rng.uniform(0.2, 0.8, m),
                                rng.uniform(0.1, 0.4, m),
                                rng.uniform(0.1, 0.4, m)], -1)
            gt_xyxy = _xywh_to_xyxy(gt_xywh)
            got = rc.recall_image(boxes, obj, gt_xyxy, thresh=0.3,
                                  nms=0.4, iou_thresh=0.5)
            ref = _reference_recall(boxes, obj, gt_xywh, 0.3, 0.4, 0.5)
            assert got[:3] == ref[:3]
            assert got[3] == pytest.approx(ref[3], abs=1e-12)


class TestDecodeObjectness:
    def test_region_obj_is_score_sum(self):
        """[region] decode: scores = conf * softmax(classes), so the
        class sum recovers objectness — and the boxes must be the
        production decode()'s boxes exactly."""
        from yolo_tpu.configs import get_variant
        from yolo_tpu.ops.decode import decode

        cfg = get_variant("tiny-voc").with_input_size(96)
        rng = np.random.default_rng(0)
        h = w = 96 // 32
        logits = rng.normal(0, 1, (2, h, w, len(cfg.anchors)
                                   * (5 + cfg.num_classes))).astype(
                                       np.float32)
        boxes, obj = rc.decode_boxes_objectness(cfg, logits)
        ref_boxes, ref_scores = decode(logits, cfg.anchors,
                                       cfg.num_classes)
        np.testing.assert_allclose(np.asarray(boxes),
                                   np.asarray(ref_boxes), atol=1e-6)
        np.testing.assert_allclose(np.asarray(obj),
                                   np.asarray(ref_scores).sum(-1),
                                   atol=1e-5)

    def test_yolo_obj_matches_saturated_class_score(self, tmp_path):
        """[yolo] decode with a saturated single-class logit: score =
        sigmoid(obj) * sigmoid(40) == objectness, pinning the obj
        channel position and sigmoid; boxes match decode_yolo."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.ops.decode import decode_yolo

        cfg_path = tmp_path / "one.cfg"
        cfg_path.write_text("""
[net]
width=64
height=64
channels=3

[convolutional]
filters=18
size=1
stride=32
activation=linear

[yolo]
mask=0,1,2
anchors=10,14, 23,27, 37,58
classes=1
num=3
""")
        cfg = config_from_cfg(str(cfg_path))
        rng = np.random.default_rng(1)
        logits = [rng.normal(0, 1, (2, 2, 2, 18)).astype(np.float32)]
        logits[0] = logits[0].reshape(2, 2, 2, 3, 6)
        logits[0][..., 5] = 40.0  # sigmoid(40) == 1.0 in fp32
        logits[0] = logits[0].reshape(2, 2, 2, 18)
        boxes, obj = rc.decode_boxes_objectness(cfg, logits)
        ref_boxes, ref_scores = decode_yolo(
            logits, cfg.anchors, [hd.mask for hd in cfg.yolo_heads],
            cfg.num_classes, cfg.input_hw,
            scales=[hd.scale_xy for hd in cfg.yolo_heads])
        np.testing.assert_allclose(np.asarray(boxes),
                                   np.asarray(ref_boxes), atol=1e-6)
        np.testing.assert_allclose(np.asarray(obj),
                                   np.asarray(ref_scores)[..., 0],
                                   atol=1e-6)


class TestGtGeometry:
    def test_stretch_is_plain_normalize(self):
        gt = {"boxes": np.array([[10.0, 5.0, 60.0, 45.0]]),
              "difficult": np.array([False]),
              "width": 120, "height": 90}
        out = rc._gt_net_norm(gt, (64, 64), "stretch")
        np.testing.assert_allclose(
            out, [[10 / 120, 5 / 90, 60 / 120, 45 / 90]])

    def test_letterbox_matches_geometry_helper(self):
        from yolo_tpu.ops.letterbox import letterbox_geometry

        gt = {"boxes": np.array([[10.0, 5.0, 60.0, 45.0]]),
              "difficult": np.array([False]),
              "width": 120, "height": 90}
        out = rc._gt_net_norm(gt, (64, 64), "letterbox")
        scale, _rh, _rw, px, py = letterbox_geometry(90, 120, (64, 64))
        exp = np.array([[(10 * scale + px) / 64, (5 * scale + py) / 64,
                         (60 * scale + px) / 64, (45 * scale + py) / 64]])
        np.testing.assert_allclose(out, exp)

    def test_difficult_dropped(self):
        gt = {"boxes": np.array([[10.0, 5.0, 60.0, 45.0],
                                 [0.0, 0.0, 20.0, 20.0]]),
              "difficult": np.array([False, True]),
              "width": 120, "height": 90}
        assert rc._gt_net_norm(gt, (64, 64), "stretch").shape == (1, 4)


def test_recall_unreadable_image_gt_counts_as_missed(tmp_path, capsys):
    """An image the loader cannot decode still carries GT: its boxes
    count in `total` with zero correct — matching cmd_eval, where a
    skipped image's GT scores as FN (code-review finding: skipping it
    entirely deflated the denominator; darknet hard-errors instead)."""
    import glob

    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    wpath = str(tmp_path / "tiny.weights")
    cfg = get_variant("tiny-voc")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)),
            seen=100)
    root = make_voc_root(tmp_path, n_images=4, size=(80, 90))
    victim = sorted(glob.glob(os.path.join(root, "JPEGImages", "*")))[0]
    with open(victim, "wb") as f:
        f.write(b"not an image at all")
    cli.main(["recall", "--model", "tiny-voc", "--input-size", "96",
              "--weights", wpath, "--voc-root", root,
              "--split", "train", "--batch", "4", "--precision", "fp32"])
    cap = capsys.readouterr()
    res = json.loads(cap.out.strip().splitlines()[-1])
    assert res["total"] == 4          # all 4 GT boxes, incl. the bad image's
    assert res["images"] == 3         # only 3 actually scored
    assert "could not be read" in cap.err


def test_recall_cli_e2e(tmp_path, capsys):
    """`recall` e2e on a synthetic VOC set: darknet's cumulative line
    format on stderr, one summary JSON on stdout, total == the
    non-difficult GT count."""
    from tests.test_cli import tiny_weights  # noqa: F401 (fixture)
    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    wpath = str(tmp_path / "tiny.weights")
    cfg = get_variant("tiny-voc")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)),
            seen=100)
    root = make_voc_root(tmp_path, n_images=4, size=(80, 90))
    cli.main(["recall", "--model", "tiny-voc", "--input-size", "96",
              "--weights", wpath, "--voc-root", root,
              "--split", "train", "--batch", "4", "--precision", "fp32"])
    cap = capsys.readouterr()
    res = json.loads(cap.out.strip().splitlines()[-1])
    assert res["total"] == 4 and res["images"] == 4
    assert 0.0 <= res["recall"] <= 1.0
    assert res["correct"] <= res["total"]
    # darknet's fprintf layout, cumulative, one line per image
    lines = [l for l in cap.err.splitlines() if "RPs/Img" in l]
    assert len(lines) == 4
    pat = re.compile(r"^\s*\d+\s+\d+\s+\d+\tRPs/Img: \d+\.\d{2}\t"
                     r"IOU: \d+\.\d{2}%\tRecall:\d+\.\d{2}%$")
    for l in lines:
        assert pat.match(l), l
    # the last line's totals agree with the JSON summary
    m = re.match(r"^\s*(\d+)\s+(\d+)\s+(\d+)\t", lines[-1])
    assert (int(m.group(2)), int(m.group(3))) == (res["correct"],
                                                  res["total"])
