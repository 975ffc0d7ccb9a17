"""darknet -map's conf-threshold stats block (eval/voc_map.py
detection_stats): hand-derived TP/FP/FN + the avg-IoU-over-(TP+FP)
quirk, strict-> boundaries, difficult handling, and the CLI e2e via
--from-detections (format-exact console lines + JSON merge)."""

import json

import numpy as np
import pytest

from yolo_tpu.eval.voc_map import detection_stats


def _gt(img_boxes):
    """{img_id: [(cls, x1, y1, x2, y2, difficult)]} -> ground_truth."""
    out = {}
    for img_id, rows in img_boxes.items():
        out[img_id] = {
            "boxes": np.array([[r[1], r[2], r[3], r[4]] for r in rows],
                              np.float64).reshape(-1, 4),
            "classes": np.array([r[0] for r in rows], np.int64),
            "difficult": np.array([bool(r[5]) for r in rows]),
        }
    return out


class TestDetectionStats:
    def test_hand_case_with_avg_iou_quirk(self):
        # 4 images, one GT each: exact match (IoU 1.0, TP), shifted
        # match (IoU 0.714..., TP), far box (IoU 0.2, FP), missed GT
        # (FN); plus a duplicate on the matched GT (FP). avg IoU
        # divides by TP+FP — darknet's quirk.
        gt = _gt({i: [(0, 20, 20, 80, 70, 0)] for i in range(4)})
        dets = {
            0: [(0, 0.9, 20, 20, 80, 70),   # TP, IoU 1.0
                (0, 0.3, 20, 20, 80, 70)],  # duplicate -> FP
            1: [(0, 0.8, 30, 20, 90, 70)],  # TP, IoU 2500/3500
            2: [(0, 0.7, 60, 20, 120, 70)],  # IoU 0.2 -> FP
            3: [],
        }
        s = detection_stats(dets, gt, 1)
        assert (s["tp"], s["fp"], s["fn"]) == (2, 2, 2)
        assert s["precision"] == pytest.approx(0.5)
        assert s["recall"] == pytest.approx(0.5)
        assert s["f1"] == pytest.approx(0.5)
        assert s["avg_iou"] == pytest.approx((1.0 + 2500 / 3500) / 4)
        assert s["unique_truth_count"] == 4

    def test_conf_thresh_strictly_greater(self):
        gt = _gt({0: [(0, 20, 20, 80, 70, 0)]})
        dets = {0: [(0, 0.25, 20, 20, 80, 70)]}  # == thresh: excluded
        s = detection_stats(dets, gt, 1, conf_thresh=0.25)
        assert (s["tp"], s["fp"], s["fn"]) == (0, 0, 1)
        s = detection_stats(dets, gt, 1, conf_thresh=0.2499)
        assert (s["tp"], s["fp"], s["fn"]) == (1, 0, 0)

    def test_iou_thresh_strictly_greater_continuous(self):
        # continuous IoU exactly 0.5: [20,20,80,70] vs [20,20,80,45]
        # inter 60*25=1500, union 3000+1500-1500=3000 -> 0.5 -> FP
        gt = _gt({0: [(0, 20, 20, 80, 70, 0)]})
        dets = {0: [(0, 0.9, 20, 20, 80, 45)]}
        s = detection_stats(dets, gt, 1)
        assert (s["tp"], s["fp"]) == (0, 1)
        s = detection_stats(dets, gt, 1, iou_thresh=0.4999)
        assert (s["tp"], s["fp"]) == (1, 0)

    def test_best_match_no_second_best_fallback(self):
        # two overlapping GT; the higher-IoU one is already flagged by
        # a stronger detection -> the weaker det is FP even though the
        # second GT also clears the threshold (truth_index walk)
        gt = _gt({0: [(0, 20, 20, 80, 70, 0), (0, 25, 20, 85, 70, 0)]})
        dets = {0: [(0, 0.9, 20, 20, 80, 70),    # flags GT 0 (IoU 1.0)
                    (0, 0.8, 21, 20, 81, 70)]}   # best = GT 0 -> FP
        s = detection_stats(dets, gt, 1)
        assert (s["tp"], s["fp"], s["fn"]) == (1, 1, 1)

    def test_difficult_neither_tp_nor_fp(self):
        gt = _gt({0: [(0, 20, 20, 80, 70, 1)]})  # difficult only
        dets = {0: [(0, 0.9, 20, 20, 80, 70)]}
        s = detection_stats(dets, gt, 1)
        assert (s["tp"], s["fp"], s["fn"]) == (0, 0, 0)
        assert s["unique_truth_count"] == 0
        assert s["precision"] == 0.0 and s["recall"] == 0.0

    def test_difficult_does_not_steal_regular_match(self):
        # darknet keeps -difficult truths in a SEPARATE list consulted
        # only when no regular truth matched: a detection whose best
        # overlap is a difficult box still scores TP against a regular
        # box that also clears iou_thresh (advisor finding r3)
        gt = _gt({0: [(0, 20, 20, 80, 70, 1),     # difficult, IoU 1.0
                      (0, 25, 20, 85, 70, 0)]})   # regular, IoU ~0.74
        dets = {0: [(0, 0.9, 20, 20, 80, 70)]}
        s = detection_stats(dets, gt, 1)
        assert (s["tp"], s["fp"], s["fn"]) == (1, 0, 0)
        assert s["unique_truth_count"] == 1
        # the matched IoU credited is the REGULAR box's, not 1.0
        # (inter 55x50=2750, union 3000+3000-2750=3250)
        assert s["avg_iou"] == pytest.approx(2750.0 / 3250.0)

    def test_class_mismatch_is_fp(self):
        gt = _gt({0: [(1, 20, 20, 80, 70, 0)]})
        dets = {0: [(0, 0.9, 20, 20, 80, 70)]}
        s = detection_stats(dets, gt, 2)
        assert (s["tp"], s["fp"], s["fn"]) == (0, 1, 1)


def test_eval_stats_cli_e2e(tmp_path, capsys):
    """eval --stats --from-detections: the two validate_detector_map
    console lines (format-exact) + the JSON stats block, over a
    synthetic VOC set with hand-placed detections."""
    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant

    root = make_voc_root(tmp_path, n_images=4, size=(100, 120))
    names = get_variant("tiny-voc").class_names
    dog = names.index("dog")
    # make_voc_root GT: one dog xml-(20,20,80,70) per image, which the
    # VOC parser converts to 0-based (19,19,79,69)
    dets = [
        {"image_id": 0, "category_id": dog,
         "bbox": [19, 19, 60, 50], "score": 0.9},     # TP IoU 1.0
        {"image_id": 1, "category_id": dog,
         "bbox": [29, 19, 60, 50], "score": 0.8},     # TP IoU 5/7
        {"image_id": 2, "category_id": dog,
         "bbox": [59, 19, 60, 50], "score": 0.7},     # FP IoU 0.2
    ]
    det_file = tmp_path / "dets.json"
    det_file.write_text(json.dumps(dets))
    cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
              "--voc-root", root, "--split", "train",
              "--from-detections", str(det_file), "--stats"])
    cap = capsys.readouterr()
    res = json.loads(cap.out.strip().splitlines()[-1])
    st = res["stats"]
    assert (st["tp"], st["fp"], st["fn"]) == (2, 1, 2)
    assert st["avg_iou"] == pytest.approx((1.0 + 5 / 7) / 3, abs=1e-4)
    # the exact validate_detector_map line layout
    exp_iou = (1.0 + 5 / 7) / 3 * 100
    assert (" for conf_thresh = 0.25, precision = 0.67, "
            "recall = 0.50, F1-score = 0.57 ") in cap.err
    assert (f" for conf_thresh = 0.25, TP = 2, FP = 1, FN = 2, "
            f"average IoU = {exp_iou:2.2f} % ") in cap.err
