"""COCO-style mAP@[.5:.95] evaluation (SURVEY.md §3.5 extension; the
full-YOLOv2 variant is COCO-80, BASELINE.json:8 — YOLO9000 Table 5
reports COCO AP, so the framework must be able to compute it).

Implements the pycocotools `bbox` protocol for the standard all-areas /
maxDets=100 cell:

* AP averaged over IoU thresholds 0.50:0.05:0.95 (``map``), plus the
  ``map50`` / ``map75`` slices;
* 101-point interpolated precision (precision envelope sampled at
  recalls linspace(0, 1, 101));
* greedy matching per detection (score-descending) to the *unmatched*
  same-class GT with the highest IoU >= threshold;
* ``iscrowd`` GT (carried in the ``difficult`` field) never counts as a
  false positive: a detection whose only qualifying overlap is a crowd
  region is dropped from the PR curve, and crowd IoU is computed as
  intersection / detection-area (pycocotools' crowd convention).

Deliberate simplification vs pycocotools (documented, not silent):
area-range breakdowns (small/medium/large) are not computed. The
maxDets cap follows pycocotools' actual implementation
(COCOeval.evaluateImg runs per category and truncates dt[0:maxDet]
there): top ``max_dets`` by score per image PER CLASS — note this
differs from the "100 detections per image" phrasing in the paper-style
summaries.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from yolo_tpu.eval.voc_map import _iou_xyxy

COCO_IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05).round(2)
_RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _crowd_iou(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """pycocotools crowd convention: intersection / detection area."""
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(ix2 - ix1, 0.0) * np.maximum(iy2 - iy1, 0.0)
    det_area = (box[2] - box[0]) * (box[3] - box[1])
    return np.where(det_area > 0, inter / max(det_area, 1e-12), 0.0)


def _ap_101pt(recall: np.ndarray, precision: np.ndarray) -> float:
    """101-point interpolated AP (precision envelope sampled on the
    fixed recall grid — COCO's `accumulate`)."""
    mpre = precision.copy()
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    # first detection index reaching each recall point
    idx = np.searchsorted(recall, _RECALL_POINTS, side="left")
    ok = idx < len(recall)
    return float(np.where(ok, mpre[np.minimum(idx, len(recall) - 1)],
                          0.0).sum() / len(_RECALL_POINTS))


def evaluate_coco(detections: Dict[int, List], ground_truth: Dict[int, Dict],
                  num_classes: int,
                  iou_thresholds: Optional[Sequence[float]] = None,
                  max_dets: int = 100) -> Dict:
    """Same input schema as `voc_map.evaluate`:
    detections: {image_id: [(class_id, score, x1, y1, x2, y2), ...]}
    ground_truth: {image_id: {'boxes' (G,4) xyxy pixel, 'classes' (G,),
                              'difficult' (G,)}}  (difficult == iscrowd)
    Returns {'map', 'map50', 'map75', 'ar' (average recall at max_dets,
    pycocotools AR@100), 'ap': {class_id: ap_over_ious}}.
    """
    thresholds = np.asarray(
        COCO_IOU_THRESHOLDS if iou_thresholds is None else iou_thresholds,
        np.float64)
    ap = np.full((len(thresholds), num_classes), np.nan)
    ar = np.full((len(thresholds), num_classes), np.nan)

    for cls in range(num_classes):
        # pycocotools maxDets: evaluateImg truncates per (image, class)
        recs = []
        for img_id, dets in detections.items():
            mine = sorted((d for d in dets if d[0] == cls),
                          key=lambda d: -d[1])[:max_dets]
            recs.extend((img_id, d[1], np.asarray(d[2:6], np.float64))
                        for d in mine)
        recs.sort(key=lambda r: -r[1])

        gt_cls = {}
        npos = 0
        for img_id, gt in ground_truth.items():
            mask = np.asarray(gt["classes"]) == cls
            boxes = np.asarray(gt["boxes"], np.float64)[mask]
            crowd = np.asarray(
                gt.get("difficult", np.zeros(len(mask))))[mask].astype(bool)
            gt_cls[img_id] = {"boxes": boxes[~crowd],
                              "crowd_boxes": boxes[crowd]}
            npos += int((~crowd).sum())
        if npos == 0:
            continue

        # IoUs once per (detection, class) — reused across all 10
        # thresholds (pycocotools computeIoU does the same hoisting)
        det_ious = []
        for img_id, _score, box in recs:
            g = gt_cls.get(img_id)
            det_ious.append((
                _iou_xyxy(box, g["boxes"])
                if g is not None and len(g["boxes"]) else None,
                float(_crowd_iou(box, g["crowd_boxes"]).max())
                if g is not None and len(g["crowd_boxes"]) else -1.0))

        for ti, thr in enumerate(thresholds):
            matched = {i: np.zeros(len(g["boxes"]), bool)
                       for i, g in gt_cls.items()}
            tp, fp = [], []
            for (img_id, _score, _box), (ious, crowd_iou) in zip(recs,
                                                                 det_ious):
                if ious is not None:
                    avail = np.where(matched[img_id], -1.0, ious)
                    j = int(np.argmax(avail))
                    if avail[j] >= thr:
                        matched[img_id][j] = True
                        tp.append(1.0)
                        fp.append(0.0)
                        continue
                if crowd_iou >= thr:
                    continue  # crowd hit: drop from the PR curve
                tp.append(0.0)
                fp.append(1.0)

            tp_c = np.cumsum(tp)
            fp_c = np.cumsum(fp)
            if len(tp_c) == 0:
                ap[ti, cls] = 0.0
                ar[ti, cls] = 0.0
                continue
            recall = tp_c / npos
            precision = tp_c / np.maximum(tp_c + fp_c, 1e-12)
            ap[ti, cls] = _ap_101pt(recall, precision)
            ar[ti, cls] = recall[-1]  # recall at max_dets

    def _mean(rows: np.ndarray) -> float:
        v = rows[~np.isnan(rows)]
        return float(v.mean()) if v.size else 0.0

    i50 = int(np.argmin(np.abs(thresholds - 0.5)))
    i75 = int(np.argmin(np.abs(thresholds - 0.75)))
    return {
        "map": _mean(ap),
        "map50": _mean(ap[i50]),
        "map75": _mean(ap[i75]),
        "ar": _mean(ar),
        "ap": {c: _mean(ap[:, c]) for c in range(num_classes)
               if not np.isnan(ap[:, c]).all()},
    }
