"""VOC mAP evaluation — the parity gate metric (SURVEY.md §3.5;
BASELINE.json:2 'VOC mAP parity').

VOC2007 protocol: per class, detections sorted by score, greedy-matched
to GT at IoU >= 0.5 with the DEVKIT's +1 pixel-inclusive IoU
(VOCevaldet.m; each GT matched at most once, difficult GT ignored),
11-point interpolated AP; mAP = mean over classes. ``use_07_metric=False``
switches to the continuous AUC variant (VOC2010+).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _iou_xyxy(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Continuous IoU — the pycocotools bbox convention (COCO eval
    imports this; w = x2 - x1, no pixel inclusivity)."""
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    iw = np.maximum(ix2 - ix1, 0.0)
    ih = np.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    area_a = (box[2] - box[0]) * (box[3] - box[1])
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area_a + area_b - inter
    return np.where(union > 0, inter / union, 0.0)


def _iou_xyxy_voc(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """VOC devkit IoU (VOCevaldet.m / py-faster-rcnn voc_eval): the +1
    pixel-inclusive convention — iw = ixmax - ixmin + 1, areas
    (x2-x1+1)*(y2-y1+1). Published VOC2007 numbers use this; near the
    0.5 threshold small-box matches flip vs the continuous form
    (code-review finding), so the VOC evaluator must not silently use
    the COCO convention."""
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    iw = np.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = np.maximum(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih
    area_a = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    area_b = ((boxes[:, 2] - boxes[:, 0] + 1.0)
              * (boxes[:, 3] - boxes[:, 1] + 1.0))
    union = area_a + area_b - inter
    return np.where(union > 0, inter / union, 0.0)


def average_precision(recall: np.ndarray, precision: np.ndarray,
                      use_07_metric: bool = True) -> float:
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = precision[recall >= t].max() if np.any(recall >= t) else 0.0
            ap += p / 11.0
        return float(ap)
    # continuous: envelope + area under PR curve
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def evaluate(detections: Dict[int, List], ground_truth: Dict[int, Dict],
             num_classes: int, iou_thresh: float = 0.5,
             use_07_metric: bool = True,
             return_curves: bool = False) -> Dict:
    """detections: {image_id: [(class_id, score, x1, y1, x2, y2), ...]}
    ground_truth: {image_id: {'boxes' (G,4) xyxy pixel, 'classes' (G,),
                              'difficult' (G,)}}
    Returns {'map': float, 'ap': {class_id: ap}}; with
    return_curves=True also 'curves': {class_id: {'scores', 'recall',
    'precision'}} — the raw PR points behind each AP (analysis /
    threshold tuning).
    """
    aps = {}
    curves = {}
    for cls in range(num_classes):
        # collect per-class detections
        recs = []
        for img_id, dets in detections.items():
            for d in dets:
                if d[0] == cls:
                    recs.append((img_id, d[1], np.asarray(d[2:6], np.float64)))
        recs.sort(key=lambda r: -r[1])

        # per-image GT bookkeeping
        gt_cls = {}
        npos = 0
        for img_id, gt in ground_truth.items():
            mask = np.asarray(gt["classes"]) == cls
            boxes = np.asarray(gt["boxes"], np.float64)[mask]
            difficult = np.asarray(
                gt.get("difficult", np.zeros(len(mask))))[mask].astype(bool)
            gt_cls[img_id] = {"boxes": boxes, "difficult": difficult,
                              "matched": np.zeros(len(boxes), bool)}
            npos += int((~difficult).sum())

        if npos == 0:
            aps[cls] = float("nan")
            continue

        tp = np.zeros(len(recs))
        fp = np.zeros(len(recs))
        for i, (img_id, _score, box) in enumerate(recs):
            g = gt_cls.get(img_id)
            if g is None or len(g["boxes"]) == 0:
                fp[i] = 1
                continue
            ious = _iou_xyxy_voc(box, g["boxes"])
            j = int(np.argmax(ious))
            if ious[j] >= iou_thresh:
                if g["difficult"][j]:
                    continue  # ignore
                if not g["matched"][j]:
                    tp[i] = 1
                    g["matched"][j] = True
                else:
                    fp[i] = 1
            else:
                fp[i] = 1

        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(fp)
        recall = tp_cum / npos
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
        aps[cls] = average_precision(recall, precision, use_07_metric)
        if return_curves:
            curves[cls] = {
                "scores": [round(float(r[1]), 5) for r in recs],
                "recall": np.round(recall, 5).tolist(),
                "precision": np.round(precision, 5).tolist(),
            }

    valid = [v for v in aps.values() if not np.isnan(v)]
    out = {"map": float(np.mean(valid)) if valid else 0.0, "ap": aps}
    if return_curves:
        out["curves"] = curves
    return out
