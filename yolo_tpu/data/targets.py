"""Ground-truth encoder: boxes -> per-cell/per-anchor target tensors
(SURVEY.md §2.1 'Ground-truth encoder').

Darknet region-layer assignment semantics (region_layer.c behavior,
YOLO9000 §2): each GT box is assigned to the cell containing its center
and to the anchor with best IoU between the box's (w, h) and the anchor
prior, both placed at the origin. Targets are on the logit-activation
scale: (sigma(tx), sigma(ty)) in-cell offsets and (tw, th) = log(wh / prior).

Host-side numpy (runs in the data pipeline workers); the loss consumes the
resulting fixed-shape tensors on device.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import numpy as np

MAX_GT = 30  # fixed GT capacity per image (darknet uses 30 for v2-era)


def _wh_iou(w1, h1, w2, h2) -> float:
    inter = min(w1, w2) * min(h1, h2)
    union = w1 * h1 + w2 * h2 - inter
    return inter / union if union > 0 else 0.0


def _as_hw(v) -> tuple:
    """int -> (v, v); (h, w) kept (same convention as ops.letterbox.as_hw,
    inlined so the pipeline workers don't import jax-adjacent modules)."""
    if isinstance(v, (tuple, list)):
        return int(v[0]), int(v[1])
    return int(v), int(v)


def encode(gt_boxes: np.ndarray, gt_classes: np.ndarray, *, grid,
           anchors: Sequence, num_classes: int,
           max_gt: int = MAX_GT) -> Dict[str, np.ndarray]:
    """Encode one image's ground truth.

    gt_boxes: (G, 4) normalized (cx, cy, w, h) in [0,1]; gt_classes: (G,).
    grid: int (square) or (gh, gw) — rectangular nets have per-axis cell
    counts; darknet region_layer compares anchors against
    (truth.w*l.w, truth.h*l.h) and encodes tw = log(w*l.w/pw),
    th = log(h*l.h/ph), i.e. each axis uses its OWN grid extent.

    Returns fixed-shape arrays:
      obj_mask   (GH, GW, A)    1.0 where an anchor is responsible for a GT
      tcoord     (GH, GW, A, 4) targets (sx, sy, tw, th) on activation scale
      tcls       (GH, GW, A)    int32 class id (0 where unassigned)
      coord_w    (GH, GW, A)    darknet coord scale factor (2 - w*h)
      tiou_boxes (GH, GW, A, 4) the raw GT xywh for the rescore obj target
      gt_boxes   (max_gt, 4)  padded raw GT (for the noobj best-IoU mask)
      gt_mask    (max_gt,)    validity of the padded GT rows
    """
    (gh, gw), a = _as_hw(grid), len(anchors)
    anchors = np.asarray(anchors, dtype=np.float32)
    out = {
        "obj_mask": np.zeros((gh, gw, a), np.float32),
        "tcoord": np.zeros((gh, gw, a, 4), np.float32),
        "tcls": np.zeros((gh, gw, a), np.int32),
        "coord_w": np.zeros((gh, gw, a), np.float32),
        "tiou_boxes": np.zeros((gh, gw, a, 4), np.float32),
        "gt_boxes": np.zeros((max_gt, 4), np.float32),
        "gt_mask": np.zeros((max_gt,), np.float32),
    }
    g = 0
    for box, cls in zip(np.asarray(gt_boxes, np.float64), gt_classes):
        cx, cy, w, h = box
        if w <= 0 or h <= 0 or g >= max_gt:
            continue
        out["gt_boxes"][g] = box
        out["gt_mask"][g] = 1.0
        g += 1
        # darknet fill_truth_detection constrains x,y to [0,1]
        # BEFORE the cell computation — without the low clamp a
        # center off-image to the left/top wraps the numpy index to
        # the opposite grid edge (code-review finding)
        ci = min(max(int(cx * gw), 0), gw - 1)
        cj = min(max(int(cy * gh), 0), gh - 1)
        # best anchor by wh-IoU at origin, in cell units (per-axis grid)
        ious = [_wh_iou(w * gw, h * gh, pw, ph) for pw, ph in anchors]
        best = int(np.argmax(ious))
        out["obj_mask"][cj, ci, best] = 1.0
        out["tcoord"][cj, ci, best] = (
            cx * gw - ci,                      # sigma(tx) target
            cy * gh - cj,                      # sigma(ty) target
            np.log(max(w * gw / anchors[best, 0], 1e-9)),
            np.log(max(h * gh / anchors[best, 1], 1e-9)),
        )
        out["tcls"][cj, ci, best] = int(cls)
        out["coord_w"][cj, ci, best] = 2.0 - w * h
        out["tiou_boxes"][cj, ci, best] = box
    return out


def encode_batch(batch_boxes, batch_classes, **kw) -> Dict[str, np.ndarray]:
    encoded = [encode(b, c, **kw) for b, c in zip(batch_boxes, batch_classes)]
    return {k: np.stack([e[k] for e in encoded]) for k in encoded[0]}


# ---------------------------------------------------------------------------
# yolov3 family: multi-head assignment (darknet yolo_layer semantics)
# ---------------------------------------------------------------------------

MAX_GT_V3 = 90  # darknet yolo_layer reads up to 90 truths per image


def encode_yolo(gt_boxes: np.ndarray, gt_classes: np.ndarray, *,
                input_size, anchors_px: Sequence,
                masks: Sequence[Sequence[int]], strides: Sequence[int],
                max_gt: int = MAX_GT_V3,
                assign_iou_thresh: float = 1.0) -> Dict[str, np.ndarray]:
    """Encode one image's GT for the yolov3 multi-head loss.
    input_size: int or (net_h, net_w) — rectangular nets get per-axis
    grids (net/stride) and pixel wh via the matching net extent
    (darknet delta_yolo_box: tw = log(truth.w*net.w / anchor_w)).

    Darknet yolo_layer assignment: each GT box picks the best anchor by
    wh-IoU at origin over ALL anchors (pixel units); EVERY head whose
    mask contains that anchor receives the target at the cell containing
    the box center on its own grid (each darknet [yolo] layer checks the
    best anchor against its mask independently — with the official
    yolov3-tiny masks (3,4,5)/(1,2,3), anchor 3 trains both heads).
    assign_iou_thresh < 1 additionally assigns EVERY anchor whose
    wh-IoU with the truth exceeds it (AlexeyAB [yolo] iou_thresh,
    yolov4.cfg: 0.213 — multi-positive assignment).

    Returns flat keys per head h (loss/pipeline shard these like any
    other batch array):
      obj_mask_h (S,S,A)  tcoord_h (S,S,A,4)  tcls_h (S,S,A)
      coord_w_h  (S,S,A)  [coord scale 2 - w*h]
      tbox_h     (S,S,A,4) raw assigned GT xywh (CIoU box loss)
    plus shared gt_boxes (max_gt, 4) / gt_mask (max_gt,) for the
    ignore-threshold objectness mask and gt_cls (max_gt,) for the
    truth_thresh multi-truth pass (train/loss.py).
    """
    net_h, net_w = _as_hw(input_size)
    anchors_px = np.asarray(anchors_px, dtype=np.float32)
    out: Dict[str, np.ndarray] = {
        "gt_boxes": np.zeros((max_gt, 4), np.float32),
        "gt_mask": np.zeros((max_gt,), np.float32),
        "gt_cls": np.zeros((max_gt,), np.int32),
    }
    grids = [(net_h // st, net_w // st) for st in strides]
    for h, (mask, (sh, sw)) in enumerate(zip(masks, grids)):
        a = len(mask)
        out[f"obj_mask_{h}"] = np.zeros((sh, sw, a), np.float32)
        out[f"tcoord_{h}"] = np.zeros((sh, sw, a, 4), np.float32)
        out[f"tcls_{h}"] = np.zeros((sh, sw, a), np.int32)
        out[f"coord_w_{h}"] = np.zeros((sh, sw, a), np.float32)
        out[f"tbox_{h}"] = np.zeros((sh, sw, a, 4), np.float32)

    # anchor index -> [(head, slot), ...]: darknet checks each [yolo]
    # layer's mask independently, so shared anchors train EVERY owner
    anchor_homes: Dict[int, list] = {}
    for h, mask in enumerate(masks):
        for slot, ai in enumerate(mask):
            anchor_homes.setdefault(int(ai), []).append((h, slot))

    g = 0
    for box, cls in zip(np.asarray(gt_boxes, np.float64), gt_classes):
        cx, cy, w, h_ = box
        if w <= 0 or h_ <= 0 or g >= max_gt:
            continue
        out["gt_boxes"][g] = box
        out["gt_mask"][g] = 1.0
        out["gt_cls"][g] = int(cls)
        g += 1
        ious = [_wh_iou(w * net_w, h_ * net_h, pw, ph)
                for pw, ph in anchors_px]
        best = int(np.argmax(ious))
        assign = {best} | {ai for ai, iou in enumerate(ious)
                           if iou > assign_iou_thresh}
        for anchor in assign:
            # empty when the anchor is in no mask (yolov3-tiny's anchor
            # 0: the truth trains no head, exactly as darknet behaves)
            for hd, slot in anchor_homes.get(anchor, ()):
                sh, sw = grids[hd]
                # low clamp too: see encode() (darknet constrains)
                ci = min(max(int(cx * sw), 0), sw - 1)
                cj = min(max(int(cy * sh), 0), sh - 1)
                out[f"obj_mask_{hd}"][cj, ci, slot] = 1.0
                out[f"tcoord_{hd}"][cj, ci, slot] = (
                    cx * sw - ci,
                    cy * sh - cj,
                    np.log(max(w * net_w / anchors_px[anchor, 0],
                               1e-9)),
                    np.log(max(h_ * net_h / anchors_px[anchor, 1],
                               1e-9)),
                )
                out[f"tcls_{hd}"][cj, ci, slot] = int(cls)
                out[f"coord_w_{hd}"][cj, ci, slot] = 2.0 - w * h_
                out[f"tbox_{hd}"][cj, ci, slot] = box
    return out


def encode_batch_yolo(batch_boxes, batch_classes, **kw) -> Dict[str, np.ndarray]:
    encoded = [encode_yolo(b, c, **kw)
               for b, c in zip(batch_boxes, batch_classes)]
    return {k: np.stack([e[k] for e in encoded]) for k in encoded[0]}


def _head_strides(model_cfg):
    return _head_strides_cached(model_cfg.layers)


@functools.lru_cache(maxsize=64)
def _head_strides_cached(layers):
    """Per-topology memo: encode_for runs once per image in the data
    pipeline's hot path, and the stride walk is a pure function of the
    (hashable) layer tuple."""
    from yolo_tpu.configs.darknet_cfg import layer_strides
    from yolo_tpu.configs.specs import YoloHead

    strides = layer_strides(layers)
    return tuple(strides[i] for i, l in enumerate(layers)
                 if isinstance(l, YoloHead))


def encode_for(model_cfg, boxes, classes,
               input_size=None) -> Dict[str, np.ndarray]:
    """Head-kind dispatch, one image (see encode_batch_for).
    input_size: int, (net_h, net_w), or None (the config's input_hw)."""
    size = input_size if input_size is not None else model_cfg.input_hw
    net_h, net_w = _as_hw(size)
    if model_cfg.head_kind == "yolo":
        return encode_yolo(boxes, classes, input_size=(net_h, net_w),
                           anchors_px=model_cfg.anchors,
                           masks=[h.mask for h in model_cfg.yolo_heads],
                           strides=_head_strides(model_cfg),
                           assign_iou_thresh=getattr(
                               model_cfg, "assign_iou_thresh", 1.0))
    if model_cfg.head_kind == "detection":
        return encode_v1(boxes, classes,
                         side=model_cfg.detection_head.side)
    return encode(boxes, classes, grid=(net_h // 32, net_w // 32),
                  anchors=model_cfg.anchors,
                  num_classes=model_cfg.num_classes)


def encode_batch_for(model_cfg, batch_boxes, batch_classes,
                     input_size=None) -> Dict[str, np.ndarray]:
    """Head-kind dispatch: encode a batch for ``model_cfg``'s loss
    (region single-head or yolo multi-head)."""
    encoded = [encode_for(model_cfg, b, c, input_size=input_size)
               for b, c in zip(batch_boxes, batch_classes)]
    return {k: np.stack([e[k] for e in encoded]) for k in encoded[0]}


def encode_v1(boxes: np.ndarray, classes: np.ndarray, side: int
              ) -> Dict[str, np.ndarray]:
    """YOLOv1 ground-truth encoder (paper arXiv:1506.02640 §2: the cell
    containing an object's center is responsible; ONE object per cell
    — the first box landing in a cell wins, later ones are dropped,
    matching darknet's fill_truth skip-if-occupied behavior).

    boxes (G, 4) normalized xywh; classes (G,) ints. Returns flat
    side²-indexed targets:
      v1_obj (S*S,)   cell has an object
      v1_box (S*S, 4) the object's normalized xywh
      v1_cls (S*S,)   its class (0 where empty)
    """
    s2 = side * side
    obj = np.zeros(s2, np.float32)
    tbox = np.zeros((s2, 4), np.float32)
    tcls = np.zeros(s2, np.int32)
    for g in range(len(boxes)):
        x, y, w, h = boxes[g]
        if w <= 0 or h <= 0:
            continue
        col = min(max(int(x * side), 0), side - 1)
        row = min(max(int(y * side), 0), side - 1)
        i = row * side + col
        if obj[i]:
            continue  # first object in the cell wins
        obj[i] = 1.0
        tbox[i] = (x, y, w, h)
        tcls[i] = classes[g]
    return {"v1_obj": obj, "v1_box": tbox, "v1_cls": tcls}
