"""Fixed-shape, on-device class-wise greedy NMS.

The reference runs TF's host-side NonMaxSuppression-equivalent in numpy
(SURVEY.md §3.1); TPUs need static shapes, so this is the O(K^2)
IoU-matrix + iterative-suppression formulation (SURVEY.md §7.2):

  per class: top-K by score -> pairwise IoU -> fori_loop over rank order,
  a box suppresses lower-ranked overlaps only if it is itself kept AND
  above the confidence threshold (matches numpy_ref.nms_per_class,
  including the (score desc, then lower index) tie-break, which lax.top_k
  guarantees).

Output is fixed-size (max_detections) arrays with a validity mask —
directly returnable from a jitted graph, batched via vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_iou_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """boxes (K, 4) xywh -> IoU matrix (K, K) in fp32."""
    b = boxes.astype(jnp.float32)
    x1 = b[:, 0] - b[:, 2] / 2
    y1 = b[:, 1] - b[:, 3] / 2
    x2 = b[:, 0] + b[:, 2] / 2
    y2 = b[:, 1] + b[:, 3] / 2
    iw = jnp.maximum(0.0, jnp.minimum(x2[:, None], x2[None, :]) -
                     jnp.maximum(x1[:, None], x1[None, :]))
    ih = jnp.maximum(0.0, jnp.minimum(y2[:, None], y2[None, :]) -
                     jnp.maximum(y1[:, None], y1[None, :]))
    inter = iw * ih
    area = b[:, 2] * b[:, 3]
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms_single_class(boxes, class_scores, k, conf_threshold, iou_threshold):
    """boxes (N,4), class_scores (N,) -> (boxes_k (K,4), scores_k (K,),
    keep (K,) bool) for one class."""
    scores_k, idx = lax.top_k(class_scores, k)
    boxes_k = boxes[idx]
    iou = pairwise_iou_xywh(boxes_k)
    rank = jnp.arange(k)

    def body(i, keep):
        active = keep[i] & (scores_k[i] >= conf_threshold)
        suppress = active & (iou[i] > iou_threshold) & (rank > i)
        return keep & ~suppress

    keep = lax.fori_loop(0, k, body, jnp.ones(k, dtype=bool))
    keep = keep & (scores_k >= conf_threshold)
    return boxes_k, scores_k, keep


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, *,
        conf_threshold: float, iou_threshold: float,
        top_k: int = 128, max_detections: int = 100):
    """Class-wise NMS for ONE image.

    boxes (N, 4) xywh net-normalized; scores (N, C).
    Returns dict of fixed-shape arrays:
      boxes (D, 4), scores (D,), classes (D,) int32, valid (D,) bool
    sorted by score desc (D = max_detections).
    """
    n, c = scores.shape
    k = min(top_k, n)
    per_class = jax.vmap(
        functools.partial(_nms_single_class, k=k,
                          conf_threshold=conf_threshold,
                          iou_threshold=iou_threshold),
        in_axes=(None, 1))
    boxes_k, scores_k, keep = per_class(boxes, scores)   # (C, K, ...)

    flat_scores = jnp.where(keep, scores_k, -1.0).reshape(-1)       # (C*K,)
    flat_boxes = boxes_k.reshape(-1, 4)
    flat_classes = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.int32)[:, None], (c, k)).reshape(-1)

    d = min(max_detections, flat_scores.shape[0])
    best, sel = lax.top_k(flat_scores, d)
    return {
        "boxes": flat_boxes[sel],
        "scores": jnp.maximum(best, 0.0),
        "classes": flat_classes[sel],
        "valid": best >= 0.0,
    }


def nms_batch(boxes, scores, **kw):
    """(B, N, 4), (B, N, C) -> batched fixed-shape detections."""
    return jax.vmap(lambda b, s: nms(b, s, **kw))(boxes, scores)
