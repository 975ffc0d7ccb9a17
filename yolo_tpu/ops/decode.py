"""On-device region-layer decode (SURVEY.md §2.1 'Decode').

The reference decodes on host in numpy after sess.run (SURVEY.md §3.1);
here decode is vectorized jnp *inside* the jitted graph — no host round
trip (BASELINE.json:5). Math pinned by YOLO9000 Fig.3 / darknet
region_layer semantics:

  bx = (sigmoid(tx) + cx) / W,  by = (sigmoid(ty) + cy) / H
  bw = pw * exp(tw) / W,        bh = ph * exp(th) / H
  conf = sigmoid(to), p = softmax(tc), score = conf * p

No tw/th clamp — matches the oracle exactly (SURVEY.md §7.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode(logits: jnp.ndarray, anchors, num_classes: int):
    """logits: (B, H, W, A*(5+C)) raw head output.

    Returns:
      boxes  (B, H*W*A, 4)  (cx, cy, w, h) normalized to net space
      scores (B, H*W*A, C)  conf * class prob
    Compute in fp32 regardless of input dtype (parity gate, SURVEY.md §7.2).
    """
    b, h, w, _ = logits.shape
    a = len(anchors)
    t = logits.astype(jnp.float32).reshape(b, h, w, a, 5 + num_classes)
    anchors = jnp.asarray(anchors, dtype=jnp.float32)  # (A, 2) cell units

    cx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    cy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    bx = (jax.nn.sigmoid(t[..., 0]) + cx) / w
    by = (jax.nn.sigmoid(t[..., 1]) + cy) / h
    bw = anchors[None, None, None, :, 0] * jnp.exp(t[..., 2]) / w
    bh = anchors[None, None, None, :, 1] * jnp.exp(t[..., 3]) / h
    conf = jax.nn.sigmoid(t[..., 4])
    probs = jax.nn.softmax(t[..., 5:], axis=-1)
    scores = conf[..., None] * probs
    boxes = jnp.stack([bx, by, bw, bh], axis=-1)
    return boxes.reshape(b, -1, 4), scores.reshape(b, -1, num_classes)


def decode_yolo(head_logits, anchors_px, masks, num_classes: int,
                net_size: int, scales=None, new_coords=None,
                gaussian=None):
    """YOLOv3-family [yolo] decode, all heads merged (darknet
    yolo_layer semantics — sigmoid xy/conf, exp wh on PIXEL anchors,
    independent sigmoid class probs; no softmax, no tw/th clamp).

      head_logits: sequence of (B, Hs, Ws, As*(5+C)) raw head outputs
                   (As*(9+C) for gaussian heads)
      anchors_px:  full anchor list, pixel units of the net input
      masks:       per-head index tuples into anchors_px
      scales:      per-head scale_x_y (yolov4 grid-sensitivity fix:
                   xy = sigmoid(t)*s - (s-1)/2); default all 1.0
      new_coords:  per-head scaled-yolov4 new_coords flags (the head
                   conv already applied logistic, so all values arrive
                   in [0,1]: xy uses v directly, wh = 4*v^2*anchor,
                   conf/class are raw); default all False
      gaussian:    per-head [Gaussian_yolo] flags (gaussian_yolo_layer:
                   INTERLEAVED per-anchor channels
                   [x, ux, y, uy, w, uw, h, uh, obj, cls...] —
                   get_gaussian_yolo_box reads x/y/w/h at entries
                   0/2/4/6 and the uncertainties sit at 1/3/5/7; box
                   math as [yolo]; score = sigmoid(obj) * sigmoid(cls)
                   * (1 - mean(sigmoid(uc))) — the uc_aver factor of
                   get_gaussian_yolo_detections); default all False

    Returns boxes (B, N, 4) xywh and scores (B, N, C) normalized to net
    space, N = sum over heads of Hs*Ws*As — same convention as decode(),
    so the NMS/un-letterbox path is shared. fp32 throughout.
    """
    scales = scales or [1.0] * len(masks)
    new_coords = new_coords or [False] * len(masks)
    gaussian = gaussian or [False] * len(masks)
    all_boxes, all_scores = [], []
    for logits, mask, s_xy, nc, ga in zip(head_logits, masks, scales,
                                          new_coords, gaussian):
        b, h, w, _ = logits.shape
        a = len(mask)
        ch = (9 if ga else 5) + num_classes
        t = logits.astype(jnp.float32).reshape(b, h, w, a, ch)
        if ga:
            # interleaved layout: remap the means to [x y w h ...] so
            # the shared box math applies (entries 0/2/4/6)
            t_box = t[..., jnp.asarray([0, 2, 4, 6])]
            boxes = decode_head_boxes(t_box, anchors_px, mask, s_xy,
                                      net_size)
            conf = jax.nn.sigmoid(t[..., 8])
            probs = jax.nn.sigmoid(t[..., 9:])
            uc = jax.nn.sigmoid(t[..., jnp.asarray([1, 3, 5, 7])])
            uc_aver = jnp.mean(uc, axis=-1)
            scores = (conf * (1.0 - uc_aver))[..., None] * probs
            all_boxes.append(boxes.reshape(b, -1, 4))
            all_scores.append(scores.reshape(b, -1, num_classes))
            continue
        boxes = decode_head_boxes(t, anchors_px, mask, s_xy, net_size,
                                  new_coords=nc)
        conf = t[..., 4] if nc else jax.nn.sigmoid(t[..., 4])
        probs = t[..., 5:] if nc else jax.nn.sigmoid(t[..., 5:])
        scores = conf[..., None] * probs
        all_boxes.append(boxes.reshape(b, -1, 4))
        all_scores.append(scores.reshape(b, -1, num_classes))
    return (jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1))


def decode_head_boxes(t, anchors_px, mask, s_xy: float, net_size: int,
                      new_coords: bool = False):
    """(B,H,W,A,5+C) fp32 head activations -> (B,H,W,A,4) normalized
    xywh boxes (the [yolo] box math, shared by decode_yolo and the
    training loss's ignore-mask decode). new_coords=True switches to
    the scaled-yolov4 box math (AlexeyAB yolo_layer.c get_yolo_box:
    input already logistic-activated by the head conv; xy skips the
    sigmoid, wh = (2v)^2 * anchor instead of exp)."""
    _, h, w, _, _ = t.shape
    anch = jnp.asarray(anchors_px, jnp.float32)[jnp.asarray(mask)]
    cx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    cy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    off = (s_xy - 1.0) / 2.0
    vx = t[..., 0] if new_coords else jax.nn.sigmoid(t[..., 0])
    vy = t[..., 1] if new_coords else jax.nn.sigmoid(t[..., 1])
    bx = (vx * s_xy - off + cx) / w
    by = (vy * s_xy - off + cy) / h
    if new_coords:
        bw = (4.0 * jnp.square(t[..., 2])
              * anch[None, None, None, :, 0] / net_size)
        bh = (4.0 * jnp.square(t[..., 3])
              * anch[None, None, None, :, 1] / net_size)
    else:
        bw = anch[None, None, None, :, 0] * jnp.exp(t[..., 2]) / net_size
        bh = anch[None, None, None, :, 1] * jnp.exp(t[..., 3]) / net_size
    return jnp.stack([bx, by, bw, bh], axis=-1)
