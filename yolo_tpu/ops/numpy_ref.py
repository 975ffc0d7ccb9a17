"""Pure-numpy reference implementations (oracles).

These are direct, loop-level transcriptions of the darknet semantics the
reference consumes (SURVEY.md §4.2.1: every JAX/Pallas op is golden-tested
against these). They are deliberately slow and obvious — the executable spec.

Sources of truth: darknet region_layer.c / reorg_layer.c / maxpool_layer.c
behavioral descriptions in SURVEY.md §2-§3 and the YOLO9000 paper
(arXiv:1612.08242). No code is copied from the (absent) reference tree.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x):
    # exp(-x) overflows for large negative x; the result saturates to
    # the correct limit (0.0), so the warning is noise by design —
    # suppress it HERE so real numeric regressions elsewhere still warn
    with np.errstate(over="ignore"):
        return 1.0 / (1.0 + np.exp(-x))


def softmax(x, axis=-1):
    x = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=axis, keepdims=True)


# ---------------------------------------------------------------------------
# reorg (darknet passthrough), transcribed from reorg_cpu index math with
# forward=0 — the flag yolov2.cfg's [reorg] stride=2 layer uses.
# NOTE: this is NOT space_to_depth (SURVEY.md §7.2 parity trap).
# ---------------------------------------------------------------------------

def reorg_nchw(x: np.ndarray, stride: int = 2) -> np.ndarray:
    """x: (B, C, H, W) -> (B, C*stride^2, H/stride, W/stride).

    Darknet layout is NCHW/flat; the scrambled flat buffer the real layer
    produces is reinterpreted as (C*s^2, H/s, W/s) by the next layer.
    """
    b, c, h, w = x.shape
    s = stride
    out_c = c // (s * s)
    out = np.empty(x.size, dtype=x.dtype)
    xf = x.reshape(-1)
    for bi in range(b):
        for k in range(c):
            for j in range(h):
                for i in range(w):
                    in_index = i + w * (j + h * (k + c * bi))
                    c2 = k % out_c
                    offset = k // out_c
                    w2 = i * s + offset % s
                    h2 = j * s + offset // s
                    out_index = w2 + w * s * (h2 + h * s * (c2 + out_c * bi))
                    # forward=0: out[in_index] = x[out_index]
                    out[in_index] = xf[out_index]
    return out.reshape(b, c * s * s, h // s, w // s)


def reorg_nhwc(x: np.ndarray, stride: int = 2) -> np.ndarray:
    """NHWC wrapper around the NCHW oracle."""
    y = reorg_nchw(np.ascontiguousarray(x.transpose(0, 3, 1, 2)), stride)
    return y.transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# maxpool with darknet padding (pads at the END with -inf for the
# size-2/stride-1 SAME case — tiny-YOLO layer 6, SURVEY.md §7.2)
# ---------------------------------------------------------------------------

def maxpool_nhwc(x: np.ndarray, size: int, stride: int) -> np.ndarray:
    """Darknet maxpool_layer: pad = size-1, window origin offset
    -(pad//2) — lead pad//2, trail the rest, fill -inf."""
    b, h, w, c = x.shape
    pad = size - 1
    lead = pad // 2
    oh = (h + pad - size) // stride + 1
    ow = (w + pad - size) // stride + 1
    # dtype-aware identity: np.full(-inf, dtype=int8) silently casts
    # to 0, disagreeing with ops/pool.py's iinfo-min int branch on
    # all-negative edge windows (code-review finding)
    fill = (np.iinfo(x.dtype).min
            if np.issubdtype(x.dtype, np.integer) else -np.inf)
    xp = np.full((b, h + pad, w + pad, c), fill, dtype=x.dtype)
    xp[:, lead:lead + h, lead:lead + w, :] = x
    out = np.empty((b, oh, ow, c), dtype=x.dtype)
    for j in range(oh):
        for i in range(ow):
            win = xp[:, j * stride:j * stride + size, i * stride:i * stride + size, :]
            out[:, j, i, :] = win.max(axis=(1, 2))
    return out


# ---------------------------------------------------------------------------
# batch norm (inference) — eps pinned inside the sqrt (SURVEY.md §3.4)
# ---------------------------------------------------------------------------

def batchnorm(x, gamma, beta, mean, var, eps=1e-5):
    return gamma * (x - mean) / np.sqrt(var + eps) + beta


def fold_bn(kernel_hwio, gamma, beta, mean, var, eps=1e-5):
    """Fold inference BN into conv weight+bias:
    w' = w * g/sqrt(v+eps), b' = beta - mean * g/sqrt(v+eps) (SURVEY.md §3.4)."""
    scale = gamma / np.sqrt(var + eps)
    return kernel_hwio * scale[None, None, None, :], beta - mean * scale


# ---------------------------------------------------------------------------
# region-layer decode (YOLO9000 Fig.3 / SURVEY.md §2.1 'Decode')
# ---------------------------------------------------------------------------

def decode(logits: np.ndarray, anchors, num_classes: int):
    """logits: (H, W, A*(5+C)) raw conv output for ONE image.

    Returns (boxes, scores):
      boxes  (H*W*A, 4) as (cx, cy, w, h) normalized to [0, 1] net space
      scores (H*W*A, C) = sigmoid(obj) * softmax(classes)
    """
    h, w, _ = logits.shape
    a = len(anchors)
    t = logits.reshape(h, w, a, 5 + num_classes)
    anchors = np.asarray(anchors, dtype=np.float64)  # (A, 2) in cell units

    cx = np.arange(w, dtype=np.float64)[None, :, None]
    cy = np.arange(h, dtype=np.float64)[:, None, None]
    bx = (sigmoid(t[..., 0]) + cx) / w
    by = (sigmoid(t[..., 1]) + cy) / h
    # SURVEY.md §7.2 no-clamp policy: darknet does not clamp tw/th, so
    # neither do we — exp overflows to inf on extreme random logits
    # (test inputs, never trained nets) and downstream thresholding
    # still agrees with the jax path. Suppress the expected overflow
    # warning explicitly so a NEW warning would still surface.
    with np.errstate(over="ignore"):
        bw = anchors[None, None, :, 0] * np.exp(t[..., 2]) / w
        bh = anchors[None, None, :, 1] * np.exp(t[..., 3]) / h
    conf = sigmoid(t[..., 4])
    probs = softmax(t[..., 5:], axis=-1)
    scores = conf[..., None] * probs
    boxes = np.stack([bx, by, bw, bh], axis=-1)
    return boxes.reshape(-1, 4), scores.reshape(-1, num_classes)


# ---------------------------------------------------------------------------
# YOLO9000 hierarchical softmax tree (paper §4 'Hierarchical
# classification'; darknet .tree/.map file formats). Loop-level,
# independent of the vectorized ops/decode.py implementation.
# ---------------------------------------------------------------------------

def tree_softmax(logits_c: np.ndarray, tree) -> np.ndarray:
    """(C,) class logits -> conditional probs: one softmax per sibling
    group (configs.tree.SoftmaxTree group structure)."""
    out = np.zeros_like(logits_c, dtype=np.float64)
    for g in range(tree.n_groups):
        members = list(tree.group_members(g))
        out[members] = softmax(logits_c[members].astype(np.float64))
    return out


def tree_absolute(cond: np.ndarray, tree) -> np.ndarray:
    """Conditional -> absolute probs: product along each node's root
    path (paper: 'multiply the conditional probabilities along the
    path'). Recomputed per node from scratch — O(C * depth), obvious."""
    out = np.zeros_like(cond, dtype=np.float64)
    for i in range(len(cond)):
        p = 1.0
        node = i
        while node >= 0:
            p *= cond[node]
            node = tree.parents[node]
        out[i] = p
    return out


def tree_top_prediction(cond: np.ndarray, tree, thresh: float) -> int:
    """Greedy descent: at each split take the max-conditional node;
    stop when the cumulative path product would drop to <= thresh and
    predict the last accepted node (the root argmax is returned even
    below threshold — nothing shallower exists)."""
    group = 0
    p = 1.0
    result = -1
    while True:
        members = list(tree.group_members(group))
        vals = cond[members]
        node = members[int(np.argmax(vals))]
        mx = float(np.max(vals))
        if result < 0:
            result = node          # root argmax, unconditional
        if p * mx <= thresh:
            return result
        p *= mx
        result = node
        if tree.child_group[node] < 0:
            return result
        group = tree.child_group[node]


def decode_tree(logits: np.ndarray, anchors, tree, hier_thresh: float,
                tree_map=None):
    """Region decode for ONE image with the YOLO9000 class hierarchy.
    Box/conf math identical to decode(); class scores follow the tree:
    with tree_map, score_j = conf * absolute[map[j]]; without, the
    traversal's predicted node scores conf (one-hot over the tree)."""
    h, w, _ = logits.shape
    a = len(anchors)
    c = tree.n_nodes
    boxes, _ = decode(logits, anchors, c)
    t = logits.reshape(h, w, a, 5 + c).astype(np.float64)
    out_c = len(tree_map) if tree_map is not None else c
    scores = np.zeros((h, w, a, out_c), dtype=np.float64)
    for j in range(h):
        for i in range(w):
            for n in range(a):
                conf = sigmoid(t[j, i, n, 4])
                cond = tree_softmax(t[j, i, n, 5:], tree)
                if tree_map is not None:
                    absolute = tree_absolute(cond, tree)
                    for k, m in enumerate(tree_map):
                        scores[j, i, n, k] = conf * absolute[m]
                else:
                    node = tree_top_prediction(cond, tree, hier_thresh)
                    scores[j, i, n, node] = conf
    return boxes, scores.reshape(-1, out_c)


def decode_yolo(head_logits, anchors_px, masks, num_classes: int,
                net_size, scales=None, new_coords=None,
                gaussian=None):
    """YOLOv3 [yolo]-layer decode oracle for ONE image, loop-level
    (darknet yolo_layer semantics: sigmoid xy/conf, exp wh on pixel
    anchors, INDEPENDENT sigmoid class probs — no softmax; optional
    per-head yolov4 scale_x_y; optional per-head scaled-yolov4
    new_coords, where the head conv already applied logistic so xy/conf/
    class use the value directly and wh = (2v)^2 * anchor — AlexeyAB
    yolo_layer.c get_yolo_box).

      head_logits: list of (Hs, Ws, As*(5+C)) raw head outputs
                   (As*(9+C) for gaussian heads — AlexeyAB
                   gaussian_yolo_layer.c INTERLEAVES mean/sigma:
                   [x, ux, y, uy, w, uw, h, uh, obj, cls...];
                   get_gaussian_yolo_box reads x/y/w/h at entries
                   0/2/4/6, the uncertainties at 1/3/5/7; box math as
                   [yolo], score = sigmoid(obj)*sigmoid(cls)*
                   (1 - mean(sigmoid(uc))), the uc_aver factor)
      anchors_px:  full anchor list in net-input pixels
      masks:       per-head tuples of indices into anchors_px

    Returns (boxes (N, 4) xywh, scores (N, C)) normalized to net space,
    heads concatenated in order.
    """
    from yolo_tpu.ops.letterbox import as_hw

    net_h, net_w = as_hw(net_size)  # rect nets: bw /= net_w, bh /= net_h
    boxes_out, scores_out = [], []
    scales = scales or [1.0] * len(masks)
    new_coords = new_coords or [False] * len(masks)
    gaussian = gaussian or [False] * len(masks)
    for logits, mask, s_xy, nc, ga in zip(head_logits, masks, scales,
                                          new_coords, gaussian):
        h, w, _ = logits.shape
        a = len(mask)
        ch = (9 if ga else 5) + num_classes
        t = logits.reshape(h, w, a, ch).astype(np.float64)
        for j in range(h):
            for i in range(w):
                for n in range(a):
                    pw, ph = anchors_px[mask[n]]
                    off = (s_xy - 1.0) / 2.0
                    if ga:
                        # interleaved entries (get_gaussian_yolo_box):
                        # x=0, y=2, w=4, h=6; uncertainties 1/3/5/7
                        v = t[j, i, n]
                        bx = (sigmoid(v[0]) * s_xy - off + i) / w
                        by = (sigmoid(v[2]) * s_xy - off + j) / h
                        with np.errstate(over="ignore"):
                            bw = pw * np.exp(v[4]) / net_w
                            bh = ph * np.exp(v[6]) / net_h
                        uc_aver = sigmoid(v[[1, 3, 5, 7]]).mean()
                        conf = sigmoid(v[8]) * (1.0 - uc_aver)
                        probs = sigmoid(v[9:])
                        boxes_out.append([bx, by, bw, bh])
                        scores_out.append(conf * probs)
                        continue
                    tx, ty, tw, th = t[j, i, n, :4]
                    to = t[j, i, n, 4]
                    if nc:
                        bx = (tx * s_xy - off + i) / w
                        by = (ty * s_xy - off + j) / h
                        bw = 4.0 * tw * tw * pw / net_w
                        bh = 4.0 * th * th * ph / net_h
                        conf = to
                        probs = t[j, i, n, 5:].copy()
                    else:
                        bx = (sigmoid(tx) * s_xy - off + i) / w
                        by = (sigmoid(ty) * s_xy - off + j) / h
                        # same no-clamp policy as decode_region above
                        with np.errstate(over="ignore"):
                            bw = pw * np.exp(tw) / net_w
                            bh = ph * np.exp(th) / net_h
                        conf = sigmoid(to)
                        probs = sigmoid(t[j, i, n, 5:])
                    boxes_out.append([bx, by, bw, bh])
                    scores_out.append(conf * probs)
    return np.asarray(boxes_out), np.asarray(scores_out)


# ---------------------------------------------------------------------------
# IoU + greedy per-class NMS (darknet do_nms_sort behavior)
# ---------------------------------------------------------------------------

def iou_xywh(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two (cx, cy, w, h) boxes."""
    ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx2, by2 = b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    # inf-sized boxes (no-clamp exp overflow on random test logits,
    # SURVEY.md §7.2) give inf*0 -> nan here; both stacks agree after
    # thresholding, so silence only the expected invalid-op warning
    with np.errstate(invalid="ignore"):
        inter = iw * ih
        union = a[2] * a[3] + b[2] * b[3] - inter
        return inter / union if union > 0 else 0.0


def diou_nms_metric(a, b, beta: float) -> float:
    """AlexeyAB box.c box_diounms: IoU - (d/c)^beta with d = squared
    center distance, c = squared enclosing-box diagonal (c==0 -> IoU)."""
    ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx2, by2 = b[0] + b[2] / 2, b[1] + b[3] / 2
    ew = max(ax2, bx2) - min(ax1, bx1)
    eh = max(ay2, by2) - min(ay1, by1)
    c = ew * ew + eh * eh
    iou = iou_xywh(a, b)
    if c <= 0:
        return iou
    d = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
    return iou - (d / c) ** beta


def nms_per_class(boxes, scores, conf_threshold, iou_threshold,
                  kind: str = "greedy", beta: float = 0.6):
    """Greedy class-wise NMS.

    boxes (N, 4) xywh; scores (N, C). Deterministic tie-break: higher score
    first, then lower box index (SURVEY.md §7.2). Returns a list of
    (box_xywh, score, class_id) sorted by (score desc, class, index).
    kind="diou" suppresses on the DIoU-NMS metric (diou_nms_metric)
    instead of plain IoU.
    """
    n, c = scores.shape
    metric = (iou_xywh if kind == "greedy"
              else lambda a, b: diou_nms_metric(a, b, beta))
    out = []
    for cls in range(c):
        s = scores[:, cls]
        # stable sort by (-score, index)
        order = np.lexsort((np.arange(n), -s))
        suppressed = np.zeros(n, dtype=bool)
        for oi, i in enumerate(order):
            if s[i] < conf_threshold or suppressed[i]:
                continue
            out.append((boxes[i].copy(), float(s[i]), cls))
            for j in order[oi + 1:]:
                if not suppressed[j] and metric(boxes[i], boxes[j]) > iou_threshold:
                    suppressed[j] = True
    out.sort(key=lambda r: (-r[1], r[2]))
    return out


# ---------------------------------------------------------------------------
# letterbox (host oracle). Resize filter pinned to half-pixel-center
# bilinear == cv2 INTER_LINEAR == jax.image.resize('bilinear')
# (SURVEY.md §7.2 'resize-filter pinning'). Pad value 0.5 (gray 127.5).
# ---------------------------------------------------------------------------

def letterbox(img_u8: np.ndarray, net_w: int, net_h: int):
    """img_u8: (H, W, C) uint8 (C=3 RGB or C=1 grayscale) ->
    (net_h, net_w, C) float32 in [0,1].

    Returns (out, scale, pad_x, pad_y) where pad is in net pixels.
    """
    import cv2

    h, w = img_u8.shape[:2]
    c = 1 if img_u8.ndim == 2 else img_u8.shape[2]
    scale = min(net_w / w, net_h / h)
    rw, rh = int(round(w * scale)), int(round(h * scale))
    resized = cv2.resize(img_u8.astype(np.float32) / 255.0, (rw, rh),
                         interpolation=cv2.INTER_LINEAR)
    if resized.ndim == 2:
        resized = resized[..., None]   # cv2 drops the size-1 C axis
    out = np.full((net_h, net_w, c), 0.5, dtype=np.float32)
    px, py = (net_w - rw) // 2, (net_h - rh) // 2
    out[py:py + rh, px:px + rw, :] = resized
    return out, scale, px, py


def stretch_resize(img_u8: np.ndarray, net_w: int, net_h: int):
    """Plain (aspect-ignoring) resize oracle — the AlexeyAB-darknet
    default preprocessing (letter_box=0). (H, W, C) uint8 ->
    (net_h, net_w, C) float32 in [0,1]."""
    import cv2

    out = cv2.resize(img_u8.astype(np.float32) / 255.0, (net_w, net_h),
                     interpolation=cv2.INTER_LINEAR)
    return out[..., None] if out.ndim == 2 and img_u8.ndim == 3 else out


def unstretch_boxes(boxes_xywh: np.ndarray, img_w: int, img_h: int):
    """Inverse of stretch_resize: net-normalized xywh -> original-image
    pixel xyxy, clipped."""
    b = boxes_xywh.astype(np.float64).reshape(-1, 4)
    cx, cy = b[:, 0] * img_w, b[:, 1] * img_h
    bw, bh = b[:, 2] * img_w, b[:, 3] * img_h
    return np.stack([np.clip(cx - bw / 2, 0, img_w),
                     np.clip(cy - bh / 2, 0, img_h),
                     np.clip(cx + bw / 2, 0, img_w),
                     np.clip(cy + bh / 2, 0, img_h)], axis=-1)


def unletterbox_boxes(boxes_xywh: np.ndarray, scale: float, px: int, py: int,
                      net_w: int, net_h: int, img_w: int, img_h: int):
    """Map net-normalized xywh boxes back to original-image pixel xyxy."""
    b = boxes_xywh.astype(np.float64)
    cx = (b[:, 0] * net_w - px) / scale
    cy = (b[:, 1] * net_h - py) / scale
    bw = b[:, 2] * net_w / scale
    bh = b[:, 3] * net_h / scale
    x1 = np.clip(cx - bw / 2, 0, img_w)
    y1 = np.clip(cy - bh / 2, 0, img_h)
    x2 = np.clip(cx + bw / 2, 0, img_w)
    y2 = np.clip(cy + bh / 2, 0, img_h)
    return np.stack([x1, y1, x2, y2], axis=-1)


# ---------------------------------------------------------------------------
# yolov1 [detection] decode (paper arXiv:1506.02640 §2 + the darknet
# detection_layer flat layout — format-derived, reference tree absent).
# Loop-level, one image.
# ---------------------------------------------------------------------------

def decode_detection(flat: np.ndarray, side: int, num: int,
                     classes: int, sqrt: bool = True, coords: int = 4):
    """flat (side²·(classes+num·(1+coords)),) -> (boxes (side²·num, 4)
    normalized xywh, scores (side²·num, classes))."""
    flat = flat.astype(np.float64)
    boxes_out, scores_out = [], []
    for i in range(side * side):
        row, col = i // side, i % side
        for nn in range(num):
            conf = flat[side * side * classes + i * num + nn]
            bi = side * side * (classes + num) + (i * num + nn) * coords
            bx = (flat[bi + 0] + col) / side
            by = (flat[bi + 1] + row) / side
            bw = flat[bi + 2] ** 2 if sqrt else flat[bi + 2]
            bh = flat[bi + 3] ** 2 if sqrt else flat[bi + 3]
            probs = np.array([conf * flat[i * classes + j]
                              for j in range(classes)])
            boxes_out.append([bx, by, bw, bh])
            scores_out.append(probs)
    return np.asarray(boxes_out), np.asarray(scores_out)


def local_forward(x: np.ndarray, kernel: np.ndarray, bias: np.ndarray,
                  stride: int = 1, pad: int = 0, act: str = "leaky"):
    """darknet local_layer oracle, loop-level, ONE image:
    x (H, W, C); kernel (H', W', F, C, k, k) per-position filters;
    bias (H', W', F). Zero padding, leaky/linear activation."""
    h, w, c = x.shape
    oh, ow, f, _, k, _ = kernel.shape
    xp = np.zeros((h + 2 * pad, w + 2 * pad, c), dtype=np.float64)
    xp[pad:pad + h, pad:pad + w] = x
    out = np.zeros((oh, ow, f), dtype=np.float64)
    for j in range(oh):
        for i in range(ow):
            patch = xp[j * stride:j * stride + k,
                       i * stride:i * stride + k]      # (k, k, C)
            for ff in range(f):
                acc = 0.0
                for cc in range(c):
                    for ky in range(k):
                        for kx in range(k):
                            acc += (kernel[j, i, ff, cc, ky, kx]
                                    * patch[ky, kx, cc])
                out[j, i, ff] = acc + bias[j, i, ff]
    if act == "leaky":
        out = np.where(out > 0, out, 0.1 * out)
    return out
