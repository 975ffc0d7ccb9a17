"""Loop-level numpy oracle for the region loss (independent of the
vectorized jnp implementation it tests — SURVEY.md §4.2.4)."""

from __future__ import annotations

import numpy as np

from yolo_tpu.ops.numpy_ref import iou_xywh, sigmoid, softmax


def region_loss_np(logits, targets, anchors, num_classes, cfg, seen,
                   tree=None):
    b, s, _, _ = logits.shape
    a = len(anchors)
    c = num_classes
    t = logits.reshape(b, s, s, a, 5 + c).astype(np.float64)
    anchors = np.asarray(anchors, dtype=np.float64)
    parts = {k: 0.0 for k in ("coord", "obj", "noobj", "class", "warmup")}

    for bi in range(b):
        gt = [targets["gt_boxes"][bi][g] for g in range(len(targets["gt_mask"][bi]))
              if targets["gt_mask"][bi][g] > 0]
        for j in range(s):
            for i in range(s):
                for ai in range(a):
                    v = t[bi, j, i, ai]
                    sx, sy = sigmoid(v[0]), sigmoid(v[1])
                    tw, th = v[2], v[3]
                    conf = sigmoid(v[4])
                    probs = softmax(v[5:])
                    pbox = np.array([
                        (sx + i) / s, (sy + j) / s,
                        anchors[ai, 0] * np.exp(tw) / s,
                        anchors[ai, 1] * np.exp(th) / s,
                    ])
                    assigned = targets["obj_mask"][bi, j, i, ai] > 0
                    best_iou = max((iou_xywh(pbox, g) for g in gt), default=0.0)
                    if assigned:
                        tc = targets["tcoord"][bi, j, i, ai]
                        w = targets["coord_w"][bi, j, i, ai]
                        parts["coord"] += cfg.coord_scale * w * (
                            (sx - tc[0]) ** 2 + (sy - tc[1]) ** 2 +
                            (tw - tc[2]) ** 2 + (th - tc[3]) ** 2)
                        iou_t = iou_xywh(pbox, targets["tiou_boxes"][bi, j, i, ai])
                        tgt = iou_t if cfg.rescore else 1.0
                        parts["obj"] += cfg.object_scale * (tgt - conf) ** 2
                        tcls = targets["tcls"][bi, j, i, ai]
                        if tree is not None:
                            # YOLO9000: squared error within each
                            # sibling-softmax group on the target's
                            # root path (groups off the path untouched)
                            from yolo_tpu.ops.numpy_ref import tree_softmax

                            cond = tree_softmax(v[5:], tree)
                            acc = 0.0
                            node = int(tcls)
                            while node >= 0:
                                members = list(tree.group_members(
                                    tree.node_group[node]))
                                oh = np.zeros(len(members))
                                oh[members.index(node)] = 1.0
                                acc += np.sum((cond[members] - oh) ** 2)
                                node = tree.parents[node]
                            parts["class"] += cfg.class_scale * acc
                        else:
                            onehot = np.zeros(c)
                            onehot[tcls] = 1.0
                            parts["class"] += cfg.class_scale * np.sum((probs - onehot) ** 2)
                    else:
                        if best_iou < cfg.iou_thresh:
                            parts["noobj"] += cfg.noobject_scale * conf ** 2
                        if seen < cfg.warmup_seen:
                            parts["warmup"] += cfg.warmup_scale * (
                                (sx - 0.5) ** 2 + (sy - 0.5) ** 2 + tw ** 2 + th ** 2)
    parts = {k: v / b for k, v in parts.items()}
    return sum(parts.values()), parts


def _bce_np(logit, target):
    return max(logit, 0.0) - logit * target + np.log1p(np.exp(-abs(logit)))


def _cls_np(logit, tk, nc, cfg):
    """One class element: MSE (new_coords heads), focal (paper form,
    alpha=0.5 gamma=2 — darknet's constants), or plain BCE."""
    if nc:
        return 0.5 * (logit - tk) ** 2
    if getattr(cfg, "focal_loss", False):
        p = sigmoid(logit)
        pt = tk * p + (1.0 - tk) * (1.0 - p)
        return 0.5 * (1.0 - pt) ** 2 * _bce_np(logit, tk)
    return _bce_np(logit, tk)


def _iou_variant_np(p, g, kind, eps=1e-9):
    """Scalar IoU/GIoU/DIoU/CIoU oracle for two xywh boxes."""
    px1, py1, px2, py2 = (p[0] - p[2] / 2, p[1] - p[3] / 2,
                          p[0] + p[2] / 2, p[1] + p[3] / 2)
    gx1, gy1, gx2, gy2 = (g[0] - g[2] / 2, g[1] - g[3] / 2,
                          g[0] + g[2] / 2, g[1] + g[3] / 2)
    iw = max(0.0, min(px2, gx2) - max(px1, gx1))
    ih = max(0.0, min(py2, gy2) - max(py1, gy1))
    inter = iw * ih
    union = p[2] * p[3] + g[2] * g[3] - inter
    iou = inter / (union + eps)
    if kind == "iou":
        return iou
    cw = max(px2, gx2) - min(px1, gx1)
    ch = max(py2, gy2) - min(py1, gy1)
    if kind == "giou":
        area_c = cw * ch + eps
        return iou - (area_c - union) / area_c
    rho2 = (p[0] - g[0]) ** 2 + (p[1] - g[1]) ** 2
    c2 = cw ** 2 + ch ** 2 + eps
    if kind == "diou":
        return iou - rho2 / c2
    v = (4.0 / np.pi ** 2) * (np.arctan(g[2] / (g[3] + eps))
                              - np.arctan(p[2] / (p[3] + eps))) ** 2
    alpha = v / (1.0 - iou + v + eps)
    return iou - rho2 / c2 - alpha * v


def gaussian_nll_np(x, mu, sigma, eps=1e-9):
    """Gaussian YOLOv3 NLL oracle: -log(N(x|mu, sigma^2) + eps), the
    variance stabilized by the same eps (arXiv:1904.04620 eq. 9)."""
    var = sigma * sigma + eps
    pdf = np.exp(-(x - mu) ** 2 / (2.0 * var)) / np.sqrt(
        2.0 * np.pi * var)
    return -np.log(pdf + eps)


def yolo_loss_np(head_logits, targets, anchors_px, masks, num_classes,
                 net_size, cfg, scales=None, new_coords=None,
                 gaussian=None):
    """Loop-level numpy oracle for the yolov3 multi-head loss
    (train/loss.py::yolo_loss), incl. the yolov4 scale_x_y variant and
    the scaled-yolov4 new_coords heads (inputs already
    logistic-activated; 0.5*MSE obj/class terms — see YoloLossConfig)."""
    anchors_px = np.asarray(anchors_px, dtype=np.float64)
    c = num_classes
    b = head_logits[0].shape[0]
    parts = {k: 0.0 for k in ("coord", "obj", "noobj", "class")}
    scales = scales or [1.0] * len(masks)
    new_coords = new_coords or [False] * len(masks)
    gaussian = gaussian or [False] * len(masks)

    for h, (logits, mask, s_xy, nc) in enumerate(zip(head_logits, masks,
                                                     scales, new_coords)):
        _, s, _, _ = logits.shape
        a = len(mask)
        ga = gaussian[h]
        if ga:
            # interleaved (9+C): remap to [x y w h obj cls...] + sigmas
            raw = logits.reshape(b, s, s, a, 9 + c).astype(np.float64)
            t = np.concatenate([raw[..., [0, 2, 4, 6]], raw[..., 8:]],
                               axis=-1)
            sig_all = sigmoid(raw[..., [1, 3, 5, 7]])
        else:
            t = logits.reshape(b, s, s, a, 5 + c).astype(np.float64)
        for bi in range(b):
            gt = [targets["gt_boxes"][bi][g]
                  for g in range(len(targets["gt_mask"][bi]))
                  if targets["gt_mask"][bi][g] > 0]
            gt_cls = [int(targets["gt_cls"][bi][g])
                      for g in range(len(targets["gt_mask"][bi]))
                      if targets["gt_mask"][bi][g] > 0
                      ] if "gt_cls" in targets else []
            for j in range(s):
                for i in range(s):
                    for ai in range(a):
                        v = t[bi, j, i, ai]
                        pw, ph = anchors_px[mask[ai]]
                        off = (s_xy - 1.0) / 2.0
                        if nc:
                            pbox = np.array([
                                (v[0] * s_xy - off + i) / s,
                                (v[1] * s_xy - off + j) / s,
                                4.0 * v[2] * v[2] * pw / net_size,
                                4.0 * v[3] * v[3] * ph / net_size,
                            ])
                        else:
                            pbox = np.array([
                                (sigmoid(v[0]) * s_xy - off + i) / s,
                                (sigmoid(v[1]) * s_xy - off + j) / s,
                                pw * np.exp(v[2]) / net_size,
                                ph * np.exp(v[3]) / net_size,
                            ])
                        assigned = targets[f"obj_mask_{h}"][bi, j, i, ai] > 0
                        best_iou = max((iou_xywh(pbox, g) for g in gt),
                                       default=0.0)
                        if assigned:
                            tc = targets[f"tcoord_{h}"][bi, j, i, ai]
                            w = targets[f"coord_w_{h}"][bi, j, i, ai]
                            kind = getattr(cfg, "iou_loss", "mse")
                            if ga:
                                # Gaussian NLL over the encoded coords,
                                # weighted by (2 - w*h)
                                sg = sig_all[bi, j, i, ai]
                                mux = sigmoid(v[0]) * s_xy - off
                                muy = sigmoid(v[1]) * s_xy - off
                                nll = (gaussian_nll_np(tc[0], mux, sg[0])
                                       + gaussian_nll_np(tc[1], muy,
                                                         sg[1])
                                       + gaussian_nll_np(tc[2], v[2],
                                                         sg[2])
                                       + gaussian_nll_np(tc[3], v[3],
                                                         sg[3]))
                                parts["coord"] += w * nll
                            elif kind != "mse":
                                gbox = targets[f"tbox_{h}"][bi, j, i, ai]
                                parts["coord"] += (
                                    cfg.iou_normalizer
                                    * (1.0 - _iou_variant_np(pbox, gbox,
                                                             kind)))
                            elif s_xy == 1.0:
                                xy = (_bce_np(v[0], tc[0])
                                      + _bce_np(v[1], tc[1]))
                                parts["coord"] += w * (
                                    xy + 0.5 * ((v[2] - tc[2]) ** 2
                                                + (v[3] - tc[3]) ** 2))
                            else:
                                px = sigmoid(v[0]) * s_xy - off
                                py = sigmoid(v[1]) * s_xy - off
                                xy = 0.5 * ((px - tc[0]) ** 2
                                            + (py - tc[1]) ** 2)
                                parts["coord"] += w * (
                                    xy + 0.5 * ((v[2] - tc[2]) ** 2
                                                + (v[3] - tc[3]) ** 2))
                            # classic AlexeyAB: cls_normalizer scales
                            # objectness; modern (obj_normalizer set):
                            # roles split (see YoloLossConfig)
                            onm = getattr(cfg, "obj_normalizer", None)
                            cn = getattr(cfg, "cls_normalizer", 1.0)
                            on = cn if onm is None else onm
                            cls_n = 1.0 if onm is None else cn
                            parts["obj"] += on * (
                                0.5 * (1.0 - v[4]) ** 2 if nc
                                else _bce_np(v[4], 1.0))
                            cls = targets[f"tcls_{h}"][bi, j, i, ai]
                            for k in range(c):
                                tk = 1.0 if k == cls else 0.0
                                parts["class"] += cls_n * _cls_np(
                                    v[5 + k], tk, nc, cfg)
                        elif (getattr(cfg, "truth_thresh", 1.0) < 1.0
                              and best_iou > cfg.truth_thresh):
                            # multi-truth pass: positive toward the
                            # best truth at this anchor's own cell
                            onm = getattr(cfg, "obj_normalizer", None)
                            cn = getattr(cfg, "cls_normalizer", 1.0)
                            on = cn if onm is None else onm
                            cls_n = 1.0 if onm is None else cn
                            bg = int(np.argmax([iou_xywh(pbox, g)
                                                for g in gt]))
                            gbox, gcls = gt[bg], gt_cls[bg]
                            parts["obj"] += on * (
                                0.5 * (1.0 - v[4]) ** 2 if nc
                                else _bce_np(v[4], 1.0))
                            for k in range(c):
                                tk = 1.0 if k == gcls else 0.0
                                parts["class"] += cls_n * _cls_np(
                                    v[5 + k], tk, nc, cfg)
                            kind = getattr(cfg, "iou_loss", "mse")
                            if kind != "mse":
                                parts["coord"] += (
                                    cfg.iou_normalizer
                                    * (1.0 - _iou_variant_np(pbox, gbox,
                                                             kind)))
                            else:
                                txm = gbox[0] * s - i
                                tym = gbox[1] * s - j
                                twm = np.log(max(
                                    gbox[2] * net_size / pw, 1e-9))
                                thm = np.log(max(
                                    gbox[3] * net_size / ph, 1e-9))
                                if s_xy == 1.0:
                                    xy = (_bce_np(v[0], txm)
                                          + _bce_np(v[1], tym))
                                else:
                                    px = sigmoid(v[0]) * s_xy - off
                                    py = sigmoid(v[1]) * s_xy - off
                                    xy = 0.5 * ((px - txm) ** 2
                                                + (py - tym) ** 2)
                                wmt = 2.0 - gbox[2] * gbox[3]
                                parts["coord"] += wmt * (
                                    xy + 0.5 * ((v[2] - twm) ** 2
                                                + (v[3] - thm) ** 2))
                        elif best_iou < cfg.ignore_thresh:
                            onm = getattr(cfg, "obj_normalizer", None)
                            cn = getattr(cfg, "cls_normalizer", 1.0)
                            on = cn if onm is None else onm
                            parts["noobj"] += on * (
                                0.5 * v[4] ** 2 if nc
                                else _bce_np(v[4], 0.0))
    parts = {k: v / b for k, v in parts.items()}
    return sum(parts.values()), parts


def detection_loss_np(flat, targets, head):
    """Loop-level yolov1 loss oracle (paper eq. 3; independent of the
    vectorized train/loss.detection_loss). flat (B, F), targets from
    data.targets.encode_v1 (batched)."""
    s, n, c = head.side, head.num, head.classes
    b = flat.shape[0]
    t = flat.reshape(b, -1).astype(np.float64)
    parts = {k: 0.0 for k in ("coord", "obj", "noobj", "class")}
    for bi in range(b):
        probs = t[bi, :s * s * c].reshape(s * s, c)
        conf = t[bi, s * s * c:s * s * (c + n)].reshape(s * s, n)
        boxes = t[bi, s * s * (c + n):].reshape(s * s, n, head.coords)
        for i in range(s * s):
            row, col = i // s, i % s
            has_obj = targets["v1_obj"][bi, i] > 0
            if has_obj:
                gx, gy, gw, gh = targets["v1_box"][bi, i]
                # responsible predictor: live max-IoU vs the GT;
                # when every IoU is 0, darknet detection_layer.c falls
                # back to min box_rmse
                ious, rmses = [], []
                for j in range(n):
                    px = (boxes[i, j, 0] + col) / s
                    py = (boxes[i, j, 1] + row) / s
                    pw = boxes[i, j, 2] ** 2 if head.sqrt else boxes[i, j, 2]
                    ph = boxes[i, j, 3] ** 2 if head.sqrt else boxes[i, j, 3]
                    ious.append(iou_xywh(
                        np.array([px, py, pw, ph]),
                        np.array([gx, gy, gw, gh])))
                    rmses.append(np.sqrt(
                        (px - gx) ** 2 + (py - gy) ** 2
                        + (pw - gw) ** 2 + (ph - gh) ** 2))
                resp = (int(np.argmax(ious)) if max(ious) > 0
                        else int(np.argmin(rmses)))
                xr, yr = gx * s - col, gy * s - row
                tw = np.sqrt(gw) if head.sqrt else gw
                th = np.sqrt(gh) if head.sqrt else gh
                parts["coord"] += head.coord_scale * (
                    (boxes[i, resp, 0] - xr) ** 2
                    + (boxes[i, resp, 1] - yr) ** 2
                    + (boxes[i, resp, 2] - tw) ** 2
                    + (boxes[i, resp, 3] - th) ** 2)
                ct = ious[resp] if head.rescore else 1.0
                parts["obj"] += head.object_scale * (
                    (ct - conf[i, resp]) ** 2)
                for j in range(n):
                    if j != resp:
                        parts["noobj"] += head.noobject_scale * (
                            conf[i, j] ** 2)
                onehot = np.zeros(c)
                onehot[targets["v1_cls"][bi, i]] = 1.0
                parts["class"] += head.class_scale * np.sum(
                    (probs[i] - onehot) ** 2)
            else:
                for j in range(n):
                    parts["noobj"] += head.noobject_scale * (
                        conf[i, j] ** 2)
    parts = {k: v / b for k, v in parts.items()}
    return sum(parts.values()), parts
