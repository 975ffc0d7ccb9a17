"""Fused detection head: decode + candidate selection + class-wise NMS
in one pass (BASELINE.json:5 'decode ... and class-wise NMS become
vectorized on-device kernels').

The reference decodes every box then thresholds on host (SURVEY.md §3.1).
The fused head exploits score = sigmoid(obj) * softmax(cls) <= sigmoid(obj):

  1. objectness sigmoid over all H*W*A boxes          (cheap, (B, N))
  2. top-KB boxes by objectness                        (small sort)
  3. decode + softmax ONLY those KB boxes              (~N/KB less VPU work)
  4. global top-K (box, class) candidates              (sort of KB*C, not N*C)
  5. same-class greedy suppression (Pallas kernel on TPU, XLA elsewhere)

EXACTNESS: identical to the reference decode+NMS whenever fewer than KB
boxes have objectness >= conf_threshold (score <= objectness, so no
dropped box could have passed the threshold) and fewer than K (box,
class) pairs clear it. Always true at production thresholds; the
reference path (ops/decode.py + ops/nms.py impl="xla") remains for
low-threshold PR-curve evaluation and parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from yolo_tpu.ops.nms import _geom, _package, _suppress


def detect_head(logits: jnp.ndarray, anchors, num_classes: int, *,
                conf_threshold: float, iou_threshold: float,
                pre_top_k: int = 256, max_detections: int = 100,
                use_pallas: bool = True, nms_kind: str = "greedy",
                beta_nms: float = 0.6):
    """logits (B, H, W, A*(5+C)) -> fixed-shape detections dict
    (boxes in net-normalized xywh)."""
    b, h, w, _ = logits.shape
    a = len(anchors)
    c = num_classes
    n = h * w * a
    t = logits.astype(jnp.float32).reshape(b, n, 5 + c)
    anchors_arr = jnp.asarray(anchors, dtype=jnp.float32)

    # 1-2: objectness prefilter
    conf_all = jax.nn.sigmoid(t[..., 4])                  # (B, N)
    kb = min(pre_top_k, n)
    conf_k, nidx = lax.top_k(conf_all, kb)                # (B, KB)
    tk = jnp.take_along_axis(t, nidx[..., None], axis=1)  # (B, KB, 5+C)

    # 3: decode the survivors (flat index n = (cj*W + ci)*A + ai)
    ai = nidx % a
    ci = (nidx // a) % w
    cj = nidx // (a * w)
    bx = (jax.nn.sigmoid(tk[..., 0]) + ci.astype(jnp.float32)) / w
    by = (jax.nn.sigmoid(tk[..., 1]) + cj.astype(jnp.float32)) / h
    pw = anchors_arr[ai, 0]
    ph = anchors_arr[ai, 1]
    bw = pw * jnp.exp(tk[..., 2]) / w
    bh = ph * jnp.exp(tk[..., 3]) / h
    boxes_kb = jnp.stack([bx, by, bw, bh], axis=-1)       # (B, KB, 4)
    probs = jax.nn.softmax(tk[..., 5:], axis=-1)
    scores_kb = conf_k[..., None] * probs                 # (B, KB, C)

    # 4: global top-K (box, class) candidates
    k = kb
    flat = scores_kb.reshape(b, kb * c)
    scores_k, idx = lax.top_k(flat, k)                    # (B, K)
    box_idx = idx // c
    classes_k = (idx % c).astype(jnp.int32)
    boxes_k = jnp.take_along_axis(boxes_kb, box_idx[..., None], axis=1)

    # 5: suppression + packaging (shared with ops/nms.py)
    keep = _suppress(_geom(boxes_k), scores_k, classes_k,
                     conf_threshold, iou_threshold, use_pallas=use_pallas,
                     kind=nms_kind, beta=beta_nms)
    return _package(boxes_k, scores_k, classes_k, keep, max_detections)


def detect_head_yolo(head_logits, anchors_px, masks, num_classes: int,
                     net_size, *, conf_threshold: float,
                     iou_threshold: float, pre_top_k: int = 256,
                     max_detections: int = 100, use_pallas: bool = True,
                     scales=None, nms_kind: str = "greedy",
                     beta_nms: float = 0.6, new_coords=None,
                     gaussian=None):
    """Fused yolov3 multi-head: objectness prefilter over ALL heads'
    boxes, then decode + sigmoid class scores for the survivors only.

    Same exactness envelope as detect_head: score = sigmoid(obj) *
    sigmoid(cls) <= sigmoid(obj), so no box that could clear
    conf_threshold is dropped while fewer than pre_top_k boxes have
    objectness >= threshold. For yolov3/COCO this skips the dense
    (B, 10647, 80) score tensor entirely (~29% of e2e time at batch 64,
    docs/PERF.md).

    new_coords: per-head scaled-yolov4 flags (head conv already applied
    logistic — conf/class/xy use values directly, wh = (2v)^2 * anchor).
    The prefilter envelope is unchanged: conf and probs stay in [0,1],
    so score <= conf still holds.

    gaussian: per-head [Gaussian_yolo] flags. Such heads are remapped
    at flatten time into the shared 5+C view: the interleaved means
    (entries 0/2/4/6) become xywh slots 0-3 and slot 4 carries the
    PRE-ACTIVATED confidence sigmoid(obj) * (1 - uc_aver) — classic
    box/class math applies downstream, only the conf activation is
    bypassed (the conf-direct flag new_coords heads also use). The
    envelope still holds: that conf stays in [0,1] and
    score = conf * sigmoid(cls) <= conf.

    net_size: int or (net_h, net_w) — rectangular nets normalize pw by
    net_w and ph by net_h, matching ops/decode.decode_head_boxes."""
    import numpy as np

    from yolo_tpu.ops.letterbox import as_hw

    net_h, net_w = as_hw(net_size)
    c = num_classes
    b = head_logits[0].shape[0]
    anchors_np = np.asarray(anchors_px, dtype=np.float32)

    # flatten all heads + per-box decode metadata (trace-time constants)
    scales = scales or [1.0] * len(masks)
    new_coords = new_coords or [False] * len(masks)
    gaussian = gaussian or [False] * len(masks)
    ts, cx_l, cy_l, gw_l, gh_l, pw_l, ph_l, sc_l, nc_l, cd_l = (
        [], [], [], [], [], [], [], [], [], [])
    for logits, mask, s_xy, nc, ga in zip(head_logits, masks, scales,
                                          new_coords, gaussian):
        _, h, w, _ = logits.shape
        a = len(mask)
        if ga:
            # [Gaussian_yolo]: remap the interleaved 9+C layout into
            # the shared 5+C view — means 0/2/4/6 -> xywh, slot 4 =
            # precomputed conf (sigmoid(obj) * (1 - uc_aver))
            raw = logits.astype(jnp.float32).reshape(b, h * w * a,
                                                     9 + c)
            uc = jnp.mean(jax.nn.sigmoid(
                raw[..., jnp.asarray([1, 3, 5, 7])]), axis=-1)
            conf = jax.nn.sigmoid(raw[..., 8]) * (1.0 - uc)
            ts.append(jnp.concatenate(
                [raw[..., jnp.asarray([0, 2, 4, 6])], conf[..., None],
                 raw[..., 9:]], axis=-1))
        else:
            ts.append(logits.astype(jnp.float32).reshape(b, h * w * a,
                                                         5 + c))
        jj, ii, aa = np.meshgrid(np.arange(h), np.arange(w),
                                 np.arange(a), indexing="ij")
        cx_l.append(ii.reshape(-1).astype(np.float32))
        cy_l.append(jj.reshape(-1).astype(np.float32))
        gw_l.append(np.full(h * w * a, w, np.float32))
        gh_l.append(np.full(h * w * a, h, np.float32))
        pw_l.append(anchors_np[np.asarray(mask), 0][aa.reshape(-1)])
        ph_l.append(anchors_np[np.asarray(mask), 1][aa.reshape(-1)])
        sc_l.append(np.full(h * w * a, s_xy, np.float32))
        nc_l.append(np.full(h * w * a, float(nc), np.float32))
        # conf-direct: slot 4 is already an activated confidence
        cd_l.append(np.full(h * w * a, float(nc or ga), np.float32))
    t = jnp.concatenate(ts, axis=1)                       # (B, N, 5+C)
    n = t.shape[1]
    cx = jnp.asarray(np.concatenate(cx_l))
    cy = jnp.asarray(np.concatenate(cy_l))
    gw = jnp.asarray(np.concatenate(gw_l))
    gh = jnp.asarray(np.concatenate(gh_l))
    pw = jnp.asarray(np.concatenate(pw_l))
    ph = jnp.asarray(np.concatenate(ph_l))
    sc = jnp.asarray(np.concatenate(sc_l))
    any_nc = any(new_coords)
    all_nc = all(new_coords)
    ncf = jnp.asarray(np.concatenate(nc_l))               # 1.0 = new_coords
    cds = [n or g for n, g in zip(new_coords, gaussian)]
    any_cd, all_cd = any(cds), all(cds)
    cdf = jnp.asarray(np.concatenate(cd_l))               # 1.0 = conf direct

    def _mix(nc_val, classic_val, nc_mask):
        """Per-box select; collapses to one branch when heads agree.
        jnp.where (not arithmetic blend) so a classic head's exp
        overflow can't poison a new_coords box with inf*0."""
        if all_nc:
            return nc_val
        if not any_nc:
            return classic_val
        return jnp.where(nc_mask > 0, nc_val, classic_val)

    if all_cd:
        conf_all = t[..., 4]
    elif not any_cd:
        conf_all = jax.nn.sigmoid(t[..., 4])
    else:
        conf_all = jnp.where(cdf[None, :] > 0, t[..., 4],
                             jax.nn.sigmoid(t[..., 4]))
    kb = min(pre_top_k, n)
    conf_k, nidx = lax.top_k(conf_all, kb)                # (B, KB)
    tk = jnp.take_along_axis(t, nidx[..., None], axis=1)  # (B, KB, 5+C)

    s_k = sc[nidx]
    nc_k = ncf[nidx]
    off = (s_k - 1.0) / 2.0
    vx = _mix(tk[..., 0], jax.nn.sigmoid(tk[..., 0]), nc_k)
    vy = _mix(tk[..., 1], jax.nn.sigmoid(tk[..., 1]), nc_k)
    bx = (vx * s_k - off + cx[nidx]) / gw[nidx]
    by = (vy * s_k - off + cy[nidx]) / gh[nidx]
    bw = _mix(4.0 * jnp.square(tk[..., 2]), jnp.exp(tk[..., 2]),
              nc_k) * pw[nidx] / net_w
    bh = _mix(4.0 * jnp.square(tk[..., 3]), jnp.exp(tk[..., 3]),
              nc_k) * ph[nidx] / net_h
    boxes_kb = jnp.stack([bx, by, bw, bh], axis=-1)       # (B, KB, 4)
    probs = _mix(tk[..., 5:], jax.nn.sigmoid(tk[..., 5:]),
                 nc_k[..., None])                         # v3: independent
    scores_kb = conf_k[..., None] * probs                 # (B, KB, C)

    k = kb
    flat = scores_kb.reshape(b, kb * c)
    scores_k, idx = lax.top_k(flat, k)
    box_idx = idx // c
    classes_k = (idx % c).astype(jnp.int32)
    boxes_k = jnp.take_along_axis(boxes_kb, box_idx[..., None], axis=1)

    keep = _suppress(_geom(boxes_k), scores_k, classes_k,
                     conf_threshold, iou_threshold, use_pallas=use_pallas,
                     kind=nms_kind, beta=beta_nms)
    return _package(boxes_k, scores_k, classes_k, keep, max_detections)


def detect_head_tree(logits: jnp.ndarray, anchors, tree, *,
                     conf_threshold: float, iou_threshold: float,
                     hier_thresh: float = 0.5, tree_map=None,
                     pre_top_k: int = 256, max_detections: int = 100,
                     use_pallas: bool = True, nms_kind: str = "greedy",
                     beta_nms: float = 0.6):
    """Fused YOLO9000 head: objectness prefilter, then the hierarchy
    math on the SURVIVORS only — skips the reference path's dense
    (B, N, n_nodes) score tensor (32 MB/image at 9k nodes on the
    real tree) and runs the greedy traversal on pre_top_k boxes.

    Traversal mode (tree_map=None): a box's detection score IS its
    objectness (ops/decode semantics), so the conf top-k candidate cut
    is EXACT — box/score/class-identical to decode+NMS whenever fewer
    than pre_top_k boxes clear conf_threshold (the usual envelope, and
    tighter: no class term can exceed conf).

    Map mode: score_j = conf * absolute[map[j]] <= conf — the same
    prefilter envelope as the softmax head, and the same global
    (box, class) top-K flatten, so multi-class boxes survive exactly
    as on the reference path at production thresholds."""
    from yolo_tpu.ops.decode import (tree_absolute_probs,
                                     tree_conditional_probs,
                                     tree_top_prediction)

    b, h, w, _ = logits.shape
    a = len(anchors)
    c = tree.n_nodes
    n = h * w * a
    t = logits.astype(jnp.float32).reshape(b, n, 5 + c)
    anchors_arr = jnp.asarray(anchors, dtype=jnp.float32)

    conf_all = jax.nn.sigmoid(t[..., 4])
    kb = min(pre_top_k, n)
    conf_k, nidx = lax.top_k(conf_all, kb)
    tk = jnp.take_along_axis(t, nidx[..., None], axis=1)

    ai = nidx % a
    ci = (nidx // a) % w
    cj = nidx // (a * w)
    bx = (jax.nn.sigmoid(tk[..., 0]) + ci.astype(jnp.float32)) / w
    by = (jax.nn.sigmoid(tk[..., 1]) + cj.astype(jnp.float32)) / h
    bw = anchors_arr[ai, 0] * jnp.exp(tk[..., 2]) / w
    bh = anchors_arr[ai, 1] * jnp.exp(tk[..., 3]) / h
    boxes_k = jnp.stack([bx, by, bw, bh], axis=-1)        # (B, KB, 4)

    cond = tree_conditional_probs(tk[..., 5:], tree)      # (B, KB, C)
    if tree_map is None:
        classes_k = tree_top_prediction(cond, tree, hier_thresh)
        scores_k = conf_k
    else:
        absolute = tree_absolute_probs(cond, tree)
        proj = absolute[..., jnp.asarray(tree_map)]       # (B, KB, M)
        m = len(tree_map)
        flat = (conf_k[..., None] * proj).reshape(b, kb * m)
        scores_k, idx = lax.top_k(flat, kb)
        classes_k = (idx % m).astype(jnp.int32)
        boxes_k = jnp.take_along_axis(boxes_k, (idx // m)[..., None],
                                      axis=1)

    keep = _suppress(_geom(boxes_k), scores_k, classes_k,
                     conf_threshold, iou_threshold,
                     use_pallas=use_pallas, kind=nms_kind, beta=beta_nms)
    return _package(boxes_k, scores_k, classes_k, keep, max_detections)
