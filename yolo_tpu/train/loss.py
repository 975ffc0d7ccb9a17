"""YOLO multi-part region loss (SURVEY.md §2.1 'YOLO multi-part loss';
BASELINE.json:10 'coord/obj/class loss').

Darknet region-layer semantics with the standard TF-port loss convention
(each squared error weighted once by its scale):

  L = sum coord_scale*(2 - w*h) * [(sx-tx)^2+(sy-ty)^2+(tw-ttw)^2+(th-tth)^2]   (assigned)
    + object_scale   * (iou - conf)^2        (assigned; rescore=1, darknet yolov2.cfg)
      or (1 - conf)^2 when rescore=0
    + noobject_scale * (0 - conf)^2          (unassigned anchors whose best
                                              IoU vs any GT < thresh=0.6)
    + class_scale    * ||softmax - onehot||^2 (assigned)
    + 0.01 * prior-matching warmup on unassigned anchors while
      seen < 12800 images (darknet burn-in), targets (0.5, 0.5, prior).

All terms are computed from the raw head logits in fp32; fully vectorized,
static shapes, batched. Oracle: tests/loss_oracle.py (loop-level numpy).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    coord_scale: float = 1.0
    object_scale: float = 5.0
    noobject_scale: float = 1.0
    class_scale: float = 1.0
    iou_thresh: float = 0.6
    rescore: bool = True
    warmup_seen: int = 12800
    warmup_scale: float = 0.01


def region_loss_config(mcfg) -> LossConfig:
    """LossConfig from a ModelConfig's [region] training keys
    (cfg-parsed values, or the official-cfg defaults for the pinned
    variants) — one rule, stated once, shared by the CLI and tests."""
    return LossConfig(coord_scale=mcfg.region_coord_scale,
                      object_scale=mcfg.region_object_scale,
                      noobject_scale=mcfg.region_noobject_scale,
                      class_scale=mcfg.region_class_scale,
                      iou_thresh=mcfg.region_thresh,
                      rescore=mcfg.region_rescore)


def _iou_xywh_pairwise(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """pred (..., N, 4), gt (..., G, 4) xywh -> IoU (..., N, G)."""
    px1 = pred[..., :, None, 0] - pred[..., :, None, 2] / 2
    py1 = pred[..., :, None, 1] - pred[..., :, None, 3] / 2
    px2 = pred[..., :, None, 0] + pred[..., :, None, 2] / 2
    py2 = pred[..., :, None, 1] + pred[..., :, None, 3] / 2
    gx1 = gt[..., None, :, 0] - gt[..., None, :, 2] / 2
    gy1 = gt[..., None, :, 1] - gt[..., None, :, 3] / 2
    gx2 = gt[..., None, :, 0] + gt[..., None, :, 2] / 2
    gy2 = gt[..., None, :, 1] + gt[..., None, :, 3] / 2
    iw = jnp.maximum(0.0, jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1))
    ih = jnp.maximum(0.0, jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1))
    inter = iw * ih
    pa = pred[..., :, None, 2] * pred[..., :, None, 3]
    ga = gt[..., None, :, 2] * gt[..., None, :, 3]
    union = pa + ga - inter
    return jnp.where(union > 0, inter / union, 0.0)


def classifier_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                    tree=None, temperature: float = 1.0
                    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Softmax cross-entropy for classifier (softmax-head) training.

    Darknet's softmax layer trains with softmax_x_ent semantics: error
    -log(p_truth), delta (truth - p) straight on the logits — exactly
    the standard CE gradient, so this is jax.nn.log_softmax CE.

    With a YOLO9000 tree ([softmax] tree=): the label's ROOT PATH
    contributes one CE term per sibling group (darknet9000 marks every
    ancestor as truth during data loading; paper §4 'backpropagate at
    or above the level of the label') — groups off the path carry no
    gradient. Labels may be leaves or internal nodes.

    logits: (B, C) PRE-softmax head output
    (graph.apply_layers(softmax_logits=True)); labels: (B,) int.
    Returns (mean CE, {"ce": mean CE, "top1": batch accuracy}) — top1
    is diagnostic only (with a tree it is leaf-masked-absolute top-1,
    the inference protocol)."""
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        # [softmax] temperature: darknet's FORWARD applies 1/T
        # (softmax_cpu's temp argument) but backward_softmax_layer
        # axpy's the softmax_x_ent delta (truth - p) onto the input
        # with NO 1/T chain factor — the darknet gradient is
        # (p - onehot)/B with p computed at l/T. A plain l/T here
        # would add the chain-rule 1/T darknet omits (training the
        # head at 1/T the reference's effective LR — code-review
        # finding), so the scaling is STRAIGHT-THROUGH: forward sees
        # l/T, the backward Jacobian is identity.
        scaled = logits / temperature
        logits = logits + jax.lax.stop_gradient(scaled - logits)
    if tree is None:
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        pred = jnp.argmax(logits, axis=-1)
    else:
        from yolo_tpu.configs.tree import tree_paths_padded
        from yolo_tpu.ops.decode import (tree_absolute_probs,
                                         tree_conditional_probs,
                                         tree_log_conditional)

        logc = tree_log_conditional(logits, tree)
        paths = jnp.asarray(tree_paths_padded(tree))
        pnodes = paths[labels]                     # (B, max_depth)
        mask = (pnodes >= 0).astype(jnp.float32)
        safe = jnp.maximum(pnodes, 0)
        ce = -jnp.sum(mask * jnp.take_along_axis(logc, safe, axis=-1),
                      axis=-1)
        absolute = tree_absolute_probs(
            tree_conditional_probs(logits, tree), tree)
        from yolo_tpu.ops.decode import _tree_np_consts

        leaf = jnp.asarray(_tree_np_consts(tree)["leaf"])
        pred = jnp.argmax(jnp.where(leaf, absolute, 0.0), axis=-1)
        # hierarchical top1: the prediction is a LEAF, so an internal-
        # node label counts correct when it lies on the predicted
        # leaf's root path (leaf labels reduce to equality) — without
        # this, internal-node labels could never score (code-review)
        pred_paths = paths[pred]                   # (B, max_depth)
        hit = jnp.any(pred_paths == labels[:, None], axis=-1)
        mean_ce = jnp.mean(ce)
        return mean_ce, {"ce": mean_ce,
                         "top1": jnp.mean(hit.astype(jnp.float32))}
    mean_ce = jnp.mean(ce)
    top1 = jnp.mean((pred == labels).astype(jnp.float32))
    return mean_ce, {"ce": mean_ce, "top1": top1}


def _tree_class_sq(logits_c: jnp.ndarray, tcls: jnp.ndarray,
                   tree) -> jnp.ndarray:
    """Hierarchical class squared error per anchor (region_loss tree
    branch). For target node t, summed over sibling groups g on
    path(t): ||cond_g - onehot_g||^2 = sumsq(g) - 2*cond[node_g] + 1
    (onehot is the path's node within each group). (..., C) logits +
    (...,) int targets -> (...,)."""
    from yolo_tpu.configs.tree import tree_paths_padded
    from yolo_tpu.ops.decode import _tree_consts, tree_conditional_probs

    cond = tree_conditional_probs(logits_c, tree)
    g = _tree_consts(tree)["node_group"]
    shape_g = cond.shape[:-1] + (tree.n_groups,)
    sumsq = jnp.zeros(shape_g, jnp.float32).at[..., g].add(cond ** 2)
    paths = jnp.asarray(tree_paths_padded(tree))   # (C, max_depth)
    pnodes = paths[tcls]                           # (..., max_depth)
    mask = (pnodes >= 0).astype(jnp.float32)
    safe = jnp.maximum(pnodes, 0)
    cond_at = jnp.take_along_axis(cond, safe, axis=-1)
    sumsq_at = jnp.take_along_axis(sumsq, g[safe], axis=-1)
    return jnp.sum(mask * (sumsq_at - 2.0 * cond_at + 1.0), axis=-1)


def detection_loss(flat: jnp.ndarray, targets: Dict[str, jnp.ndarray],
                   head) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """YOLOv1 multi-part loss — the paper's eq. 3 (arXiv:1506.02640)
    with the darknet [detection] scale keys:

      coord_scale    Σ 1^obj_ij [(tx-x̂rel)² + (ty-ŷrel)²
                                 + (tw-√ŵ)² + (th-√ĥ)²]   (sqrt=1)
      object_scale   Σ 1^obj_ij (Ĉ - conf)²   Ĉ = live IoU (rescore=1)
                                               or 1
      noobject_scale Σ 1^noobj_ij conf²        every NON-responsible
                                               predictor, incl. the
                                               losers in object cells
      class_scale    Σ 1^obj_i ||probs - onehot||²   per CELL

    The responsible predictor j is the cell's max-IoU box against its
    ground truth, computed live from the decoded predictions (the
    paper's 1^obj_ij). flat: (B, side²(classes+num(1+coords))) raw
    connected activations; targets from data.targets.encode_v1.
    Oracle: tests/loss_oracle.py::detection_loss_np.
    """
    s, n, c = head.side, head.num, head.classes
    b = flat.shape[0]
    t = flat.astype(jnp.float32).reshape(b, -1)
    probs = t[:, :s * s * c].reshape(b, s * s, c)
    conf = t[:, s * s * c:s * s * (c + n)].reshape(b, s * s, n)
    boxt = t[:, s * s * (c + n):].reshape(b, s * s, n, head.coords)

    obj = targets["v1_obj"]                    # (B, S²)
    tbox = targets["v1_box"]                   # (B, S², 4) image xywh
    tcls = targets["v1_cls"]                   # (B, S²)

    col = (jnp.arange(s * s, dtype=jnp.float32) % s)[None, :, None]
    row = (jnp.arange(s * s, dtype=jnp.float32) // s)[None, :, None]
    px = (boxt[..., 0] + col) / s
    py = (boxt[..., 1] + row) / s
    pw = jnp.square(boxt[..., 2]) if head.sqrt else boxt[..., 2]
    ph = jnp.square(boxt[..., 3]) if head.sqrt else boxt[..., 3]
    pred = jnp.stack([px, py, pw, ph], axis=-1)      # (B, S², N, 4)

    iou = _iou_xywh_pairwise(pred, tbox[:, :, None, :])[..., 0]
    # darknet detection_layer.c: the responsible predictor is the
    # max-IoU box, but when EVERY predictor's IoU is 0 (the common
    # early-training regime with sqrt=1, where pred w=h≈0) it falls
    # back to min box_rmse — argmax-over-zeros would park all object
    # gradients on predictor 0 and break specialization (code-review
    # finding). argmin over squared distance == argmin RMSE.
    dist2 = jnp.sum((pred - tbox[:, :, None, :]) ** 2, axis=-1)
    best = jnp.where(jnp.max(iou, axis=-1) > 0,
                     jnp.argmax(iou, axis=-1),
                     jnp.argmin(dist2, axis=-1))
    resp = jax.nn.one_hot(best, n, dtype=jnp.float32)  # (B, S², N)
    resp = resp * obj[..., None]

    xr = tbox[..., 0] * s - col[..., 0]   # in-cell x target
    yr = tbox[..., 1] * s - row[..., 0]   # in-cell y target
    tw = jnp.sqrt(tbox[..., 2]) if head.sqrt else tbox[..., 2]
    th = jnp.sqrt(tbox[..., 3]) if head.sqrt else tbox[..., 3]
    sq = ((boxt[..., 0] - xr[..., None]) ** 2
          + (boxt[..., 1] - yr[..., None]) ** 2
          + (boxt[..., 2] - tw[..., None]) ** 2
          + (boxt[..., 3] - th[..., None]) ** 2)
    loss_coord = head.coord_scale * jnp.sum(resp * sq)

    ctarget = (jax.lax.stop_gradient(iou) if head.rescore
               else jnp.ones_like(iou))
    loss_obj = head.object_scale * jnp.sum(resp * (ctarget - conf) ** 2)
    loss_noobj = head.noobject_scale * jnp.sum((1.0 - resp) * conf ** 2)

    onehot = jax.nn.one_hot(tcls, c, dtype=jnp.float32)
    loss_cls = head.class_scale * jnp.sum(
        obj[..., None] * (probs - onehot) ** 2)

    parts = {
        "coord": loss_coord / b,
        "obj": loss_obj / b,
        "noobj": loss_noobj / b,
        "class": loss_cls / b,
    }
    total = sum(parts.values())
    return total, parts


def region_loss(logits: jnp.ndarray, targets: Dict[str, jnp.ndarray],
                anchors, num_classes: int, cfg: LossConfig,
                seen: jnp.ndarray, tree=None
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """logits (B, S, S, A*(5+C)); targets from data.targets.encode_batch.

    Returns (total_loss_mean_per_image, parts dict) — parts are the
    per-term scalars the reference-class trainers log per step
    (SURVEY.md §5.5: coord/obj/noobj/class separately).

    tree (configs.tree.SoftmaxTree, YOLO9000 [region] tree=) swaps the
    class term for the hierarchical one: the squared error is taken
    within each sibling-softmax group ALONG THE TARGET'S ROOT PATH only
    (target node 1, its siblings 0) — groups off the path carry no
    class gradient, mirroring the paper's "only backpropagate loss at
    or above the level of the label" and keeping this repo's documented
    squared-error-on-softmax convention for the region family.
    """
    b, sh, sw, _ = logits.shape
    a = len(anchors)
    c = num_classes
    t = logits.astype(jnp.float32).reshape(b, sh, sw, a, 5 + c)
    anchors_arr = jnp.asarray(anchors, dtype=jnp.float32)

    sx = jax.nn.sigmoid(t[..., 0])
    sy = jax.nn.sigmoid(t[..., 1])
    tw = t[..., 2]
    th = t[..., 3]
    conf = jax.nn.sigmoid(t[..., 4])
    probs = jax.nn.softmax(t[..., 5:], axis=-1)

    obj = targets["obj_mask"]                    # (B,S,S,A)
    tc = targets["tcoord"]                       # (B,S,S,A,4)
    coord_w = targets["coord_w"]

    # --- decoded predicted boxes, normalized xywh (for IoU terms) ---
    # the ONE region box decode, shared with inference (ops/decode.py)
    from yolo_tpu.ops.decode import decode_region_boxes

    pred_boxes = decode_region_boxes(sx, sy, tw, th, anchors_arr,
                                     sh, sw)              # (B,SH,SW,A,4)

    # --- noobj: anchors whose best IoU vs any valid GT < thresh ---
    flat_pred = pred_boxes.reshape(b, -1, 4)
    iou_all = _iou_xywh_pairwise(flat_pred, targets["gt_boxes"])  # (B,N,G)
    iou_all = iou_all * targets["gt_mask"][:, None, :]
    best_iou = jnp.max(iou_all, axis=-1).reshape(b, sh, sw, a)
    noobj_mask = (1.0 - obj) * (best_iou < cfg.iou_thresh).astype(jnp.float32)
    loss_noobj = cfg.noobject_scale * jnp.sum(noobj_mask * conf ** 2)

    # --- obj (rescore: target is the live IoU vs the assigned GT) ---
    iou_truth = _diag_iou(pred_boxes, targets["tiou_boxes"])
    obj_target = jax.lax.stop_gradient(iou_truth) if cfg.rescore else 1.0
    loss_obj = cfg.object_scale * jnp.sum(obj * (obj_target - conf) ** 2)

    # --- coords on assigned anchors ---
    sq = ((sx - tc[..., 0]) ** 2 + (sy - tc[..., 1]) ** 2 +
          (tw - tc[..., 2]) ** 2 + (th - tc[..., 3]) ** 2)
    loss_coord = cfg.coord_scale * jnp.sum(obj * coord_w * sq)

    # --- class on assigned anchors ---
    if tree is not None:
        loss_cls = cfg.class_scale * jnp.sum(
            obj * _tree_class_sq(t[..., 5:], targets["tcls"], tree))
    else:
        onehot = jax.nn.one_hot(targets["tcls"], c, dtype=jnp.float32)
        loss_cls = cfg.class_scale * jnp.sum(
            obj[..., None] * (probs - onehot) ** 2)

    # --- warmup prior matching (darknet seen < 12800) ---
    warm = (seen < cfg.warmup_seen).astype(jnp.float32)
    sq_warm = ((sx - 0.5) ** 2 + (sy - 0.5) ** 2 + tw ** 2 + th ** 2)
    loss_warm = warm * cfg.warmup_scale * jnp.sum((1.0 - obj) * sq_warm)

    parts = {
        "coord": loss_coord / b,
        "obj": loss_obj / b,
        "noobj": loss_noobj / b,
        "class": loss_cls / b,
        "warmup": loss_warm / b,
    }
    total = sum(parts.values())
    return total, parts


@dataclasses.dataclass(frozen=True)
class YoloLossConfig:
    """yolov3/yolov4 [yolo]-layer loss (darknet yolo_layer semantics).

    Darknet computes deltas directly on the sigmoid outputs
    (delta = target - sigmoid), which is exactly the BCE gradient w.r.t.
    the logit — so xy/objectness/class terms here are sigmoid BCE and
    wh is 0.5*MSE on the raw logits (delta = target - t), making the
    gradients darknet-faithful. Anchors whose predicted box overlaps
    any GT above ignore_thresh get NO objectness penalty.

    iou_loss="ciou" (yolov4.cfg) replaces the xy/wh terms with
    iou_normalizer * (1 - CIoU(pred_box, gt_box)) on the DECODED boxes
    (Zheng et al. arXiv:1911.08287: IoU − center-distance/diag² − αv
    aspect term); cls_normalizer scales the OBJECTNESS deltas (both obj
    and noobj BCE), matching the classic AlexeyAB yolo_layer where
    l.cls_normalizer multiplies l.delta[obj_index] — the class BCE is
    unscaled, as in that era's delta_yolo_class. NEWER AlexeyAB builds
    (scaled-yolov4 cfgs) split the roles: obj_normalizer scales the
    objectness deltas and cls_normalizer scales the class deltas —
    setting obj_normalizer (non-None) selects those semantics, exactly
    as a cfg that writes the key expects. All pinned cfgs use 1.0
    everywhere, so both conventions agree on them.

    Scaled-yolov4 heads ([yolo] new_coords=1, selected per head via
    yolo_loss's new_coords flags) receive ACTIVATED values — the head
    conv applied logistic, and darknet's yolo layer computes
    delta = (target - output) on those activations, which the conv's
    backward then multiplies by the logistic derivative. Plain autodiff
    reproduces that exactly when the obj/class terms are 0.5*MSE on the
    activated outputs (dL/dp = p - target, then the graph's logistic
    backward applies p(1-p)), so new_coords heads use 0.5*MSE where
    classic heads use BCE-on-logits. Box regression must be an
    iou-family loss (every scaled cfg uses ciou); new_coords +
    iou_loss=mse is rejected (darknet's sqrt wh targets for that combo
    are not encoded).

    Known gradient deviations (documented, not darknet-exact):
    * with iou_loss="mse" AND scale_x_y != 1 the xy term is 0.5*MSE on
      the scaled sigmoid, whose gradient to the logit carries a
      sigmoid-derivative factor; darknet back-propagates
      delta = (target - scaled_sigmoid) straight to the logit with no
      sigmoid-derivative. No official cfg hits this combination (the v4
      cfgs that set scale_x_y all use iou_loss=ciou), so we keep the
      plain-autodiff form rather than a custom VJP.
    * iou-family box terms are the functional loss iou_normalizer *
      (1 - IoU_kind) differentiated by autodiff through the decode, so
      the box gradient carries the full chain rule (1/grid, scale_x_y,
      and for new_coords the d(4v^2·anchor)/dv = 8v·anchor factor);
      darknet's delta_yolo_box stores the raw dx_box_iou components,
      omitting the grid/scale factors and (for new_coords, where the
      chain multiply is commented out in yolo_layer.c) the 8v factor.
      We keep the mathematically correct gradient of the stated loss."""
    ignore_thresh: float = 0.7
    iou_loss: str = "mse"  # "mse" (yolov3) | "iou"|"giou"|"diou"|"ciou"
    iou_normalizer: float = 1.0  # yolov4.cfg: 0.07
    cls_normalizer: float = 1.0
    # None = classic semantics (cls_normalizer scales objectness);
    # a float = modern split (it scales objectness, cls_normalizer
    # scales the class BCE)
    obj_normalizer: Optional[float] = None
    # AlexeyAB [yolo] max_delta: clamp the per-element box-term gradient
    # (darknet clips the tx/ty/tw/th entries of l.delta); 0 = off
    max_delta: float = 0.0
    # AlexeyAB [yolo] label_smooth_eps: class targets become
    # y*(1-eps) + eps/2; 0 = off
    label_smooth_eps: float = 0.0
    # AlexeyAB [yolo] focal_loss=1: class term becomes the focal loss
    # (Lin et al. arXiv:1708.02002) with darknet's hardcoded constants
    # gamma=2, alpha=0.5. The PAPER's elementwise sigmoid form is the
    # pinned source (reference absent, same convention as the Gaussian
    # head): FL = alpha*(1-p_t)^2 * BCE with p_t = y*p + (1-y)*(1-p),
    # gradient by autodiff through both factors. Darknet's delta-file
    # variant instead rescales every class delta by the TRUE class's
    # focal gradient — a different (unpinnable) weighting.
    focal_loss: bool = False
    # [yolo] truth_thresh (yolo_layer.c per-position pass): anchors
    # whose best predicted-box IoU against any truth exceeds it ALSO
    # train as positives toward that best truth — objectness target 1,
    # the truth's class, and the box term — on top of the best-anchor
    # assignment (which wins where both fire, as darknet's later pass
    # overwrites the delta). 1.0 disables (IoU never exceeds 1).
    truth_thresh: float = 1.0


def _bce(logit, target):
    """Sigmoid binary cross-entropy, elementwise, from the raw logit."""
    return jnp.maximum(logit, 0.0) - logit * target + jnp.log1p(
        jnp.exp(-jnp.abs(logit)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _clip_grad(x, m: float):
    """Identity forward; backward clamps the cotangent to [-m, m] per
    element (darknet max_delta clips l.delta the same way)."""
    return x


def _clip_grad_fwd(x, m):
    return x, None


def _clip_grad_bwd(m, _res, g):
    return (jnp.clip(g, -m, m),)


_clip_grad.defvjp(_clip_grad_fwd, _clip_grad_bwd)


def _diag_iou_variant(p, g, kind: str, eps: float = 1e-9):
    """Elementwise IoU / GIoU / DIoU / CIoU of matching (..., 4) xywh
    boxes (GIoU arXiv:1902.09630; D/CIoU arXiv:1911.08287)."""
    import math

    px1, py1 = p[..., 0] - p[..., 2] / 2, p[..., 1] - p[..., 3] / 2
    px2, py2 = p[..., 0] + p[..., 2] / 2, p[..., 1] + p[..., 3] / 2
    gx1, gy1 = g[..., 0] - g[..., 2] / 2, g[..., 1] - g[..., 3] / 2
    gx2, gy2 = g[..., 0] + g[..., 2] / 2, g[..., 1] + g[..., 3] / 2
    iw = jnp.maximum(0.0, jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1))
    ih = jnp.maximum(0.0, jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1))
    inter = iw * ih
    union = p[..., 2] * p[..., 3] + g[..., 2] * g[..., 3] - inter
    iou = inter / (union + eps)
    if kind == "iou":
        return iou
    cw = jnp.maximum(px2, gx2) - jnp.minimum(px1, gx1)  # enclosing box
    ch = jnp.maximum(py2, gy2) - jnp.minimum(py1, gy1)
    if kind == "giou":
        area_c = cw * ch + eps
        return iou - (area_c - union) / area_c
    rho2 = ((p[..., 0] - g[..., 0]) ** 2 + (p[..., 1] - g[..., 1]) ** 2)
    c2 = cw ** 2 + ch ** 2 + eps
    if kind == "diou":
        return iou - rho2 / c2
    # ciou: + aspect-ratio consistency term
    v = (4.0 / math.pi ** 2) * (
        jnp.arctan(g[..., 2] / (g[..., 3] + eps))
        - jnp.arctan(p[..., 2] / (p[..., 3] + eps))) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))
    return iou - rho2 / c2 - alpha * v


def gaussian_nll(target: jnp.ndarray, mu: jnp.ndarray,
                 sigma: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Gaussian YOLOv3 per-coordinate negative log likelihood
    (arXiv:1904.04620 eq. 9): -log(N(target | mu, sigma^2) + eps),
    with the variance also stabilized by eps. sigma arrives already
    sigmoid-activated (the decode convention, ops/decode.decode_yolo).
    Computed in log space — no pdf under/overflow."""
    var = jnp.square(sigma) + eps
    log_pdf = (-0.5 * jnp.log(2.0 * jnp.pi * var)
               - jnp.square(target - mu) / (2.0 * var))
    # -log(pdf + eps) without forming the pdf: logaddexp is stable for
    # arbitrarily small pdfs (a naive log1p(eps*exp(-log_pdf)) overflows)
    return -jnp.logaddexp(log_pdf, jnp.log(jnp.float32(eps)))


def yolo_loss(head_logits, targets: Dict[str, jnp.ndarray], anchors_px,
              masks, num_classes: int, net_size,
              cfg: YoloLossConfig, scales=None, max_deltas=None,
              smooth_eps=None, new_coords=None, gaussian=None
              ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Multi-head yolov3 loss. head_logits: tuple of (B, S, S, A*(5+C))
    raw outputs (graph.apply_layers yolo-family return); targets from
    data.targets.encode_batch_yolo (flat per-head keys + gt_boxes/mask).
    scales: per-head yolov4 scale_x_y (xy term switches from BCE to
    0.5*MSE on the scaled sigmoid when != 1, since the prediction range
    leaves [0, 1]). max_deltas / smooth_eps: per-head overrides of the
    cfg-level max_delta / label_smooth_eps (AlexeyAB parses these per
    [yolo] section; None = unset, falls back to the cfg value, while an
    EXPLICIT per-head 0 disables the global — the None-sentinel
    semantics pinned by
    test_explicit_zero_max_delta_survives_round_trip).
    new_coords: per-head scaled-yolov4 flags — such heads arrive
    logistic-activated (graph applies the head conv's activation), so
    obj/class terms become 0.5*MSE on the activations and the box term
    decodes with the new_coords math; requires an iou-family iou_loss
    (see the YoloLossConfig docstring).

    gaussian: per-head [Gaussian_yolo] flags. Such heads carry the
    INTERLEAVED (9+C) layout [x,ux,y,uy,w,uw,h,uh,obj,cls...]; the box
    term becomes the paper's per-coordinate Gaussian NLL
    (arXiv:1904.04620 — mean in the SAME encoded space as the [yolo]
    targets: sigmoid-cell xy, log-ratio wh; sigma = sigmoid(u)),
    weighted by the (2 - w*h) scale like the mse box term, while
    obj/class stay BCE at their shifted slots. The paper's loss, not
    darknet's delta file, is the pinned source (reference absent) —
    iou_loss/max_delta do not apply to gaussian heads.

    Returns (total_loss_mean_per_image, parts) like region_loss.
    """
    from yolo_tpu.ops.decode import decode_head_boxes
    from yolo_tpu.ops.letterbox import as_hw

    net_h, net_w = as_hw(net_size)  # rect nets: per-axis wh encoding
    c = num_classes
    b = head_logits[0].shape[0]
    zero = jnp.zeros((), jnp.float32)
    parts = {"coord": zero, "obj": zero, "noobj": zero, "class": zero}
    n_heads = len(masks)
    scales = scales or [1.0] * n_heads
    max_deltas = max_deltas or [None] * n_heads
    smooth_eps = smooth_eps or [None] * n_heads
    new_coords = new_coords or [False] * n_heads
    gaussian = gaussian or [False] * n_heads
    if any(gaussian) and any(new_coords):
        raise NotImplementedError(
            "[Gaussian_yolo] + new_coords heads cannot be combined")
    if any(new_coords) and cfg.iou_loss == "mse":
        raise NotImplementedError(
            "[yolo] new_coords=1 training requires an iou-family "
            "iou_loss (iou/giou/diou/ciou — every scaled-yolov4 cfg "
            "uses ciou); the mse combination's sqrt wh targets are "
            "not encoded")
    if cfg.focal_loss and any(new_coords):
        raise NotImplementedError(
            "[yolo] focal_loss=1 with new_coords=1 heads is not "
            "supported (the scaled family's class term is "
            "activation-space MSE, not BCE; no published cfg combines "
            "them)")
    if cfg.focal_loss and (cfg.label_smooth_eps
                           or any(e for e in smooth_eps if e)):
        raise NotImplementedError(
            "[yolo] focal_loss=1 with label_smooth_eps is not "
            "supported (darknet's focal branch ignores smoothing; "
            "the focal p_t is undefined for soft targets)")
    if cfg.truth_thresh < 1.0 and any(gaussian):
        raise NotImplementedError(
            "[yolo] truth_thresh < 1 with [Gaussian_yolo] heads is "
            "not supported (the multi-truth box term would need the "
            "Gaussian NLL; no published cfg combines them)")

    for h, (logits, mask, s_xy, nc) in enumerate(zip(head_logits, masks,
                                                     scales, new_coords)):
        _, sh, sw, _ = logits.shape
        a = len(mask)
        ga = gaussian[h]
        if ga:
            # interleaved (9+C): remap to the shared views
            tg = logits.astype(jnp.float32).reshape(b, sh, sw, a, 9 + c)
            means = tg[..., jnp.asarray([0, 2, 4, 6])]
            sig = jax.nn.sigmoid(tg[..., jnp.asarray([1, 3, 5, 7])])
            # build a (5+C) view [x y w h obj cls...] so the shared
            # obj/class/ignore machinery applies unchanged
            t = jnp.concatenate([means, tg[..., 8:]], axis=-1)
        else:
            t = logits.astype(jnp.float32).reshape(b, sh, sw, a, 5 + c)
        md = (None if ga else
              (max_deltas[h] if max_deltas[h] is not None
               else cfg.max_delta))
        if md:
            # clamp the box-term gradient only (darknet clips the
            # tx/ty/tw/th entries of the PER-IMAGE l.delta; our loss is
            # the batch mean, so the cotangent here is delta/b and the
            # equivalent threshold is max_delta/b); obj/class keep t
            t_box = jnp.concatenate(
                [_clip_grad(t[..., :4], md / b), t[..., 4:]],
                axis=-1)
        else:
            t_box = t

        obj = targets[f"obj_mask_{h}"]
        tc = targets[f"tcoord_{h}"]
        coord_w = targets[f"coord_w_{h}"]

        # decoded predicted boxes (normalized) for the ignore mask and
        # the IoU-family box losses — the same [yolo] math inference uses
        pred_boxes = decode_head_boxes(t_box, anchors_px, mask, s_xy,
                                       net_size, new_coords=nc)
        off = (s_xy - 1.0) / 2.0

        iou_all = _iou_xywh_pairwise(pred_boxes.reshape(b, -1, 4),
                                     targets["gt_boxes"])
        iou_all = iou_all * targets["gt_mask"][:, None, :]
        best_iou = jnp.max(iou_all, axis=-1).reshape(b, sh, sw, a)
        best_iou = jax.lax.stop_gradient(best_iou)

        # multi-truth mask (truth_thresh < 1): anchors whose best
        # predicted-box IoU beats truth_thresh train as positives
        # toward that truth; best-anchor assignments win where both
        # fire (darknet's later pass overwrites the delta), and mt
        # anchors never count as noobj
        mt = None
        if cfg.truth_thresh < 1.0:
            best_g = jnp.argmax(
                jax.lax.stop_gradient(iou_all), axis=-1)       # (B, N)
            mt = ((best_iou > cfg.truth_thresh).astype(jnp.float32)
                  * (1.0 - obj))

        # objectness: BCE(1) on assigned; BCE(0) unless ignored
        noobj_mask = ((1.0 - obj)
                      * (best_iou < cfg.ignore_thresh).astype(jnp.float32))
        if mt is not None:
            noobj_mask = noobj_mask * (1.0 - mt)
        if nc:
            # new_coords head: t[..., 4] is the activated objectness p;
            # darknet's delta is (target - p) on the activation, i.e.
            # 0.5*MSE here (the head conv's logistic backward supplies
            # the p(1-p) factor via autodiff — see YoloLossConfig)
            obj_bce = 0.5 * (1.0 - t[..., 4]) ** 2
            noobj_bce = 0.5 * jnp.square(t[..., 4])
        else:
            obj_bce = _bce(t[..., 4], 1.0)
            noobj_bce = _bce(t[..., 4], 0.0)
        # classic AlexeyAB: cls_normalizer scales objectness; modern
        # (cfg sets obj_normalizer): obj_normalizer scales objectness
        # and cls_normalizer moves to the class BCE below
        on = (cfg.cls_normalizer if cfg.obj_normalizer is None
              else cfg.obj_normalizer)
        cls_n = 1.0 if cfg.obj_normalizer is None else cfg.cls_normalizer
        parts["obj"] = parts["obj"] + on * jnp.sum(obj * obj_bce) / b
        parts["noobj"] = (parts["noobj"]
                          + on * jnp.sum(noobj_mask * noobj_bce) / b)

        if ga:
            # Gaussian NLL over the four encoded coordinates; xy means
            # pass through the same sigmoid(+scale_x_y) the decode uses
            mu_x = jax.nn.sigmoid(t_box[..., 0]) * s_xy - off
            mu_y = jax.nn.sigmoid(t_box[..., 1]) * s_xy - off
            nll = (gaussian_nll(tc[..., 0], mu_x, sig[..., 0])
                   + gaussian_nll(tc[..., 1], mu_y, sig[..., 1])
                   + gaussian_nll(tc[..., 2], t_box[..., 2],
                                  sig[..., 2])
                   + gaussian_nll(tc[..., 3], t_box[..., 3],
                                  sig[..., 3]))
            parts["coord"] = parts["coord"] + jnp.sum(
                obj * coord_w * nll) / b
        elif cfg.iou_loss != "mse":
            # yolov4 family: box regression on the DECODED boxes
            iou_k = _diag_iou_variant(pred_boxes, targets[f"tbox_{h}"],
                                      cfg.iou_loss)
            parts["coord"] = parts["coord"] + cfg.iou_normalizer * jnp.sum(
                obj * (1.0 - iou_k)) / b
        else:
            # coords on assigned anchors: xy BCE (darknet delta on
            # sigmoid), wh 0.5*MSE on raw logits; weighted by (2 - w*h)
            if s_xy == 1.0:
                xy = (_bce(t_box[..., 0], tc[..., 0])
                      + _bce(t_box[..., 1], tc[..., 1]))
            else:
                px = jax.nn.sigmoid(t_box[..., 0]) * s_xy - off
                py = jax.nn.sigmoid(t_box[..., 1]) * s_xy - off
                xy = 0.5 * ((px - tc[..., 0]) ** 2
                            + (py - tc[..., 1]) ** 2)
            wh = 0.5 * ((t_box[..., 2] - tc[..., 2]) ** 2
                        + (t_box[..., 3] - tc[..., 3]) ** 2)
            parts["coord"] = parts["coord"] + jnp.sum(
                obj * coord_w * (xy + wh)) / b

        # classes: per-class BCE vs one-hot on assigned anchors
        # (focal_loss swaps in the paper's elementwise sigmoid focal
        # form — alpha=0.5, gamma=2, darknet's constants)
        def cls_elem_of(onehot_x):
            if nc:
                return 0.5 * jnp.square(t[..., 5:] - onehot_x)
            if cfg.focal_loss:
                p = jax.nn.sigmoid(t[..., 5:])
                pt = onehot_x * p + (1.0 - onehot_x) * (1.0 - p)
                return (0.5 * jnp.square(1.0 - pt)
                        * _bce(t[..., 5:], onehot_x))
            return _bce(t[..., 5:], onehot_x)

        onehot = jax.nn.one_hot(targets[f"tcls_{h}"], c, dtype=jnp.float32)
        eps = (smooth_eps[h] if smooth_eps[h] is not None
               else cfg.label_smooth_eps)
        if eps:
            onehot = onehot * (1.0 - eps) + 0.5 * eps
        parts["class"] = parts["class"] + cls_n * jnp.sum(
            obj[..., None] * cls_elem_of(onehot)) / b

        if mt is not None:
            # --- multi-truth positive pass toward the best truth ---
            gtb = jnp.take_along_axis(
                targets["gt_boxes"], best_g[..., None], axis=1
            ).reshape(b, sh, sw, a, 4)
            gtc = jnp.take_along_axis(
                targets["gt_cls"].astype(jnp.int32), best_g, axis=1
            ).reshape(b, sh, sw, a)
            gtb = jax.lax.stop_gradient(gtb)
            # objectness toward 1 — the same elementwise form and
            # normalizer as the assigned pass
            parts["obj"] = parts["obj"] + on * jnp.sum(mt * obj_bce) / b
            # class toward the truth's class
            onehot_mt = jax.nn.one_hot(gtc, c, dtype=jnp.float32)
            if eps:
                onehot_mt = onehot_mt * (1.0 - eps) + 0.5 * eps
            parts["class"] = parts["class"] + cls_n * jnp.sum(
                mt[..., None] * cls_elem_of(onehot_mt)) / b
            # box toward the truth, at the anchor's OWN cell/anchor
            # (darknet delta_yolo_box: tx = truth.x*lw - i — the
            # encoded target may leave [0,1] when the truth's center
            # sits in another cell; the BCE gradient is still
            # sigmoid - target, darknet's delta)
            if cfg.iou_loss != "mse":
                iou_mt = _diag_iou_variant(pred_boxes, gtb,
                                           cfg.iou_loss)
                parts["coord"] = (parts["coord"] + cfg.iou_normalizer
                                  * jnp.sum(mt * (1.0 - iou_mt)) / b)
            else:
                cxi = jnp.arange(sw, dtype=jnp.float32)[None, None, :,
                                                        None]
                cyj = jnp.arange(sh, dtype=jnp.float32)[None, :, None,
                                                        None]
                txm = gtb[..., 0] * sw - cxi
                tym = gtb[..., 1] * sh - cyj
                aw = jnp.asarray([anchors_px[m][0] for m in mask],
                                 jnp.float32)
                ah = jnp.asarray([anchors_px[m][1] for m in mask],
                                 jnp.float32)
                twm = jnp.log(jnp.maximum(
                    gtb[..., 2] * net_w / aw, 1e-9))
                thm = jnp.log(jnp.maximum(
                    gtb[..., 3] * net_h / ah, 1e-9))
                if s_xy == 1.0:
                    xy_mt = (_bce(t_box[..., 0], txm)
                             + _bce(t_box[..., 1], tym))
                else:
                    pxm = jax.nn.sigmoid(t_box[..., 0]) * s_xy - off
                    pym = jax.nn.sigmoid(t_box[..., 1]) * s_xy - off
                    xy_mt = 0.5 * ((pxm - txm) ** 2 + (pym - tym) ** 2)
                wh_mt = 0.5 * ((t_box[..., 2] - twm) ** 2
                               + (t_box[..., 3] - thm) ** 2)
                w_mt = 2.0 - gtb[..., 2] * gtb[..., 3]
                parts["coord"] = parts["coord"] + jnp.sum(
                    mt * w_mt * (xy_mt + wh_mt)) / b

    total = sum(parts.values())
    return total, parts


def _diag_iou(pred_boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of matching (B,S,S,A,4) boxes."""
    return _diag_iou_variant(pred_boxes, gt_boxes, "iou")
