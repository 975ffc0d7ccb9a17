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

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def decode(logits: jnp.ndarray, anchors, num_classes: int,
           tree=None, tree_map: Optional[Tuple[int, ...]] = None,
           hier_thresh: float = 0.5):
    """logits: (B, H, W, A*(5+C)) raw head output.

    Returns:
      boxes  (B, H*W*A, 4)  (cx, cy, w, h) normalized to net space
      scores (B, H*W*A, C)  conf * class prob
    Compute in fp32 regardless of input dtype (parity gate, SURVEY.md §7.2).

    tree (configs.tree.SoftmaxTree) switches the class math to the
    YOLO9000 hierarchy (paper §4): per-sibling-group softmax gives
    conditional probabilities. Then either
      * tree_map (a darknet .map projection): score_j = conf *
        absolute_prob[map[j]] over the map's class list (the COCO-eval
        projection), scores shape (B, N, len(map)); or
      * no map: greedy root-to-leaf traversal — at each split take the
        max-conditional child while the cumulative path product stays
        above hier_thresh — and the predicted node scores conf
        (one-hot over the tree's nodes), scores shape (B, N, C).
    """
    b, h, w, _ = logits.shape
    a = len(anchors)
    t = logits.astype(jnp.float32).reshape(b, h, w, a, 5 + num_classes)
    anchors = jnp.asarray(anchors, dtype=jnp.float32)  # (A, 2) cell units

    pred_boxes = decode_region_boxes(
        jax.nn.sigmoid(t[..., 0]), jax.nn.sigmoid(t[..., 1]),
        t[..., 2], t[..., 3], anchors, h, w)
    conf = jax.nn.sigmoid(t[..., 4])
    if tree is not None:
        cond = tree_conditional_probs(t[..., 5:], tree)
        if tree_map is not None:
            absolute = tree_absolute_probs(cond, tree)
            scores = conf[..., None] * absolute[..., jnp.asarray(tree_map)]
            out_c = len(tree_map)
        else:
            node = tree_top_prediction(cond, tree, hier_thresh)
            scores = (jax.nn.one_hot(node, num_classes, dtype=jnp.float32)
                      * conf[..., None])
            out_c = num_classes
    else:
        probs = jax.nn.softmax(t[..., 5:], axis=-1)
        scores = conf[..., None] * probs
        out_c = num_classes
    return pred_boxes.reshape(b, -1, 4), scores.reshape(b, -1, out_c)


def decode_region_boxes(sx, sy, tw, th, anchors, h: int, w: int):
    """[region] box decode (region_layer.c get_region_box), shared by
    decode() and the training loss's live-IoU terms
    (train/loss.region_loss) so train-vs-inference box math is ONE
    implementation (code-review finding: the loss had an inline copy).

    sx/sy: SIGMOIDED xy offsets (B, H, W, A); tw/th raw wh logits;
    anchors (A, 2) in cell units. Returns (B, H, W, A, 4) normalized
    (cx, cy, w, h)."""
    a = jnp.asarray(anchors, dtype=jnp.float32)
    cx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    cy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    bx = (sx + cx) / w
    by = (sy + cy) / h
    bw = a[None, None, None, :, 0] * jnp.exp(tw) / w
    bh = a[None, None, None, :, 1] * jnp.exp(th) / h
    return jnp.stack([bx, by, bw, bh], axis=-1)


@functools.lru_cache(maxsize=8)
def _tree_np_consts(tree):
    """Constant tables for one SoftmaxTree, as NUMPY arrays. Cached as
    host arrays on purpose: jnp values created during a jit trace are
    tracers, and caching those across traces leaks them — callers
    convert with jnp.asarray per use (XLA constant-folds them)."""
    import numpy as np

    from yolo_tpu.configs.tree import group_members_padded

    levels = np.zeros(tree.n_nodes, dtype=np.int32)
    for i, p in enumerate(tree.parents):
        levels[i] = 0 if p < 0 else levels[p] + 1
    return {
        "node_group": np.asarray(tree.node_group, np.int32),
        "parents": np.asarray(tree.parents, np.int32),
        "levels": levels,
        "child_group": np.asarray(tree.child_group, np.int32),
        "members": group_members_padded(tree),
        "leaf": np.asarray([tree.leaf(i)
                            for i in range(tree.n_nodes)], bool),
    }


def _tree_consts(tree):
    """jnp views of _tree_np_consts, safe inside or outside jit."""
    return {k: jnp.asarray(v) for k, v in _tree_np_consts(tree).items()}


def tree_conditional_probs(logits_c: jnp.ndarray, tree) -> jnp.ndarray:
    """(..., C) class logits -> per-sibling-group softmax (YOLO9000
    conditional probabilities Pr(node | parent)). Scatter/gather over
    the static group id table; fully batched, static shapes.

    Leading dims are flattened to ONE batch dim for the compute, and
    the flattened form is pinned with an optimization_barrier: on TPU
    the >2-D forms here draw batch-minor gather layouts padded to 128
    lanes (measured 5.19-5.50 GB per (B, H, W, A, 9418) intermediate
    at batch 32 — 5x the payload, the OOM that kept 9k-class reference
    decode off-chip), while the (F, C) form keeps the native (8, 128)
    tiling at ~1x padding. The barrier matters: a bare reshape is
    moved across elementwise ops by XLA's simplifier, silently
    restoring the 5-D gathers (measured — same OOM with reshape
    alone). Same applies to the other tree ops below."""
    k = _tree_consts(tree)
    g = k["node_group"]
    t = logits_c.astype(jnp.float32)
    lead = t.shape[:-1]
    t = lax.optimization_barrier(t.reshape(-1, t.shape[-1]))
    shape_g = (t.shape[0], tree.n_groups)
    gmax = (jnp.full(shape_g, -jnp.inf, jnp.float32)
            .at[..., g].max(t))
    e = jnp.exp(t - gmax[..., g])
    gsum = jnp.zeros(shape_g, jnp.float32).at[..., g].add(e)
    # back-reshape names the static C (a -1 is unresolvable when a
    # zero-size lead dim makes the element count 0)
    return (e / gsum[..., g]).reshape(*lead, t.shape[-1])


def tree_log_conditional(logits_c: jnp.ndarray, tree) -> jnp.ndarray:
    """(..., C) class logits -> log of the per-sibling-group softmax,
    computed as shifted-logit minus log-sum-exp per group (numerically
    stable for the classifier-training CE — never takes log of a
    formed probability)."""
    k = _tree_consts(tree)
    g = k["node_group"]
    t = logits_c.astype(jnp.float32)
    lead = t.shape[:-1]
    # 2-D + barrier: sane TPU layouts (see tree_conditional_probs)
    t = lax.optimization_barrier(t.reshape(-1, t.shape[-1]))
    shape_g = (t.shape[0], tree.n_groups)
    gmax = (jnp.full(shape_g, -jnp.inf, jnp.float32)
            .at[..., g].max(t))
    z = t - gmax[..., g]
    gsum = jnp.zeros(shape_g, jnp.float32).at[..., g].add(jnp.exp(z))
    return (z - jnp.log(gsum)[..., g]).reshape(*lead, t.shape[-1])


def tree_absolute_probs(cond: jnp.ndarray, tree) -> jnp.ndarray:
    """Conditional -> absolute probabilities: product of conditionals
    along each node's path to the root (paper §4 'absolute
    probability ... multiply the conditional probabilities along the
    path'). Computed level-by-level (max_depth gathers) instead of a
    per-node (C, depth) gather table to bound memory at 9k-node scale."""
    k = _tree_consts(tree)
    parents = jnp.maximum(k["parents"], 0)
    lead = cond.shape[:-1]
    # 2-D + barrier: sane TPU layouts (see tree_conditional_probs)
    cond = lax.optimization_barrier(cond.reshape(-1, cond.shape[-1]))
    absolute = cond
    for d in range(1, tree.max_depth):
        par = absolute[..., parents]
        absolute = jnp.where(k["levels"] == d, cond * par, absolute)
    return absolute.reshape(*lead, cond.shape[-1])


def tree_top_prediction(cond: jnp.ndarray, tree,
                        thresh: float) -> jnp.ndarray:
    """Greedy hierarchy prediction on conditionals (paper §4: 'traverse
    the tree down, taking the highest confidence path at every split
    until we reach some threshold and we predict that object class').

    Start at the root group; at each split pick the max-conditional
    node; descend while the cumulative product of conditionals (= the
    node's absolute probability) exceeds ``thresh``; predict the last
    accepted node. Below threshold at the ROOT split the root argmax is
    still returned (there is no shallower fallback). Returns int32 node
    indices, shape = cond.shape[:-1]. Unrolled max_depth times — depth
    is static and small (14 for the official 9k tree)."""
    k = _tree_consts(tree)
    members = k["members"]                      # (G, K) pad -1
    child_group = k["child_group"]
    lead = cond.shape[:-1]
    # 2-D + barrier: sane TPU layouts (see tree_conditional_probs)
    cond = lax.optimization_barrier(cond.reshape(-1, cond.shape[-1]))
    batch_shape = cond.shape[:-1]
    group = jnp.zeros(batch_shape, jnp.int32)
    p = jnp.ones(batch_shape, jnp.float32)
    result = jnp.full(batch_shape, -1, jnp.int32)
    done = jnp.zeros(batch_shape, bool)
    for step in range(tree.max_depth):
        cand = members[group]                   # (..., K)
        val = jnp.where(
            cand >= 0,
            jnp.take_along_axis(cond, jnp.maximum(cand, 0), axis=-1),
            -1.0)
        arg = jnp.argmax(val, axis=-1)
        mx = jnp.max(val, axis=-1)
        node = jnp.take_along_axis(cand, arg[..., None],
                                   axis=-1)[..., 0]
        active = ~done
        accept = active & (p * mx > thresh)
        # the root argmax is recorded even below threshold (there is no
        # shallower node to fall back to); deeper nodes only on accept
        result = jnp.where(active if step == 0 else accept, node, result)
        p = jnp.where(accept, p * mx, p)
        is_leaf = child_group[node] < 0
        group = jnp.where(accept & ~is_leaf, child_group[node], group)
        done = done | ~accept | (accept & is_leaf)
    return result.reshape(lead)


def decode_yolo(head_logits, anchors_px, masks, num_classes: int,
                net_size, scales=None, new_coords=None,
                gaussian=None):
    """YOLOv3-family [yolo] decode, all heads merged (darknet
    yolo_layer semantics — sigmoid xy/conf, exp wh on PIXEL anchors,
    independent sigmoid class probs; no softmax, no tw/th clamp).

      head_logits: sequence of (B, Hs, Ws, As*(5+C)) raw head outputs
                   (As*(9+C) for gaussian heads)
      net_size:    int or (net_h, net_w) — rectangular nets normalize
                   bw by net_w and bh by net_h (darknet get_yolo_box's
                   separate netw/neth divisors)
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


def decode_head_boxes(t, anchors_px, mask, s_xy: float, net_size,
                      new_coords: bool = False):
    """(B,H,W,A,5+C) fp32 head activations -> (B,H,W,A,4) normalized
    xywh boxes (the [yolo] box math, shared by decode_yolo and the
    training loss's ignore-mask decode). net_size: int or
    (net_h, net_w). new_coords=True switches to
    the scaled-yolov4 box math (AlexeyAB yolo_layer.c get_yolo_box:
    input already logistic-activated by the head conv; xy skips the
    sigmoid, wh = (2v)^2 * anchor instead of exp)."""
    from yolo_tpu.ops.letterbox import as_hw

    net_h, net_w = as_hw(net_size)
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
              * anch[None, None, None, :, 0] / net_w)
        bh = (4.0 * jnp.square(t[..., 3])
              * anch[None, None, None, :, 1] / net_h)
    else:
        bw = anch[None, None, None, :, 0] * jnp.exp(t[..., 2]) / net_w
        bh = anch[None, None, None, :, 1] * jnp.exp(t[..., 3]) / net_h
    return jnp.stack([bx, by, bw, bh], axis=-1)


def decode_detection(flat: jnp.ndarray, head) -> tuple:
    """yolov1 [detection] decode (configs.specs.DetectionHead layout):
    flat (B, side²·(classes + num·(1+coords))) activations ->
      boxes  (B, side²·num, 4) normalized xywh
      scores (B, side²·num, classes) = confidence · class prob
    x=(tx+col)/side, y=(ty+row)/side, w=tw², h=th² under the paper's
    sqrt-wh parameterization (sqrt=0: tw/th directly). fp32."""
    s, n, c = head.side, head.num, head.classes
    b = flat.shape[0]
    t = flat.astype(jnp.float32).reshape(b, -1)
    probs = t[:, :s * s * c].reshape(b, s * s, 1, c)
    conf = t[:, s * s * c:s * s * (c + n)].reshape(b, s * s, n)
    boxes = t[:, s * s * (c + n):].reshape(b, s * s, n, head.coords)
    col = (jnp.arange(s * s, dtype=jnp.float32) % s)[None, :, None]
    row = (jnp.arange(s * s, dtype=jnp.float32) // s)[None, :, None]
    bx = (boxes[..., 0] + col) / s
    by = (boxes[..., 1] + row) / s
    if head.sqrt:
        bw = jnp.square(boxes[..., 2])
        bh = jnp.square(boxes[..., 3])
    else:
        bw, bh = boxes[..., 2], boxes[..., 3]
    scores = conf[..., None] * probs
    out_boxes = jnp.stack([bx, by, bw, bh], axis=-1)
    return (out_boxes.reshape(b, -1, 4), scores.reshape(b, -1, c))
