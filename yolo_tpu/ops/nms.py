"""Fixed-shape, on-device class-wise greedy NMS.

The reference runs host-side numpy NMS after sess.run (SURVEY.md §3.1);
TPUs need static shapes, so this is a top-K + O(K^2) suppressability +
iterative-suppression formulation (SURVEY.md §7.2). Two candidate
strategies, two suppression backends:

Candidate strategies
  * "per-class" (exact oracle semantics): per-class top-K of the (B,N,C)
    score tensor -> a (B*C, K) grid. What numpy_ref.nms_per_class does.
  * "global" (the fast path, impl="fused*"): ONE top-K over all
    (box, class) pairs per image -> a (B, K) grid with mixed classes and
    a same-class suppression mask. ~C times less suppression work and
    one top-K instead of C. Identical results whenever fewer than K
    (box, class) pairs clear the confidence threshold (always true at
    production thresholds; K defaults to 2*top_k).

Suppression backends
  * pallas kernel (ops/pallas/nms_kernel.py): suppressability matrix in
    VMEM, sequential greedy pass in-kernel. No XLA loop overhead, no
    (G, K, K) HBM tensor. Default on TPU.
  * XLA lax.fori_loop reference — default on CPU and the golden
    cross-check for the kernel.

impl: "auto" | "fused" | "fused_xla" | "pallas" | "xla".
In every mode a box suppresses lower-ranked same-class overlaps only if
it is itself kept AND above the confidence threshold; ties order by
(score desc, candidate index asc), matching lax.top_k and the oracle.
"""

from __future__ import annotations

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


def _geom(boxes_k: jnp.ndarray) -> jnp.ndarray:
    """(..., K, 4) xywh -> (..., 5, K) rows [x1, y1, x2, y2, area]."""
    x1 = boxes_k[..., 0] - boxes_k[..., 2] / 2
    y1 = boxes_k[..., 1] - boxes_k[..., 3] / 2
    x2 = boxes_k[..., 0] + boxes_k[..., 2] / 2
    y2 = boxes_k[..., 1] + boxes_k[..., 3] / 2
    area = boxes_k[..., 2] * boxes_k[..., 3]
    return jnp.stack([x1, y1, x2, y2, area], axis=-2)


def _suppress_xla(geom: jnp.ndarray, scores_k: jnp.ndarray,
                  classes_k: jnp.ndarray, conf_threshold: float,
                  iou_threshold: float, kind: str = "greedy",
                  beta: float = 0.6) -> jnp.ndarray:
    """geom (G, 5, K), scores_k (G, K) sorted desc, classes_k (G, K) ->
    keep (G, K) float {0,1}. Reference XLA implementation.

    kind="diou" is AlexeyAB's nms_kind=diounms (box.c box_diounms):
    the suppression metric becomes IoU - (d/c)^beta with d = squared
    center distance and c = squared diagonal of the smallest enclosing
    box — far-apart centers suppress less. beta is the cfg's beta_nms
    (darknet default 0.6)."""
    g, _, k = geom.shape
    x1, y1, x2, y2, area = (geom[:, i, :] for i in range(5))
    iw = jnp.maximum(0.0, jnp.minimum(x2[:, :, None], x2[:, None, :]) -
                     jnp.maximum(x1[:, :, None], x1[:, None, :]))
    ih = jnp.maximum(0.0, jnp.minimum(y2[:, :, None], y2[:, None, :]) -
                     jnp.maximum(y1[:, :, None], y1[:, None, :]))
    inter = iw * ih
    union = area[:, :, None] + area[:, None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)     # (G, K, K)
    if kind == "diou":
        cx = (x1 + x2) / 2
        cy = (y1 + y2) / 2
        d = ((cx[:, :, None] - cx[:, None, :]) ** 2
             + (cy[:, :, None] - cy[:, None, :]) ** 2)
        ew = (jnp.maximum(x2[:, :, None], x2[:, None, :])
              - jnp.minimum(x1[:, :, None], x1[:, None, :]))
        eh = (jnp.maximum(y2[:, :, None], y2[:, None, :])
              - jnp.minimum(y1[:, :, None], y1[:, None, :]))
        c = ew ** 2 + eh ** 2
        # darknet box_diounms: c == 0 -> plain IoU
        iou = jnp.where(c > 0, iou - (d / jnp.maximum(c, 1e-12)) ** beta,
                        iou)
    elif kind != "greedy":
        raise ValueError(f"unknown NMS kind {kind!r} (greedy | diou)")
    same = classes_k[:, :, None] == classes_k[:, None, :]
    sup_matrix = same & (iou > iou_threshold)
    rank = jnp.arange(k)

    def body(i, keep):
        active = (keep[:, i] > 0.5) & (scores_k[:, i] >= conf_threshold)
        suppress = (active[:, None] & sup_matrix[:, i, :] &
                    (rank[None, :] > i))
        return jnp.where(suppress, 0.0, keep)

    keep = lax.fori_loop(0, k, body, jnp.ones((g, k), jnp.float32))
    return keep * (scores_k >= conf_threshold).astype(jnp.float32)


# fp32 elements per live (rows, K, K) pairwise buffer in the chunked
# XLA suppression: 64M elems = 256 MB. The exact per-class grid on a
# 9k-class tree model is G = B*9418 rows, whose monolithic (G, K, K)
# IoU tensor is 19.75 GB at B=32/K=128 (docs/PERF.md "tree decode")
# — far beyond a 16 GB chip. Suppression rows are independent, so
# lax.map over fixed-size row chunks bounds live memory with zero
# semantic change; below the budget the monolithic path is unchanged.
_CHUNK_ELEMS = 64 * 1024 * 1024


def _suppress_xla_rows(geom, scores_k, classes_k, conf_threshold,
                       iou_threshold, kind="greedy", beta=0.6):
    """_suppress_xla, row-chunked when the (G, K, K) pairwise tensor
    would exceed _CHUNK_ELEMS. Exactness: every output row depends
    only on its own (geom, scores, classes) row, so any row partition
    computes identical keep masks; padded rows are sliced off."""
    g, _, k = geom.shape
    rows = max(1, _CHUNK_ELEMS // (k * k))
    if g <= rows:
        return _suppress_xla(geom, scores_k, classes_k, conf_threshold,
                             iou_threshold, kind=kind, beta=beta)
    pad = (-g) % rows
    n_chunks = (g + pad) // rows

    def one(args):
        ge, sc, cl = args
        return _suppress_xla(ge, sc, cl, conf_threshold, iou_threshold,
                             kind=kind, beta=beta)

    keep = lax.map(one, (
        jnp.pad(geom, ((0, pad), (0, 0), (0, 0))).reshape(
            n_chunks, rows, 5, k),
        jnp.pad(scores_k, ((0, pad), (0, 0))).reshape(n_chunks, rows, k),
        jnp.pad(classes_k, ((0, pad), (0, 0))).reshape(
            n_chunks, rows, k)))
    return keep.reshape(n_chunks * rows, k)[:g]


def _per_class_suppress(geom_n, idx, scores_k, classes_k,
                        conf_threshold, iou_threshold, use_pallas: bool,
                        kind: str = "greedy", beta: float = 0.6):
    """Exact per-class suppression from a shared geometry table.

    geom_n (B, 5, N) candidate geometry; idx/scores_k/classes_k
    (B, C, K) per-class top-K. Returns keep (B, C, K).

    Below the _CHUNK_ELEMS budget this is ONE gather into (B, C, 5, K)
    plus the monolithic suppression (the fast path — measured at parity
    with a fused (B, C, K, 4) gather at 80 classes on a v5e). Above
    it, class-chunks are processed under lax.map with the geometry
    gather INSIDE the chunk body: at 9k-class scale BOTH the pairwise
    matrix (19.75 GB) and the gathered-geometry tensor (19.75 GB as
    laid out by XLA: candidates-major, 5 padded to 128 lanes) must
    never be live at once — each measured as the compile-stopping
    allocation on a 16 GB chip. Chunks are row-independent, so the
    result is bitwise identical (pinned by tests/test_nms_impls.py)."""
    b, c, k = idx.shape
    rows = max(1, _CHUNK_ELEMS // (k * k))
    cc = max(1, rows // b)
    if c <= cc:
        geom = jnp.take_along_axis(
            geom_n[:, None, :, :],                         # (B, 1, 5, N)
            idx[:, :, None, :], axis=-1)                   # (B, C, 5, K)
        return _suppress(geom.reshape(b * c, 5, k),
                         scores_k.reshape(b * c, k),
                         classes_k.reshape(b * c, k),
                         conf_threshold, iou_threshold,
                         use_pallas=use_pallas, kind=kind,
                         beta=beta).reshape(b, c, k)
    pad = (-c) % cc
    n_chunks = (c + pad) // cc

    def chunked(a):
        return jnp.moveaxis(
            jnp.pad(a, ((0, 0), (0, pad), (0, 0))).reshape(
                b, n_chunks, cc, k), 1, 0)                 # (n, B, cc, K)

    def one(args):
        ic, sc, cl = args                                  # (B, cc, K)
        geom = jnp.take_along_axis(geom_n[:, None, :, :],
                                   ic[:, :, None, :], axis=-1)
        # route through _suppress: the pallas backend stays usable
        # per chunk, and when b > rows (cc floored to 1) the XLA
        # route's secondary row-chunking still enforces the budget
        return _suppress(geom.reshape(b * cc, 5, k),
                         sc.reshape(b * cc, k),
                         cl.reshape(b * cc, k),
                         conf_threshold, iou_threshold,
                         use_pallas=use_pallas, kind=kind,
                         beta=beta).reshape(b, cc, k)

    keep = lax.map(one, (chunked(idx), chunked(scores_k),
                         chunked(classes_k)))
    return jnp.moveaxis(keep, 0, 1).reshape(b, c + pad, k)[:, :c, :]


def _suppress(geom, scores_k, classes_k, conf_threshold, iou_threshold,
              use_pallas: bool, kind: str = "greedy", beta: float = 0.6):
    if use_pallas and geom.shape[-1] > 256:
        use_pallas = False  # beyond the kernel's VMEM budget (see kernel)
    if kind != "greedy":
        use_pallas = False  # the VMEM kernel computes plain IoU only
    if use_pallas:
        from yolo_tpu.ops.pallas.nms_kernel import suppress

        return suppress(geom, scores_k, classes_k.astype(jnp.float32),
                        conf_threshold=float(conf_threshold),
                        iou_threshold=float(iou_threshold))
    return _suppress_xla_rows(geom, scores_k, classes_k, conf_threshold,
                              iou_threshold, kind=kind, beta=beta)


def _package(flat_boxes, flat_scores, flat_classes, keep, max_detections,
             box_index=None):
    """Final fixed-size output: global top max_detections by kept score.

    box_index (optional, (B, S) int32): slot -> row of flat_boxes,
    for callers whose candidate grid does not materialize its own
    boxes tensor (the per-class exact path defers the gather to the
    final D slots — see nms_batch). Without it, slot s selects
    flat_boxes[:, s] directly."""
    masked = jnp.where(keep > 0.5, flat_scores, -1.0)
    d = min(max_detections, masked.shape[-1])
    best, sel = lax.top_k(masked, d)
    bsel = (sel if box_index is None
            else jnp.take_along_axis(box_index, sel, axis=1))
    return {
        "boxes": jnp.take_along_axis(flat_boxes, bsel[..., None], axis=1),
        "scores": jnp.maximum(best, 0.0),
        "classes": jnp.take_along_axis(flat_classes, sel, axis=1),
        "valid": best >= 0.0,
    }


def nms_batch(boxes: jnp.ndarray, scores: jnp.ndarray, *,
              conf_threshold: float, iou_threshold: float,
              top_k: int = 128, max_detections: int = 100,
              impl: str = "auto", kind: str = "greedy",
              beta: float = 0.6):
    """Class-wise NMS, batched.

    boxes (B, N, 4) xywh; scores (B, N, C).
    Returns fixed-shape arrays sorted by score desc:
      boxes (B, D, 4), scores (B, D), classes (B, D) int32, valid (B, D).
    """
    b, n, c = scores.shape
    if kind != "greedy" and impl in ("fused", "pallas"):
        impl = {"fused": "fused_xla", "pallas": "xla"}[impl]
    if impl == "auto":
        # TPU: fast global-top-K path; elsewhere: exact per-class XLA
        # (keeps low-threshold CPU parity tests oracle-exact)
        impl = "fused" if jax.default_backend() == "tpu" else "xla"

    if impl in ("fused", "fused_xla"):
        # global top-K candidates per image, classes mixed
        k = min(2 * top_k, n * c)
        flat = scores.reshape(b, n * c)
        scores_k, idx = lax.top_k(flat, k)                 # (B, K)
        box_idx = idx // c
        classes_k = (idx % c).astype(jnp.int32)
        boxes_k = jnp.take_along_axis(
            boxes.astype(jnp.float32), box_idx[..., None], axis=1)
        keep = _suppress(_geom(boxes_k), scores_k, classes_k,
                         conf_threshold, iou_threshold,
                         use_pallas=(impl == "fused"),
                         kind=kind, beta=beta)
        return _package(boxes_k, scores_k, classes_k, keep, max_detections)

    if impl in ("pallas", "xla"):
        # exact per-class candidates: (B*C, K) grid. The geometry is
        # built CHANNEL-WISE and the box gather is DEFERRED to the
        # final D slots so no (B, C, K, 4) tensor is materialized:
        # TPU layouts pad the minor-most dim to 128 lanes, making a
        # coords-minor candidate tensor 32x its payload — at 9k tree
        # classes that single allocation is 19.75 GB (the second OOM
        # behind the pairwise matrix; both measured on a v5e), and
        # even an 80-class eval wastes ~0.6 GB per such tensor.
        k = min(top_k, n)
        scores_t = jnp.swapaxes(scores, 1, 2)              # (B, C, N)
        scores_k, idx = lax.top_k(scores_t, k)             # (B, C, K)
        bf = boxes.astype(jnp.float32)
        classes_k = jnp.broadcast_to(
            jnp.arange(c, dtype=jnp.int32)[None, :, None], (b, c, k))
        keep = _per_class_suppress(_geom(bf), idx, scores_k, classes_k,
                                   conf_threshold, iou_threshold,
                                   use_pallas=(impl == "pallas"),
                                   kind=kind, beta=beta)
        # box gather deferred to the final D slots: the flat (C*K)
        # grid's slot j holds class j // k and source box
        # idx[b, j // k, j % k] — slot-for-slot identical to packaging
        # a materialized flat boxes tensor, without the (B, C, K, 4)
        # allocation (see _per_class_suppress)
        return _package(bf, scores_k.reshape(b, c * k),
                        classes_k.reshape(b, c * k),
                        keep.reshape(b, c * k), max_detections,
                        box_index=idx.reshape(b, c * k))

    raise ValueError(f"unknown NMS impl {impl!r}")


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, **kw):
    """Single-image convenience wrapper around nms_batch."""
    out = nms_batch(boxes[None], scores[None], **kw)
    return {key: v[0] for key, v in out.items()}
