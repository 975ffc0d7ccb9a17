"""Frame-in/boxes-out inference pipeline: one compiled graph.

The reference's predict path (SURVEY.md §3.1) is host-preprocess ->
sess.run(conv stack) -> host decode/NMS. Here everything from raw RGB to
fixed-shape detections is a single jitted function (BASELINE.json:5):

  raw u8 (B, H, W, 3) -> letterbox -> backbone+head -> decode -> NMS
  -> {boxes (B, D, 4) [original-image pixel xyxy], scores, classes, valid}

Source shape and net size are static per specialization; the jit cache
buckets over them (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from yolo_tpu.configs.specs import ModelConfig
from yolo_tpu.models import graph
from yolo_tpu.ops.decode import decode, decode_yolo
from yolo_tpu.ops.letterbox import (letterbox, stretch_resize,
                                    unletterbox_boxes_xyxy,
                                    unstretch_boxes_xyxy)
from yolo_tpu.ops.nms import nms_batch


def forward(cfg: ModelConfig, params, images_01: jnp.ndarray,
            *, compute_dtype=jnp.float32,
            conv_impl: str = "xla") -> jnp.ndarray:
    """Preprocessed (B, S, S, 3) [0,1] float -> raw head logits (fp32)."""
    return graph.apply_layers(cfg.layers, params, images_01,
                              eps=cfg.bn_eps, compute_dtype=compute_dtype,
                              conv_impl=conv_impl)


def detect(cfg: ModelConfig, params, images_01: jnp.ndarray, *,
           compute_dtype=jnp.float32,
           conf_threshold: Optional[float] = None,
           nms_threshold: Optional[float] = None,
           top_k: int = 128, max_detections: int = 100,
           nms_impl: str = "auto", head: str = "auto",
           use_tree_map: bool = False,
           hier_thresh: Optional[float] = None,
           conv_impl: str = "xla"):
    """Preprocessed images -> fixed-shape detections (net-space xywh).

    head="fused" runs the objectness-prefiltered decode+NMS
    (ops/head.py, exact at production thresholds, TPU default);
    head="reference" runs full decode + per-class NMS (parity path,
    CPU default).

    use_tree_map / hier_thresh apply to YOLO9000 tree models only
    (ops/decode.decode): map projection vs hierarchy traversal.

    conv_impl="pallas" selects the A/B Pallas conv blocks for the
    backbone (ops/pallas/conv_kernel.py — measured slower than XLA,
    docs/PERF.md; kept reachable for re-measurement on new toolchains;
    code-review finding: forward()'s parameter was unreachable from
    every production entry point).
    """
    logits = forward(cfg, params, images_01, compute_dtype=compute_dtype,
                     conv_impl=conv_impl)
    return _postprocess(cfg, logits, conf_threshold=conf_threshold,
                        nms_threshold=nms_threshold, top_k=top_k,
                        max_detections=max_detections, nms_impl=nms_impl,
                        head=head, use_tree_map=use_tree_map,
                        hier_thresh=hier_thresh)


def _postprocess(cfg: ModelConfig, logits, *,
                 compute_dtype=None,  # accepted for call symmetry
                 conf_threshold: Optional[float] = None,
                 nms_threshold: Optional[float] = None,
                 top_k: int = 128, max_detections: int = 100,
                 nms_impl: str = "auto", head: str = "auto",
                 use_tree_map: bool = False,
                 hier_thresh: Optional[float] = None):
    conf_t = cfg.conf_threshold if conf_threshold is None else conf_threshold
    iou_t = cfg.nms_threshold if nms_threshold is None else nms_threshold
    if use_tree_map and cfg.tree_map is None:
        raise ValueError("use_tree_map=True but the model has no "
                         "[region] map= projection")
    if head == "auto":
        # fused heads are exact only while few boxes clear the
        # threshold; at PR-curve thresholds take the reference path
        head = ("fused" if jax.default_backend() == "tpu"
                and conf_t >= 0.1
                and cfg.head_kind != "detection" else "reference")
    if cfg.tree is not None and cfg.head_kind == "region" \
            and head == "fused":
        # YOLO9000: the fused head runs the hierarchy math on the
        # objectness survivors only (skips the dense N x n_nodes score
        # tensor; traversal-mode candidate cut is EXACT — score == conf)
        from yolo_tpu.ops.head import detect_head_tree

        pre = top_k if conf_t >= 0.3 else 2 * top_k
        return detect_head_tree(
            logits, cfg.anchors, cfg.tree,
            conf_threshold=conf_t, iou_threshold=iou_t,
            hier_thresh=(cfg.hier_thresh if hier_thresh is None
                         else hier_thresh),
            tree_map=cfg.tree_map if use_tree_map else None,
            pre_top_k=pre, max_detections=max_detections,
            use_pallas=(jax.default_backend() == "tpu"),
            nms_kind=cfg.nms_kind, beta_nms=cfg.beta_nms)
    if cfg.head_kind == "detection":
        # yolov1 [detection]: reference decode path only (tiny 7x7*num
        # candidate set — a fused prefilter has nothing to save)
        if head == "fused":
            raise ValueError("head='fused' does not support yolov1 "
                             "[detection] models")
        from yolo_tpu.ops.decode import decode_detection

        boxes, scores = decode_detection(logits, cfg.detection_head)
        return nms_batch(
            boxes, scores, conf_threshold=conf_t, iou_threshold=iou_t,
            top_k=top_k, max_detections=max_detections, impl=nms_impl,
            kind=cfg.nms_kind, beta=cfg.beta_nms)
    if cfg.head_kind == "yolo":
        # yolov3/v4 family: multi-head [yolo] decode (sigmoid classes,
        # pixel anchors, per-head scale_x_y)
        scales = [h.scale_xy for h in cfg.yolo_heads]
        ncs = [h.new_coords for h in cfg.yolo_heads]
        gas = [h.gaussian for h in cfg.yolo_heads]
        if head == "fused":
            from yolo_tpu.ops.head import detect_head_yolo

            pre = top_k if conf_t >= 0.3 else 2 * top_k
            return detect_head_yolo(
                logits, cfg.anchors, [h.mask for h in cfg.yolo_heads],
                cfg.num_classes, cfg.input_hw,
                conf_threshold=conf_t, iou_threshold=iou_t,
                pre_top_k=pre, max_detections=max_detections,
                use_pallas=(jax.default_backend() == "tpu"),
                scales=scales, nms_kind=cfg.nms_kind,
                beta_nms=cfg.beta_nms, new_coords=ncs, gaussian=gas)
        boxes, scores = decode_yolo(
            logits, cfg.anchors, [h.mask for h in cfg.yolo_heads],
            cfg.num_classes, cfg.input_hw, scales=scales,
            new_coords=ncs, gaussian=gas)
        return nms_batch(
            boxes, scores, conf_threshold=conf_t, iou_threshold=iou_t,
            top_k=top_k, max_detections=max_detections, impl=nms_impl,
            kind=cfg.nms_kind, beta=cfg.beta_nms)
    if head == "fused":
        from yolo_tpu.ops.head import detect_head

        # prefilter budget: top_k suffices at high thresholds; near the
        # exactness boundary (low conf, dense scenes, larger grids)
        # spend 2x so the objectness cut can't drop passing boxes
        pre = top_k if conf_t >= 0.3 else 2 * top_k
        return detect_head(
            logits, cfg.anchors, cfg.num_classes,
            conf_threshold=conf_t, iou_threshold=iou_t,
            pre_top_k=pre, max_detections=max_detections,
            use_pallas=(jax.default_backend() == "tpu"),
            nms_kind=cfg.nms_kind, beta_nms=cfg.beta_nms)
    boxes, scores = decode(
        logits, cfg.anchors, cfg.num_classes, tree=cfg.tree,
        tree_map=cfg.tree_map if use_tree_map else None,
        hier_thresh=(cfg.hier_thresh if hier_thresh is None
                     else hier_thresh))
    return nms_batch(
        boxes, scores, conf_threshold=conf_t, iou_threshold=iou_t,
        top_k=top_k, max_detections=max_detections, impl=nms_impl,
        kind=cfg.nms_kind, beta=cfg.beta_nms)


def _entry_fusable(cfg: ModelConfig, params) -> bool:
    from yolo_tpu.configs.specs import Route, Sam, ScaleChannels, Shortcut
    from yolo_tpu.ops.pallas import entry_kernel as ek

    def refs_ok(idx, refs):
        # layers[2:] must resolve cross-references without the entry
        # layers: relative only, never reaching back into layers 0-1
        # (Shortcut/Sam/ScaleChannels frm included — an absolute or
        # early reference would silently resolve against the
        # truncated list, shifted by 2; code-review finding)
        return all(r < 0 and idx + r >= 2 for r in refs)

    return (ek.eligible(cfg.layers)
            # the parity-plane letterbox packs exactly 3 RGB channels
            # (2 column-parities x 3 = 6 planes); grayscale nets stay
            # on the XLA path
            and cfg.in_channels == 3
            and "bias" in params[0] and "kernel_q" not in params[0]
            and all(
                refs_ok(idx, l.layers if isinstance(l, Route)
                        else (l.frm,))
                for idx, l in enumerate(cfg.layers)
                if isinstance(l, (Route, Shortcut, Sam, ScaleChannels))))


def detect_raw(cfg: ModelConfig, params, images_u8: jnp.ndarray, *,
               compute_dtype=jnp.float32, entry: str = "auto",
               resize: str = "letterbox", **kw):
    """Raw RGB (B, H, W, 3) uint8 -> detections with boxes mapped back to
    original-image pixel xyxy. The full fused path.

    resize="stretch" uses plain (aspect-ignoring) bilinear resize — the
    AlexeyAB-darknet default (letter_box=0), for box-level parity with
    that tool family; "letterbox" (default) matches pjreddie darknet.

    entry="fused" replaces letterbox + conv1 + pool1 with the parity-
    plane letterbox and the fused entry Pallas kernel
    (ops/pallas/entry_kernel.py) — box/score-identical to the XLA path
    at bf16, but measured ~4% SLOWER end-to-end (XLA's whole-graph
    fusion beats the standalone phase sum; docs/PERF.md entry-layer
    study), so "auto" always resolves to "xla". Kept as an explicit
    A/B path and the substrate for future deeper fusion."""
    b, h, w, _ = images_u8.shape
    if entry == "auto":
        entry = "xla"
    if resize == "stretch":
        if entry == "fused":
            raise ValueError("entry='fused' implements letterbox only")
        x = stretch_resize(images_u8, cfg.input_hw, dtype=compute_dtype)
        dets = detect(cfg, params, x, compute_dtype=compute_dtype, **kw)
        dets["boxes"] = unstretch_boxes_xyxy(dets["boxes"], src_h=h,
                                             src_w=w)
        return dets
    if entry == "fused":
        from yolo_tpu.ops.pallas import entry_kernel as ek

        if not _entry_fusable(cfg, params):
            raise ValueError("entry='fused' needs a conv3x3+pool2x2 "
                             "entry and folded-BN params")
        if cfg.input_w != cfg.input_h:
            # the Pallas entry kernel's plane packing and tile picker
            # are square-net only; rect nets take the XLA path
            raise ValueError(
                f"entry='fused' supports square nets only "
                f"({cfg.input_w}x{cfg.input_h} is rectangular) — use "
                f"the default entry='xla'")
        if cfg.input_size > 416:
            # the kernel processes one whole image per program with no
            # VMEM-driven spatial tiling: 416 fits (~10 MB, the
            # measured A/B in docs/PERF.md); 608 double-buffers past
            # the ~16 MB VMEM and dies at Mosaic compile — fail with
            # the reason instead (code-review finding)
            raise ValueError(
                f"entry='fused' supports net sizes <= 416 (whole-image "
                f"VMEM residency; {cfg.input_size} exceeds it) — use "
                f"the default entry='xla'")
        planes = ek.letterbox_planes(images_u8, cfg.input_size,
                                     interp_dtype=compute_dtype)
        x = ek.fused_entry_from_planes(
            planes, params[0]["kernel"], params[0]["bias"],
            out_dtype=compute_dtype,
            interpret=jax.default_backend() != "tpu")
        logits = graph.apply_layers(
            cfg.layers[2:], params[1:], x, eps=cfg.bn_eps,
            compute_dtype=compute_dtype, input_layout="NHCW")
        dets = _postprocess(cfg, logits, compute_dtype=compute_dtype, **kw)
    else:
        x = letterbox(images_u8, cfg.input_hw, dtype=compute_dtype)
        dets = detect(cfg, params, x, compute_dtype=compute_dtype, **kw)
    dets["boxes"] = unletterbox_boxes_xyxy(
        dets["boxes"], src_h=h, src_w=w, net_size=cfg.input_hw)
    return dets


@functools.lru_cache(maxsize=32)
def _jitted_detect_pre(cfg: ModelConfig, compute_dtype, conf_threshold,
                       nms_threshold, top_k, max_detections, nms_impl,
                       head, use_tree_map=False, hier_thresh=None):
    def fn(params, images_01):
        return detect(cfg, params, images_01.astype(compute_dtype),
                      compute_dtype=compute_dtype,
                      conf_threshold=conf_threshold,
                      nms_threshold=nms_threshold,
                      top_k=top_k, max_detections=max_detections,
                      nms_impl=nms_impl, head=head,
                      use_tree_map=use_tree_map, hier_thresh=hier_thresh)
    return jax.jit(fn)


def make_detector_preprocessed(cfg: ModelConfig, *,
                               compute_dtype=jnp.float32,
                               conf_threshold: Optional[float] = None,
                               nms_threshold: Optional[float] = None,
                               top_k: int = 128, max_detections: int = 100,
                               nms_impl: str = "auto", head: str = "auto",
                               use_tree_map: bool = False,
                               hier_thresh: Optional[float] = None):
    """Jitted detector for host-letterboxed (B, net, net, 3) [0,1] input:
    ONE compiled program regardless of source image shapes (the
    heterogeneous-directory mode, data/pipeline.py net_size=...).
    Returns net-space xywh boxes; un-letterbox per image on host
    (ops/numpy_ref.unletterbox_boxes)."""
    return _jitted_detect_pre(
        cfg, compute_dtype,
        cfg.conf_threshold if conf_threshold is None else conf_threshold,
        cfg.nms_threshold if nms_threshold is None else nms_threshold,
        top_k, max_detections, nms_impl, head, use_tree_map, hier_thresh)


@functools.lru_cache(maxsize=32)
def _jitted_detect_raw(cfg: ModelConfig, compute_dtype, conf_threshold,
                       nms_threshold, top_k, max_detections, nms_impl,
                       head, entry, resize, use_tree_map=False,
                       hier_thresh=None):
    def fn(params, images_u8):
        return detect_raw(cfg, params, images_u8,
                          compute_dtype=compute_dtype,
                          conf_threshold=conf_threshold,
                          nms_threshold=nms_threshold,
                          top_k=top_k, max_detections=max_detections,
                          nms_impl=nms_impl, head=head, entry=entry,
                          resize=resize, use_tree_map=use_tree_map,
                          hier_thresh=hier_thresh)
    return jax.jit(fn)


def make_detector(cfg: ModelConfig, *, compute_dtype=jnp.float32,
                  conf_threshold: Optional[float] = None,
                  nms_threshold: Optional[float] = None,
                  top_k: int = 128, max_detections: int = 100,
                  nms_impl: str = "auto", head: str = "auto",
                  entry: str = "auto", resize: str = "letterbox",
                  use_tree_map: bool = False,
                  hier_thresh: Optional[float] = None):
    """Jitted raw-RGB detector; recompiles only per (source-shape, batch)
    bucket."""
    return _jitted_detect_raw(
        cfg, compute_dtype,
        cfg.conf_threshold if conf_threshold is None else conf_threshold,
        cfg.nms_threshold if nms_threshold is None else nms_threshold,
        top_k, max_detections, nms_impl, head, entry, resize,
        use_tree_map, hier_thresh)
