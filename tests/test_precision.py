"""Precision-policy tests (SURVEY.md §7.2 'fp32 parity vs speed'):
the bf16 throughput mode must preserve detections after thresholding.

Decode and NMS always run in fp32 (ops/decode.py, ops/nms.py cast up),
so the bf16-vs-fp32 difference enters only through the conv stack. The
testable contract is therefore at the decoded boxes/scores level: with
bounded score/box deviation, any detection with a non-degenerate margin
to the threshold is preserved. (A set-level NMS comparison on *random*
weights is chaotic by construction — hundreds of equal-score overlapping
boxes make greedy suppression an amplifier for 1e-3 jitter — and says
nothing about trained networks, whose detections are sparse and
high-margin. An end-to-end set comparison therefore needs trained
weights, which are unavailable offline — the decode-level bound here is
the testable part of the contract.)"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from yolo_tpu.configs.variants import TINY_YOLOV2_VOC
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.models.predict import forward
from yolo_tpu.ops.decode import decode


def test_bf16_decode_level_parity():
    cfg = dataclasses.replace(TINY_YOLOV2_VOC, input_size=160)
    rng = np.random.default_rng(5)
    params = graph.params_to_jax(
        graph.fold_params(cfg.layers, dw.random_params(cfg.layers, rng,
                                                       scale=0.05)))
    x = jnp.asarray(rng.uniform(0, 1, (2, 160, 160, 3)).astype(np.float32))

    lo32 = forward(cfg, params, x, compute_dtype=jnp.float32)
    lob = forward(cfg, params, x, compute_dtype=jnp.bfloat16)
    b32, s32 = decode(lo32, cfg.anchors, cfg.num_classes)
    bb, sb = decode(lob, cfg.anchors, cfg.num_classes)

    score_dev = np.abs(np.asarray(s32) - np.asarray(sb)).max()
    assert score_dev < 0.03, f"score deviation {score_dev}"

    # box deviation measured only on plausible detections: exp(tw) on the
    # huge logits of *suppressed* random boxes amplifies bf16 jitter
    # astronomically, but those boxes never clear the threshold
    b32a = np.asarray(b32)
    plausible = (np.asarray(s32).max(-1) >= 0.3) & \
                (b32a[..., 2:].max(-1) < 2.0)   # sane size (trained regime)
    a = b32a[plausible]
    b = np.asarray(bb)[plausible]
    assert len(a) > 0
    # centers: absolute (net-normalized); sizes: relative (exp scale)
    assert np.abs(a[:, :2] - b[:, :2]).max() < 0.02
    rel = np.abs(a[:, 2:] - b[:, 2:]) / np.maximum(a[:, 2:], 1e-3)
    assert rel.max() < 0.15, f"wh rel deviation {rel.max()}"


def test_bf16_decode_level_parity_yolov3():
    """Same decode-level bf16 contract for the multi-head [yolo] path
    (sigmoid class scores)."""
    from yolo_tpu.configs.variants import YOLOV3_TINY_COCO
    from yolo_tpu.ops.decode import decode_yolo

    cfg = dataclasses.replace(YOLOV3_TINY_COCO, input_size=160)
    masks = [h.mask for h in cfg.yolo_heads]
    rng = np.random.default_rng(7)
    params = graph.params_to_jax(
        graph.fold_params(cfg.layers, dw.random_params(cfg.layers, rng,
                                                       scale=0.05)))
    x = jnp.asarray(rng.uniform(0, 1, (2, 160, 160, 3)).astype(np.float32))

    lo32 = forward(cfg, params, x, compute_dtype=jnp.float32)
    lob = forward(cfg, params, x, compute_dtype=jnp.bfloat16)
    b32, s32 = decode_yolo(lo32, cfg.anchors, masks, cfg.num_classes,
                           cfg.input_size)
    bb, sb = decode_yolo(lob, cfg.anchors, masks, cfg.num_classes,
                         cfg.input_size)

    score_dev = np.abs(np.asarray(s32) - np.asarray(sb)).max()
    assert score_dev < 0.03, f"score deviation {score_dev}"

    b32a = np.asarray(b32)
    plausible = (np.asarray(s32).max(-1) >= 0.3) & \
                (b32a[..., 2:].max(-1) < 2.0)
    a = b32a[plausible]
    b = np.asarray(bb)[plausible]
    assert len(a) > 0
    assert np.abs(a[:, :2] - b[:, :2]).max() < 0.02
    rel = np.abs(a[:, 2:] - b[:, 2:]) / np.maximum(a[:, 2:], 1e-3)
    assert rel.max() < 0.15, f"wh rel deviation {rel.max()}"
