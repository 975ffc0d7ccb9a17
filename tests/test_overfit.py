"""End-to-end learning test: overfit the micro model on one synthetic
scene and verify the trained network *detects* the ground-truth box
(IoU > 0.5, right class). Exercises GT encoding -> loss -> gradients ->
optimizer -> BN stats -> fold -> decode -> NMS as one system."""

import numpy as np

import jax.numpy as jnp

from tests.test_train import MICRO
from yolo_tpu.data import targets as tgt
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.models.predict import detect
from yolo_tpu.ops.numpy_ref import iou_xywh
from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step


def test_overfit_single_scene():
    rng = np.random.default_rng(0)
    gt_box = np.array([0.5, 0.45, 0.4, 0.5])
    gt_cls = 2

    # scene: bright rectangle on dark background where the box is
    img = np.zeros((64, 64, 3), np.float32) + 0.1
    img[12:42, 20:44] = (0.9, 0.2, 0.3)
    batch = {k: jnp.asarray(np.repeat(v[None], 4, 0)) for k, v in tgt.encode(
        gt_box[None], np.array([gt_cls]), grid=MICRO.grid_size,
        anchors=MICRO.anchors, num_classes=MICRO.num_classes).items()}
    batch["images"] = jnp.asarray(np.repeat(img[None], 4, 0))

    tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                       weight_decay=0.0)
    state = init_state(dw.random_params(MICRO.layers, rng), tcfg)
    step = make_train_step(MICRO, tcfg)
    for _ in range(800):  # BN EMA (0.99) needs ~600 steps to converge
        state, metrics = step(state, batch)
    assert float(metrics["loss"]) < 1.0, f"did not converge: {metrics}"

    folded = graph.params_to_jax(
        graph.fold_params(MICRO.layers, [
            {k: np.asarray(v) for k, v in p.items()}
            for p in state["params"]
        ], MICRO.bn_eps))
    out = detect(MICRO, folded, batch["images"][:1], conf_threshold=0.5,
                 head="reference", nms_impl="xla")
    valid = np.asarray(out["valid"][0])
    assert valid.sum() >= 1, "trained model produced no detections"
    best_iou, best_cls = 0.0, -1
    for i in np.nonzero(valid)[0]:
        iou = iou_xywh(np.asarray(out["boxes"][0][i], np.float64), gt_box)
        if iou > best_iou:
            best_iou = iou
            best_cls = int(out["classes"][0][i])
    assert best_iou > 0.7, f"best IoU {best_iou}"
    assert best_cls == gt_cls
