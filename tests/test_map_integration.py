"""Train -> detect -> VOC mAP integration: overfit the micro model on a
tiny synthetic dataset and verify the evaluator reports high mAP on it
(the parity-gate metric path end-to-end, SURVEY.md §3.5)."""

import numpy as np

import jax.numpy as jnp

from tests.test_train import MICRO
from yolo_tpu.data import targets as tgt
from yolo_tpu.eval.voc_map import evaluate
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.models.predict import detect
from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step


def _dataset():
    """4 images, each one bright rectangle with a distinct position and
    class (classes 0-3)."""
    scenes = []
    specs = [
        (0, (0.3, 0.4, 0.3, 0.4), (0.9, 0.2, 0.2)),
        (1, (0.7, 0.4, 0.25, 0.4), (0.2, 0.9, 0.2)),
        (2, (0.4, 0.65, 0.4, 0.3), (0.2, 0.2, 0.9)),
        (3, (0.6, 0.6, 0.3, 0.35), (0.8, 0.8, 0.1)),
    ]
    for cls, (cx, cy, w, h), color in specs:
        img = np.zeros((64, 64, 3), np.float32) + 0.1
        x1, y1 = int((cx - w / 2) * 64), int((cy - h / 2) * 64)
        x2, y2 = int((cx + w / 2) * 64), int((cy + h / 2) * 64)
        img[y1:y2, x1:x2] = color
        scenes.append((img, np.array([[cx, cy, w, h]]), np.array([cls])))
    return scenes


def test_train_then_map():
    scenes = _dataset()
    enc = tgt.encode_batch([s[1] for s in scenes], [s[2] for s in scenes],
                           grid=MICRO.grid_size, anchors=MICRO.anchors,
                           num_classes=MICRO.num_classes)
    batch = {k: jnp.asarray(v) for k, v in enc.items()}
    batch["images"] = jnp.asarray(np.stack([s[0] for s in scenes]))

    tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                       weight_decay=0.0)
    state = init_state(dw.random_params(MICRO.layers,
                                        np.random.default_rng(0)), tcfg)
    step = make_train_step(MICRO, tcfg)
    for _ in range(800):
        state, metrics = step(state, batch)
    assert float(metrics["loss"]) < 1.0

    folded = graph.params_to_jax(graph.fold_params(
        MICRO.layers,
        [{k: np.asarray(v) for k, v in p.items()} for p in state["params"]],
        MICRO.bn_eps))
    out = detect(MICRO, folded, batch["images"], conf_threshold=0.05,
                 head="reference", nms_impl="xla")

    gt, detections = {}, {}
    for i, (_, boxes, classes) in enumerate(scenes):
        xyxy = np.stack([
            (boxes[:, 0] - boxes[:, 2] / 2) * 64,
            (boxes[:, 1] - boxes[:, 3] / 2) * 64,
            (boxes[:, 0] + boxes[:, 2] / 2) * 64,
            (boxes[:, 1] + boxes[:, 3] / 2) * 64,
        ], axis=-1)
        gt[i] = {"boxes": xyxy, "classes": classes,
                 "difficult": np.zeros(len(classes), np.int32)}
        valid = np.asarray(out["valid"][i])
        dets_i = []
        for j in np.nonzero(valid)[0]:
            cx, cy, w, h = np.asarray(out["boxes"][i][j], np.float64)
            dets_i.append((int(out["classes"][i][j]),
                           float(out["scores"][i][j]),
                           (cx - w / 2) * 64, (cy - h / 2) * 64,
                           (cx + w / 2) * 64, (cy + h / 2) * 64))
        detections[i] = dets_i

    result = evaluate(detections, gt, MICRO.num_classes)
    assert result["map"] > 0.99, f"mAP {result['map']}: {result['ap']}"


def test_train_then_map_yolov3():
    """Same end-to-end gate for the yolov3 family: overfit the 2-head
    micro-v3 model (multi-head targets + yolo_layer loss) and verify
    near-perfect mAP through the v3 decode/NMS path."""
    from tests.test_yolov3 import MICRO_V3

    scenes = _dataset()
    enc = tgt.encode_batch_for(MICRO_V3, [s[1] for s in scenes],
                               [s[2] for s in scenes])
    batch = {k: jnp.asarray(v) for k, v in enc.items()}
    batch["images"] = jnp.asarray(np.stack([s[0] for s in scenes]))

    tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                       weight_decay=0.0)
    state = init_state(dw.random_params(MICRO_V3.layers,
                                        np.random.default_rng(0)), tcfg)
    step = make_train_step(MICRO_V3, tcfg)
    for _ in range(800):
        state, metrics = step(state, batch)
    # the xy BCE has a soft-target entropy floor, so total loss never
    # reaches 0 at a perfect fit — gate on the floored-at-zero terms
    assert float(metrics["obj"]) < 0.05
    assert float(metrics["class"]) < 0.05
    assert float(metrics["noobj"]) < 0.7

    folded = graph.params_to_jax(graph.fold_params(
        MICRO_V3.layers,
        [{k: np.asarray(v) for k, v in p.items()} for p in state["params"]],
        MICRO_V3.bn_eps))
    out = detect(MICRO_V3, folded, batch["images"], conf_threshold=0.05,
                 head="reference", nms_impl="xla")

    gt, detections = {}, {}
    for i, (_, boxes, classes) in enumerate(scenes):
        xyxy = np.stack([
            (boxes[:, 0] - boxes[:, 2] / 2) * 64,
            (boxes[:, 1] - boxes[:, 3] / 2) * 64,
            (boxes[:, 0] + boxes[:, 2] / 2) * 64,
            (boxes[:, 1] + boxes[:, 3] / 2) * 64,
        ], axis=-1)
        gt[i] = {"boxes": xyxy, "classes": classes,
                 "difficult": np.zeros(len(classes), np.int32)}
        valid = np.asarray(out["valid"][i])
        dets_i = []
        for j in np.nonzero(valid)[0]:
            cx, cy, w, h = np.asarray(out["boxes"][i][j], np.float64)
            dets_i.append((int(out["classes"][i][j]),
                           float(out["scores"][i][j]),
                           (cx - w / 2) * 64, (cy - h / 2) * 64,
                           (cx + w / 2) * 64, (cy + h / 2) * 64))
        detections[i] = dets_i

    result = evaluate(detections, gt, MICRO_V3.num_classes)
    assert result["map"] > 0.99, f"mAP {result['map']}: {result['ap']}"
