"""Shared evaluation machinery: dataset -> ground truth, model ->
detections (used by `cli eval` and by mid-training validation,
SURVEY.md §3.5)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def build_ground_truth(samples: Sequence[Tuple[str, object]],
                       class_names) -> Tuple[Dict, Dict]:
    """(image_path, annotation) samples -> ({img_id: gt}, {img_id:
    original image id}). Annotations are VOC XML paths or pre-parsed
    dicts (cli._dataset_samples output); difficult/crowd flags kept."""
    from yolo_tpu.data.voc import parse_annotation

    gt, orig_ids = {}, {}
    for img_id, (_path, ann) in enumerate(samples):
        if not isinstance(ann, dict):
            ann = parse_annotation(ann, class_names, keep_difficult=True)
        orig_ids[img_id] = ann.get("image_id", img_id)
        w, h = ann["width"], ann["height"]
        if len(ann["boxes"]):
            b = ann["boxes"]
            xyxy = np.stack([
                (b[:, 0] - b[:, 2] / 2) * w, (b[:, 1] - b[:, 3] / 2) * h,
                (b[:, 0] + b[:, 2] / 2) * w, (b[:, 1] + b[:, 3] / 2) * h,
            ], axis=-1)
        else:
            xyxy = np.zeros((0, 4))
        gt[img_id] = {"boxes": xyxy, "classes": ann["classes"],
                      "difficult": ann["difficult"],
                      # retained so consumers (the comp4 writer's
                      # devkit clamp) need not re-parse annotations
                      "width": int(w), "height": int(h)}
        if "areas" in ann:
            # COCO segmentation areas (pycocotools areaRng buckets by
            # ann['area'], not bbox area) — VOC XML has no equivalent,
            # so the key is optional and the evaluator falls back
            gt[img_id]["areas"] = ann["areas"]
    return gt, orig_ids


def collect_detections(cfg, folded_params,
                       samples: Sequence[Tuple[str, object]], *,
                       batch: int = 32, eval_conf: float = 0.005,
                       compute_dtype=None,
                       resize: str = "letterbox",
                       use_tree_map: bool = False,
                       hier_thresh=None) -> Dict[int, List]:
    """Run the exact reference decode + per-class NMS path over the
    samples; returns {img_id: [(cls, score, x1, y1, x2, y2) pixel], ...}.

    Host-preprocess mode: heterogeneous source shapes compile ONE
    program. PR-curve thresholds violate the fused head's exactness
    precondition (ops/head.py), so this always takes the reference
    head."""
    import jax.numpy as jnp

    from yolo_tpu.data.pipeline import DevicePrefetcher, inference_batches
    from yolo_tpu.models.predict import make_detector_preprocessed
    from yolo_tpu.ops import numpy_ref as npr
    from yolo_tpu.ops.letterbox import letterbox_geometry

    det = make_detector_preprocessed(
        cfg, compute_dtype=compute_dtype or jnp.float32,
        conf_threshold=eval_conf, head="reference", nms_impl="xla",
        use_tree_map=use_tree_map, hier_thresh=hier_thresh)
    # duplicate paths (e.g. a COCO json with two image records sharing
    # one file_name) must ALL receive the decoded detections — a plain
    # dict would keep only the last id and silently score the others'
    # ground truth as misses (code-review finding)
    path_to_ids: Dict[str, List[int]] = {}
    for i, (p, _) in enumerate(samples):
        path_to_ids.setdefault(p, []).append(i)
    host_iter = inference_batches(list(path_to_ids), batch,
                                  net_size=cfg.input_hw, resize=resize,
                                  channels=cfg.in_channels)
    net_h, net_w = cfg.input_hw
    detections: Dict[int, List] = {}
    import sys
    import time

    t0, done = None, 0
    for b in DevicePrefetcher(host_iter, depth=2):
        out = det(folded_params, jnp.asarray(b["images"]))
        # ONE device->host fetch per output array per batch — the axon
        # relay pays a full round trip per fetch, so per-element
        # float()/int() pulls would make eval transfer-latency-bound
        # (code-review finding)
        valid_np = np.asarray(out["valid"])
        boxes_np = np.asarray(out["boxes"], np.float64)
        scores_np = np.asarray(out["scores"])
        classes_np = np.asarray(out["classes"])
        for bi, path in enumerate(b["paths"]):
            src_h, src_w = b["shapes"][bi]
            valid = np.nonzero(valid_np[bi])[0]
            boxes_net = boxes_np[bi][valid]
            if resize == "stretch":
                xyxy = npr.unstretch_boxes(boxes_net, src_w, src_h)
            else:
                scale, rh, rw, px, py = letterbox_geometry(
                    src_h, src_w, (net_h, net_w))
                xyxy = npr.unletterbox_boxes(boxes_net, scale, px, py,
                                             net_w, net_h, src_w, src_h)
            dets = [(int(classes_np[bi][i]), float(scores_np[bi][i]),
                     *xyxy[j]) for j, i in enumerate(valid)]
            for sid in path_to_ids[path]:
                detections[sid] = list(dets)
        # progress: results for this batch are already fetched above;
        # start the clock after batch 1 so the first-compile ~30 s
        # doesn't poison the rate
        done += len(b["paths"])
        if t0 is None:
            t0 = time.perf_counter()
            done_base = done
        elif done % (batch * 8) < batch and done < len(samples):
            rate = (done - done_base) / max(time.perf_counter() - t0,
                                            1e-9)
            print(f"eval: {done}/{len(samples)} images "
                  f"({rate:.0f} img/s)", file=sys.stderr)
    return detections


def quick_map(cfg, train_params, samples, *, batch: int = 16,
              eval_conf: float = 0.005, compute_dtype=None,
              use_07_metric: bool = True,
              resize: str = "letterbox") -> float:
    """Mid-training validation mAP: fold the CURRENT (unfolded-BN)
    train params and score `samples`. Reuses the same jit bucket on
    every call."""
    import jax

    from yolo_tpu.eval.voc_map import evaluate
    from yolo_tpu.models import graph

    params = jax.device_get(train_params)
    folded = graph.params_to_jax(
        graph.fold_params(cfg.layers, params, cfg.bn_eps))
    gt, _ = build_ground_truth(samples, cfg.class_names)
    dets = collect_detections(cfg, folded, samples, batch=batch,
                              eval_conf=eval_conf,
                              compute_dtype=compute_dtype,
                              resize=resize)
    return float(evaluate(dets, gt, cfg.num_classes,
                          use_07_metric=use_07_metric)["map"])
