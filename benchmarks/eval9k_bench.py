"""End-to-end 9k-class eval drive: the user-facing surface of the
tree-memory work (docs/PERF.md "tree decode" note).

Runs the PRODUCTION eval path — host letterbox -> full darknet-19
trunk -> tree decode (traversal or .map projection) -> exact
class-chunked per-class NMS -> unletterbox -> VOC scoring — over a
synthetic image set with a generated 9k-shaped tree, and reports
wall/throughput plus a self-consistency mAP (GT = the model's own
top detections, so the score is ~1 when the pipeline is coherent
and collapses when any stage drifts).

Usage: python benchmarks/eval9k_bench.py [--nodes 9418] [--images 16]
       [--batch 8] [--net 416] [--mode traversal|map] [--cpu]
Prints ONE json line.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from tree_bench import synth_tree  # noqa: E402


def sample_leaf_map(tree, n=80, seed=1):
    """n DISTINCT leaves, seeded — real darknet .map files list
    distinct leaves (coco9k.map). Shared by this bench and
    benchmarks/record.py (code-review r5: two drifting copies)."""
    leaves = np.asarray([i for i in range(tree.n_nodes)
                         if tree.leaf(i)])
    pick = np.random.default_rng(seed).choice(
        leaves, size=min(n, len(leaves)), replace=False)
    return tuple(int(v) for v in pick)


def synth_anchors(a=3):
    """The synthetic prior ladder both tree benches use."""
    return tuple((0.8 + 0.7 * i, 1.1 + 0.9 * i) for i in range(a))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=9418)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--net", type=int, default=416)
    ap.add_argument("--mode", default="traversal",
                    choices=["traversal", "map"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import cv2

    from yolo_tpu.configs.specs import ModelConfig
    from yolo_tpu.configs.variants import _yolov2_layers
    from yolo_tpu.eval.runner import collect_detections
    from yolo_tpu.eval.voc_map import evaluate
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph

    tree = synth_tree(args.nodes)
    a = 3
    anchors = synth_anchors(a)
    use_map = args.mode == "map"
    # real darknet .map files list DISTINCT leaves (coco9k.map) —
    # advisor r4; sampling shared with benchmarks/record.py
    tree_map = sample_leaf_map(tree) if use_map else None
    cfg = ModelConfig(name="synth9000",
                      layers=_yolov2_layers(a * (5 + tree.n_nodes)),
                      anchors=anchors, class_names=tree.names,
                      input_size=args.net, tree=tree, hier_thresh=0.5,
                      tree_map=tree_map)

    rng = np.random.default_rng(0)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    # fan-in scaling keeps head logits sane through the 1024-ch trunk
    for p in params:
        if "kernel" in p:
            fan_in = int(np.prod(p["kernel"].shape[:-1]))
            p["kernel"] = rng.normal(0, 1.4 / np.sqrt(fan_in),
                                     p["kernel"].shape
                                     ).astype(np.float32)
    folded = graph.params_to_jax(
        graph.fold_params(cfg.layers, params, cfg.bn_eps))

    d = tempfile.mkdtemp(prefix="eval9k_")
    samples = []
    for i in range(args.images):
        h = int(rng.integers(240, 480))
        w = int(rng.integers(240, 480))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = os.path.join(d, f"i{i}.png")
        cv2.imwrite(p, img[..., ::-1])
        samples.append((p, None))

    # map-projection scores are conf * absolute (a product of ~depth
    # conditionals — small by construction for deep nodes), so the
    # map mode collects at a validation-style low threshold
    eval_conf = 0.001 if use_map else 0.05
    t0 = time.perf_counter()
    dets = collect_detections(cfg, folded, samples, batch=args.batch,
                              eval_conf=eval_conf, use_tree_map=use_map)
    wall = time.perf_counter() - t0

    gt = {}
    for img_id, (p, _) in enumerate(samples):
        boxes = [[x1, y1, x2, y2]
                 for (_c, _s, x1, y1, x2, y2) in dets.get(img_id, [])[:5]]
        classes = [c for (c, *_rest) in dets.get(img_id, [])[:5]]
        if not boxes:
            boxes, classes = [[0, 0, 10, 10]], [0]
        gt[img_id] = {"boxes": np.asarray(boxes, np.float64),
                      "classes": np.asarray(classes, np.int64),
                      "difficult": np.zeros(len(classes), np.int64)}
    nc = cfg.num_detection_classes(use_map)
    m = evaluate(dets, gt, nc, use_07_metric=True)["map"]

    print(json.dumps({
        "nodes": tree.n_nodes, "net": args.net, "mode": args.mode,
        "images": args.images, "batch": args.batch,
        "detections": sum(len(v) for v in dets.values()),
        "wall_s": round(wall, 1),
        "img_s": round(args.images / wall, 2),
        "self_map": round(float(m), 4),
    }))


if __name__ == "__main__":
    main()
