"""Phase-level benchmark harness: reproduces the docs/PERF.md tables.

Usage: python benchmarks/phase_bench.py [--batch 128] [--model coco]
Prints one JSON object with phase timings, batch scan, and precision
ladder points. The driver-facing single-line benchmark stays bench.py.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(tree):
    from yolo_tpu.utils.profiling import sync as _sync

    _sync(tree)


def timeit(f, *args, n=15):
    from yolo_tpu.utils.profiling import timeit as _timeit

    return _timeit(f, *args, n=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--model", default="coco")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph, quantize
    from yolo_tpu.models.predict import make_detector
    from yolo_tpu.ops.head import detect_head
    from yolo_tpu.ops.letterbox import letterbox

    cfg = get_variant(args.model)
    rng = np.random.default_rng(0)
    raw_params = dw.random_params(cfg.layers, rng, scale=0.03)
    params = graph.params_to_jax(
        graph.fold_params(cfg.layers, raw_params, cfg.bn_eps))
    b = args.batch
    images = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b, 480, 640, 3), dtype=np.uint8)))

    report = {"model": cfg.name, "batch": b,
              "backend": jax.default_backend()}

    # phases (separate jits; the fused graph overlaps these)
    lb = jax.jit(lambda v: letterbox(v, cfg.input_size, dtype=jnp.bfloat16))
    fwd = jax.jit(lambda p, v: graph.apply_layers(
        cfg.layers, p, v, compute_dtype=jnp.bfloat16))
    head = jax.jit(lambda l: detect_head(
        l, cfg.anchors, cfg.num_classes,
        conf_threshold=cfg.conf_threshold,
        iou_threshold=cfg.nms_threshold))
    x = lb(images); sync(x)
    logits = fwd(params, x); sync(logits)
    report["phases_ms"] = {
        "letterbox": round(timeit(lb, images), 2),
        "forward": round(timeit(fwd, params, x), 2),
        "head": round(timeit(head, logits), 2),
    }

    # fused end-to-end, bf16 and int8
    det = make_detector(cfg, compute_dtype=jnp.bfloat16)
    t = timeit(det, params, images)
    report["e2e_bf16_img_s"] = round(b / t * 1e3, 1)
    calib = jnp.asarray(rng.uniform(
        0, 1, (8, cfg.input_size, cfg.input_size, 3)).astype(np.float32))
    qparams = quantize.prepare_int8(cfg, raw_params, calib)
    t = timeit(det, qparams, images)
    report["e2e_int8_img_s"] = round(b / t * 1e3, 1)

    # batch-1 latency
    one = images[:1]
    t = timeit(det, params, one, n=50)
    report["batch1_latency_ms"] = round(t, 2)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
