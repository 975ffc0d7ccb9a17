"""Classifier throughput benchmark (darknet19/darknet53 — the
pretrained-backbone classifiers).

Usage: python benchmarks/classify_bench.py [--model darknet19]
       [--batch 128] [--precision bf16]
Prints one JSON object: {model, batch, net, img_s, ms_batch1}.
The driver-facing single-line benchmark stays bench.py.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="darknet19",
                    choices=["darknet19", "darknet19-448", "darknet53"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--precision", default="bf16",
                    choices=["fp32", "bf16"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph
    from yolo_tpu.models.classify import make_classifier
    from yolo_tpu.utils.profiling import timeit

    cfg = get_variant(args.model)
    rng = np.random.default_rng(0)
    params = graph.params_to_jax(graph.fold_params(
        cfg.layers, dw.random_params(cfg.layers, rng, scale=0.03),
        cfg.bn_eps))
    dtype = jnp.float32 if args.precision == "fp32" else jnp.bfloat16
    run = make_classifier(cfg, compute_dtype=dtype)

    net = cfg.input_size
    xb = jnp.asarray(rng.uniform(0, 1, (args.batch, net, net, 3))
                     .astype(np.float32))
    x1 = xb[:1]
    run(params, xb)  # compile
    run(params, x1)
    ms_b = timeit(lambda: run(params, xb))  # ms per call
    ms_1 = timeit(lambda: run(params, x1))
    print(json.dumps({
        "model": args.model, "net": net, "batch": args.batch,
        "precision": args.precision,
        "img_s": round(args.batch / (ms_b / 1e3), 1),
        "ms_batch": round(ms_b, 3),
        "ms_batch1": round(ms_1, 3),
    }))


if __name__ == "__main__":
    main()
