"""Training-step roofline benchmark (VERDICT r1 item 6): where does the
train-step time go, and what fraction of the chip's peak does it reach?

Usage: python benchmarks/train_bench.py [--batch 128] [--sizes 416,608]
Prints one JSON object per (size, precision) point with:
  * step_ms / img_s — full jitted train_step (loss+grads+opt+BN EMA)
  * grads_ms — value_and_grad only (no optimizer/EMA apply)
  * fwd_train_ms — train-mode forward + loss only (no backward)
  * optimizer_ms — step_ms - grads_ms (optax update + EMA fold)
  * flops — XLA's compiled cost-analysis FLOPs for the full step
  * tflops_s, mfu_bf16 — achieved rate vs the v5e ~197 TFLOP/s bf16 peak
plus the bn_stats_fp32 A/B at bf16 (the measured optimization attempt:
keep batch-stat math in bf16 instead of casting each conv's activations
to fp32).

Numbers land in docs/PERF.md ("Training roofline"). The driver-facing
single-line benchmark stays bench.py.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12


def timeit(f, *args, n=10):
    from yolo_tpu.utils.profiling import timeit as _timeit

    return _timeit(f, *args, n=n)


def compiled_flops(jitted, *args):
    try:
        c = jitted.lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_point(cfg, tcfg, batch, size, compute_dtype, rng, label):
    import jax
    import jax.numpy as jnp

    from yolo_tpu.data import targets as tgt
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph
    from yolo_tpu.train.loop import init_state, train_step
    from yolo_tpu.train.loss import region_loss

    boxes = [np.array([[0.5, 0.5, 0.3, 0.4]]) for _ in range(batch)]
    classes = [np.array([1]) for _ in range(batch)]
    data = {k: jnp.asarray(v) for k, v in tgt.encode_batch(
        boxes, classes, grid=size // 32, anchors=cfg.anchors,
        num_classes=cfg.num_classes).items()}
    data["images"] = jnp.asarray(rng.uniform(
        0, 1, (batch, size, size, 3)).astype(np.float32))

    state = init_state(dw.random_params(cfg.layers, rng, scale=0.03), tcfg)

    from functools import partial

    step = jax.jit(partial(train_step, mcfg=cfg, tcfg=tcfg,
                           compute_dtype=compute_dtype))
    # grads-only: forward(train) + backward, no optimizer/EMA
    def grads_fn(params, seen, data):
        def loss_fn(p):
            logits, bn = graph.apply_layers(
                cfg.layers, p, data["images"], eps=cfg.bn_eps, train=True,
                compute_dtype=compute_dtype, remat=tcfg.remat,
                bn_stats_fp32=tcfg.bn_stats_fp32)
            total, _ = region_loss(logits, data, cfg.anchors,
                                   cfg.num_classes, tcfg.loss, seen)
            return total
        return jax.grad(loss_fn)(params)

    def fwd_fn(params, seen, data):
        logits, bn = graph.apply_layers(
            cfg.layers, params, data["images"], eps=cfg.bn_eps, train=True,
            compute_dtype=compute_dtype, remat=tcfg.remat,
            bn_stats_fp32=tcfg.bn_stats_fp32)
        total, _ = region_loss(logits, data, cfg.anchors,
                               cfg.num_classes, tcfg.loss, seen)
        return total

    grads = jax.jit(grads_fn)
    fwd = jax.jit(fwd_fn)

    step_ms = timeit(step, state, data)
    grads_ms = timeit(grads, state["params"], state["seen"], data)
    fwd_ms = timeit(fwd, state["params"], state["seen"], data)
    flops = compiled_flops(step, state, data)
    out = {
        "label": label, "size": size, "batch": batch,
        "step_ms": round(step_ms, 2),
        "img_s": round(batch / step_ms * 1e3, 1),
        "grads_ms": round(grads_ms, 2),
        "fwd_train_ms": round(fwd_ms, 2),
        "optimizer_ms": round(step_ms - grads_ms, 2),
        "bwd_only_ms": round(grads_ms - fwd_ms, 2),
    }
    if flops:
        out["flops"] = flops
        out["tflops_s"] = round(flops / (step_ms / 1e3) / 1e12, 1)
        out["mfu_bf16_peak"] = round(
            flops / (step_ms / 1e3) / V5E_BF16_PEAK, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--sizes", default="416,608")
    # region-head (yolov2-family) variants only: bench_point builds
    # region_loss targets; the yolo-head families' train perf is covered
    # by docs/PERF.md's multi-head training table
    ap.add_argument("--model", default="coco",
                    choices=["coco", "voc", "tiny-coco", "tiny-voc"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from yolo_tpu.configs import get_variant
    from yolo_tpu.train.loop import TrainConfig

    rng = np.random.default_rng(0)
    points = []
    for size in [int(s) for s in args.sizes.split(",")]:
        cfg = get_variant(args.model, input_size=size)
        batch = args.batch
        remat = size >= 608  # 608^2 x b128 activations exceed HBM
        base = TrainConfig(remat=remat)
        variants = [
            ("fp32", base, jnp.float32),
            ("bf16", base, jnp.bfloat16),
            ("bf16_stats_bf16",
             TrainConfig(remat=remat, bn_stats_fp32=False), jnp.bfloat16),
        ]
        if remat:  # does the no-remat graph even fit? measure if so
            variants.append(("bf16_noremat", TrainConfig(remat=False),
                             jnp.bfloat16))
        for label, tcfg, dtype in variants:
            try:
                points.append(bench_point(cfg, tcfg, batch, size, dtype,
                                          rng, label))
            except Exception as e:  # OOM etc: record, keep going
                points.append({"label": label, "size": size,
                               "batch": batch, "error": str(e)[:200]})
            print(json.dumps(points[-1]), flush=True)
    import jax

    print(json.dumps({"backend": jax.default_backend(),
                      "points": points}))


if __name__ == "__main__":
    main()
