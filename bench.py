"""Benchmark harness: full YOLOv2/COCO 416x416 batched inference on one
chip — the BASELINE.md north-star metric (>=2000 img/s on v5e-8 ==
>=250 img/s/chip; vs_baseline is measured img/s/chip over 250).

The measured path is the whole fused frame-in/boxes-out graph from raw
RGB: device letterbox -> backbone+head -> decode -> class-wise NMS
(BASELINE.json:5), bf16 compute with fp32 accumulation (the precision
that preserves box-level parity, SURVEY.md §7.2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_IMG_S_PER_CHIP = 250.0


def main(batch: int = 128, iters: int = 15, warmup: int = 3) -> None:
    import jax
    import jax.numpy as jnp

    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph
    from yolo_tpu.models.predict import make_detector

    cfg = get_variant("coco")
    rng = np.random.default_rng(0)
    params = graph.params_to_jax(
        graph.fold_params(cfg.layers, dw.random_params(cfg.layers, rng),
                          cfg.bn_eps))
    det = make_detector(cfg, compute_dtype=jnp.bfloat16)

    images = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8)))

    def sync(o):
        # On some PJRT backends (the axon relay here) block_until_ready
        # does not actually wait; a device->host fetch does, and execution
        # is in-order, so fetching from the last dispatch syncs everything.
        jax.block_until_ready(o)
        return float(np.asarray(o["scores"][0, 0]))

    for _ in range(warmup):
        sync(det(params, images))

    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = det(params, images)   # async dispatch pipelines iterations
    sync(out)
    dt = time.perf_counter() - t0

    img_s = batch * iters / dt
    print(json.dumps({
        "metric": "yolov2_coco_416_batch_inference",
        "value": round(img_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_S_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
