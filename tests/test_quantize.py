"""int8 PTQ accuracy and plumbing tests (models/quantize.py)."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from yolo_tpu.configs.variants import TINY_YOLOV2_VOC
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph, quantize
from yolo_tpu.models.predict import forward
from yolo_tpu.ops.decode import decode


def test_int8_score_deviation_bounded():
    cfg = dataclasses.replace(TINY_YOLOV2_VOC, input_size=128)
    rng = np.random.default_rng(7)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))

    folded = graph.params_to_jax(graph.fold_params(cfg.layers, params,
                                                   cfg.bn_eps))
    lo32 = forward(cfg, folded, x, compute_dtype=jnp.float32)

    qparams = quantize.prepare_int8(cfg, params, x)
    assert qparams[0]["kernel_q"].dtype == jnp.int8
    lo8 = forward(cfg, qparams, x, compute_dtype=jnp.float32)

    _, s32 = decode(lo32, cfg.anchors, cfg.num_classes)
    _, s8 = decode(lo8, cfg.anchors, cfg.num_classes)
    dev = np.abs(np.asarray(s32) - np.asarray(s8)).max()
    assert dev < 0.3, f"int8 score deviation {dev}"  # ~3%/layer rel error compounds
    # scores should broadly agree (rank correlation of top candidates)
    top32 = np.argsort(-np.asarray(s32).ravel())[:50]
    top8 = np.argsort(-np.asarray(s8).ravel())[:50]
    overlap = len(set(top32) & set(top8)) / 50
    assert overlap > 0.6, f"top-50 overlap only {overlap}"


def test_calibration_scales_positive():
    cfg = dataclasses.replace(TINY_YOLOV2_VOC, input_size=96)
    rng = np.random.default_rng(8)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    folded = graph.fold_params(cfg.layers, params, cfg.bn_eps)
    x = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    scales = quantize.calibrate(cfg.layers, folded, x, cfg.bn_eps)
    assert len(scales) == 9  # tiny-yolo conv count
    assert all(s > 0 for s in scales)


def test_int8_params_checkpoint_roundtrip(tmp_path):
    import dataclasses

    from yolo_tpu.io import checkpoint as ckpt

    cfg = dataclasses.replace(TINY_YOLOV2_VOC, input_size=96)
    rng = np.random.default_rng(9)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    x = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32))
    qparams = quantize.prepare_int8(cfg, params, x)
    path = str(tmp_path / "q")
    ckpt.save(path, [dict(p) for p in qparams])
    restored = ckpt.restore(path)
    assert np.asarray(restored[0]["kernel_q"]).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(restored[0]["kernel_q"]),
                                  np.asarray(qparams[0]["kernel_q"]))
