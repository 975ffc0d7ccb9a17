"""Checked-in golden e2e test (SURVEY.md §4.2.6): raw PNG in ->
exact box set out, fp32, fixed thresholds. Weights are regenerated
deterministically from the committed seed (a 63 MB file is not worth
committing; the seed pins the same bytes)."""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_tpu.configs import get_variant
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.models.predict import detect_raw

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
SEED = 20260816


def test_golden_boxes():
    import cv2

    img = cv2.cvtColor(cv2.imread(os.path.join(FIXTURES, "scene.png")),
                       cv2.COLOR_BGR2RGB)
    golden = json.load(open(os.path.join(FIXTURES, "golden_boxes.json")))

    rng = np.random.default_rng(SEED)
    # consume the same rng stream the fixture generator used (scene was
    # deterministic; rng used only for weights)
    cfg = dataclasses.replace(get_variant("tiny-voc"), input_size=160,
                              conf_threshold=0.35)
    params = graph.params_to_jax(graph.fold_params(
        cfg.layers, dw.random_params(cfg.layers, rng, scale=0.05),
        cfg.bn_eps))
    out = detect_raw(cfg, params, jnp.asarray(img[None]),
                     compute_dtype=jnp.float32,
                     head="reference", nms_impl="xla")
    valid = np.asarray(out["valid"][0])
    got = [{
        "class": int(out["classes"][0][i]),
        "score": round(float(out["scores"][0][i]), 6),
        "box": [round(float(v), 3) for v in np.asarray(out["boxes"][0][i])],
    } for i in np.nonzero(valid)[0]]

    assert len(got) == len(golden)
    for g, w in zip(got, golden):
        assert g["class"] == w["class"]
        assert g["score"] == pytest.approx(w["score"], abs=2e-5)
        np.testing.assert_allclose(g["box"], w["box"], atol=5e-2)


def test_golden_full_yolov2_logits():
    """Full YOLOv2 (reorg + routes) seed-pinned golden: the logits
    checksum pins the whole graph including the passthrough semantics.
    Regenerate GOLDEN if the (documented) numerics ever change on
    purpose."""
    rng = np.random.default_rng(SEED + 1)
    cfg = dataclasses.replace(get_variant("coco"), input_size=160)
    params = graph.params_to_jax(dw.random_params(cfg.layers, rng,
                                                  scale=0.03))
    x = jnp.asarray(rng.uniform(0, 1, (1, 160, 160, 3)).astype(np.float32))
    logits = np.asarray(graph.apply_layers(cfg.layers, params, x,
                                           eps=cfg.bn_eps))
    assert logits.shape == (1, 5, 5, 425)
    checksum = float(np.abs(logits).mean())
    golden = json.load(open(os.path.join(FIXTURES,
                                         "golden_full_checksum.json")))
    assert checksum == pytest.approx(golden["abs_mean"], rel=1e-4)
    np.testing.assert_allclose(logits[0, 2, 2, :5], golden["probe"],
                               rtol=1e-4)
