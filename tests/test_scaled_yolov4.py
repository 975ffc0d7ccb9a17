"""Scaled-YOLOv4 support: [yolo] new_coords=1 decode, logistic/swish
conv activations, cfg parse/round-trip, fused-head parity, and
new_coords training (oracle-pinned loss; objectness_smooth and the
mse box-loss combo reject loudly).

Semantics pinned (AlexeyAB yolo_layer.c, get_yolo_box with new_coords):
the head conv carries activation=logistic, so every head value arrives
already sigmoided; decode uses the values directly for xy/conf/class
and wh = (2v)^2 * anchor instead of exp. Training computes darknet's
delta = (target - activation) as 0.5*MSE on the activations (the head
conv's logistic backward supplies the derivative factor via autodiff)
plus the iou-family box loss every scaled cfg uses.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.configs.specs import Conv, ModelConfig, Route, Upsample, YoloHead
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.models.predict import detect
from yolo_tpu.ops import numpy_ref as npr
from yolo_tpu.ops.decode import decode_yolo

# Micro 2-head scaled topology: logistic head convs + new_coords heads
# with the official scale_x_y=2.0 (yolov4-csp/yolov4x-mish structure).
SCALED_ANCHORS = ((6.0, 8.0), (12.0, 10.0), (24.0, 20.0), (40.0, 36.0))
MICRO_SCALED = ModelConfig(
    name="micro-scaled",
    layers=(
        Conv(8, stride=2),                       # 0  /2
        Conv(16, stride=2),                      # 1  /4
        Conv(32, stride=2, act="swish"),         # 2  /8
        Conv(2 * (5 + 4), size=1, bn=False, act="logistic"),  # 3
        YoloHead((2, 3), scale_xy=2.0, new_coords=True),      # 4 (8x8)
        Route((-3,)),                            # 5  -> 2
        Conv(8, 1),                              # 6
        Upsample(2),                             # 7  /4
        Route((-1, 1)),                          # 8  -> concat(7, 1)
        Conv(2 * (5 + 4), size=1, bn=False, act="logistic"),  # 9
        YoloHead((0, 1), scale_xy=2.0, new_coords=True),      # 10 (16x16)
    ),
    anchors=SCALED_ANCHORS,
    class_names=("a", "b", "dog", "d"),
    input_size=64,
)

SCALED_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=swish

[convolutional]
filters=18
size=1
stride=1
activation=logistic

[yolo]
mask = 2,3
anchors = 6,8, 12,10, 24,20, 40,36
classes=4
num=4
scale_x_y = 2.0
new_coords=1

[route]
layers=-3

[convolutional]
batch_normalize=1
filters=8
size=1
stride=1
activation=leaky

[upsample]
stride=2

[route]
layers=-1,1

[convolutional]
filters=18
size=1
stride=1
activation=logistic

[yolo]
mask = 0,1
anchors = 6,8, 12,10, 24,20, 40,36
classes=4
num=4
scale_x_y = 2.0
new_coords=1
"""


@pytest.mark.quick
class TestNewCoordsDecode:
    def _heads(self, rng, c=7):
        # head conv output = logistic activations, everything in (0,1)
        return [npr.sigmoid(rng.normal(size=(2, 3, 3, 3 * (5 + c)))
                            ).astype(np.float32),
                npr.sigmoid(rng.normal(size=(2, 6, 6, 3 * (5 + c)))
                            ).astype(np.float32)]

    def test_matches_oracle(self):
        from yolo_tpu.configs.variants import YOLOV3_TINY_COCO

        rng = np.random.default_rng(7)
        anchors = YOLOV3_TINY_COCO.anchors
        masks = [h.mask for h in YOLOV3_TINY_COCO.yolo_heads]
        c, net = 7, 96
        heads = self._heads(rng, c)
        ncs = [True, True]
        boxes, scores = decode_yolo(
            [jnp.asarray(h) for h in heads], anchors, masks, c, net,
            scales=[2.0, 2.0], new_coords=ncs)
        for b in range(2):
            wb, ws = npr.decode_yolo([h[b] for h in heads], anchors,
                                     masks, c, net, scales=[2.0, 2.0],
                                     new_coords=ncs)
            np.testing.assert_allclose(np.asarray(boxes[b]), wb,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(scores[b]), ws,
                                       rtol=0, atol=1e-6)

    def test_box_math_explicit(self):
        """Spot-check the get_yolo_box formulas at a known activation:
        v=0.75 everywhere, scale 2.0, cell (0,0) of a 2x2 grid."""
        c = 1
        v = 0.75
        t = np.full((1, 2, 2, 1 * (5 + c)), v, np.float32)
        boxes, scores = decode_yolo(
            [jnp.asarray(t)], ((10.0, 20.0),), [(0,)], c, 64,
            scales=[2.0], new_coords=[True])
        bx, by, bw, bh = np.asarray(boxes)[0, 0]
        # bx = (v*2 - 0.5 + cx)/W = (1.5 - 0.5 + 0)/2
        assert np.isclose(bx, 0.5) and np.isclose(by, 0.5)
        # bw = 4*v^2*anchor/net = 4*0.5625*10/64
        assert np.isclose(bw, 4 * v * v * 10.0 / 64)
        assert np.isclose(bh, 4 * v * v * 20.0 / 64)
        # conf/class are raw products, no sigmoid: score = v*v
        assert np.isclose(np.asarray(scores)[0, 0, 0], v * v)

    def test_classic_heads_unchanged(self):
        """new_coords=None / all-False must reproduce the classic path
        bit-for-bit (regression gate for the flag plumbing)."""
        from yolo_tpu.configs.variants import YOLOV3_TINY_COCO

        rng = np.random.default_rng(11)
        anchors = YOLOV3_TINY_COCO.anchors
        masks = [h.mask for h in YOLOV3_TINY_COCO.yolo_heads]
        c, net = 7, 96
        heads = [jnp.asarray(rng.normal(
            size=(1, 3, 3, 3 * (5 + c))).astype(np.float32)),
            jnp.asarray(rng.normal(
                size=(1, 6, 6, 3 * (5 + c))).astype(np.float32))]
        b0, s0 = decode_yolo(heads, anchors, masks, c, net)
        b1, s1 = decode_yolo(heads, anchors, masks, c, net,
                             new_coords=[False, False])
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


@pytest.mark.quick
class TestScaledCfg:
    def test_parse(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "scaled.cfg"
        p.write_text(SCALED_CFG)
        got = config_from_cfg(str(p))
        assert got.layers == MICRO_SCALED.layers
        assert got.anchors == MICRO_SCALED.anchors
        assert all(h.new_coords for h in got.yolo_heads)
        assert [l.act for l in got.layers if isinstance(l, Conv)][2] == \
            "swish"

    def test_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "rt.cfg"
        p.write_text(cfg_to_string(MICRO_SCALED))
        got = config_from_cfg(str(p))
        assert got.layers == MICRO_SCALED.layers

    def test_objectness_smooth_parses_and_round_trips(self, tmp_path):
        """[yolo] objectness_smooth=1 (scaled cfgs set it) parses —
        inference ignores it like darknet's forward; training rejects
        (TestScaledTraining) — and survives cfg round-trip."""
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "os.cfg"
        p.write_text(SCALED_CFG.replace("new_coords=1",
                                        "new_coords=1\nobjectness_smooth=1"))
        got = config_from_cfg(str(p))
        assert got.objectness_smooth
        p.write_text(cfg_to_string(got))
        assert config_from_cfg(str(p)).objectness_smooth

    def test_new_coords_requires_logistic_conv(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad.cfg"
        p.write_text(SCALED_CFG.replace(
            "filters=18\nsize=1\nstride=1\nactivation=logistic",
            "filters=18\nsize=1\nstride=1\nactivation=linear"))
        with pytest.raises(ValueError, match="activation=logistic"):
            config_from_cfg(str(p))

    def test_logistic_conv_requires_new_coords(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad2.cfg"
        p.write_text(SCALED_CFG.replace("new_coords=1\n", ""))
        with pytest.raises(ValueError, match="double-sigmoid"):
            config_from_cfg(str(p))


class TestActivations:
    def test_logistic_swish_parity_vs_tf_oracle(self):
        from tests.tf_oracle import run_layers

        layers = (Conv(8, stride=2, act="swish"),
                  Conv(6, size=1, bn=False, act="logistic"))
        rng = np.random.default_rng(3)
        params = dw.random_params(layers, rng, scale=0.1)
        x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        want = run_layers(layers, params, x)
        got = graph.apply_layers(layers, graph.params_to_jax(params),
                                 jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-5)


class TestEndToEnd:
    def test_fused_head_matches_reference_path(self):
        """detect_head_yolo under new_coords is box/score identical to
        decode_yolo + exact per-class NMS.

        Crafted head activations (everything in [0,1], the logistic
        conv's range) with a Beta(1,8) objectness tail: ~6 % of boxes
        clear conf 0.3, keeping the prefilter inside its exactness
        envelope while leaving real detections to compare — a micro
        model with random weights can't reach this regime because
        new_coords conf is the raw logistic output (~0.5 everywhere or
        a near-constant, never a trained-like sparse tail)."""
        from tests.test_nms_impls import _assert_dets_equal
        from yolo_tpu.ops.head import detect_head_yolo
        from yolo_tpu.ops.nms import nms_batch

        rng = np.random.default_rng(5)
        c, net = 4, 64
        masks = [(2, 3), (0, 1)]

        def head(hw, a=2):
            t5 = rng.uniform(0, 1, (2, hw, hw, a, 5 + c))
            t5[..., 4] = rng.beta(1.0, 8.0, t5[..., 4].shape)
            return jnp.asarray(
                t5.reshape(2, hw, hw, a * (5 + c)).astype(np.float32))

        heads = [head(8), head(16)]
        scales, ncs = [2.0, 2.0], [True, True]
        boxes, scores = decode_yolo(heads, SCALED_ANCHORS, masks, c, net,
                                    scales=scales, new_coords=ncs)
        want = nms_batch(boxes, scores, conf_threshold=0.3,
                         iou_threshold=0.45, impl="xla")
        got = detect_head_yolo(heads, SCALED_ANCHORS, masks, c, net,
                               conf_threshold=0.3, iou_threshold=0.45,
                               pre_top_k=256, use_pallas=False,
                               scales=scales, new_coords=ncs)
        assert int(np.asarray(want["valid"]).sum()) > 0
        _assert_dets_equal(want, got, rtol=1e-5, atol=1e-6)

    def test_fused_head_mixed_heads(self):
        """Heads disagreeing on new_coords (no official cfg does this,
        but the per-head plumbing supports it) — the fused head's
        per-box select must match the reference path's per-head
        branches."""
        from tests.test_nms_impls import _assert_dets_equal
        from yolo_tpu.ops.head import detect_head_yolo
        from yolo_tpu.ops.nms import nms_batch

        rng = np.random.default_rng(9)
        c, net = 4, 64
        masks = [(2, 3), (0, 1)]
        # new_coords head: [0,1] activations, sparse conf tail
        t5 = rng.uniform(0, 1, (2, 8, 8, 2, 5 + c))
        t5[..., 4] = rng.beta(1.0, 8.0, t5[..., 4].shape)
        h_nc = jnp.asarray(t5.reshape(2, 8, 8, 18).astype(np.float32))
        # classic head: raw logits, negative objectness center
        t5 = rng.normal(0, 1, (2, 16, 16, 2, 5 + c))
        t5[..., 4] = rng.normal(-3.0, 1.5, t5[..., 4].shape)
        h_cl = jnp.asarray(t5.reshape(2, 16, 16, 18).astype(np.float32))
        heads, scales, ncs = [h_nc, h_cl], [2.0, 1.0], [True, False]
        boxes, scores = decode_yolo(heads, SCALED_ANCHORS, masks, c, net,
                                    scales=scales, new_coords=ncs)
        want = nms_batch(boxes, scores, conf_threshold=0.3,
                         iou_threshold=0.45, impl="xla")
        got = detect_head_yolo(heads, SCALED_ANCHORS, masks, c, net,
                               conf_threshold=0.3, iou_threshold=0.45,
                               pre_top_k=256, use_pallas=False,
                               scales=scales, new_coords=ncs)
        assert int(np.asarray(want["valid"]).sum()) > 0
        _assert_dets_equal(want, got, rtol=1e-5, atol=1e-6)

    def test_detect_runs_from_cfg(self, tmp_path):
        """Full path: parse the scaled cfg, random weights, detect()."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "scaled.cfg"
        p.write_text(SCALED_CFG)
        cfg = config_from_cfg(str(p))
        rng = np.random.default_rng(0)
        params = graph.params_to_jax(dw.random_params(cfg.layers, rng,
                                                      scale=0.05))
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)
                                    ).astype(np.float32))
        out = detect(cfg, params, x, head="reference", nms_impl="xla")
        assert np.isfinite(np.asarray(out["boxes"])).all()


COMPOSITE_CFG = (
    "[net]\nwidth=64\nheight=64\n"
    "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\nstride=2\n"
    "pad=1\nactivation=mish\n"                              # 0  /2
    "[convolutional]\nbatch_normalize=1\nfilters=32\nsize=3\nstride=2\n"
    "pad=1\nactivation=swish\n"                             # 1  /4
    "[route]\nlayers=-1\ngroups=2\ngroup_id=1\n"            # 2  CSP slice
    "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=1\n"
    "activation=leaky\n"                                    # 3
    "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\nstride=1\n"
    "pad=1\nactivation=leaky\n"                             # 4
    "[route]\nlayers=-1,-2\n"                               # 5
    "[convolutional]\nbatch_normalize=1\nfilters=32\nsize=1\n"
    "activation=leaky\n"                                    # 6
    "[route]\nlayers=-6,-1\n"                               # 7  CSP merge
    "[convolutional]\nbatch_normalize=1\nfilters=32\nsize=1\n"
    "activation=leaky\n"                                    # 8
    "[maxpool]\nsize=5\nstride=1\n"                         # 9  SPP
    "[route]\nlayers=-2\n"                                  # 10
    "[maxpool]\nsize=9\nstride=1\n"                         # 11
    "[route]\nlayers=-4\n"                                  # 12
    "[maxpool]\nsize=13\nstride=1\n"                        # 13
    "[route]\nlayers=-1,-3,-5,-6\n"                         # 14
    "[convolutional]\nbatch_normalize=1\nfilters=32\nsize=1\n"
    "activation=leaky\n"                                    # 15
    "[sam]\nfrom=-8\n"                                      # 16 x conv8
    "[convolutional]\nfilters=18\nsize=1\nactivation=logistic\n"  # 17
    "[yolo]\nmask = 0,1\nanchors = 6,8, 12,10\nclasses=4\nnum=2\n"
    "scale_x_y = 2.0\nnew_coords=1\n")                      # 18


class TestCompositeScaledCfg:
    """One cfg composing every yolov4/scaled-yolov4 cfg feature: mish +
    swish activations, CSP grouped route + merge, SPP 5/9/13 stride-1
    pools, [sam] attention, logistic head conv, new_coords+scale_x_y=2
    [yolo] — parity-gated against the independent TF oracle and driven
    through weights round-trip, detect(), and the CLI."""

    def _cfg(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "composite.cfg"
        p.write_text(COMPOSITE_CFG)
        return config_from_cfg(str(p)), str(p)

    def test_oracle_parity_and_round_trips(self, tmp_path):
        from tests import tf_oracle
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        cfg, _ = self._cfg(tmp_path)
        # structure spot checks: sam multiplies conv15 by conv8 (32ch),
        # spp concat feeds 128 channels into conv15
        rng = np.random.default_rng(6)
        params = dw.random_params(cfg.layers, rng, scale=0.1)
        assert params[6]["kernel"].shape[2] == 128
        xin = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        want = tf_oracle.run_layers(cfg.layers, params, xin,
                                    eps=cfg.bn_eps)
        got = graph.apply_layers(cfg.layers, graph.params_to_jax(params),
                                 jnp.asarray(xin), eps=cfg.bn_eps)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=2e-4,
                                       atol=2e-4 * np.abs(w).max())
        # weights file round-trip over the full topology
        wpath = tmp_path / "c.weights"
        dw.save(str(wpath), cfg.layers, params)
        loaded, _hdr = dw.load(str(wpath), cfg.layers)
        for a, b in zip(params, loaded):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
        # cfg text round-trip
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        assert config_from_cfg(str(p2)).layers == cfg.layers

    def test_cli_predict_e2e(self, tmp_path, capsys):
        import json

        import cv2

        from yolo_tpu import cli

        cfg, cfg_path = self._cfg(tmp_path)
        rng = np.random.default_rng(1)
        wpath = tmp_path / "c.weights"
        dw.save(str(wpath), cfg.layers,
                dw.random_params(cfg.layers, rng, scale=0.05))
        img = tmp_path / "img.png"
        cv2.imwrite(str(img), rng.integers(0, 255, (60, 80, 3),
                                           dtype=np.uint8))
        cli.main(["predict", "--cfg", cfg_path, "--weights", str(wpath),
                  "--image", str(img), "--conf", "0.05",
                  "--precision", "fp32"])
        for line in capsys.readouterr().out.strip().splitlines():
            d = json.loads(line)
            assert set(d) == {"class", "score", "box_xyxy"}


SCALED_MASKS = [(2, 3), (0, 1)]
SCALED_STRIDES = [8, 4]


def _random_scene(rng, batch):
    boxes, classes = [], []
    for _ in range(batch):
        g = int(rng.integers(1, 4))
        b = np.stack([
            rng.uniform(0.2, 0.8, g), rng.uniform(0.2, 0.8, g),
            rng.uniform(0.08, 0.6, g), rng.uniform(0.08, 0.6, g),
        ], axis=-1)
        boxes.append(b)
        classes.append(rng.integers(0, 4, g))
    return boxes, classes


class TestScaledTraining:
    """new_coords=1 training (AlexeyAB yolo_layer.c with new_coords):
    heads arrive logistic-activated, obj/class deltas are
    (target - activation) i.e. 0.5*MSE here, box loss is the iou
    family every scaled cfg uses — pinned against the loop oracle."""

    def _heads(self, rng, batch):
        return [npr.sigmoid(rng.normal(
            size=(batch, 64 // st, 64 // st, 2 * 9))).astype(np.float32)
            for st in SCALED_STRIDES]

    def test_loss_matches_oracle(self):
        from tests.loss_oracle import yolo_loss_np
        from yolo_tpu.data import targets as tgt
        from yolo_tpu.train.loss import YoloLossConfig, yolo_loss

        rng = np.random.default_rng(3)
        boxes, classes = _random_scene(rng, 2)
        targets = tgt.encode_batch_for(MICRO_SCALED, boxes, classes)
        heads = self._heads(rng, 2)
        cfg = YoloLossConfig(iou_loss="ciou", iou_normalizer=0.07,
                             cls_normalizer=0.5)
        ncs = [True, True]
        total, parts = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            SCALED_ANCHORS, SCALED_MASKS, 4, 64, cfg,
            scales=[2.0, 2.0], new_coords=ncs)
        want_total, want_parts = yolo_loss_np(
            heads, targets, SCALED_ANCHORS, SCALED_MASKS, 4, 64, cfg,
            scales=[2.0, 2.0], new_coords=ncs)
        for k in want_parts:
            assert float(parts[k]) == pytest.approx(want_parts[k],
                                                    rel=1e-4,
                                                    abs=1e-5), k
        assert float(total) == pytest.approx(want_total, rel=1e-4)

    def test_train_step_loss_decreases(self):
        from yolo_tpu.data import targets as tgt
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         make_train_step)
        from yolo_tpu.train.loss import YoloLossConfig

        rng = np.random.default_rng(11)
        tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                           yolo_loss=YoloLossConfig(iou_loss="ciou",
                                                    iou_normalizer=0.07))
        state = init_state(dw.random_params(MICRO_SCALED.layers, rng,
                                            scale=0.1), tcfg)
        step = make_train_step(MICRO_SCALED, tcfg)

        boxes, classes = _random_scene(rng, 4)
        batch = tgt.encode_batch_for(MICRO_SCALED, boxes, classes)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["images"] = jnp.asarray(
            rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))

        losses = []
        for _ in range(30):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8

    def test_mse_box_loss_rejected(self):
        """new_coords + iou_loss=mse (no official cfg): loud error."""
        from yolo_tpu.train.loss import YoloLossConfig, yolo_loss

        rng = np.random.default_rng(1)
        heads = self._heads(rng, 1)
        with pytest.raises(NotImplementedError, match="iou-family"):
            yolo_loss([jnp.asarray(h) for h in heads], {},
                      SCALED_ANCHORS, SCALED_MASKS, 4, 64,
                      YoloLossConfig(iou_loss="mse"),
                      scales=[2.0, 2.0], new_coords=[True, True])

    def test_objectness_smooth_rejected(self):
        from yolo_tpu.train.loop import TrainConfig, init_state, train_step
        from yolo_tpu.train.loss import YoloLossConfig

        cfg = dataclasses.replace(MICRO_SCALED, objectness_smooth=True)
        tcfg = TrainConfig(yolo_loss=YoloLossConfig(iou_loss="ciou"))
        rng = np.random.default_rng(1)
        state = init_state(dw.random_params(cfg.layers, rng), tcfg)
        batch = {"images": jnp.zeros((1, 64, 64, 3), jnp.float32)}
        with pytest.raises(NotImplementedError,
                           match="objectness_smooth"):
            train_step(state, batch, mcfg=cfg, tcfg=tcfg)
