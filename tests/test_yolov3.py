"""YOLOv3-family tests: Shortcut/Upsample/YoloHead executor semantics,
multi-head [yolo] decode, weights I/O over the residual/FPN topology,
and golden parity vs the independent TF oracle (SURVEY.md §4.2 pyramid,
extended beyond the yolov2-only reference surface).

Topology ground truth: both built-in v3 variants reproduce the official
.weights byte counts exactly (248,007,048 / 35,434,956 bytes), which
over-determines every conv's in/out channels — see configs/variants.py.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.configs.specs import (Conv, ModelConfig, Route, Shortcut,
                                    Upsample, YoloHead)
from yolo_tpu.configs.variants import YOLOV3_COCO, YOLOV3_TINY_COCO
from yolo_tpu.data import targets as tgt
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.io.zoo import expected_weights_bytes
from yolo_tpu.models import graph
from yolo_tpu.models.predict import detect
from yolo_tpu.ops import numpy_ref as npr
from yolo_tpu.ops.decode import decode_yolo
from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step
from yolo_tpu.train.loss import YoloLossConfig, yolo_loss

# Micro 2-head v3 topology (residual + upsample + route, strides 8/4)
# for fast trainer tests: anchors in net-input pixels (net 64).
V3_ANCHORS = ((6.0, 8.0), (12.0, 10.0), (24.0, 20.0), (40.0, 36.0))
MICRO_V3 = ModelConfig(
    name="micro-v3",
    layers=(
        Conv(8, stride=2),                       # 0  /2
        Conv(16, stride=2),                      # 1  /4
        Conv(8, 1), Conv(16), Shortcut(-3),      # 2-4 residual
        Conv(32, stride=2),                      # 5  /8
        Conv(2 * (5 + 4), size=1, bn=False, act="linear"),  # 6
        YoloHead((2, 3)),                        # 7  (8x8 at 64)
        Route((-3,)),                            # 8  -> 5
        Conv(8, 1),                              # 9
        Upsample(2),                             # 10 /4
        Route((-1, 4)),                          # 11 -> concat(10, 4)
        Conv(16),                                # 12
        Conv(2 * (5 + 4), size=1, bn=False, act="linear"),  # 13
        YoloHead((0, 1)),                        # 14 (16x16 at 64)
    ),
    anchors=V3_ANCHORS,
    class_names=("a", "b", "dog", "d"),
    input_size=64,
)
MICRO_V3_MASKS = [h.mask for h in MICRO_V3.yolo_heads]
MICRO_V3_STRIDES = [8, 4]


def _small(cfg, size=96):
    return dataclasses.replace(cfg, input_size=size)


class TestLayerOps:
    def test_upsample_nearest(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 4, 2)).astype(np.float32)
        layers = (Upsample(2),)
        got = np.asarray(graph.apply_layers(layers, [], jnp.asarray(x)))
        want = x.repeat(2, axis=1).repeat(2, axis=2)
        np.testing.assert_array_equal(got, want)

    def test_upsample_scale_matches_tf_oracle(self):
        # [upsample] scale= multiplies the values (upsample_layer.c
        # l.scale); cross-checked against the independent TF derivation.
        from tests import tf_oracle
        rng = np.random.default_rng(7)
        x = rng.normal(size=(1, 3, 4, 2)).astype(np.float32)
        layers = (Upsample(2, scale=2.5),)
        got = np.asarray(graph.apply_layers(layers, [], jnp.asarray(x)))
        want = tf_oracle.run_layers(layers, [], x)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            got, x.repeat(2, axis=1).repeat(2, axis=2) * 2.5,
            rtol=1e-6, atol=1e-6)

    def test_shortcut_residual_add(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        params = graph.params_to_jax(
            dw.random_params((Conv(8, 1), Conv(8, 1)), rng,
                             input_channels=8))
        layers = (Conv(8, 1), Conv(8, 1), Shortcut(-2, act="linear"))
        outs = graph.apply_layers(layers, params, jnp.asarray(x),
                                  return_all=True)
        np.testing.assert_allclose(np.asarray(outs[2]),
                                   np.asarray(outs[0]) + np.asarray(outs[1]),
                                   rtol=1e-6, atol=1e-6)

    def test_yolo_head_is_identity_for_routing(self):
        """[yolo] layers pass their input through so darknet layer
        indices (Route/Shortcut offsets) stay valid."""
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 4, 4, 6)).astype(np.float32)
        layers = (YoloHead((0,)),)
        outs = graph.apply_layers(layers, [], jnp.asarray(x),
                                  return_all=True)
        np.testing.assert_array_equal(np.asarray(outs[0]), x)

    def test_multi_head_return(self):
        """apply_layers returns per-head logits (cfg order) when YoloHead
        markers are present."""
        cfg = _small(YOLOV3_TINY_COCO)
        rng = np.random.default_rng(3)
        params = graph.params_to_jax(dw.random_params(cfg.layers, rng))
        x = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32))
        heads = graph.apply_layers(cfg.layers, params, x, eps=cfg.bn_eps)
        assert isinstance(heads, tuple) and len(heads) == 2
        assert heads[0].shape == (1, 3, 3, 255)   # 13x13-equivalent at 96
        assert heads[1].shape == (1, 6, 6, 255)


class TestDecodeYolo:
    def test_matches_oracle(self):
        rng = np.random.default_rng(5)
        anchors = YOLOV3_TINY_COCO.anchors
        masks = [h.mask for h in YOLOV3_TINY_COCO.yolo_heads]
        c, net = 7, 96
        heads = [rng.normal(size=(2, 3, 3, 3 * (5 + c))).astype(np.float32),
                 rng.normal(size=(2, 6, 6, 3 * (5 + c))).astype(np.float32)]
        boxes, scores = decode_yolo(
            [jnp.asarray(h) for h in heads], anchors, masks, c, net)
        assert boxes.shape == (2, 3 * (9 + 36), 4)
        for b in range(2):
            wb, ws = npr.decode_yolo([h[b] for h in heads], anchors, masks,
                                     c, net)
            np.testing.assert_allclose(np.asarray(boxes[b]), wb,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(scores[b]), ws,
                                       rtol=0, atol=1e-6)

    def test_class_probs_are_independent_sigmoid(self):
        """v3 class scores must NOT be softmax-normalized — two strong
        classes both keep probability ~1."""
        c = 4  # one anchor in the mask -> 1*(5+C) head channels
        logits = np.zeros((1, 1, 1, 5 + c), dtype=np.float32)
        logits[0, 0, 0, 5] = 10.0   # class 0, anchor 0
        logits[0, 0, 0, 6] = 10.0   # class 1, anchor 0
        logits[0, 0, 0, 4] = 10.0   # objectness ~1
        _, scores = decode_yolo([jnp.asarray(logits)], ((10, 10),), [(0,)],
                                c, 32)
        s = np.asarray(scores)[0, 0]
        assert s[0] > 0.99 and s[1] > 0.99  # softmax would give ~0.5 each


class TestWeightsIO:
    def test_official_byte_counts(self):
        """The layer lists reproduce the official .weights sizes exactly
        (the strongest offline topology pin; mirrors test_zoo)."""
        from yolo_tpu.configs.variants import (YOLOV4_COCO,
                                               YOLOV4_TINY_COCO)

        from yolo_tpu.configs.variants import YOLOV3_SPP_COCO

        assert expected_weights_bytes(YOLOV3_COCO.layers) == 248_007_048
        # spp = yolov3 + one 512x2048 1x1 conv (+BN): 4,202,496 bytes
        assert expected_weights_bytes(YOLOV3_SPP_COCO.layers) == 252_209_544
        assert expected_weights_bytes(YOLOV3_TINY_COCO.layers) == 35_434_956
        assert expected_weights_bytes(YOLOV4_TINY_COCO.layers) == 24_251_276
        assert expected_weights_bytes(YOLOV4_COCO.layers) == 257_717_640

    def test_save_load_round_trip(self):
        cfg = YOLOV3_TINY_COCO
        rng = np.random.default_rng(11)
        params = dw.random_params(cfg.layers, rng)
        import io as _io

        buf = _io.BytesIO()
        dw.save(buf, cfg.layers, params)
        assert buf.tell() == expected_weights_bytes(cfg.layers)
        buf.seek(0)
        loaded, _ = dw.load(buf, cfg.layers)
        for p, q in zip(params, loaded):
            assert set(p) == set(q)
            for k in p:
                np.testing.assert_array_equal(p[k], q[k])


@pytest.mark.parametrize("variant", ["yolov3-tiny", "yolov3", "yolov3-spp",
                                     "yolov4-tiny", "yolov4"])
def test_logits_parity_vs_tf_oracle(variant):
    from tests import tf_oracle
    from yolo_tpu.configs.variants import (YOLOV3_SPP_COCO, YOLOV4_COCO,
                                           YOLOV4_TINY_COCO)

    cfg = _small({"yolov3-tiny": YOLOV3_TINY_COCO,
                  "yolov3": YOLOV3_COCO,
                  "yolov3-spp": YOLOV3_SPP_COCO,
                  "yolov4-tiny": YOLOV4_TINY_COCO,
                  "yolov4": YOLOV4_COCO}[variant])
    rng = np.random.default_rng(42)
    params = dw.random_params(cfg.layers, rng)
    x = rng.uniform(0, 1, (1, cfg.input_size, cfg.input_size, 3)
                    ).astype(np.float32)

    want = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    got = graph.apply_layers(cfg.layers, graph.params_to_jax(params),
                             jnp.asarray(x), eps=cfg.bn_eps)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        g = np.asarray(g)
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, rtol=1e-4,
                                   atol=1e-5 * np.abs(w).max())


def test_layer_by_layer_parity_vs_tf_oracle():
    from tests import tf_oracle

    cfg = _small(YOLOV3_TINY_COCO)
    rng = np.random.default_rng(21)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    x = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)

    want = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps,
                                return_all=True)
    got = graph.apply_layers(cfg.layers, graph.params_to_jax(params),
                             jnp.asarray(x), eps=cfg.bn_eps,
                             return_all=True)
    assert len(want) == len(got)
    for li, (w, g) in enumerate(zip(want, got)):
        g = np.asarray(g)
        assert g.shape == tuple(w.shape), f"layer {li}"
        np.testing.assert_allclose(
            g, w, rtol=1e-4, atol=1e-5 * max(np.abs(w).max(), 1.0),
            err_msg=f"layer {li} ({cfg.layers[li]})")


def test_end_to_end_boxes_parity():
    """frame -> boxes through the jitted v3 pipeline vs the numpy oracle
    chain (decode_yolo + per-class NMS) on TF-oracle logits.

    Unlike the region head (softmax spreads class mass), v3's sigmoid
    class scores make fully-random weights emit thousands of detections
    at any usable threshold. Pin sparse, realistic output by biasing the
    head convs: objectness strongly negative except one anchor per head,
    a couple of positive class biases, and a tiny kernel scale for
    per-cell score variation (deterministic NMS tie-breaks)."""
    from yolo_tpu.configs.specs import conv_specs
    from tests import tf_oracle

    cfg = dataclasses.replace(_small(YOLOV3_TINY_COCO, 160),
                              conf_threshold=0.5)
    masks = [h.mask for h in cfg.yolo_heads]
    rng = np.random.default_rng(7)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    nc = 5 + cfg.num_classes
    head_ci = [i for i, c in enumerate(conv_specs(cfg.layers)) if not c.bn]
    for ci, (anchor, cls_biases) in zip(
            head_ci, [(1, {14: 2.0, 3: 1.5}), (2, {7: 2.2})]):
        params[ci]["kernel"] *= 0.02  # per-cell noise only
        bias = np.full_like(params[ci]["bias"], -8.0)
        bias[anchor * nc + 0: anchor * nc + 4] = [0.3, -0.2, 0.25, -0.3]
        bias[anchor * nc + 4] = 2.0  # objectness
        for cls, v in cls_biases.items():
            bias[anchor * nc + 5 + cls] = v
        params[ci]["bias"] = bias
    x = rng.uniform(0, 1, (1, 160, 160, 3)).astype(np.float32)

    tf_heads = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    wb, ws = npr.decode_yolo([h[0] for h in tf_heads], cfg.anchors, masks,
                             cfg.num_classes, cfg.input_size)
    want = npr.nms_per_class(wb, ws, cfg.conf_threshold, cfg.nms_threshold)

    dets = detect(cfg, graph.params_to_jax(params), jnp.asarray(x),
                  top_k=wb.shape[0], max_detections=256)
    got = [(np.asarray(dets["boxes"][0][i]), float(dets["scores"][0][i]),
            int(dets["classes"][0][i]))
           for i in range(256) if bool(dets["valid"][0][i])]

    assert len(got) == len(want) and len(want) > 0
    got.sort(key=lambda r: (-r[1], r[2]))
    for (gb, gs, gc), (bb, bs, bc) in zip(got, want):
        assert gc == bc
        assert gs == pytest.approx(bs, abs=1e-4)
        np.testing.assert_allclose(gb, bb, rtol=1e-3, atol=1e-4)


YOLOV3_TINY_CFG = """\
[net]
width=416
height=416
channels=3
momentum=0.9

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=64
size=3
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=128
size=3
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=256
size=3
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=512
size=3
pad=1
activation=leaky

[maxpool]
size=2
stride=1

[convolutional]
batch_normalize=1
filters=1024
size=3
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=256
size=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=512
size=3
pad=1
activation=leaky

[convolutional]
filters=255
size=1
activation=linear

[yolo]
mask = 3,4,5
anchors = 10,14,  23,27,  37,58,  81,82,  135,169,  344,319
classes=80
num=6
ignore_thresh = .7

[route]
layers = -4

[convolutional]
batch_normalize=1
filters=128
size=1
pad=1
activation=leaky

[upsample]
stride=2

[route]
layers = -1, 8

[convolutional]
batch_normalize=1
filters=256
size=3
pad=1
activation=leaky

[convolutional]
filters=255
size=1
activation=linear

[yolo]
mask = 1,2,3
anchors = 10,14,  23,27,  37,58,  81,82,  135,169,  344,319
classes=80
num=6
ignore_thresh = .7
"""


class TestCfgParser:
    def test_yolov3_tiny_reproduced_from_cfg_text(self, tmp_path):
        """The official-structure yolov3-tiny cfg parses to exactly the
        pinned variant (layers, anchors, classes)."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "yolov3-tiny.cfg"
        p.write_text(YOLOV3_TINY_CFG)
        got = config_from_cfg(str(p))
        assert got.layers == YOLOV3_TINY_COCO.layers
        assert got.anchors == YOLOV3_TINY_COCO.anchors
        assert got.num_classes == 80
        assert got.head_kind == "yolo"

    def test_mask_out_of_range(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 2\nanchors = 10,14, 23,27\nclasses=4\nnum=2\n")
        with pytest.raises(ValueError, match="mask"):
            config_from_cfg(str(p))

    def test_mixed_region_and_yolo_rejected(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "mixed.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\nnum=2\n"
            "[region]\nanchors = 1,1, 2,2\nclasses=4\nnum=2\n")
        with pytest.raises(ValueError, match="mixed"):
            config_from_cfg(str(p))

    def test_head_conv_filters_validated(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "badfilters.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=10\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\nnum=2\n")
        with pytest.raises(ValueError, match="len.mask"):
            config_from_cfg(str(p))

    def test_route_stride_mismatch_rejected(self, tmp_path):
        """Concatenating feature maps of different strides is a graph
        bug the parser must catch (missing upsample)."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "strides.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[route]\nlayers = -1, -2\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\nnum=2\n")
        with pytest.raises(ValueError,
                           match="stride|mismatched spatial extents"):
            config_from_cfg(str(p))

    def test_layer_strides_yolov3(self):
        from yolo_tpu.configs.darknet_cfg import layer_strides

        strides = layer_strides(YOLOV3_COCO.layers)
        head_strides = [strides[i] for i, l in enumerate(YOLOV3_COCO.layers)
                        if isinstance(l, YoloHead)]
        assert head_strides == [32, 16, 8]

    def test_layer_strides_counts_reorg(self):
        from yolo_tpu.configs.darknet_cfg import layer_strides
        from yolo_tpu.configs.specs import Reorg

        assert layer_strides((Conv(8, stride=2), Reorg(2)))[-1] == 4

    def test_num_anchor_count_validated(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "num.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\nnum=6\n")
        with pytest.raises(ValueError, match="anchor values"):
            config_from_cfg(str(p))

    def test_out_of_range_reference_rejected(self, tmp_path):
        """A route reaching before layer 0 must raise, not silently
        wrap to the END of the outputs list (python negative index)."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "wrap.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[route]\nlayers = -5\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\nnum=2\n")
        with pytest.raises(ValueError, match="not an earlier layer"):
            config_from_cfg(str(p))

    def test_ignore_thresh_parsed_and_round_trips(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "it.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\nignore_thresh = .5\n")
        cfg = config_from_cfg(str(p))
        assert cfg.ignore_thresh == 0.5
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        assert config_from_cfg(str(p2)).ignore_thresh == 0.5


class TestCli:
    @pytest.fixture
    def v3_weights(self, tmp_path):
        cfg = YOLOV3_TINY_COCO
        rng = np.random.default_rng(9)
        p = tmp_path / "v3tiny.weights"
        dw.save(str(p), cfg.layers, dw.random_params(cfg.layers, rng))
        return str(p)

    @pytest.fixture
    def sample_image(self, tmp_path):
        import cv2

        p = tmp_path / "img.png"
        cv2.imwrite(str(p), np.random.default_rng(3).integers(
            0, 255, (60, 80, 3), dtype=np.uint8))
        return str(p)

    def test_predict_e2e(self, v3_weights, sample_image, capsys):
        import json

        from yolo_tpu import cli

        cli.main(["predict", "--model", "yolov3-tiny", "--input-size",
                  "96", "--weights", v3_weights, "--image", sample_image,
                  "--conf", "0.3", "--precision", "fp32"])
        for line in capsys.readouterr().out.strip().splitlines():
            d = json.loads(line)
            assert set(d) == {"class", "score", "box_xyxy"}
            assert 0 <= d["score"] <= 1

    def test_predict_int8_e2e(self, v3_weights, sample_image, capsys):
        import json

        from yolo_tpu import cli

        cli.main(["predict", "--model", "yolov3-tiny", "--input-size",
                  "96", "--weights", v3_weights, "--image", sample_image,
                  "--conf", "0.3", "--precision", "int8"])
        out = capsys.readouterr()
        assert "int8 PTQ: calibrated" in out.err
        for line in out.out.strip().splitlines():
            assert 0 <= json.loads(line)["score"] <= 1

    def test_anchors_pixel_units(self, tmp_path, capsys):
        """cmd anchors emits net-input-pixel anchors for [yolo] models
        (cell units are a region-family convention)."""
        import json

        from tests.test_data_eval import make_voc_root
        from yolo_tpu import cli

        root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
        cli.main(["anchors", "--model", "yolov3-tiny", "--voc-root", root,
                  "--split", "train", "--num-anchors", "2"])
        res = json.loads(capsys.readouterr().out)
        assert res["units"] == "pixels"
        # the synthetic GT is a ~0.75x0.71 normalized box -> ~300 px
        assert all(100 < w <= 416 and 100 < h <= 416
                   for w, h in res["anchors"])

    def test_partial_darknet53_cutoff(self, tmp_path):
        """`partial --layers 74` on yolov3 produces a byte-exact
        darknet53.conv.74-sized file that reloads as a 52-conv prefix."""
        from yolo_tpu import cli

        full = tmp_path / "yolov3.weights"
        dw.save(str(full), YOLOV3_COCO.layers,
                dw.random_params(YOLOV3_COCO.layers,
                                 np.random.default_rng(1)))
        out = tmp_path / "darknet53.conv.74"
        cli.main(["partial", "--model", "yolov3", "--weights", str(full),
                  "--output", str(out), "--layers", "74"])
        import os

        assert os.path.getsize(out) == 162_482_580
        params, _, n = dw.load_partial(str(out), YOLOV3_COCO.layers)
        assert n == 52

    def test_train_batches_multiscale_v3(self, tmp_path):
        """The thread pipeline emits per-size multi-head targets when
        multi-scale switching changes the net size between batches."""
        from tests.test_data_eval import make_voc_root
        from yolo_tpu.data import pipeline as pipe
        from yolo_tpu.data.voc import list_split

        root = make_voc_root(tmp_path, n_images=4, size=(70, 80))
        pairs = list_split(root, "train")
        cfg = dataclasses.replace(MICRO_V3,
                                  class_names=("cat", "dog", "x", "y"))
        sizes = {0: 64, 1: 96}
        batches = list(pipe.train_batches(
            pairs, class_names=cfg.class_names, anchors=cfg.anchors,
            num_classes=cfg.num_classes, net_size=64, batch_size=2,
            rng=np.random.default_rng(0),
            size_for_batch=lambda bi: sizes[bi], model_cfg=cfg))
        assert [b["images"].shape[1] for b in batches] == [64, 96]
        assert batches[0]["obj_mask_0"].shape == (2, 8, 8, 2)
        assert batches[1]["obj_mask_0"].shape == (2, 12, 12, 2)
        assert batches[1]["obj_mask_1"].shape == (2, 24, 24, 2)
        # every image's single GT is assigned to exactly one head
        for b in batches:
            assert (b["obj_mask_0"].sum(axis=(1, 2, 3))
                    + b["obj_mask_1"].sum(axis=(1, 2, 3))).tolist() == [1, 1]

    def test_eval_e2e(self, tmp_path, capsys):
        """eval runs the multi-head reference decode path end-to-end
        (VOC root -> detections -> mAP JSON)."""
        import json

        from tests.test_data_eval import make_voc_root
        from yolo_tpu import cli
        from yolo_tpu.configs.darknet_cfg import cfg_to_string

        root = make_voc_root(tmp_path, n_images=4, size=(80, 90))
        cfgp = tmp_path / "m.cfg"
        cfgp.write_text(cfg_to_string(MICRO_V3))
        names = tmp_path / "m.names"
        names.write_text("\n".join(MICRO_V3.class_names) + "\n")
        w = tmp_path / "m.weights"
        dw.save(str(w), MICRO_V3.layers,
                dw.random_params(MICRO_V3.layers, np.random.default_rng(2)))
        cli.main(["eval", "--cfg", str(cfgp), "--names", str(names),
                  "--weights", str(w), "--voc-root", root,
                  "--split", "train", "--batch", "4",
                  "--precision", "fp32"])
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "map" in res and 0.0 <= res["map"] <= 1.0

    def test_train_e2e(self, tmp_path):
        """cfg-defined micro-v3 trains end-to-end through the CLI (VOC
        root -> multi-head targets -> yolo loss -> checkpoint)."""
        from tests.test_data_eval import make_voc_root
        from yolo_tpu import cli
        from yolo_tpu.configs.darknet_cfg import cfg_to_string

        root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
        cfgp = tmp_path / "micro3.cfg"
        cfgp.write_text(cfg_to_string(MICRO_V3))
        names = tmp_path / "m.names"
        names.write_text("\n".join(MICRO_V3.class_names) + "\n")
        wpath = tmp_path / "init.weights"
        dw.save(str(wpath), MICRO_V3.layers,
                dw.random_params(MICRO_V3.layers, np.random.default_rng(0)))
        ckdir = tmp_path / "ck"
        cli.main(["train", "--cfg", str(cfgp), "--names", str(names),
                  "--weights", str(wpath), "--voc-root", root,
                  "--epochs", "1", "--batch", "8", "--precision", "fp32",
                  "--checkpoint-dir", str(ckdir)])
        assert any(ckdir.iterdir())

class TestSpp:
    """yolov3-spp support: darknet symmetric -inf padding for the
    5/9/13 stride-1 SPP maxpools."""

    @pytest.mark.parametrize("size", [5, 9, 13])
    def test_stride1_pool_matches_oracle(self, size):
        from yolo_tpu.ops.pool import maxpool_nhwc

        rng = np.random.default_rng(size)
        x = rng.normal(size=(1, 13, 13, 4)).astype(np.float32)
        got = np.asarray(maxpool_nhwc(jnp.asarray(x), size, 1))
        want = npr.maxpool_nhwc(x, size, 1)
        assert got.shape == want.shape == (1, 13, 13, 4)
        np.testing.assert_array_equal(got, want)

    def test_spp_pool_is_symmetric(self):
        """A 5x5/1 pool must look 2 pixels in EVERY direction (darknet
        offset -(size-1)//2), not 4 to the bottom-right."""
        from yolo_tpu.ops.pool import maxpool_nhwc

        x = np.zeros((1, 7, 7, 1), np.float32)
        x[0, 0, 0, 0] = 5.0  # top-left corner peak
        got = np.asarray(maxpool_nhwc(jnp.asarray(x), 5, 1))[0, :, :, 0]
        assert got[2, 2] == 5.0   # reaches 2 down-right
        assert got[3, 3] == 0.0   # but not 3

    def test_spp_block_cfg_runs(self, tmp_path):
        """A mini SPP block (route -2 / pools 5,9,13 / 4-way concat)
        parses from cfg text and matches the TF oracle."""
        from tests import tf_oracle
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        cfg_text = (
            "[net]\nwidth=64\nheight=64\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[maxpool]\nsize=5\nstride=1\n"
            "[route]\nlayers = -2\n"
            "[maxpool]\nsize=9\nstride=1\n"
            "[route]\nlayers = -4\n"
            "[maxpool]\nsize=13\nstride=1\n"
            "[route]\nlayers = -1,-3,-5,-6\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=1\n"
            "activation=leaky\n"
            "[convolutional]\nfilters=18\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0,1\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\n")
        p = tmp_path / "spp.cfg"
        p.write_text(cfg_text)
        cfg = config_from_cfg(str(p))
        # 4-way concat: 16 * 4 = 64 channels into the 1x1
        rng = np.random.default_rng(0)
        params = dw.random_params(cfg.layers, rng)
        x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        want = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
        got = graph.apply_layers(cfg.layers, graph.params_to_jax(params),
                                 jnp.asarray(x), eps=cfg.bn_eps)
        assert len(got) == len(want) == 1
        np.testing.assert_allclose(
            np.asarray(got[0]), want[0], rtol=1e-4,
            atol=1e-5 * np.abs(want[0]).max())


class TestYolov4Features:
    """yolov4-family cfg capabilities: mish activation, [route]
    groups/group_id (CSP channel slice), [yolo] scale_x_y."""

    def test_mish_matches_tf_oracle(self):
        from tests import tf_oracle

        layers = (Conv(8, act="mish"), Conv(16, act="mish"))
        rng = np.random.default_rng(0)
        params = dw.random_params(layers, rng)
        x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
        want = tf_oracle.run_layers(layers, params, x)
        got = np.asarray(graph.apply_layers(
            layers, graph.params_to_jax(params), jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4,
                                   atol=1e-5 * np.abs(want).max())

    def test_sam_matches_tf_oracle(self):
        """[sam] (AlexeyAB sam_layer): elementwise multiply with the
        `from` layer's output — yolov4-sam-* spatial attention."""
        from tests import tf_oracle
        from yolo_tpu.configs.specs import Sam

        layers = (Conv(8), Conv(8, 1, act="logistic"), Sam(-2))
        rng = np.random.default_rng(4)
        params = dw.random_params(layers, rng)
        x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        want = tf_oracle.run_layers(layers, params, x)
        got = np.asarray(graph.apply_layers(
            layers, graph.params_to_jax(params), jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4,
                                   atol=1e-5 * np.abs(want).max())
        # and the multiply really is vs layer 0's output
        outs = graph.apply_layers(layers, graph.params_to_jax(params),
                                  jnp.asarray(x), return_all=True)
        np.testing.assert_allclose(
            np.asarray(outs[2]),
            np.asarray(outs[1]) * np.asarray(outs[0]), rtol=1e-6)

    def test_sam_cfg_parse_and_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)
        from yolo_tpu.configs.specs import Sam

        cfg_text = (
            "[net]\nwidth=32\nheight=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=1\n"
            "activation=leaky\n"
            "[sam]\nfrom=-2\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\n")
        p = tmp_path / "sam.cfg"
        p.write_text(cfg_text)
        cfg = config_from_cfg(str(p))
        assert cfg.layers[2] == Sam(-2)
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        assert config_from_cfg(str(p2)).layers == cfg.layers

    def test_sam_ref_and_stride_validated(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        base = ("[net]\nwidth=32\nheight=32\n"
                "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
                "stride=2\npad=1\nactivation=leaky\n"
                "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
                "stride=2\npad=1\nactivation=leaky\n"
                "[sam]\nfrom=-2\n"
                "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
                "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
                "num=2\n")
        p = tmp_path / "bad.cfg"
        p.write_text(base)  # sam spans stride 2 vs 4
        with pytest.raises(ValueError, match="sam across feature"):
            config_from_cfg(str(p))
        p.write_text(base.replace("from=-2", "from=-9"))
        with pytest.raises(ValueError, match="not an earlier layer"):
            config_from_cfg(str(p))

    def test_sam_breaks_int8_chain(self):
        """A conv whose output feeds a [sam] (directly or as its `from`
        source) must emit fp, not chained int8 — sam multiplies in
        dequantized space."""
        from yolo_tpu.configs.specs import Sam
        from yolo_tpu.models.quantize import _chain_out_scales

        layers = (Conv(8), Conv(8, 1), Sam(-2), Conv(4, 1))
        out_scales, _ = _chain_out_scales(layers, [1.0] * 3)
        assert out_scales == [None, None, None]

    def test_scale_channels_se_block_matches_tf_oracle(self):
        """[scale_channels] (AlexeyAB scale_channels_layer): the SE
        multiply — a global-avgpool 1x1-conv attention branch scales
        the from layer's channels, output adopting the FROM shape."""
        from tests import tf_oracle
        from yolo_tpu.configs.specs import AvgPool, ScaleChannels

        layers = (Conv(8),                       # 0: trunk (H, W, 8)
                  AvgPool(),                     # 1: (1, 1, 8)
                  Conv(4, 1),                    # 2: squeeze
                  Conv(8, 1, act="logistic"),    # 3: excite (1, 1, 8)
                  ScaleChannels(-4))             # 4: scale layer 0
        rng = np.random.default_rng(6)
        params = dw.random_params(layers, rng)
        x = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
        want = tf_oracle.run_layers(layers, params, x)
        got = np.asarray(graph.apply_layers(
            layers, graph.params_to_jax(params), jnp.asarray(x)))
        assert got.shape == (2, 8, 8, 8)  # FROM layer's extent
        np.testing.assert_allclose(got, want, rtol=1e-4,
                                   atol=1e-5 * np.abs(want).max())
        # broadcast semantics: out = trunk * excite per channel
        outs = graph.apply_layers(layers, graph.params_to_jax(params),
                                  jnp.asarray(x), return_all=True)
        np.testing.assert_allclose(
            np.asarray(outs[4]),
            np.asarray(outs[0]) * np.asarray(outs[3]), rtol=1e-6)

    def test_scale_channels_spatial_mode(self):
        """scale_wh=1: a (B, H, W, 1) attention map scales all channels
        of the from layer (spatial scaling)."""
        from yolo_tpu.configs.specs import ScaleChannels

        layers = (Conv(8), Conv(1, 1, act="logistic"),
                  ScaleChannels(-2, scale_wh=1))
        rng = np.random.default_rng(7)
        params = dw.random_params(layers, rng)
        x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        outs = graph.apply_layers(layers, graph.params_to_jax(params),
                                  jnp.asarray(x), return_all=True)
        assert np.asarray(outs[2]).shape == (1, 8, 8, 8)
        np.testing.assert_allclose(
            np.asarray(outs[2]),
            np.asarray(outs[0]) * np.asarray(outs[1]), rtol=1e-6)

    def test_scale_channels_cfg_parse_and_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)
        from yolo_tpu.configs.specs import AvgPool, ScaleChannels

        cfg_text = (
            "[net]\nwidth=32\nheight=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[avgpool]\n"
            "[convolutional]\nbatch_normalize=1\nfilters=4\nsize=1\n"
            "activation=leaky\n"
            "[convolutional]\nfilters=16\nsize=1\nactivation=logistic\n"
            "[scale_channels]\nfrom=-4\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\n")
        p = tmp_path / "se.cfg"
        p.write_text(cfg_text)
        cfg = config_from_cfg(str(p))
        assert cfg.layers[1] == AvgPool()
        assert cfg.layers[4] == ScaleChannels(-4)
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        assert config_from_cfg(str(p2)).layers == cfg.layers
        # weights round-trip through the SE block (channel inference
        # must follow the from layer at the scale_channels)
        rng = np.random.default_rng(8)
        params = dw.random_params(cfg.layers, rng)
        assert params[3]["kernel"].shape[2] == 16  # head conv in-ch
        import io as _io

        blob = dw.to_bytes(cfg.layers, params)
        got, _ = dw.load(_io.BytesIO(blob), cfg.layers)
        for a, b in zip(params, got):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_scale_channels_ref_validated(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad.cfg"
        p.write_text(
            "[net]\nwidth=32\nheight=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[scale_channels]\nfrom=-9\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\n")
        with pytest.raises(ValueError, match="not an earlier layer"):
            config_from_cfg(str(p))

    def test_scale_channels_breaks_int8_chain(self):
        """Convs feeding a [scale_channels] (as input or `from`) must
        emit fp — the SE multiply runs in dequantized space."""
        from yolo_tpu.configs.specs import ScaleChannels
        from yolo_tpu.models.quantize import _chain_out_scales

        layers = (Conv(8), Conv(8, 1), ScaleChannels(-2), Conv(4, 1))
        out_scales, _ = _chain_out_scales(layers, [1.0] * 3)
        assert out_scales == [None, None, None]

    def test_se_block_int8_calibrates(self):
        """int8 calibration walks SE blocks (avgpool squeeze branch)
        and returns one finite scale per conv."""
        from yolo_tpu.configs.specs import AvgPool, ScaleChannels
        from yolo_tpu.models import quantize

        layers = (Conv(8), AvgPool(), Conv(4, 1),
                  Conv(8, 1, act="logistic"), ScaleChannels(-4),
                  Conv(4, 1, bn=False, act="linear"))
        rng = np.random.default_rng(9)
        folded = graph.fold_params(
            layers, dw.random_params(layers, rng), 1e-5)
        scales = quantize.calibrate(
            layers, folded, rng.uniform(0, 1, (1, 8, 8, 3)
                                        ).astype(np.float32))
        assert len(scales) == 4 and all(np.isfinite(s) and s > 0
                                        for s in scales)

    def test_partial_residual_shortcut(self):
        """[shortcut] across MISMATCHED channel counts (darknet
        shortcut_cpu: add over min(c1,c2), pass the rest through — the
        yolov3-tiny-prn partial-residual family), vs the TF oracle and
        an explicit channel-slice check."""
        from tests import tf_oracle
        from yolo_tpu.configs.specs import Shortcut

        layers = (Conv(16), Conv(8, 1), Shortcut(-2))  # 8ch + 16ch from
        rng = np.random.default_rng(21)
        params = dw.random_params(layers, rng)
        x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        want = tf_oracle.run_layers(layers, params, x)
        outs = graph.apply_layers(layers, graph.params_to_jax(params),
                                  jnp.asarray(x), return_all=True)
        got = np.asarray(outs[2])
        assert got.shape[-1] == 8  # output keeps the INPUT's channels
        np.testing.assert_allclose(got, want, rtol=1e-4,
                                   atol=1e-5 * np.abs(want).max())
        np.testing.assert_allclose(
            got, np.asarray(outs[1]) + np.asarray(outs[0])[..., :8],
            rtol=1e-6)
        # larger input than from: tail passes through untouched
        layers2 = (Conv(8), Conv(16, 1), Shortcut(-2))
        params2 = dw.random_params(layers2, rng)
        outs2 = graph.apply_layers(layers2, graph.params_to_jax(params2),
                                   jnp.asarray(x), return_all=True)
        got2 = np.asarray(outs2[2])
        assert got2.shape[-1] == 16
        np.testing.assert_allclose(
            got2[..., 8:], np.asarray(outs2[1])[..., 8:], rtol=1e-6)
        want2 = tf_oracle.run_layers(layers2, params2, x)
        np.testing.assert_allclose(got2, want2, rtol=1e-4,
                                   atol=1e-5 * np.abs(want2).max())

    def test_weighted_shortcut_parses(self, tmp_path):
        """[shortcut] weights_type (scaled-yolov4 csp-x family) parses
        into a weighted Shortcut since round 3 (it used to reject);
        forward/layout semantics live in tests/test_weighted_shortcut.py.
        Unknown weights_type values still reject loudly."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "w.cfg"
        body = (
            "[net]\nwidth=32\nheight=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=1\n"
            "activation=linear\n"
            "[shortcut]\nfrom=-2\nweights_type={wt}\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\n")
        p.write_text(body.format(wt="per_feature"))
        cfg = config_from_cfg(str(p))
        sc = [l for l in cfg.layers if isinstance(l, Shortcut)]
        assert len(sc) == 1
        assert sc[0].weights_type == "per_feature"
        assert sc[0].weights_norm == "none"

        # parser.c alias: per_layer == per_feature
        p.write_text(body.format(wt="per_layer"))
        cfg = config_from_cfg(str(p))
        sc = [l for l in cfg.layers if isinstance(l, Shortcut)]
        assert sc[0].weights_type == "per_feature"

        p.write_text(body.format(wt="per_pixel"))
        with pytest.raises(ValueError, match="weights_type"):
            config_from_cfg(str(p))

    def test_grouped_conv_matches_tf_oracle(self):
        """[convolutional] groups=N (grouped conv, efficientnet/enet
        cfgs): lax feature_group_count vs the oracle's independent
        split/conv/concat derivation; kernel is (k, k, ic/g, oc)."""
        from tests import tf_oracle

        layers = (Conv(8), Conv(16, groups=4),
                  Conv(16, groups=16))  # last = depthwise
        rng = np.random.default_rng(12)
        params = dw.random_params(layers, rng)
        assert params[1]["kernel"].shape == (3, 3, 2, 16)   # 8/4 in
        assert params[2]["kernel"].shape == (3, 3, 1, 16)   # depthwise
        x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        want = tf_oracle.run_layers(layers, params, x)
        got = np.asarray(graph.apply_layers(
            layers, graph.params_to_jax(params), jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4,
                                   atol=1e-5 * np.abs(want).max())

    def test_grouped_conv_weights_round_trip(self):
        import io as _io

        from yolo_tpu.io import zoo

        layers = (Conv(8), Conv(16, groups=4, bn=False, act="linear"))
        rng = np.random.default_rng(13)
        params = dw.random_params(layers, rng)
        blob = dw.to_bytes(layers, params)
        assert len(blob) == zoo.expected_weights_bytes(layers)
        got, _ = dw.load(_io.BytesIO(blob), layers)
        for a, b in zip(params, got):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_grouped_conv_cfg_parse_and_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        cfg_text = (
            "[net]\nwidth=32\nheight=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\ngroups=16\n"
            "size=3\nstride=1\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\n")
        p = tmp_path / "g.cfg"
        p.write_text(cfg_text)
        cfg = config_from_cfg(str(p))
        assert cfg.layers[1] == Conv(16, groups=16)
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        assert config_from_cfg(str(p2)).layers == cfg.layers
        # groups must divide filters
        p.write_text(cfg_text.replace("groups=16", "groups=5"))
        with pytest.raises(ValueError, match="groups=5"):
            config_from_cfg(str(p))

    def test_grouped_conv_in_channel_mismatch_raises(self):
        """groups must divide the INPUT channels too (caught at the
        weights walk with a clear message, not a reshape error)."""
        layers = (Conv(9), Conv(8, groups=2))  # 9 in-ch, groups=2
        with pytest.raises(ValueError, match="groups=2 must divide"):
            dw.random_params(layers, np.random.default_rng(0))

    def test_grouped_conv_int8(self):
        """int8 PTQ through grouped convs: per-out-channel weight
        scales apply unchanged; dequantized output tracks fp32."""
        from yolo_tpu.models import quantize

        layers = (Conv(8), Conv(16, groups=4),
                  Conv(8, 1, bn=False, act="linear"))
        rng = np.random.default_rng(14)
        params = dw.random_params(layers, rng)
        x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        folded = graph.fold_params(layers, params, 1e-5)
        fp = np.asarray(graph.apply_layers(
            layers, graph.params_to_jax(folded), jnp.asarray(x)))
        scales, om = quantize.calibrate(layers, folded, x,
                                        return_out_maxes=True)
        q = quantize.quantize(layers, folded, scales, out_maxes=om)
        qout = np.asarray(graph.apply_layers(
            layers, graph.params_to_jax_quant(q), jnp.asarray(x),
            compute_dtype=jnp.bfloat16))
        assert np.isfinite(qout).all()
        scale = max(np.abs(fp).max(), 1e-3)
        assert np.abs(qout - fp).max() / scale < 0.1

    def test_route_groups_slices_channels(self):
        """[route] layers=-1 groups=2 group_id=1 keeps the SECOND half
        of the channels (yolov4-tiny CSP pattern)."""
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        layers = (Route((-1,), groups=2, group_id=1),)
        # route referencing layer -1 from index 0 is invalid; embed it
        layers = (Conv(8, 1), Route((-1,), groups=2, group_id=1))
        params = dw.random_params(layers, rng, input_channels=8)
        outs = graph.apply_layers(layers, graph.params_to_jax(params),
                                  jnp.asarray(x), return_all=True)
        np.testing.assert_array_equal(np.asarray(outs[1]),
                                      np.asarray(outs[0])[..., 4:])

    def test_csp_block_cfg_runs_vs_oracle(self, tmp_path):
        """A yolov4-tiny-style CSP block (conv; route groups; convs;
        route concat; shortcutless merge) parses and matches the TF
        oracle, and its weights round-trip (in-channel inference must
        halve at the grouped route)."""
        from tests import tf_oracle
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        cfg_text = (
            "[net]\nwidth=32\nheight=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=3\n"
            "stride=2\npad=1\nactivation=mish\n"
            "[route]\nlayers=-1\ngroups=2\ngroup_id=1\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=1\npad=1\nactivation=leaky\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=1\npad=1\nactivation=leaky\n"
            "[route]\nlayers=-1,-2\n"
            "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=1\n"
            "activation=leaky\n"
            "[route]\nlayers=-6,-1\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\nscale_x_y = 1.05\n")
        p = tmp_path / "csp.cfg"
        p.write_text(cfg_text)
        cfg = config_from_cfg(str(p))
        assert cfg.yolo_heads[0].scale_xy == pytest.approx(1.05)
        rng = np.random.default_rng(2)
        params = dw.random_params(cfg.layers, rng)
        # conv after grouped route must see 8 in-channels (16 // 2)
        assert params[1]["kernel"].shape[2] == 8
        # final route concats conv0 (16ch) + conv4 (16ch) = 32
        assert params[4]["kernel"].shape[2] == 32
        x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        want = tf_oracle.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
        got = graph.apply_layers(cfg.layers, graph.params_to_jax(params),
                                 jnp.asarray(x), eps=cfg.bn_eps)
        np.testing.assert_allclose(
            np.asarray(got[0]), want[0], rtol=1e-4,
            atol=1e-5 * np.abs(want[0]).max())

    def test_scale_xy_decode_matches_oracle(self):
        rng = np.random.default_rng(3)
        heads = [rng.normal(size=(1, 4, 4, 9)).astype(np.float32)]
        masks, scales = [(0,)], [1.1]
        bj, sj = decode_yolo([jnp.asarray(h) for h in heads],
                             ((10, 14),), masks, 4, 64, scales=scales)
        bo, so = npr.decode_yolo([h[0] for h in heads], ((10, 14),),
                                 masks, 4, 64, scales=scales)
        np.testing.assert_allclose(np.asarray(bj)[0], bo, rtol=1e-5,
                                   atol=1e-6)
        # and scale != 1 actually changes the decode
        b1, _ = decode_yolo([jnp.asarray(h) for h in heads],
                            ((10, 14),), masks, 4, 64)
        assert np.abs(np.asarray(bj) - np.asarray(b1)).max() > 1e-4

    def test_scale_xy_loss_matches_oracle(self):
        from tests.loss_oracle import yolo_loss_np

        rng = np.random.default_rng(4)
        scales = [1.1, 1.05]
        boxes, classes = _random_v3_scene(rng, 2)
        targets = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        heads = [rng.normal(size=(2, 64 // st, 64 // st, 2 * 9)
                            ).astype(np.float32)
                 for st in MICRO_V3_STRIDES]
        cfg = YoloLossConfig()
        total, parts = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg, scales=scales)
        want_total, want_parts = yolo_loss_np(
            heads, targets, V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg,
            scales=scales)
        for k in want_parts:
            assert float(parts[k]) == pytest.approx(want_parts[k],
                                                    rel=1e-4, abs=1e-5), k

    @pytest.mark.parametrize("kind", ["iou", "giou", "diou", "ciou"])
    def test_iou_loss_matches_oracle(self, kind):
        from tests.loss_oracle import yolo_loss_np

        rng = np.random.default_rng(6)
        boxes, classes = _random_v3_scene(rng, 2)
        targets = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        heads = [rng.normal(size=(2, 64 // st, 64 // st, 2 * 9)
                            ).astype(np.float32) * 0.5
                 for st in MICRO_V3_STRIDES]
        cfg = YoloLossConfig(iou_loss=kind, iou_normalizer=0.07,
                             cls_normalizer=0.5)
        total, parts = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        want_total, want_parts = yolo_loss_np(
            heads, targets, V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        for k in want_parts:
            assert float(parts[k]) == pytest.approx(want_parts[k],
                                                    rel=1e-3, abs=1e-5), k

    def test_ciou_loss_trains_mish_csp_model(self):
        """A mish/CSP/scale_x_y micro model (the yolov4 feature set)
        trains with the CIoU box loss: loss decreases, box term falls."""
        import dataclasses as dc

        layers = (
            Conv(8, stride=2, act="mish"),                   # 0 /2
            Conv(16, stride=2, act="mish"),                  # 1 /4
            Route((-1,), groups=2, group_id=1),              # 2 (8ch)
            Conv(8, act="mish"),                             # 3
            Conv(8, act="mish"),                             # 4
            Route((-1, -2)),                                 # 5 (16)
            Conv(16, 1),                                     # 6
            Conv(32, stride=2),                              # 7 /8
            Conv(2 * 9, size=1, bn=False, act="linear"),     # 8
            YoloHead((2, 3), scale_xy=1.05),                 # 9
            Route((-3,)),                                    # 10 -> 7
            Conv(8, 1),                                      # 11
            Upsample(2),                                     # 12 /4
            Route((-1, 6)),                                  # 13 (8+16)
            Conv(16),                                        # 14
            Conv(2 * 9, size=1, bn=False, act="linear"),     # 15
            YoloHead((0, 1), scale_xy=1.05),                 # 16
        )
        cfg = ModelConfig(name="micro-v4", layers=layers,
                          anchors=V3_ANCHORS,
                          class_names=("a", "b", "c", "d"),
                          input_size=64, iou_loss="ciou",
                          iou_normalizer=0.07)
        rng = np.random.default_rng(12)
        params = dw.random_params(cfg.layers, rng, scale=0.1)
        from yolo_tpu.train.loss import YoloLossConfig as YLC

        tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                           yolo_loss=YLC(iou_loss="ciou",
                                         iou_normalizer=0.07))
        state = init_state(params, tcfg)
        step = make_train_step(cfg, tcfg)
        boxes, classes = _random_v3_scene(rng, 4)
        batch = tgt.encode_batch_for(cfg, boxes, classes)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["images"] = jnp.asarray(
            rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))
        losses, coords = [], []
        for _ in range(30):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
            coords.append(float(metrics["coord"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.6
        assert coords[-1] < coords[0]

    def test_route_groups_slices_each_source(self):
        """darknet route_layer slices EVERY source into groups before
        concatenating (not the concatenated whole)."""
        rng = np.random.default_rng(7)
        x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
        layers = (Conv(8, 1), Conv(6, 1),
                  Route((-1, -2), groups=2, group_id=0))
        params = dw.random_params(layers, rng, input_channels=4)
        outs = graph.apply_layers(layers, graph.params_to_jax(params),
                                  jnp.asarray(x), return_all=True)
        want = np.concatenate([np.asarray(outs[1])[..., :3],
                               np.asarray(outs[0])[..., :4]], axis=-1)
        np.testing.assert_array_equal(np.asarray(outs[2]), want)
        # weights walk agrees: a conv after it sees 3 + 4 channels
        layers2 = layers + (Conv(5, 1),)
        p2 = dw.random_params(layers2, rng, input_channels=4)
        assert p2[2]["kernel"].shape[2] == 7

    def test_int8_preserves_mish(self):
        """int8 blocks must apply the conv's real activation — a mish
        model quantized and run must track fp32 closely (this was a
        silent-garbage bug: mish fell through to linear)."""
        from yolo_tpu.models import quantize

        layers = (Conv(8, act="mish"), Conv(16, act="mish"))
        cfg = ModelConfig(name="m", layers=layers, anchors=((1, 1),),
                          class_names=("a",), input_size=32)
        rng = np.random.default_rng(3)
        params = dw.random_params(layers, rng)
        folded = graph.fold_params(layers, params)
        x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        want = np.asarray(graph.apply_layers(
            layers, graph.params_to_jax(folded), jnp.asarray(x)))
        q = quantize.prepare_int8(cfg, folded, x)
        got = np.asarray(graph.apply_layers(
            layers, graph.params_to_jax_quant(q), jnp.asarray(x)))
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 0.1, rel

    def test_multi_positive_iou_thresh_assignment(self):
        """assign_iou_thresh < 1 (AlexeyAB iou_thresh) assigns every
        anchor above the wh-IoU bar, not just the best."""
        # box (24, 20) px: wh-IoU 1.0 vs anchor 2 and ~0.33 vs anchor 3
        enc = tgt.encode_yolo(
            np.array([[0.5, 0.5, 24 / 64, 20 / 64]]), np.array([1]),
            input_size=64, anchors_px=V3_ANCHORS, masks=MICRO_V3_MASKS,
            strides=MICRO_V3_STRIDES, assign_iou_thresh=0.3)
        assert enc["obj_mask_0"][4, 4, 0] == 1.0  # anchor 2 (best)
        assert enc["obj_mask_0"][4, 4, 1] == 1.0  # anchor 3 (above bar)
        # each slot's wh targets use its OWN anchor
        np.testing.assert_allclose(
            enc["tcoord_0"][4, 4, 0][2:], [0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(
            enc["tcoord_0"][4, 4, 1][2:],
            [np.log(24 / 40), np.log(20 / 36)], rtol=1e-5)
        # default (1.0) stays best-anchor-only
        enc1 = tgt.encode_yolo(
            np.array([[0.5, 0.5, 24 / 64, 20 / 64]]), np.array([1]),
            input_size=64, anchors_px=V3_ANCHORS, masks=MICRO_V3_MASKS,
            strides=MICRO_V3_STRIDES)
        assert enc1["obj_mask_0"].sum() == 1.0

    def test_cls_normalizer_round_trips_without_iou_loss(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "cn.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\ncls_normalizer=0.5\niou_thresh=0.213\n")
        cfg = config_from_cfg(str(p))
        assert cfg.cls_normalizer == pytest.approx(0.5)
        assert cfg.assign_iou_thresh == pytest.approx(0.213)
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        back = config_from_cfg(str(p2))
        assert back.cls_normalizer == pytest.approx(0.5)
        assert back.assign_iou_thresh == pytest.approx(0.213)

    def test_max_delta_clamps_box_gradient(self):
        """[yolo] max_delta: the per-element gradient on the box logits
        is clamped (darknet clips l.delta's tx/ty/tw/th entries); the
        objectness/class gradients are untouched."""
        import jax

        targets = tgt.encode_batch_for(
            MICRO_V3, [np.array([[0.5, 0.5, 0.38, 0.32]])],
            [np.array([2])])
        targets = {k: jnp.asarray(v) for k, v in targets.items()}
        heads0 = [np.zeros((1, 64 // st, 64 // st, 2 * 9), np.float32)
                  for st in MICRO_V3_STRIDES]
        # extreme wh logits at the assigned slot -> huge MSE delta
        heads0[0][0, 4, 4, 2 * 9 * 0 + 2] = 12.0  # tw of slot 0
        heads0[0][0, 4, 4, 2 * 9 * 0 + 3] = -9.0

        def loss_fn(hs, max_delta):
            total, _ = yolo_loss(
                hs, targets, V3_ANCHORS, MICRO_V3_MASKS, 4, 64,
                YoloLossConfig(max_delta=max_delta))
            return total

        g_free = jax.grad(lambda hs: loss_fn(hs, 0.0))(
            [jnp.asarray(h) for h in heads0])
        g_clip = jax.grad(lambda hs: loss_fn(hs, 1.5))(
            [jnp.asarray(h) for h in heads0])
        gb_free = np.asarray(g_free[0]).reshape(1, 8, 8, 2, 9)[..., :4]
        gb_clip = np.asarray(g_clip[0]).reshape(1, 8, 8, 2, 9)[..., :4]
        assert np.abs(gb_free).max() > 5.0       # the free delta is huge
        assert np.abs(gb_clip).max() <= 1.5 + 1e-5
        # obj/class channels identical between the two
        go_free = np.asarray(g_free[0]).reshape(1, 8, 8, 2, 9)[..., 4:]
        go_clip = np.asarray(g_clip[0]).reshape(1, 8, 8, 2, 9)[..., 4:]
        np.testing.assert_allclose(go_clip, go_free, rtol=1e-6)

    def test_max_delta_parsed_per_head_and_round_trips(self, tmp_path):
        """max_delta/label_smooth_eps are PER-[yolo]-layer options in
        AlexeyAB darknet — heads may differ (published cfgs set
        max_delta on the small-object head only)."""
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "md.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\nmax_delta=5\nlabel_smooth_eps=0.1\n"
            "[route]\nlayers = -2\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 1\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\n")
        cfg = config_from_cfg(str(p))
        assert cfg.yolo_heads[0].max_delta == 5.0
        assert cfg.yolo_heads[0].label_smooth_eps == 0.1
        assert cfg.yolo_heads[1].max_delta is None  # unset on head 2
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        back = config_from_cfg(str(p2))
        assert back.yolo_heads[0].max_delta == 5.0
        assert back.yolo_heads[1].max_delta is None

    def test_explicit_zero_max_delta_survives_round_trip(self, tmp_path):
        """An explicit per-head max_delta=0 / label_smooth_eps=0 (the
        documented sentinel disabling a global YoloLossConfig value)
        must survive cfg_to_string -> config_from_cfg: emitting only
        truthy values would silently re-enable the global (ADVICE r1)."""
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "z.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\nmax_delta=0\nlabel_smooth_eps=0\n")
        cfg = config_from_cfg(str(p))
        assert cfg.yolo_heads[0].max_delta == 0.0
        assert cfg.yolo_heads[0].label_smooth_eps == 0.0
        p2 = tmp_path / "z2.cfg"
        p2.write_text(cfg_to_string(cfg))
        back = config_from_cfg(str(p2))
        assert back.yolo_heads[0].max_delta == 0.0
        assert back.yolo_heads[0].label_smooth_eps == 0.0

    def test_max_delta_scales_with_batch(self):
        """The clamp threshold is max_delta/b (darknet clips the
        PER-IMAGE delta; our loss is the batch mean)."""
        import jax

        targets = tgt.encode_batch_for(
            MICRO_V3,
            [np.array([[0.5, 0.5, 0.38, 0.32]])] * 2,
            [np.array([2])] * 2)
        targets = {k: jnp.asarray(v) for k, v in targets.items()}
        heads = [np.zeros((2, 64 // st, 64 // st, 2 * 9), np.float32)
                 for st in MICRO_V3_STRIDES]
        heads[0][:, 4, 4, 2] = 12.0  # huge tw delta, both images

        def loss_fn(hs):
            total, _ = yolo_loss(
                hs, targets, V3_ANCHORS, MICRO_V3_MASKS, 4, 64,
                YoloLossConfig(max_delta=3.0))
            return total

        g = jax.grad(loss_fn)([jnp.asarray(h) for h in heads])
        gb = np.asarray(g[0]).reshape(2, 8, 8, 2, 9)[..., :4]
        # per-element bound = max_delta / batch = 1.5
        assert np.abs(gb).max() <= 3.0 / 2 + 1e-5
        assert np.abs(gb).max() > 1.0  # and the clamp actually binds

    def test_net_training_params(self, tmp_path):
        """[net] training keys parse for CLI fallbacks (darknet's cfg
        IS its training config)."""
        from yolo_tpu.configs.darknet_cfg import net_training_params

        p = tmp_path / "hp.cfg"
        p.write_text(
            "[net]\nwidth=32\nlearning_rate=0.00261\nmomentum=0.949\n"
            "decay=0.0005\nburn_in=1000\nsteps=400000,450000\n"
            "scales=.1,.1\npolicy=steps\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\nnum=2\n")
        hp = net_training_params(str(p))
        assert hp == {"learning_rate": 0.00261, "momentum": 0.949,
                      "decay": 0.0005, "burn_in": 1000, "policy": "steps",
                      "steps": (400000, 450000), "scales": (0.1, 0.1)}
        # a cfg without the keys yields only darknet's default policy
        p2 = tmp_path / "bare.cfg"
        p2.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\nnum=2\n")
        assert net_training_params(str(p2)) == {"policy": "constant"}

    def test_label_smoothing_raises_class_floor(self):
        """label_smooth_eps shifts the class BCE optimum off 0/1: with
        saturated correct logits the smoothed loss exceeds the
        unsmoothed one (which tends to 0)."""
        targets = tgt.encode_batch_for(
            MICRO_V3, [np.array([[0.5, 0.5, 0.38, 0.32]])],
            [np.array([2])])
        targets = {k: jnp.asarray(v) for k, v in targets.items()}
        heads = [np.zeros((1, 64 // st, 64 // st, 2 * 9), np.float32)
                 for st in MICRO_V3_STRIDES]
        # saturate the assigned slot's class logits toward the truth
        v = heads[0].reshape(1, 8, 8, 2, 9)
        v[0, 4, 4, 0, 5:] = [-20, -20, 20, -20]  # class 2 hot
        args = ([jnp.asarray(h) for h in heads], targets, V3_ANCHORS,
                MICRO_V3_MASKS, 4, 64)
        _, plain = yolo_loss(*args, YoloLossConfig())
        _, smooth = yolo_loss(*args,
                              YoloLossConfig(label_smooth_eps=0.1))
        assert float(plain["class"]) < 1e-6
        assert float(smooth["class"]) > 0.1

    def test_cli_train_uses_cfg_net_hyperparams(self, tmp_path, capsys):
        """train --cfg without --lr uses the [net] learning_rate (a
        crazy-large cfg lr must visibly explode vs the default)."""
        from tests.test_data_eval import make_voc_root
        from yolo_tpu import cli
        from yolo_tpu.configs.darknet_cfg import cfg_to_string

        root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
        text = cfg_to_string(MICRO_V3)
        text = text.replace("[net]", "[net]\nlearning_rate=0.0\n", 1)
        cfgp = tmp_path / "m.cfg"
        cfgp.write_text(text)
        names = tmp_path / "m.names"
        names.write_text("\n".join(MICRO_V3.class_names) + "\n")
        w = tmp_path / "m.weights"
        init = dw.random_params(MICRO_V3.layers, np.random.default_rng(3))
        dw.save(str(w), MICRO_V3.layers, init)
        ckdir = tmp_path / "ck"
        cli.main(["train", "--cfg", str(cfgp), "--names", str(names),
                  "--weights", str(w), "--voc-root", root,
                  "--epochs", "1", "--batch", "8", "--precision", "fp32",
                  "--checkpoint-dir", str(ckdir)])
        capsys.readouterr()
        # cfg lr=0 (no --lr flag): kernels must come out bit-identical
        from yolo_tpu.io import checkpoint as ckpt

        state = ckpt.restore(str(ckdir / "final"))
        np.testing.assert_array_equal(
            np.asarray(state["params"][0]["kernel"]), init[0]["kernel"])

    def test_new_coords_rejected(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "nc.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\nnew_coords=1\n")
        with pytest.raises(ValueError, match="new_coords"):
            config_from_cfg(str(p))

    def test_cfg_round_trip_with_v4_features(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        layers = (
            Conv(16, stride=2, act="mish"),
            Route((-1,), groups=2, group_id=1),
            Conv(8),
            Conv(9, size=1, bn=False, act="linear"),
            YoloHead((0,), scale_xy=1.05),
        )
        cfg = ModelConfig(name="v4ish", layers=layers,
                          anchors=((10, 14), (23, 27)),
                          class_names=("a", "b", "c", "d"),
                          input_size=32, iou_loss="ciou",
                          iou_normalizer=0.07, cls_normalizer=0.5)
        p = tmp_path / "rt.cfg"
        p.write_text(cfg_to_string(cfg))
        back = config_from_cfg(str(p))
        assert back.layers == cfg.layers
        assert back.anchors == cfg.anchors
        assert back.iou_loss == "ciou"
        assert back.iou_normalizer == pytest.approx(0.07)
        assert back.cls_normalizer == pytest.approx(0.5)


def _random_v3_scene(rng, batch):
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


class TestGTEncoderV3:
    def test_best_anchor_routes_to_owning_head(self):
        # 0.38x0.32 box at net 64 -> (24.3, 20.5) px: best anchor 2
        # (24,20), owned by head 0 slot 0; center cell on the 8x8 grid
        enc = tgt.encode_yolo(
            np.array([[0.5, 0.5, 0.38, 0.32]]), np.array([2]),
            input_size=64, anchors_px=V3_ANCHORS, masks=MICRO_V3_MASKS,
            strides=MICRO_V3_STRIDES)
        assert enc["obj_mask_0"][4, 4, 0] == 1.0
        assert enc["obj_mask_0"].sum() == 1.0
        assert enc["obj_mask_1"].sum() == 0.0
        assert enc["tcls_0"][4, 4, 0] == 2
        np.testing.assert_allclose(
            enc["tcoord_0"][4, 4, 0],
            [0.5 * 8 - 4, 0.5 * 8 - 4,
             np.log(0.38 * 64 / 24.0), np.log(0.32 * 64 / 20.0)],
            rtol=1e-5)
        assert enc["coord_w_0"][4, 4, 0] == pytest.approx(
            2.0 - 0.38 * 0.32)

    def test_small_box_goes_to_fine_head(self):
        # 0.1x0.12 box -> (6.4, 7.7) px: best anchor 0, head 1 slot 0,
        # 16x16 grid
        enc = tgt.encode_yolo(
            np.array([[0.3, 0.7, 0.1, 0.12]]), np.array([1]),
            input_size=64, anchors_px=V3_ANCHORS, masks=MICRO_V3_MASKS,
            strides=MICRO_V3_STRIDES)
        assert enc["obj_mask_0"].sum() == 0.0
        assert enc["obj_mask_1"][int(0.7 * 16), int(0.3 * 16), 0] == 1.0

    def test_unmasked_anchor_drops_gt(self):
        """yolov3-tiny's official masks (3,4,5)/(1,2,3) leave anchor 0
        unowned — a GT matching it best gets no target (darknet
        behavior: the truth simply never trains any head)."""
        enc = tgt.encode_yolo(
            np.array([[0.5, 0.5, 0.1, 0.12]]), np.array([0]),
            input_size=64, anchors_px=V3_ANCHORS,
            masks=[(2, 3), (1,)], strides=MICRO_V3_STRIDES)
        assert enc["obj_mask_0"].sum() == 0.0
        assert enc["obj_mask_1"].sum() == 0.0
        assert enc["gt_mask"].sum() == 1.0  # still in the ignore set

    def test_shared_anchor_trains_every_owning_head(self):
        """darknet checks each [yolo] mask independently: with the
        official yolov3-tiny masks (3,4,5)/(1,2,3) a truth whose best
        anchor is 3 trains BOTH heads."""
        enc = tgt.encode_yolo(
            np.array([[0.5, 0.5, 0.38, 0.32]]), np.array([2]),
            input_size=64, anchors_px=V3_ANCHORS,
            masks=[(2, 3), (1, 2)],  # anchor 2 owned by both heads
            strides=MICRO_V3_STRIDES)
        # best anchor for (24.3, 20.5) px is anchor 2
        assert enc["obj_mask_0"][4, 4, 0] == 1.0   # head 0 slot 0
        assert enc["obj_mask_1"][8, 8, 1] == 1.0   # head 1 slot 1
        assert enc["tcls_0"][4, 4, 0] == 2
        assert enc["tcls_1"][8, 8, 1] == 2
        # per-head cell indexing differs; wh targets are identical
        np.testing.assert_allclose(enc["tcoord_0"][4, 4, 0][2:],
                                   enc["tcoord_1"][8, 8, 1][2:])

    def test_encode_batch_for_dispatches(self):
        boxes, classes = _random_v3_scene(np.random.default_rng(0), 2)
        enc = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        assert enc["obj_mask_0"].shape == (2, 8, 8, 2)
        assert enc["obj_mask_1"].shape == (2, 16, 16, 2)
        assert enc["gt_boxes"].shape == (2, tgt.MAX_GT_V3, 4)


class TestYoloLoss:
    def test_matches_oracle(self):
        from tests.loss_oracle import yolo_loss_np

        rng = np.random.default_rng(3)
        batch = 2
        boxes, classes = _random_v3_scene(rng, batch)
        targets = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        heads = [rng.normal(size=(batch, 64 // st, 64 // st, 2 * 9)
                            ).astype(np.float32)
                 for st in MICRO_V3_STRIDES]
        cfg = YoloLossConfig()
        total, parts = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        want_total, want_parts = yolo_loss_np(
            heads, targets, V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        for k in want_parts:
            assert float(parts[k]) == pytest.approx(want_parts[k],
                                                    rel=1e-4, abs=1e-5), k
        assert float(total) == pytest.approx(want_total, rel=1e-4)

    def test_ignore_thresh_masks_overlapping_anchors(self):
        """Unassigned anchors whose predictions overlap a GT above
        ignore_thresh contribute NO objectness loss: lowering the
        threshold silences strictly more anchors (exact per-anchor
        semantics are pinned by the oracle parity test)."""
        targets = tgt.encode_batch_for(
            MICRO_V3, [np.array([[0.53, 0.53, 0.4, 0.35]])],
            [np.array([0])])
        targets = {k: jnp.asarray(v) for k, v in targets.items()}
        heads = [jnp.zeros((1, 64 // st, 64 // st, 2 * 9), jnp.float32)
                 for st in MICRO_V3_STRIDES]

        def noobj(thresh):
            _, parts = yolo_loss(heads, targets, V3_ANCHORS,
                                 MICRO_V3_MASKS, 4, 64,
                                 YoloLossConfig(ignore_thresh=thresh))
            return float(parts["noobj"])

        # ignore-any-overlap silences strictly more than the default
        # (zero-logit boxes never reach IoU 0.7, so 0.7 == nothing-ignored
        # here; exact per-anchor semantics are pinned by the oracle test)
        assert noobj(0.01) < noobj(0.7)
        # with zero logits every anchor sits at BCE(0) = log 2; at
        # thresh > 1 nothing is ignored: all anchors minus the assigned
        n_anchors = sum((64 // st) ** 2 * 2 for st in MICRO_V3_STRIDES)
        assert noobj(1.1) == pytest.approx(
            (n_anchors - 1) * np.log(2), rel=1e-4)
        # the 0.01 count is also a whole number of anchors
        ratio = noobj(0.01) / np.log(2)
        assert ratio == pytest.approx(round(ratio), abs=1e-3)


class TestTrainV3:
    def test_loss_decreases(self):
        rng = np.random.default_rng(11)
        params = dw.random_params(MICRO_V3.layers, rng, scale=0.1)
        tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam")
        state = init_state(params, tcfg)
        step = make_train_step(MICRO_V3, tcfg)

        boxes, classes = _random_v3_scene(rng, 4)
        batch = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["images"] = jnp.asarray(
            rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))

        losses = []
        for _ in range(30):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.6

    def test_dp_grads_match_single_device(self):
        """DP yolo-family training over the fake 8-device mesh produces
        the same step as single-device on the concatenated batch."""
        import jax

        from yolo_tpu.parallel import sharding as shd

        rng = np.random.default_rng(5)
        params = dw.random_params(MICRO_V3.layers, rng, scale=0.1)
        tcfg = TrainConfig(learning_rate=1e-3)
        mesh = shd.make_mesh(len(jax.devices()))

        boxes, classes = _random_v3_scene(rng, 8)
        batch = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["images"] = jnp.asarray(
            rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))

        state1 = init_state(params, tcfg)
        step1 = make_train_step(MICRO_V3, tcfg)
        state1, m1 = step1(state1, batch)

        state8 = shd.replicate(mesh, init_state(params, tcfg))
        step8 = shd.make_dp_train_step(MICRO_V3, tcfg, mesh)
        state8, m8 = step8(state8, shd.shard_batch(mesh, batch))

        assert float(m8["loss"]) == pytest.approx(float(m1["loss"]),
                                                  rel=1e-5)
        k1 = np.asarray(state1["params"][0]["kernel"])
        k8 = np.asarray(state8["params"][0]["kernel"])
        np.testing.assert_allclose(k8, k1, rtol=1e-4, atol=1e-6)


def test_folded_bn_matches_unfolded():
    cfg = _small(YOLOV3_TINY_COCO)
    rng = np.random.default_rng(1)
    params = dw.random_params(cfg.layers, rng)
    x = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32))
    raw = graph.apply_layers(cfg.layers, graph.params_to_jax(params), x)
    folded = graph.fold_params(cfg.layers, params, eps=cfg.bn_eps)
    fast = graph.apply_layers(cfg.layers, graph.params_to_jax(folded), x)
    for r, f in zip(raw, fast):
        r = np.asarray(r)
        # fold/unfold are different fp32 contractions; tolerance scales
        # with the (residual-amplified) activation magnitude
        np.testing.assert_allclose(np.asarray(f), r, rtol=1e-3,
                                   atol=1e-4 * np.abs(r).max())


class TestObjNormalizer:
    def test_modern_split_matches_oracle(self):
        """obj_normalizer set (modern AlexeyAB): it scales the
        objectness BCE and cls_normalizer scales the class BCE —
        jax loss vs the loop oracle under the split semantics."""
        from tests.loss_oracle import yolo_loss_np

        rng = np.random.default_rng(31)
        boxes, classes = _random_v3_scene(rng, 2)
        targets = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        heads = [rng.normal(size=(2, 64 // st, 64 // st, 2 * 9)
                            ).astype(np.float32) * 0.5
                 for st in MICRO_V3_STRIDES]
        cfg = YoloLossConfig(obj_normalizer=2.0, cls_normalizer=0.5)
        total, parts = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        want_total, want_parts = yolo_loss_np(
            heads, targets, V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        for k in want_parts:
            assert float(parts[k]) == pytest.approx(want_parts[k],
                                                    rel=1e-4,
                                                    abs=1e-5), k
        # the split actually binds: doubling obj_normalizer doubles the
        # obj term relative to the classic config
        classic = YoloLossConfig(cls_normalizer=0.5)
        _, p2 = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64, classic)
        assert float(parts["obj"]) == pytest.approx(
            4.0 * float(p2["obj"]), rel=1e-4)  # 2.0 vs 0.5 scaling

    def test_cfg_parse_and_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "o.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\nobj_normalizer=0.7\ncls_normalizer=0.5\n")
        cfg = config_from_cfg(str(p))
        assert cfg.obj_normalizer == 0.7
        assert cfg.cls_normalizer == 0.5
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        back = config_from_cfg(str(p2))
        assert back.obj_normalizer == 0.7
        # absent key stays None (classic semantics)
        p3 = tmp_path / "c.cfg"
        p3.write_text(p.read_text().replace("obj_normalizer=0.7\n", ""))
        assert config_from_cfg(str(p3)).obj_normalizer is None


class TestFocalAndTruthThresh:
    """AlexeyAB [yolo] focal_loss=1 (paper-pinned sigmoid focal class
    loss, arXiv:1708.02002, darknet constants alpha=0.5 gamma=2) and
    truth_thresh < 1 (yolo_layer.c multi-truth positive pass)."""

    def _targets_heads(self, rng, batch=2):
        boxes, classes = _random_v3_scene(rng, batch)
        targets = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        heads = [rng.normal(size=(batch, 64 // st, 64 // st, 2 * 9)
                            ).astype(np.float32) * 0.5
                 for st in MICRO_V3_STRIDES]
        return targets, heads

    @pytest.mark.parametrize("kind", ["mse", "ciou"])
    def test_focal_loss_matches_oracle(self, kind):
        from tests.loss_oracle import yolo_loss_np

        rng = np.random.default_rng(11)
        targets, heads = self._targets_heads(rng)
        cfg = YoloLossConfig(iou_loss=kind, focal_loss=True)
        total, parts = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        want_total, want_parts = yolo_loss_np(
            heads, targets, V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        for k in want_parts:
            assert float(parts[k]) == pytest.approx(want_parts[k],
                                                    rel=1e-4, abs=1e-5), k
        # and focal actually changes (downweights) the class term
        _, p0 = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64,
            YoloLossConfig(iou_loss=kind))
        assert float(parts["class"]) < float(p0["class"])

    def test_focal_gradient_downweights_easy_examples(self):
        """The focal property: a well-classified (easy) logit receives
        a much smaller gradient than under plain BCE."""
        import jax

        def focal(l):
            p = jax.nn.sigmoid(l)
            return 0.5 * (1 - p) ** 2 * (jnp.maximum(l, 0) - l
                                         + jnp.log1p(jnp.exp(-jnp.abs(l))))

        def bce(l):
            return jnp.maximum(l, 0) - l + jnp.log1p(jnp.exp(-jnp.abs(l)))

        easy = jnp.asarray(4.0)  # p ~ 0.982 toward target 1
        g_f = float(jax.grad(focal)(easy))
        g_b = float(jax.grad(bce)(easy))
        assert abs(g_f) < 0.01 * abs(g_b)

    @pytest.mark.parametrize("kind", ["mse", "ciou"])
    def test_truth_thresh_matches_oracle(self, kind):
        from tests.loss_oracle import yolo_loss_np

        rng = np.random.default_rng(12)
        targets, heads = self._targets_heads(rng)
        cfg = YoloLossConfig(iou_loss=kind, truth_thresh=0.1,
                             ignore_thresh=0.5)
        total, parts = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        want_total, want_parts = yolo_loss_np(
            heads, targets, V3_ANCHORS, MICRO_V3_MASKS, 4, 64, cfg)
        for k in want_parts:
            assert float(parts[k]) == pytest.approx(want_parts[k],
                                                    rel=1e-3, abs=1e-5), k
        # the multi-truth pass actually fired: obj/class grow vs tt=1
        _, p0 = yolo_loss(
            [jnp.asarray(h) for h in heads],
            {k: jnp.asarray(v) for k, v in targets.items()},
            V3_ANCHORS, MICRO_V3_MASKS, 4, 64,
            YoloLossConfig(iou_loss=kind, ignore_thresh=0.5))
        assert float(parts["obj"]) > float(p0["obj"])

    def test_truth_thresh_trains(self):
        """Gradients flow through the multi-truth terms: a train step
        over MICRO_V3 with truth_thresh=0.1 decreases the loss."""
        tcfg = TrainConfig(learning_rate=5e-4,
                           yolo_loss=YoloLossConfig(truth_thresh=0.1,
                                                    focal_loss=True))
        rng = np.random.default_rng(13)
        state = init_state(dw.random_params(MICRO_V3.layers, rng,
                                            scale=0.1), tcfg)
        step = make_train_step(MICRO_V3, tcfg)
        boxes, classes = _random_v3_scene(rng, 4)
        batch = tgt.encode_batch_for(MICRO_V3, boxes, classes)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["images"] = jnp.asarray(
            rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32))
        losses = []
        for _ in range(8):
            state, m = step(state, dict(batch))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_unsupported_combinations_reject(self):
        rng = np.random.default_rng(14)
        targets, heads = self._targets_heads(rng)
        j = ([jnp.asarray(h) for h in heads],
             {k: jnp.asarray(v) for k, v in targets.items()})
        with pytest.raises(NotImplementedError, match="new_coords"):
            yolo_loss(j[0], j[1], V3_ANCHORS, MICRO_V3_MASKS, 4, 64,
                      YoloLossConfig(iou_loss="ciou", focal_loss=True),
                      new_coords=[True, True])
        with pytest.raises(NotImplementedError, match="smooth"):
            yolo_loss(j[0], j[1], V3_ANCHORS, MICRO_V3_MASKS, 4, 64,
                      YoloLossConfig(focal_loss=True,
                                     label_smooth_eps=0.1))
        with pytest.raises(NotImplementedError, match="Gaussian"):
            yolo_loss(j[0], j[1], V3_ANCHORS, MICRO_V3_MASKS, 4, 64,
                      YoloLossConfig(truth_thresh=0.5),
                      gaussian=[True, True])

    def test_cfg_parse_round_trip_and_region_rejection(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "f.cfg"
        p.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\nfocal_loss=1\ntruth_thresh=0.7\n")
        cfg = config_from_cfg(str(p))
        assert cfg.focal_loss is True
        assert cfg.truth_thresh == pytest.approx(0.7)
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        back = config_from_cfg(str(p2))
        assert back.focal_loss is True
        assert back.truth_thresh == pytest.approx(0.7)
        # defaults stay off
        p3 = tmp_path / "d.cfg"
        p3.write_text(p.read_text().replace(
            "focal_loss=1\ntruth_thresh=0.7\n", ""))
        d = config_from_cfg(str(p3))
        assert d.focal_loss is False and d.truth_thresh == 1.0
        # [region] focal_loss has no pinnable source: loud rejection
        r = tmp_path / "r.cfg"
        r.write_text(
            "[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n" * 5
            + "[convolutional]\nfilters=45\nsize=1\nactivation=linear\n"
            "[region]\nanchors = 1,1, 2,2\nclasses=4\nnum=2\n"
            "focal_loss=1\n")
        with pytest.raises(ValueError, match="focal_loss"):
            config_from_cfg(str(r))
