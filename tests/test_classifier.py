"""Darknet classifier family: [avgpool]/[connected]/[dropout]/[softmax]
parse + IR + weights IO + forward parity + CLI classify, and the
classifier->detector pretrained-backbone workflow (darknet19/darknet53
are the sources of the official .conv.NN init files).

Semantics pinned: [avgpool] is darknet's GLOBAL average pool
(avgpool_layer.c); [connected] stores biases then (out, in) row-major
weights (parser.c save_connected_weights) and flattens its input in
CHW order; [softmax] groups=1 over the flattened features; [cost] is a
loss marker with no forward effect; classifier preprocess is
resize_min (min side -> net, INTEGER arithmetic) + center crop
(classifier.c predict_classifier).
"""

import io
import json

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.configs.specs import (AvgPool, Connected, Conv, Dropout,
                                    MaxPool, ModelConfig, SoftmaxHead)
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.io import zoo
from yolo_tpu.models import graph

MICRO_CLS = ModelConfig(
    name="micro-cls",
    layers=(Conv(8), MaxPool(2, 2),
            Conv(16), MaxPool(2, 2),
            Conv(32),
            Conv(12, size=1, bn=False, act="linear"),
            AvgPool(),
            Dropout(0.5),
            Connected(6, act="linear"),
            SoftmaxHead()),
    anchors=(), class_names=tuple("abcdef"), input_size=32)

MICRO_CLS_CFG = """
[net]
width=32
height=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

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
stride=1
pad=1
activation=leaky

[convolutional]
filters=12
size=1
stride=1
activation=linear

[avgpool]

[dropout]
probability=0.5

[connected]
output=6
activation=linear

[softmax]
groups=1

[cost]
type=sse
"""


@pytest.mark.quick
class TestClassifierCfg:
    def test_parse(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "cls.cfg"
        p.write_text(MICRO_CLS_CFG)
        got = config_from_cfg(str(p))
        assert got.layers == MICRO_CLS.layers
        assert got.head_kind == "softmax"
        assert got.num_classes == 6
        assert got.anchors == ()

    def test_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "rt.cfg"
        p.write_text(cfg_to_string(MICRO_CLS))
        got = config_from_cfg(str(p))
        assert got.layers == MICRO_CLS.layers
        assert got.head_kind == "softmax"

    def test_connected_spatial_input_pins_features(self, tmp_path):
        """A [connected] over a SPATIAL map (no [avgpool]) is supported
        since the yolov1 family landed: the parser pins the flattened
        CHW feature count (8x8x12 here) and the model carries a fixed
        input size (resizing rejects)."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "spatial.cfg"
        p.write_text(MICRO_CLS_CFG.replace("[avgpool]\n", ""))
        cfg = config_from_cfg(str(p))
        conn = [l for l in cfg.layers if isinstance(l, Connected)][0]
        assert conn.in_features == 8 * 8 * 12
        with pytest.raises(ValueError, match="fixed input size"):
            cfg.with_input_size(64)

    def test_connected_after_spatial_route_pins_features(self, tmp_path):
        """A route back to a spatial map between the avgpool and the
        [connected] sizes the dense input from the ROUTED shape."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "routed.cfg"
        p.write_text(MICRO_CLS_CFG.replace(
            "[connected]\noutput=6",
            "[route]\nlayers=-4\n\n[connected]\noutput=6"))
        cfg = config_from_cfg(str(p))
        conn = [l for l in cfg.layers if isinstance(l, Connected)][0]
        # route -4 reaches the 8x8x32 conv output
        assert conn.in_features == 8 * 8 * 32

    def test_connected_bn_rejected(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad.cfg"
        p.write_text(MICRO_CLS_CFG.replace(
            "[connected]\noutput=6", "[connected]\nbatch_normalize=1\n"
            "output=6"))
        with pytest.raises(ValueError, match="batch_normalize"):
            config_from_cfg(str(p))

    def test_grouped_softmax_rejected(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad.cfg"
        p.write_text(MICRO_CLS_CFG.replace("groups=1", "groups=4"))
        with pytest.raises(ValueError, match="groups"):
            config_from_cfg(str(p))

    def test_softmax_must_be_last(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad.cfg"
        p.write_text(MICRO_CLS_CFG.replace(
            "[softmax]\ngroups=1\n", "[softmax]\ngroups=1\n\n[avgpool]\n"))
        with pytest.raises(ValueError, match="final layer"):
            config_from_cfg(str(p))


@pytest.mark.quick
class TestConnectedWeightsIO:
    def test_round_trip_bytes(self):
        rng = np.random.default_rng(3)
        params = dw.random_params(MICRO_CLS.layers, rng)
        blob = dw.to_bytes(MICRO_CLS.layers, params)
        assert len(blob) == zoo.expected_weights_bytes(MICRO_CLS.layers)
        got, header = dw.load(io.BytesIO(blob), MICRO_CLS.layers)
        for a, b in zip(params, got):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_connected_file_layout(self):
        """Byte-level pin of save_connected_weights order: biases[out]
        then (out, in) row-major weights."""
        layers = (Conv(2, size=1, bn=False, act="linear"), AvgPool(),
                  Connected(3), SoftmaxHead())
        kernel = np.arange(6, dtype=np.float32).reshape(2, 3)  # (in=2, out=3)
        params = [
            {"kernel": np.zeros((1, 1, 3, 2), np.float32),
             "bias": np.zeros(2, np.float32)},
            {"kernel": kernel, "bias": np.array([9., 8., 7.], np.float32)},
        ]
        blob = dw.to_bytes(layers, params)
        floats = np.frombuffer(blob[20:], np.float32)
        conn = floats[2 + 6:]  # skip conv bias(2) + conv kernel(6)
        np.testing.assert_array_equal(conn[:3], [9., 8., 7.])
        # row-major (out, in): out0 row first = kernel[:, 0]
        np.testing.assert_array_equal(conn[3:], kernel.T.reshape(-1))

    def test_truncated_mid_connected_raises(self):
        rng = np.random.default_rng(3)
        params = dw.random_params(MICRO_CLS.layers, rng)
        blob = dw.to_bytes(MICRO_CLS.layers, params)
        with pytest.raises(ValueError, match="connected"):
            dw.load_partial(io.BytesIO(blob[:-8]), MICRO_CLS.layers)


class TestClassifierForward:
    def test_tf_oracle_parity(self):
        from tests.tf_oracle import run_layers

        rng = np.random.default_rng(7)
        params = dw.random_params(MICRO_CLS.layers, rng)
        x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        got = np.asarray(graph.apply_layers(
            MICRO_CLS.layers, graph.params_to_jax(params), x,
            eps=MICRO_CLS.bn_eps))
        want = run_layers(MICRO_CLS.layers, params, x, eps=MICRO_CLS.bn_eps)
        assert got.shape == (2, 6)
        np.testing.assert_allclose(got.sum(axis=-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_make_classifier_and_topk(self):
        from yolo_tpu.models.classify import make_classifier, top_k

        rng = np.random.default_rng(7)
        params = graph.params_to_jax(graph.fold_params(
            MICRO_CLS.layers, dw.random_params(MICRO_CLS.layers, rng),
            MICRO_CLS.bn_eps))
        run = make_classifier(MICRO_CLS)
        probs = np.asarray(run(params, rng.uniform(0, 1, (1, 32, 32, 3))))
        ranked = top_k(probs[0], MICRO_CLS.class_names, k=3)
        assert len(ranked) == 3
        assert ranked[0][1] >= ranked[1][1] >= ranked[2][1]
        assert ranked[0][0] in MICRO_CLS.class_names

    def test_make_classifier_rejects_detector(self):
        from yolo_tpu.configs import get_variant
        from yolo_tpu.models.classify import make_classifier

        with pytest.raises(ValueError, match="not a classifier"):
            make_classifier(get_variant("tiny-voc"))


@pytest.mark.quick
class TestClassifierPreprocess:
    def test_resize_min_center_crop(self):
        from yolo_tpu.models.classify import classifier_preprocess

        img = np.zeros((60, 100, 3), np.uint8)
        img[:, 48:52] = 255  # vertical stripe at the horizontal center
        out = classifier_preprocess(img, 32)
        assert out.shape == (32, 32, 3)
        # min side 60 -> 32: new size (w*32//60=53, 32); center crop
        # keeps the stripe centered
        assert out[:, 15:17].mean() > 0.5
        assert out[:, :4].max() == 0.0

    def test_darknet_integer_resize_arithmetic(self):
        """darknet resize_min uses integer division: 100x60 at net 32
        -> (100*32)//60 = 53 wide, not round(53.33)."""
        from unittest import mock

        from yolo_tpu.models import classify

        img = np.zeros((60, 100, 3), np.uint8)
        with mock.patch("cv2.resize", wraps=__import__("cv2").resize
                        ) as spy:
            classify.classifier_preprocess(img, 32)
        (_, size), kwargs = spy.call_args[0][:2], spy.call_args[1]
        assert size == (53, 32)


class TestClassifierVariants:
    def test_byte_pins(self):
        """Full classifier sizes derive from the already-pinned partial
        byte counts + the 1000-way head (the backbone prefixes are the
        SAME conv lists the detectors fine-tune from)."""
        from yolo_tpu.configs.variants import (DARKNET19, DARKNET19_448,
                                               DARKNET53)

        head_1000 = 4 * (1000 + 1000 * 1024)  # conv1000/connected-1000
        assert zoo.expected_weights_bytes(DARKNET19.layers) == \
            79327124 + head_1000 == 83427124  # darknet19_448.conv.23 pin
        assert zoo.expected_weights_bytes(DARKNET19_448.layers) == 83427124
        assert zoo.expected_weights_bytes(DARKNET53.layers) == \
            162482580 + head_1000 == 166582580  # darknet53.conv.74 pin

    def test_darknet19_backbone_is_yolov2_trunk(self):
        """The first 18 convs of the darknet19 classifier equal
        yolov2's backbone convs — the property that makes `partial`
        extraction feed detector fine-tuning."""
        from yolo_tpu.configs import get_variant
        from yolo_tpu.configs.specs import conv_specs

        d19 = conv_specs(get_variant("darknet19").layers)[:18]
        v2 = conv_specs(get_variant("coco").layers)[:18]
        assert d19 == v2

    def test_darknet53_backbone_is_yolov3_trunk(self):
        from yolo_tpu.configs import get_variant
        from yolo_tpu.configs.specs import conv_specs

        d53 = conv_specs(get_variant("darknet53").layers)[:52]
        v3 = conv_specs(get_variant("yolov3").layers)[:52]
        assert d53 == v3

    def test_classifier_partial_initializes_detector(self, tmp_path):
        """End-to-end classifier->detector transfer on micro models:
        save a classifier's weights, cut the backbone at the darknet
        layer boundary, load_partial into a detector sharing the trunk."""
        rng = np.random.default_rng(5)
        cls_params = dw.random_params(MICRO_CLS.layers, rng)
        wpath = tmp_path / "cls.weights"
        # cut after the 3 shared trunk convs (darknet layer index 5)
        dw.save(str(wpath), MICRO_CLS.layers, cls_params, cutoff_convs=3)

        det = ModelConfig(
            name="micro-det",
            layers=(Conv(8), MaxPool(2, 2),
                    Conv(16), MaxPool(2, 2),
                    Conv(32), MaxPool(2, 2),
                    Conv(64), MaxPool(2, 2), Conv(64), MaxPool(2, 2),
                    Conv(5 * 7, size=1, bn=False, act="linear")),
            anchors=((1., 1.),), class_names=("a", "b"), input_size=32)
        got, header, n = dw.load_partial(str(wpath), det.layers)
        assert n == 3
        for a, b in zip(cls_params[:3], got):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


class TestClassifierCli:
    def _write_model(self, tmp_path):
        from yolo_tpu import cli  # noqa: F401  (import cost up front)

        cfg_path = tmp_path / "cls.cfg"
        cfg_path.write_text(MICRO_CLS_CFG)
        names = tmp_path / "cls.names"
        names.write_text("".join(f"{c}\n" for c in MICRO_CLS.class_names))
        self.names_path = str(names)
        rng = np.random.default_rng(2)
        wpath = tmp_path / "cls.weights"
        dw.save(str(wpath), MICRO_CLS.layers,
                dw.random_params(MICRO_CLS.layers, rng, scale=0.05))
        import cv2

        img = tmp_path / "img.png"
        cv2.imwrite(str(img), rng.integers(0, 255, (48, 64, 3),
                                           dtype=np.uint8))
        return str(cfg_path), str(wpath), str(img)

    def test_classify_e2e(self, tmp_path, capsys):
        from yolo_tpu import cli

        cfg_path, wpath, img = self._write_model(tmp_path)
        cli.main(["classify", "--cfg", cfg_path, "--names",
                  self.names_path, "--weights", wpath,
                  "--image", img, "--top", "3", "--precision", "fp32"])
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 3
        rows = [json.loads(l) for l in lines]
        assert all(set(r) == {"class", "prob"} for r in rows)
        probs = [r["prob"] for r in rows]
        assert probs == sorted(probs, reverse=True)
        assert all(r["class"] in MICRO_CLS.class_names for r in rows)

    def test_detection_commands_reject_classifier(self, tmp_path):
        from yolo_tpu import cli

        cfg_path, wpath, img = self._write_model(tmp_path)
        with pytest.raises(SystemExit, match="classifier"):
            cli.main(["predict", "--cfg", cfg_path, "--weights", wpath,
                      "--image", img])

    def test_classify_rejects_detector(self, tmp_path):
        from yolo_tpu import cli

        with pytest.raises(SystemExit, match="not a classifier"):
            cli.main(["classify", "--model", "tiny-voc",
                      "--weights", "x.weights", "--image", "y.png"])

    def test_classify_int8_e2e(self, tmp_path, capsys):
        """--precision int8 quantizes the convs (the [connected] tail
        stays fp) and still produces a ranked top-k."""
        from yolo_tpu import cli

        cfg_path, wpath, img = self._write_model(tmp_path)
        cli.main(["classify", "--cfg", cfg_path, "--names",
                  self.names_path, "--weights", wpath,
                  "--image", img, "--top", "3", "--precision", "int8"])
        out = capsys.readouterr()
        assert "int8 PTQ: calibrated" in out.err
        rows = [json.loads(l) for l in out.out.strip().splitlines()]
        assert len(rows) == 3
        probs = [r["prob"] for r in rows]
        assert probs == sorted(probs, reverse=True)
        assert all(np.isfinite(p) for p in probs)


def _color_classifier():
    """A hand-crafted, deterministic classifier (KNOWN weights): a 1x1
    channel-identity conv (scaled so softmax saturates) -> global
    avgpool -> softmax classifies a solid-color image as its dominant
    channel. Shared by the semantic gate and the accuracy-eval tests."""
    cfg = ModelConfig(
        name="color-cls",
        layers=(Conv(3, size=1, bn=False, act="linear"),
                AvgPool(), SoftmaxHead()),
        anchors=(), class_names=("red", "green", "blue"), input_size=32)
    params = [{"kernel": (np.eye(3, dtype=np.float32) * 40.0
                          ).reshape(1, 1, 3, 3),
               "bias": np.zeros(3, np.float32)}]
    return cfg, params


def test_handcrafted_color_classifier_is_deterministic():
    """Semantic end-to-end gate through the real preprocess."""
    from yolo_tpu.models.classify import (classifier_preprocess,
                                          make_classifier, top_k)

    cfg, params = _color_classifier()
    run = make_classifier(cfg)
    from yolo_tpu.models import graph as g

    jparams = g.params_to_jax(params)
    for ci, name in enumerate(cfg.class_names):
        img = np.zeros((50, 70, 3), np.uint8)
        img[..., ci] = 220
        x = classifier_preprocess(img, cfg.input_size)
        probs = np.asarray(run(jparams, x[None]))[0]
        ranked = top_k(probs, cfg.class_names, k=1)
        assert ranked[0][0] == name
        assert ranked[0][1] > 0.99


def test_api_load_rejects_classifier(tmp_path):
    import yolo_tpu

    rng = np.random.default_rng(2)
    wpath = tmp_path / "cls.weights"
    dw.save(str(wpath), MICRO_CLS.layers,
            dw.random_params(MICRO_CLS.layers, rng))
    cfg_path = tmp_path / "cls.cfg"
    cfg_path.write_text(MICRO_CLS_CFG)
    with pytest.raises(ValueError, match="classifier"):
        yolo_tpu.load(str(wpath), cfg=str(cfg_path))


class TestClassifyAccuracyEval:
    """classify --images DIR: imagefolder top-1/top-5 accuracy
    (darknet `classifier valid` equivalent), validated with the
    deterministic color classifier (known ground truth)."""

    COLOR_CFG = """
[net]
width=32
height=32

[convolutional]
filters=3
size=1
stride=1
activation=linear

[avgpool]

[softmax]
groups=1
"""

    def _setup(self, tmp_path):
        import cv2

        cfg_path = tmp_path / "color.cfg"
        cfg_path.write_text(self.COLOR_CFG)
        names = tmp_path / "color.names"
        names.write_text("red\ngreen\nblue\n")
        cfg, params = _color_classifier()
        wpath = tmp_path / "color.weights"
        dw.save(str(wpath), cfg.layers, params)

        root = tmp_path / "val"
        for ci, cname in enumerate(cfg.class_names):
            d = root / cname
            d.mkdir(parents=True)
            for j in range(3):
                img = np.zeros((40, 50, 3), np.uint8)
                img[..., ci] = 200 + j
                # cv2 writes BGR; load_image_rgb flips back to RGB
                cv2.imwrite(str(d / f"{j}.png"), img[..., ::-1])
        # one deliberately WRONG sample: a green image filed under red
        img = np.zeros((40, 50, 3), np.uint8)
        img[..., 1] = 210
        cv2.imwrite(str(root / "red" / "wrong.png"), img[..., ::-1])
        return str(cfg_path), str(names), str(wpath), str(root)

    def test_accuracy_counts(self, tmp_path, capsys):
        from yolo_tpu import cli

        cfg_path, names, wpath, root = self._setup(tmp_path)
        cli.main(["classify", "--cfg", cfg_path, "--names", names,
                  "--weights", wpath, "--images", root,
                  "--batch", "4", "--precision", "fp32"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["images"] == 10
        assert out["top1"] == pytest.approx(9 / 10)
        assert out["top5"] == 1.0  # 3 classes: top-5 always hits

    def test_unknown_class_dir_rejected(self, tmp_path):
        from yolo_tpu import cli

        cfg_path, names, wpath, root = self._setup(tmp_path)
        (tmp_path / "val" / "mauve").mkdir()
        with pytest.raises(SystemExit, match="mauve"):
            cli.main(["classify", "--cfg", cfg_path, "--names", names,
                      "--weights", wpath, "--images", root])

    def test_image_and_images_mutually_exclusive(self, tmp_path):
        from yolo_tpu import cli

        cfg_path, names, wpath, root = self._setup(tmp_path)
        with pytest.raises(SystemExit, match="exactly one"):
            cli.main(["classify", "--cfg", cfg_path, "--names", names,
                      "--weights", wpath])
        with pytest.raises(SystemExit, match="exactly one"):
            cli.main(["classify", "--cfg", cfg_path, "--names", names,
                      "--weights", wpath, "--image", "x.png",
                      "--images", root])

    def test_bad_batch_rejected(self, tmp_path):
        from yolo_tpu import cli

        cfg_path, names, wpath, root = self._setup(tmp_path)
        for bad in ("0", "-1"):
            with pytest.raises(SystemExit, match="batch"):
                cli.main(["classify", "--cfg", cfg_path, "--names",
                          names, "--weights", wpath, "--images", root,
                          "--batch", bad])

    def test_top_controls_the_metric(self, tmp_path, capsys):
        """--top k names and sizes the top-k accuracy column (darknet
        classifier valid's topk)."""
        from yolo_tpu import cli

        cfg_path, names, wpath, root = self._setup(tmp_path)
        cli.main(["classify", "--cfg", cfg_path, "--names", names,
                  "--weights", wpath, "--images", root,
                  "--batch", "4", "--top", "1", "--precision", "fp32"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert set(out) == {"images", "top1"}
        assert out["top1"] == pytest.approx(9 / 10)


class TestClassifierTrainSmoke:
    def test_train_step_now_supported(self):
        """Classifier training is a supported path since the softmax-CE
        trainer landed (tests/test_classifier_train.py has the full
        coverage) — one step must run and produce finite CE here."""
        from yolo_tpu.train.loop import TrainConfig, init_state, train_step

        rng = np.random.default_rng(1)
        tcfg = TrainConfig()
        state = init_state(dw.random_params(MICRO_CLS.layers, rng), tcfg)
        batch = {"images": jnp.zeros((2, 32, 32, 3), jnp.float32),
                 "labels": jnp.zeros((2,), jnp.int32)}
        _, metrics = train_step(state, batch, mcfg=MICRO_CLS, tcfg=tcfg)
        assert np.isfinite(float(metrics["loss"]))

    def test_int8_quantizes_convs_keeps_connected_fp(self):
        """Classifier int8: one scale per CONV, the [connected] params
        pass through fp, and the quantized forward tracks fp32."""
        import jax.numpy as jnp

        from yolo_tpu.models import quantize

        rng = np.random.default_rng(1)
        folded = graph.fold_params(
            MICRO_CLS.layers, dw.random_params(MICRO_CLS.layers, rng),
            MICRO_CLS.bn_eps)
        x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        scales, om = quantize.calibrate(MICRO_CLS.layers, folded, x,
                                        return_out_maxes=True)
        assert len(scales) == 4  # 4 convs; connected not counted
        q = quantize.quantize(MICRO_CLS.layers, folded, scales,
                              out_maxes=om)
        assert len(q) == 5
        assert "kernel_q" in q[0] and "kernel_q" not in q[4]
        np.testing.assert_array_equal(q[4]["kernel"],
                                      np.asarray(folded[4]["kernel"]))
        fp = np.asarray(graph.apply_layers(
            MICRO_CLS.layers, graph.params_to_jax(folded), x))
        qp = np.asarray(graph.apply_layers(
            MICRO_CLS.layers, graph.params_to_jax_quant(q), x,
            compute_dtype=jnp.bfloat16))
        assert np.isfinite(qp).all()
        # probabilities: int8 tracks fp32 within a loose budget
        assert np.abs(qp - fp).max() < 0.15

    def test_int8_color_classifier_stays_exact(self, tmp_path, capsys):
        """The deterministic color model's saturated decision survives
        int8 end-to-end: --images accuracy is unchanged."""
        from yolo_tpu import cli

        eval_cls = TestClassifyAccuracyEval()
        cfg_path, names, wpath, root = eval_cls._setup(tmp_path)
        cli.main(["classify", "--cfg", cfg_path, "--names", names,
                  "--weights", wpath, "--images", root,
                  "--batch", "4", "--precision", "int8"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["top1"] == pytest.approx(9 / 10)


def test_api_load_classifier(tmp_path):
    """yolo_tpu.load_classifier: weights + cfg -> callable top-k model
    (the deterministic color classifier gives a known ground truth);
    detectors reject symmetrically."""
    import yolo_tpu
    from yolo_tpu.configs.darknet_cfg import cfg_to_string

    cfg, params = _color_classifier()
    cfg_path = tmp_path / "color.cfg"
    cfg_path.write_text(cfg_to_string(cfg))
    names = tmp_path / "color.names"
    names.write_text("red\ngreen\nblue\n")
    wpath = tmp_path / "color.weights"
    dw.save(str(wpath), cfg.layers, params)
    clf = yolo_tpu.load_classifier(str(wpath), cfg=str(cfg_path),
                                   names=str(names), precision="fp32",
                                   k=2)
    img = np.zeros((40, 60, 3), np.uint8)
    img[..., 1] = 230  # green-dominant
    out = clf([img])
    assert out[0][0][0] == "green"
    assert out[0][0][1] > 0.99

    from yolo_tpu.configs import get_variant
    det = get_variant("tiny-voc")
    dpath = tmp_path / "det.weights"
    dw.save(str(dpath), det.layers,
            dw.random_params(det.layers, np.random.default_rng(0)))
    with pytest.raises(ValueError, match="detector"):
        yolo_tpu.load_classifier(str(dpath), "tiny-voc")
