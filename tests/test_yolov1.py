"""YOLOv1 family: [crop]/[local]/[detection] sections, spatial
[connected] layers, the v1 decode, and the weights-IO walk for
locally-connected layers. Semantics pinned to the YOLOv1 paper
(arXiv:1506.02640 §2) and the darknet cfg/weights formats; the flat
[detection] layout and the [local] weight-block order are
format-derived (reference tree absent, SURVEY.md §0) and cross-checked
three ways: vectorized jax vs a loop-level numpy oracle vs a TF
extract_patches derivation with a DIFFERENT patch order."""

import io as _io
import json
import os

import numpy as np
import pytest

from yolo_tpu.configs.darknet_cfg import cfg_to_string, config_from_cfg
from yolo_tpu.configs.specs import (Connected, Crop, DetectionHead,
                                    Local)
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.io import zoo
from yolo_tpu.ops import numpy_ref

V1_CFG = """\
[net]
width=64
height=64
channels=3

[crop]
crop_height=64
crop_width=64

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
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

[local]
filters=8
size=3
stride=1
pad=1
activation=leaky

[dropout]
probability=0.5

[connected]
output=208
activation=linear

[detection]
classes=3
coords=4
side=4
num=2
sqrt=1
rescore=1
"""


def _write_v1(tmp_path):
    p = tmp_path / "v1.cfg"
    p.write_text(V1_CFG)
    return str(p)


@pytest.mark.quick
class TestCfg:
    def test_parse(self, tmp_path):
        cfg = config_from_cfg(_write_v1(tmp_path))
        assert cfg.head_kind == "detection"
        assert cfg.num_classes == 3
        assert isinstance(cfg.layers[0], Crop)
        loc = [l for l in cfg.layers if isinstance(l, Local)][0]
        # 64 -> pools -> 4x4, local input channels 16
        assert (loc.out_h, loc.out_w, loc.in_c) == (4, 4, 16)
        conn = [l for l in cfg.layers if isinstance(l, Connected)][0]
        # spatial dense input: 4*4*8 flattened features pinned
        assert conn.in_features == 4 * 4 * 8
        d = cfg.detection_head
        assert (d.side, d.num, d.classes, d.sqrt) == (4, 2, 3, True)
        # head width contract: 4²*(3 + 2*5) = 208
        assert conn.out == d.side ** 2 * (d.classes + d.num * 5)

    def test_round_trip(self, tmp_path):
        cfg = config_from_cfg(_write_v1(tmp_path))
        text = cfg_to_string(cfg)
        again = tmp_path / "again.cfg"
        again.write_text(text)
        cfg2 = config_from_cfg(str(again), name=cfg.name)
        assert cfg2 == cfg

    def test_head_width_mismatch_rejected(self, tmp_path):
        p = tmp_path / "bad.cfg"
        p.write_text(V1_CFG.replace("output=208", "output=200"))
        with pytest.raises(ValueError, match="200 features.*208"):
            config_from_cfg(str(p))

    def test_resize_rejected(self, tmp_path):
        cfg = config_from_cfg(_write_v1(tmp_path))
        with pytest.raises(ValueError, match="fixed input size"):
            cfg.with_input_size(96)

    def test_detection_must_be_last(self, tmp_path):
        p = tmp_path / "bad.cfg"
        p.write_text(V1_CFG + "\n[avgpool]\n")
        with pytest.raises(ValueError, match="final layer"):
            config_from_cfg(str(p))

    def test_mixing_rejected(self, tmp_path):
        p = tmp_path / "bad.cfg"
        p.write_text(V1_CFG.replace(
            "[detection]",
            "[region]\nanchors=1,1\nclasses=3\nnum=1\n\n[detection]"))
        with pytest.raises(ValueError, match="cannot be mixed"):
            config_from_cfg(str(p))


@pytest.mark.quick
class TestLocalLayer:
    def test_matches_loop_oracle(self):
        import jax.numpy as jnp

        from yolo_tpu.models.graph import _local_layer

        rng = np.random.default_rng(0)
        spec = Local(filters=5, size=3, stride=1, pad=True, act="leaky",
                     out_h=4, out_w=4, in_c=6)
        x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
        p = {"kernel": rng.normal(size=(4, 4, 5, 6, 3, 3)).astype(
                 np.float32),
             "bias": rng.normal(size=(4, 4, 5)).astype(np.float32)}
        got = np.asarray(_local_layer(jnp.asarray(x), p, spec))
        for b in range(2):
            want = numpy_ref.local_forward(
                x[b].astype(np.float64), p["kernel"].astype(np.float64),
                p["bias"].astype(np.float64), stride=1, pad=1)
            np.testing.assert_allclose(got[b], want, rtol=1e-4,
                                       atol=1e-5)

    def test_strided_no_pad(self):
        import jax.numpy as jnp

        from yolo_tpu.models.graph import _local_layer

        rng = np.random.default_rng(1)
        # 6x6 input, k=2 s=2 no pad -> 3x3 output
        spec = Local(filters=4, size=2, stride=2, pad=False,
                     act="linear", out_h=3, out_w=3, in_c=2)
        x = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
        p = {"kernel": rng.normal(size=(3, 3, 4, 2, 2, 2)).astype(
                 np.float32),
             "bias": np.zeros((3, 3, 4), np.float32)}
        got = np.asarray(_local_layer(jnp.asarray(x), p, spec))[0]
        want = numpy_ref.local_forward(
            x[0].astype(np.float64), p["kernel"].astype(np.float64),
            p["bias"].astype(np.float64), stride=2, pad=0, act="linear")
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.quick
class TestDecode:
    def test_matches_oracle(self):
        import jax.numpy as jnp

        from yolo_tpu.ops.decode import decode_detection

        head = DetectionHead(side=4, num=2, classes=3, sqrt=True)
        rng = np.random.default_rng(2)
        flat = rng.normal(size=(2, 4 * 4 * (3 + 2 * 5))).astype(
            np.float32)
        jb, js = decode_detection(jnp.asarray(flat), head)
        assert np.asarray(jb).shape == (2, 32, 4)
        assert np.asarray(js).shape == (2, 32, 3)
        for b in range(2):
            nb, ns = numpy_ref.decode_detection(
                flat[b], side=4, num=2, classes=3, sqrt=True)
            np.testing.assert_allclose(np.asarray(jb)[b], nb,
                                       rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(np.asarray(js)[b], ns,
                                       rtol=1e-4, atol=1e-6)

    def test_sqrt_flag(self):
        import jax.numpy as jnp

        from yolo_tpu.ops.decode import decode_detection

        head = DetectionHead(side=2, num=1, classes=1, sqrt=False)
        flat = np.zeros((1, 2 * 2 * (1 + 1 * 5)), np.float32)
        base = 2 * 2 * (1 + 1)  # classes + conf blocks
        flat[0, base + 2] = 0.5  # first box tw
        jb, _ = decode_detection(jnp.asarray(flat), head)
        assert float(np.asarray(jb)[0, 0, 2]) == pytest.approx(0.5)
        head_sq = DetectionHead(side=2, num=1, classes=1, sqrt=True)
        jb, _ = decode_detection(jnp.asarray(flat), head_sq)
        assert float(np.asarray(jb)[0, 0, 2]) == pytest.approx(0.25)


@pytest.mark.quick
class TestWeightsIO:
    def test_round_trip_and_byte_count(self, tmp_path):
        cfg = config_from_cfg(_write_v1(tmp_path))
        rng = np.random.default_rng(3)
        params = dw.random_params(cfg.layers, rng)
        blob = dw.to_bytes(cfg.layers, params)
        assert len(blob) == zoo.expected_weights_bytes(cfg.layers)
        got, header = dw.load(_io.BytesIO(blob), cfg.layers)
        for a, b in zip(params, got):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_local_block_layout(self):
        """Byte-level pin of the format-derived [local] block: biases
        in CHW (filters, locations) order, then location-major
        (filters, in_c, k, k) filter blocks."""
        layers = (Local(filters=2, size=1, stride=1, pad=False,
                        act="linear", out_h=1, out_w=2, in_c=1),)
        kernel = np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1, 1, 1)
        bias = np.array([[[10., 20.], [30., 40.]]], np.float32)
        blob = dw.to_bytes(layers, [{"kernel": kernel, "bias": bias}])
        floats = np.frombuffer(blob[20:], np.float32)
        # biases: CHW = (filters, loc): f0 at loc0, loc1; then f1
        np.testing.assert_array_equal(floats[:4], [10., 30., 20., 40.])
        # weights: loc-major, (f, c, k, k) inside
        np.testing.assert_array_equal(floats[4:], [0., 1., 2., 3.])

    def test_truncated_mid_local_raises(self, tmp_path):
        cfg = config_from_cfg(_write_v1(tmp_path))
        params = dw.random_params(cfg.layers, np.random.default_rng(0))
        blob = dw.to_bytes(cfg.layers, params)
        # cut INSIDE the local block: header + conv1 (4*8 + 8*3*3*3 =
        # 248 floats) + conv2 (4*16 + 16*8*3*3 = 1216) + 100
        cut = 20 + 4 * (248 + 1216 + 100)
        with pytest.raises(ValueError, match="local"):
            dw.load_partial(_io.BytesIO(blob[:cut]), cfg.layers)


class TestForward:
    def test_tf_oracle_parity(self, tmp_path):
        """Full v1 graph vs the TF oracle — the Local cross-check uses
        extract_patches' DIFFERENT patch order, so agreement pins the
        executor's im2col (c, ky, kx) assumption."""
        from tests.tf_oracle import run_layers
        from yolo_tpu.models import graph

        cfg = config_from_cfg(_write_v1(tmp_path))
        rng = np.random.default_rng(4)
        params = dw.random_params(cfg.layers, rng)
        x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        got = np.asarray(graph.apply_layers(
            cfg.layers, graph.params_to_jax(params), x, eps=cfg.bn_eps))
        want = run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
        np.testing.assert_allclose(got.reshape(2, -1),
                                   np.asarray(want).reshape(2, -1),
                                   rtol=1e-4, atol=1e-5)

    def test_detect_e2e_and_fused_rejected(self, tmp_path):
        from yolo_tpu.models import predict

        cfg = config_from_cfg(_write_v1(tmp_path))
        params = dw.random_params(cfg.layers, np.random.default_rng(0))
        imgs = np.random.default_rng(1).uniform(
            size=(2, 64, 64, 3)).astype(np.float32)
        dets = predict.detect(cfg, params, imgs, conf_threshold=0.05,
                              head="reference")
        cls = np.asarray(dets["classes"])
        valid = np.asarray(dets["valid"]).astype(bool)
        assert ((cls[valid] >= 0) & (cls[valid] < 3)).all()
        with pytest.raises(ValueError, match="fused"):
            predict.detect(cfg, params, imgs, head="fused")

    def test_int8_rejects(self, tmp_path):
        import jax.numpy as jnp

        from yolo_tpu.models import quantize

        cfg = config_from_cfg(_write_v1(tmp_path))
        params = dw.random_params(cfg.layers, np.random.default_rng(0))
        with pytest.raises(NotImplementedError, match="yolov1"):
            quantize.prepare_int8(cfg, params,
                                  jnp.zeros((1, 64, 64, 3)))

    def test_predict_cli_e2e(self, tmp_path, capsys):
        import cv2

        from yolo_tpu import cli

        cfg_path = _write_v1(tmp_path)
        cfg = config_from_cfg(cfg_path)
        wpath = str(tmp_path / "v1.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        img = str(tmp_path / "in.png")
        cv2.imwrite(img, np.random.default_rng(1).integers(
            0, 255, (48, 80, 3), dtype=np.uint8))
        cli.main(["predict", "--cfg", cfg_path, "--weights", wpath,
                  "--image", img, "--precision", "fp32",
                  "--conf", "0.05"])
        for line in capsys.readouterr().out.strip().splitlines():
            if line:
                d = json.loads(line)
                assert d["class"] in ("class0", "class1", "class2")


class TestTraining:
    def _encoded(self, rng, b=2, side=4):
        from yolo_tpu.data import targets as tgt

        boxes, classes = [], []
        for _ in range(b):
            g = rng.integers(1, 4)
            bx = np.stack([
                rng.uniform(0.1, 0.9, g), rng.uniform(0.1, 0.9, g),
                rng.uniform(0.05, 0.4, g), rng.uniform(0.05, 0.4, g),
            ], axis=-1)
            boxes.append(bx)
            classes.append(rng.integers(0, 3, g))
        enc = [tgt.encode_v1(bx, cl, side)
               for bx, cl in zip(boxes, classes)]
        return {k: np.stack([e[k] for e in enc]) for k in enc[0]}

    @pytest.mark.quick
    def test_loss_matches_oracle(self):
        import jax.numpy as jnp

        from tests.loss_oracle import detection_loss_np
        from yolo_tpu.train.loss import detection_loss

        head = DetectionHead(side=4, num=2, classes=3, sqrt=True,
                             rescore=True)
        rng = np.random.default_rng(5)
        targets = self._encoded(rng)
        flat = rng.uniform(0, 1, (2, 4 * 4 * (3 + 2 * 5))).astype(
            np.float32)
        want_total, want_parts = detection_loss_np(flat, targets, head)
        got_total, got_parts = detection_loss(
            jnp.asarray(flat),
            {k: jnp.asarray(v) for k, v in targets.items()}, head)
        for k in want_parts:
            assert float(got_parts[k]) == pytest.approx(
                want_parts[k], rel=1e-4, abs=1e-6), k
        assert float(got_total) == pytest.approx(want_total, rel=1e-4)

    @pytest.mark.quick
    def test_loss_matches_oracle_no_rescore_no_sqrt(self):
        import jax.numpy as jnp

        from tests.loss_oracle import detection_loss_np
        from yolo_tpu.train.loss import detection_loss

        head = DetectionHead(side=3, num=3, classes=2, sqrt=False,
                             rescore=False, coord_scale=5.0,
                             noobject_scale=0.5)
        rng = np.random.default_rng(6)
        from yolo_tpu.data import targets as tgt

        boxes = [np.array([[0.5, 0.5, 0.4, 0.3]])]
        classes = [np.array([1])]
        enc = tgt.encode_v1(boxes[0], classes[0], 3)
        targets = {k: v[None] for k, v in enc.items()}
        flat = rng.uniform(0, 1, (1, 3 * 3 * (2 + 3 * 5))).astype(
            np.float32)
        want_total, _ = detection_loss_np(flat, targets, head)
        got_total, _ = detection_loss(
            jnp.asarray(flat),
            {k: jnp.asarray(v) for k, v in targets.items()}, head)
        assert float(got_total) == pytest.approx(want_total, rel=1e-4)

    @pytest.mark.quick
    def test_zero_iou_rmse_fallback(self):
        """darknet detection_layer.c: when every predictor's IoU vs
        the truth is 0 (sqrt=1 early training: pred w=h~0) the
        responsible box is the min-RMSE one, not argmax-over-zeros
        (code-review finding: predictor 0 used to monopolize all
        object gradients in that regime)."""
        import jax.numpy as jnp

        from tests.loss_oracle import detection_loss_np
        from yolo_tpu.train.loss import detection_loss
        from yolo_tpu.data import targets as tgt

        head = DetectionHead(side=2, num=2, classes=2, sqrt=True,
                             rescore=True)
        enc = tgt.encode_v1(np.array([[0.3, 0.3, 0.2, 0.2]]),
                            np.array([0]), 2)
        targets = {k: v[None] for k, v in enc.items()}
        flat = np.zeros((1, 2 * 2 * (2 + 2 * 5)), np.float32)
        boxes = flat[:, 2 * 2 * (2 + 2):].reshape(1, 4, 2, 4)
        # cell (0,0) holds the truth; both predictors have w=h=0
        # (zero IoU); predictor 1 sits ON the truth center, predictor
        # 0 far away — responsibility must go to 1 by RMSE
        boxes[0, 0, 0] = [0.9, 0.9, 0.0, 0.0]
        boxes[0, 0, 1] = [0.6, 0.6, 0.0, 0.0]   # (0.6+0)/2 = 0.3 ✓
        want_total, want_parts = detection_loss_np(flat, targets, head)
        got_total, got_parts = detection_loss(
            jnp.asarray(flat),
            {k: jnp.asarray(v) for k, v in targets.items()}, head)
        for k in want_parts:
            assert float(got_parts[k]) == pytest.approx(
                want_parts[k], rel=1e-4, abs=1e-6), k
        # and the coord term is predictor 1's distance, not 0's:
        # xr = 0.3*2 - 0 = 0.6 -> (0.6-0.6)^2 + ... + sqrt-wh targets
        sw = np.sqrt(0.2)
        expect_coord = head.coord_scale * (0.0 + 0.0 + sw ** 2 + sw ** 2)
        assert float(got_parts["coord"]) == pytest.approx(
            expect_coord, rel=1e-4)

    def test_train_step_overfits(self, tmp_path):
        import jax.numpy as jnp

        from yolo_tpu.data import targets as tgt
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         make_train_step)

        cfg = config_from_cfg(_write_v1(tmp_path))
        rng = np.random.default_rng(0)
        params = dw.random_params(cfg.layers, rng, scale=0.05)
        tcfg = TrainConfig(learning_rate=1e-3, optimizer="adam",
                           weight_decay=0.0)
        state = init_state(params, tcfg)
        step = make_train_step(cfg, tcfg)
        boxes = [np.array([[0.5, 0.5, 0.5, 0.5]]),
                 np.array([[0.3, 0.3, 0.2, 0.2]])]
        classes = [np.array([1]), np.array([2])]
        enc = [tgt.encode_for(cfg, b, c) for b, c in zip(boxes, classes)]
        batch = {k: jnp.asarray(np.stack([e[k] for e in enc]))
                 for k in enc[0]}
        batch["images"] = jnp.asarray(rng.uniform(
            0, 1, (2, 64, 64, 3)).astype(np.float32))
        losses = []
        for _ in range(20):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5

    @pytest.mark.quick
    def test_encoder_first_object_wins(self):
        from yolo_tpu.data import targets as tgt

        boxes = np.array([[0.5, 0.5, 0.2, 0.2], [0.52, 0.52, 0.3, 0.3],
                          [0.1, 0.1, 0.1, 0.1]])
        classes = np.array([0, 1, 2])
        enc = tgt.encode_v1(boxes, classes, 4)
        assert enc["v1_obj"].sum() == 2  # two cells occupied
        i = 2 * 4 + 2  # cell of (0.5, 0.5) on a 4-grid
        assert enc["v1_cls"][i] == 0     # FIRST box kept
        np.testing.assert_allclose(enc["v1_box"][i], [0.5, 0.5, 0.2, 0.2])


class TestCliTrain:
    def test_train_cli_e2e_and_multiscale_rejected(self, tmp_path,
                                                   capsys):
        from tests.test_data_eval import make_voc_root
        from yolo_tpu import cli

        cfg_path = _write_v1(tmp_path)
        cfg = config_from_cfg(cfg_path)
        wpath = str(tmp_path / "v1.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        names = tmp_path / "v1.names"
        names.write_text("cat\ndog\nbird\n")
        root = make_voc_root(tmp_path, n_images=8, size=(64, 64))
        cli.main(["train", "--cfg", cfg_path, "--names", str(names),
                  "--weights", wpath, "--voc-root", root,
                  "--split", "train", "--epochs", "1", "--batch", "8",
                  "--lr", "1e-4", "--precision", "fp32",
                  "--eval-every", "1", "--eval-max-images", "4"])
        with pytest.raises(SystemExit, match="FIXED input size"):
            cli.main(["train", "--cfg", cfg_path, "--names", str(names),
                      "--weights", wpath, "--voc-root", root,
                      "--split", "train", "--multi-scale",
                      "--epochs", "1", "--batch", "8"])


class TestEvalCli:
    def test_eval_v1_runs(self, tmp_path, capsys):
        """eval on a v1 model over a synthetic VOC split: the full
        collect->score pipeline runs on the [detection] decode path and
        emits the mAP JSON shape."""
        import cv2

        from tests.test_data_eval import _write_xml
        from yolo_tpu import cli

        cfg_path = _write_v1(tmp_path)
        cfg = config_from_cfg(cfg_path)
        wpath = str(tmp_path / "w.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        names = tmp_path / "v1.names"
        names.write_text("cat\ndog\nbird\n")
        root = tmp_path / "VOC"
        for d in ("Annotations", "JPEGImages", "ImageSets/Main"):
            (root / d).mkdir(parents=True)
        rng = np.random.default_rng(1)
        ids = []
        for i, cls in enumerate(("cat", "dog")):
            name = f"{i:06d}"
            ids.append(name)
            cv2.imwrite(str(root / "JPEGImages" / f"{name}.jpg"),
                        rng.integers(0, 255, (60, 80, 3), np.uint8))
            _write_xml(root / "Annotations" / f"{name}.xml",
                       [(cls, 0, 10, 10, 50, 40)], w=80, h=60)
        (root / "ImageSets/Main/test.txt").write_text("\n".join(ids))
        cli.main(["eval", "--cfg", cfg_path, "--names", str(names),
                  "--weights", wpath, "--voc-root", str(root),
                  "--split", "test", "--precision", "fp32",
                  "--batch", "2"])
        out = json.loads(capsys.readouterr().out.strip())
        assert set(out) == {"map", "ap"}


class TestCropLayer:
    """darknet crop_layer.c semantics (configs.specs.Crop docstring):
    output = input*2 - 1 unless noadjust (both modes); test mode
    center-crops, train mode draws one (dy, dx, flip) per batch."""

    # (graph imported lazily so collection stays light)

    def _x(self, seed=0):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3))
                           .astype(np.float32))

    @pytest.mark.quick
    def test_test_mode_center_crop_and_scale(self):
        from yolo_tpu.models import graph

        x = self._x()
        y = np.asarray(graph.apply_layers((Crop(4, 4),), [], x))
        np.testing.assert_allclose(
            y, np.asarray(x)[:, 2:6, 2:6, :] * 2.0 - 1.0, rtol=1e-6)
        y2 = np.asarray(graph.apply_layers(
            (Crop(4, 4, noadjust=True),), [], x))
        np.testing.assert_allclose(y2, np.asarray(x)[:, 2:6, 2:6, :],
                                   rtol=1e-6)

    @pytest.mark.quick
    def test_train_jitter_per_batch_window(self):
        import jax

        from yolo_tpu.models import graph

        x = self._x(1)
        layers = (Crop(4, 4, flip=True),)
        key = jax.random.PRNGKey(3)
        y1, _ = graph.apply_layers(layers, [], x, train=True,
                                   dropout_rng=key)
        y2, _ = graph.apply_layers(layers, [], x, train=True,
                                   dropout_rng=key)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        # the output must be SOME (possibly flipped) 4x4 window *2-1,
        # the same window for every image in the batch
        xn = np.asarray(x)
        got = np.asarray(y1)
        candidates = []
        for dy in range(5):
            for dx in range(5):
                win = xn[:, dy:dy + 4, dx:dx + 4, :]
                candidates += [win, win[:, :, ::-1]]
        assert any(np.allclose(got, c * 2.0 - 1.0, rtol=1e-5)
                   for c in candidates)
        # different step keys move the window eventually
        outs = {np.asarray(graph.apply_layers(
            layers, [], x, train=True,
            dropout_rng=jax.random.PRNGKey(s))[0]).tobytes()
            for s in range(6)}
        assert len(outs) > 1

    @pytest.mark.quick
    def test_train_without_rng_falls_back_to_center(self):
        from yolo_tpu.models import graph

        x = self._x(2)
        y, _ = graph.apply_layers((Crop(4, 4),), [], x, train=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x)[:, 2:6, 2:6, :] * 2.0 - 1.0,
            rtol=1e-6)

    @pytest.mark.quick
    def test_cfg_flip_noadjust_roundtrip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        text = V1_CFG.replace("crop_width=64\n",
                              "crop_width=64\nflip=1\nnoadjust=1\n")
        p = tmp_path / "c.cfg"
        p.write_text(text)
        cfg = config_from_cfg(str(p))
        crop = cfg.layers[0]
        assert crop.flip and crop.noadjust
        p2 = tmp_path / "rt.cfg"
        p2.write_text(cfg_to_string(cfg))
        crop2 = config_from_cfg(str(p2)).layers[0]
        assert crop2 == crop
