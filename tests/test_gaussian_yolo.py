"""[Gaussian_yolo] support (Gaussian YOLOv3, AlexeyAB
gaussian_yolo_layer.c — the published Gaussian_yolov3_BDD.cfg/.weights
family): per-anchor channel layout [x y w h sx sy sw sh obj cls...]
(9+C), box math identical to [yolo] (sigmoid xy with scale_x_y, exp wh
on pixel anchors), and detection score = sigmoid(obj) * sigmoid(cls) *
(1 - uc_aver) where uc_aver = mean(sigmoid(sigma_xywh))
(get_gaussian_yolo_detections). Training runs the paper's
per-coordinate Gaussian NLL (arXiv:1904.04620 — the pinned source;
darknet's exact delta file is unverifiable offline), loop-oracle-gated
below.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.configs.specs import Conv, ModelConfig, Route, Upsample, YoloHead
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.ops import numpy_ref as npr
from yolo_tpu.ops.decode import decode_yolo

G_ANCHORS = ((6.0, 8.0), (12.0, 10.0), (24.0, 20.0), (40.0, 36.0))
C = 4  # classes
# micro 2-head Gaussian topology; head convs emit a*(9+C) channels
MICRO_GAUSS = ModelConfig(
    name="micro-gauss",
    layers=(
        Conv(8, stride=2),                                    # 0  /2
        Conv(16, stride=2),                                   # 1  /4
        Conv(32, stride=2),                                   # 2  /8
        Conv(2 * (9 + C), size=1, bn=False, act="linear"),    # 3
        YoloHead((2, 3), gaussian=True),                      # 4 (8x8)
        Route((-3,)),                                         # 5 -> 2
        Conv(8, 1),                                           # 6
        Upsample(2),                                          # 7  /4
        Route((-1, 1)),                                       # 8
        Conv(2 * (9 + C), size=1, bn=False, act="linear"),    # 9
        YoloHead((0, 1), gaussian=True),                      # 10 (16x16)
    ),
    anchors=G_ANCHORS,
    class_names=("a", "b", "dog", "d"),
    input_size=64,
)

GAUSS_CFG = """
[net]
width=64
height=64

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
activation=leaky

[convolutional]
filters=26
size=1
stride=1
activation=linear

[Gaussian_yolo]
mask = 2,3
anchors = 6,8, 12,10, 24,20, 40,36
classes=4
num=4
ignore_thresh = .7

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
filters=26
size=1
stride=1
activation=linear

[Gaussian_yolo]
mask = 0,1
anchors = 6,8, 12,10, 24,20, 40,36
classes=4
num=4
ignore_thresh = .7
"""


@pytest.mark.quick
class TestGaussianDecode:
    def _heads(self, rng):
        return [rng.normal(size=(2, 3, 3, 3 * (9 + C))).astype(np.float32),
                rng.normal(size=(2, 6, 6, 3 * (9 + C))).astype(np.float32)]

    def test_matches_oracle(self):
        rng = np.random.default_rng(7)
        masks = [(3, 4, 5), (0, 1, 2)]
        anchors = ((10, 14), (23, 27), (37, 58), (81, 82), (135, 169),
                   (344, 319))
        heads = self._heads(rng)
        gas = [True, True]
        boxes, scores = decode_yolo(
            [jnp.asarray(h) for h in heads], anchors, masks, C, 96,
            gaussian=gas)
        for b in range(2):
            wb, ws = npr.decode_yolo([h[b] for h in heads], anchors,
                                     masks, C, 96, gaussian=gas)
            np.testing.assert_allclose(np.asarray(boxes[b]), wb,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(scores[b]), ws,
                                       rtol=1e-5, atol=1e-6)

    def test_score_formula_explicit(self):
        """Pin the uc_aver factor at a known activation: all logits 0
        -> sigmoid = 0.5 everywhere, so score = 0.5 (obj) * 0.5 (cls)
        * (1 - 0.5) = 0.125, and boxes sit at cell centers (this case
        is layout-invariant; the interleaving itself is pinned by
        test_interleaved_channel_layout)."""
        t = np.zeros((1, 2, 2, 1 * (9 + 1)), np.float32)
        boxes, scores = decode_yolo(
            [jnp.asarray(t)], ((10.0, 20.0),), [(0,)], 1, 64,
            gaussian=[True])
        np.testing.assert_allclose(np.asarray(scores)[0], 0.125,
                                   rtol=1e-6)
        bx, by, bw, bh = np.asarray(boxes)[0, 0]
        assert np.isclose(bx, 0.25) and np.isclose(by, 0.25)
        assert np.isclose(bw, 10.0 / 64) and np.isclose(bh, 20.0 / 64)

    def test_interleaved_channel_layout(self):
        """Pin the INTERLEAVED per-anchor layout of
        gaussian_yolo_layer.c ([x, ux, y, uy, w, uw, h, uh, obj, cls]):
        get_gaussian_yolo_box reads x/y/w/h at entries 0/2/4/6 and the
        uncertainties at 1/3/5/7 — perturbing one entry at a time must
        move exactly the quantity that entry encodes (an explicit gate
        the jax/numpy cross-check cannot provide, since both could
        share a wrong layout)."""
        def run(entry=None, val=2.0):
            t = np.zeros((1, 1, 1, 10), np.float32)
            if entry is not None:
                t[..., entry] = val
            b, s = decode_yolo([jnp.asarray(t)], ((10.0, 20.0),),
                               [(0,)], 1, 64, gaussian=[True])
            return np.asarray(b)[0, 0], float(np.asarray(s)[0, 0, 0])

        base_box, base_score = run()
        # entry 0 = x mean: only bx moves
        b, s = run(0)
        assert b[0] > base_box[0] and np.allclose(b[1:], base_box[1:])
        # entry 2 = y mean: only by moves
        b, s = run(2)
        assert b[1] > base_box[1]
        assert np.allclose(b[[0, 2, 3]], base_box[[0, 2, 3]])
        # entry 4 = w mean (exp): only bw moves
        b, s = run(4)
        assert b[2] == pytest.approx(np.exp(2.0) * base_box[2])
        assert np.allclose(b[[0, 1, 3]], base_box[[0, 1, 3]])
        # entry 6 = h mean: only bh moves
        b, s = run(6)
        assert b[3] == pytest.approx(np.exp(2.0) * base_box[3])
        # entries 1/3/5/7 = uncertainties: box untouched, score drops
        for e in (1, 3, 5, 7):
            b, s = run(e)
            assert np.allclose(b, base_box), e
            assert s < base_score, e
        # entry 8 = objectness: box untouched, score rises
        b, s = run(8)
        assert np.allclose(b, base_box) and s > base_score

    def test_uncertainty_lowers_score(self):
        """Raising the sigma logits (more uncertainty) must lower the
        detection score, all else equal."""
        t = np.zeros((1, 1, 1, 10), np.float32)
        hi = t.copy()
        hi[..., [1, 3, 5, 7]] = 4.0  # sigmoid ~0.982 -> (1 - uc) ~0.018
        _, s_lo = decode_yolo([jnp.asarray(t)], ((10.0, 20.0),), [(0,)],
                              1, 64, gaussian=[True])
        _, s_hi = decode_yolo([jnp.asarray(hi)], ((10.0, 20.0),), [(0,)],
                              1, 64, gaussian=[True])
        assert float(s_hi[0, 0, 0]) < 0.2 * float(s_lo[0, 0, 0])

    def test_scale_xy_combination_matches_oracle(self):
        """[Gaussian_yolo] with scale_x_y (AlexeyAB's gaussian layer
        supports the grid-sensitivity fix): jax vs the loop oracle."""
        rng = np.random.default_rng(17)
        masks = [(2, 3), (0, 1)]
        heads = [rng.normal(size=(1, 3, 3, 2 * (9 + C))
                            ).astype(np.float32),
                 rng.normal(size=(1, 6, 6, 2 * (9 + C))
                            ).astype(np.float32)]
        scales, gas = [1.1, 1.05], [True, True]
        boxes, scores = decode_yolo(
            [jnp.asarray(h) for h in heads], G_ANCHORS, masks, C, 96,
            scales=scales, gaussian=gas)
        wb, ws = npr.decode_yolo([h[0] for h in heads], G_ANCHORS,
                                 masks, C, 96, scales=scales,
                                 gaussian=gas)
        np.testing.assert_allclose(np.asarray(boxes)[0], wb, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(scores)[0], ws, rtol=1e-5,
                                   atol=1e-6)
        # scale != 1 actually changes the gaussian decode
        b1, _ = decode_yolo([jnp.asarray(h) for h in heads], G_ANCHORS,
                            masks, C, 96, gaussian=gas)
        assert np.abs(np.asarray(boxes) - np.asarray(b1)).max() > 1e-4

    def test_plain_heads_unchanged(self):
        """gaussian=None / all-False reproduces the classic path
        bit-for-bit (flag-plumbing regression gate)."""
        rng = np.random.default_rng(11)
        heads = [jnp.asarray(rng.normal(size=(1, 4, 4, 2 * 9))
                             .astype(np.float32))]
        b0, s0 = decode_yolo(heads, G_ANCHORS, [(0, 1)], C, 64)
        b1, s1 = decode_yolo(heads, G_ANCHORS, [(0, 1)], C, 64,
                             gaussian=[False])
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


@pytest.mark.quick
class TestGaussianCfg:
    def test_parse(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "g.cfg"
        p.write_text(GAUSS_CFG)
        got = config_from_cfg(str(p))
        assert got.layers == MICRO_GAUSS.layers
        assert all(h.gaussian for h in got.yolo_heads)
        assert got.head_kind == "yolo"

    def test_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = tmp_path / "rt.cfg"
        p.write_text(cfg_to_string(MICRO_GAUSS))
        assert config_from_cfg(str(p)).layers == MICRO_GAUSS.layers

    def test_head_conv_channels_validated(self, tmp_path):
        """A [Gaussian_yolo] fed by a 5+C-sized conv (the classic
        [yolo] sizing) must fail with the 9+classes message."""
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad.cfg"
        p.write_text(GAUSS_CFG.replace("filters=26", "filters=18"))
        with pytest.raises(ValueError, match=r"9\+classes"):
            config_from_cfg(str(p))

    def test_new_coords_combination_rejected(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = tmp_path / "bad.cfg"
        p.write_text(GAUSS_CFG.replace(
            "mask = 2,3", "new_coords=1\nmask = 2,3", 1))
        with pytest.raises(ValueError, match="new_coords"):
            config_from_cfg(str(p))


class TestGaussianE2E:
    def test_fused_head_matches_reference_path(self):
        """The fused head's gaussian remap (interleaved means -> the
        shared 5+C view, precomputed conf at slot 4) is box/score
        identical to the reference decode+NMS path at production
        thresholds — the detect_head_yolo exactness envelope."""
        from yolo_tpu.models import graph
        from yolo_tpu.models.predict import detect

        rng = np.random.default_rng(3)
        params = graph.params_to_jax(graph.fold_params(
            MICRO_GAUSS.layers,
            dw.random_params(MICRO_GAUSS.layers, rng, scale=0.05),
            MICRO_GAUSS.bn_eps))
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3))
                        .astype(np.float32))
        a = detect(MICRO_GAUSS, params, x, conf_threshold=0.05,
                   head="fused")
        b = detect(MICRO_GAUSS, params, x, conf_threshold=0.05,
                   head="reference")
        na, nb = np.asarray(a["valid"]).sum(), np.asarray(b["valid"]).sum()
        assert na == nb
        for k in ("boxes", "scores", "classes"):
            va = np.asarray(a[k])[np.asarray(a["valid"]) > 0]
            vb = np.asarray(b[k])[np.asarray(b["valid"]) > 0]
            np.testing.assert_allclose(va, vb, rtol=1e-5, atol=1e-6)

    def test_cli_predict_e2e(self, tmp_path, capsys):
        import cv2

        from yolo_tpu import cli

        p = tmp_path / "g.cfg"
        p.write_text(GAUSS_CFG)
        rng = np.random.default_rng(1)
        wpath = tmp_path / "g.weights"
        dw.save(str(wpath), MICRO_GAUSS.layers,
                dw.random_params(MICRO_GAUSS.layers, rng, scale=0.05))
        img = tmp_path / "img.png"
        cv2.imwrite(str(img), rng.integers(0, 255, (60, 80, 3),
                                           dtype=np.uint8))
        cli.main(["predict", "--cfg", str(p), "--weights", str(wpath),
                  "--image", str(img), "--conf", "0.02",
                  "--precision", "fp32"])
        for line in capsys.readouterr().out.strip().splitlines():
            d = json.loads(line)
            assert set(d) == {"class", "score", "box_xyxy"}


class TestGaussianTraining:
    """[Gaussian_yolo] trains with the paper's per-coordinate NLL
    (arXiv:1904.04620) — pinned by the loop oracle and an overfit run
    (this replaced the former loud rejection)."""

    def _scene(self, rng, b=2):
        from yolo_tpu.data import targets as tgt

        boxes, classes = [], []
        for _ in range(b):
            g = rng.integers(1, 3)
            bx = np.stack([
                rng.uniform(0.2, 0.8, g), rng.uniform(0.2, 0.8, g),
                rng.uniform(0.1, 0.5, g), rng.uniform(0.1, 0.5, g),
            ], axis=-1)
            boxes.append(bx)
            classes.append(rng.integers(0, C, g))
        enc = [tgt.encode_for(MICRO_GAUSS, bx, cl)
               for bx, cl in zip(boxes, classes)]
        return {k: np.stack([e[k] for e in enc]) for k in enc[0]}

    def test_loss_matches_oracle(self):
        from tests.loss_oracle import yolo_loss_np
        from yolo_tpu.train.loss import YoloLossConfig, yolo_loss

        rng = np.random.default_rng(3)
        targets = self._scene(rng)
        heads = [rng.normal(0, 1, (2, s, s, 2 * (9 + C))).astype(
                     np.float32) for s in (8, 16)]
        cfg = YoloLossConfig()
        masks = [h.mask for h in MICRO_GAUSS.yolo_heads]
        want_total, want_parts = yolo_loss_np(
            heads, targets, G_ANCHORS, masks, C, 64, cfg,
            gaussian=[True, True])
        got_total, got_parts = yolo_loss(
            tuple(jnp.asarray(h) for h in heads),
            {k: jnp.asarray(v) for k, v in targets.items()},
            G_ANCHORS, masks, C, 64, cfg, gaussian=[True, True])
        for k in want_parts:
            assert float(got_parts[k]) == pytest.approx(
                want_parts[k], rel=1e-4, abs=1e-6), k
        assert float(got_total) == pytest.approx(want_total, rel=1e-4)

    def test_train_step_overfits_and_sigma_shrinks(self):
        from yolo_tpu.data import targets as tgt
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         make_train_step)

        rng = np.random.default_rng(0)
        params = dw.random_params(MICRO_GAUSS.layers, rng, scale=0.05)
        tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                           weight_decay=0.0)
        state = init_state(params, tcfg)
        step = make_train_step(MICRO_GAUSS, tcfg)
        boxes = [np.array([[0.5, 0.5, 0.4, 0.4]]),
                 np.array([[0.3, 0.6, 0.2, 0.3]])]
        classes = [np.array([2]), np.array([1])]
        enc = [tgt.encode_for(MICRO_GAUSS, b_, c_)
               for b_, c_ in zip(boxes, classes)]
        batch = {k: jnp.asarray(np.stack([e[k] for e in enc]))
                 for k in enc[0]}
        batch["images"] = jnp.asarray(rng.uniform(
            0, 1, (2, 64, 64, 3)).astype(np.float32))

        def mean_sigma(st):
            # assigned-anchor mean sigma on head 0 (consistent targets
            # should drive the predicted uncertainty DOWN)
            from yolo_tpu.models import graph

            outs = graph.apply_layers(
                MICRO_GAUSS.layers, st["params"], batch["images"],
                eps=MICRO_GAUSS.bn_eps)
            t = np.asarray(outs[0]).reshape(2, 8, 8, 2, 9 + C)
            sig = 1 / (1 + np.exp(-t[..., [1, 3, 5, 7]]))
            m = np.asarray(batch["obj_mask_0"]) > 0
            return float(sig[m].mean()) if m.any() else 0.0

        s0 = mean_sigma(state)
        losses = []
        for _ in range(25):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7
        assert mean_sigma(state) < s0


class TestGaussianTrainingMore:
    def test_loss_matches_oracle_with_scale_xy(self):
        """Gaussian NLL under a yolov4-style scale_x_y: the xy means
        pass through the scaled sigmoid exactly as decode does."""
        import numpy as np

        from tests.loss_oracle import yolo_loss_np
        from yolo_tpu.data import targets as tgt
        from yolo_tpu.train.loss import YoloLossConfig, yolo_loss

        rng = np.random.default_rng(9)
        boxes = [np.array([[0.4, 0.6, 0.3, 0.2]])]
        classes = [np.array([1])]
        enc = tgt.encode_for(MICRO_GAUSS, boxes[0], classes[0])
        targets = {k: v[None] for k, v in enc.items()}
        heads = [rng.normal(0, 1, (1, s, s, 2 * (9 + C))).astype(
                     np.float32) for s in (8, 16)]
        cfg = YoloLossConfig()
        masks = [h.mask for h in MICRO_GAUSS.yolo_heads]
        want_total, _ = yolo_loss_np(
            heads, targets, G_ANCHORS, masks, C, 64, cfg,
            scales=[1.05, 1.1], gaussian=[True, True])
        got_total, _ = yolo_loss(
            tuple(jnp.asarray(h) for h in heads),
            {k: jnp.asarray(v) for k, v in targets.items()},
            G_ANCHORS, masks, C, 64, cfg,
            scales=[1.05, 1.1], gaussian=[True, True])
        assert float(got_total) == pytest.approx(want_total, rel=1e-4)

    def test_train_cli_e2e(self, tmp_path, capsys):
        """CLI train on a [Gaussian_yolo] cfg end-to-end (the former
        loud rejection's replacement, through the full trainer)."""
        import numpy as np

        from tests.test_data_eval import make_voc_root
        from yolo_tpu import cli
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        cfg_path = tmp_path / "gauss.cfg"
        cfg_path.write_text(GAUSS_CFG)
        cfg = config_from_cfg(str(cfg_path))
        wpath = str(tmp_path / "g.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        names = tmp_path / "g.names"
        names.write_text("\n".join(cfg.class_names) + "\n")
        root = make_voc_root(tmp_path, n_images=8, size=(64, 64))
        cli.main(["train", "--cfg", str(cfg_path), "--names",
                  str(names), "--weights", wpath, "--voc-root", root,
                  "--split", "train", "--epochs", "1", "--batch", "8",
                  "--lr", "1e-4", "--precision", "fp32"])
