"""Classifier (softmax-head) training: softmax cross-entropy loss
(darknet softmax_x_ent semantics) against a loop-level numpy oracle,
the jitted train step, the hierarchical (tree) CE, and the full CLI
workflow train -> export -> classify-accuracy."""

import json
import os

import numpy as np
import pytest

from yolo_tpu.configs.darknet_cfg import config_from_cfg

CLS_CFG = """\
[net]
width=32
height=32
channels=3
learning_rate=0.02
momentum=0.9
decay=0.0

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[avgpool]

[convolutional]
filters=3
size=1
activation=linear

[softmax]
groups=1

[cost]
type=sse
"""


def _write_cls_cfg(tmp_path, text=CLS_CFG):
    p = tmp_path / "cls.cfg"
    p.write_text(text)
    names = tmp_path / "cls.names"
    names.write_text("red\ngreen\nblue\n")
    return str(p), str(names)


def _color_batch(rng, n=12):
    """Solid-color images labeled by dominant channel."""
    labels = rng.integers(0, 3, n)
    imgs = np.zeros((n, 32, 32, 3), np.float32)
    for i, c in enumerate(labels):
        imgs[i, :, :, c] = rng.uniform(0.6, 1.0)
        imgs[i, :, :, (c + 1) % 3] = rng.uniform(0.0, 0.3)
    return imgs, labels.astype(np.int32)


class TestLoss:
    @pytest.mark.quick
    def test_matches_loop_oracle(self):
        import jax.numpy as jnp

        from yolo_tpu.train.loss import classifier_loss

        rng = np.random.default_rng(0)
        logits = rng.normal(0, 2, (6, 5)).astype(np.float32)
        labels = rng.integers(0, 5, 6).astype(np.int32)
        total, parts = classifier_loss(jnp.asarray(logits),
                                       jnp.asarray(labels))
        want = 0.0
        for b in range(6):
            z = logits[b] - logits[b].max()
            p = np.exp(z) / np.exp(z).sum()
            want += -np.log(p[labels[b]])
        want /= 6
        assert float(total) == pytest.approx(want, rel=1e-5)
        acc = np.mean(np.argmax(logits, -1) == labels)
        assert float(parts["top1"]) == pytest.approx(acc)

    @pytest.mark.quick
    def test_gradient_is_softmax_minus_onehot(self):
        """darknet softmax_x_ent backward: delta = truth - p on the
        logits; our CE gradient must be (p - onehot)/B exactly."""
        import jax
        import jax.numpy as jnp

        from yolo_tpu.train.loss import classifier_loss

        rng = np.random.default_rng(1)
        logits = rng.normal(0, 1, (4, 3)).astype(np.float32)
        labels = np.array([0, 2, 1, 1], np.int32)
        g = jax.grad(lambda l: classifier_loss(l, jnp.asarray(labels))[0]
                     )(jnp.asarray(logits))
        z = logits - logits.max(-1, keepdims=True)
        p = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
        onehot = np.eye(3)[labels]
        np.testing.assert_allclose(np.asarray(g), (p - onehot) / 4,
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.quick
    def test_tree_ce_matches_oracle_and_masks_offpath(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from tests.test_tree import TREE_TEXT
        from yolo_tpu.configs.tree import parse_tree
        from yolo_tpu.ops.numpy_ref import tree_softmax
        from yolo_tpu.train.loss import classifier_loss

        (tmp_path / "t.tree").write_text(TREE_TEXT)
        tree = parse_tree(str(tmp_path / "t.tree"))
        rng = np.random.default_rng(2)
        logits = rng.normal(0, 2, (5, 8)).astype(np.float32)
        labels = np.array([7, 4, 3, 1, 5], np.int32)  # leaves AND inner
        total, parts = classifier_loss(jnp.asarray(logits),
                                       jnp.asarray(labels), tree=tree)
        want = 0.0
        for b in range(5):
            cond = tree_softmax(logits[b].astype(np.float64), tree)
            node = int(labels[b])
            while node >= 0:
                want += -np.log(cond[node])
                node = tree.parents[node]
        want /= 5
        assert float(total) == pytest.approx(want, rel=1e-5)
        # gradient w.r.t. groups off every label's path is zero:
        # label 4 (cat) -> path 0,1,4; car/truck group untouched
        g = jax.grad(
            lambda l: classifier_loss(l, jnp.asarray([4]), tree=tree)[0]
        )(jnp.asarray(logits[:1]))
        assert float(jnp.abs(g[0, 5])) == 0.0
        assert float(jnp.abs(g[0, 6])) == 0.0


class TestTrainStep:
    def test_overfit_colors(self, tmp_path):
        import jax.numpy as jnp

        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         make_train_step)

        cfg_path, names = _write_cls_cfg(tmp_path)
        cfg = config_from_cfg(cfg_path, names_path=names)
        rng = np.random.default_rng(0)
        params = dw.random_params(cfg.layers, rng, scale=0.05)
        tcfg = TrainConfig(learning_rate=0.05, optimizer="adam",
                           weight_decay=0.0)
        state = init_state(params, tcfg)
        step = make_train_step(cfg, tcfg)
        imgs, labels = _color_batch(rng)
        batch = {"images": jnp.asarray(imgs),
                 "labels": jnp.asarray(labels)}
        hist = []
        for _ in range(25):
            state, m = step(state, batch)
            hist.append((float(m["loss"]), float(m["top1"])))
        assert hist[-1][0] < hist[0][0] * 0.5
        assert hist[-1][1] == 1.0
        assert int(state["seen"]) == 25 * 12

    def test_dropout_semantics(self, tmp_path):
        """Inverted dropout: identity at inference; under training
        ~prob of activations zeroed and survivors scaled 1/(1-prob),
        deterministic per key, fresh masks per key."""
        import jax
        import jax.numpy as jnp

        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.models import graph

        text = CLS_CFG.replace("[avgpool]",
                               "[dropout]\nprobability=.5\n\n[avgpool]")
        cfg_path, names = _write_cls_cfg(tmp_path, text)
        cfg = config_from_cfg(cfg_path, names_path=names)
        params = graph.params_to_jax(
            dw.random_params(cfg.layers, np.random.default_rng(0)))
        x = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (2, 32, 32, 3)).astype(np.float32))
        # inference: no key, no drop — twice identical
        a = graph.apply_layers(cfg.layers, params, x, eps=cfg.bn_eps)
        b = graph.apply_layers(cfg.layers, params, x, eps=cfg.bn_eps)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # training: drop on the pre-avgpool feature map. Fetch it via
        # return_all with and without the key
        k1 = jax.random.PRNGKey(7)
        full_plain = graph.apply_layers(
            cfg.layers, params, x, eps=cfg.bn_eps, train=True,
            return_all=True)
        full_drop = graph.apply_layers(
            cfg.layers, params, x, eps=cfg.bn_eps, train=True,
            return_all=True, dropout_rng=k1)
        pre, post = np.asarray(full_plain[1]), np.asarray(full_drop[1])
        zero_frac = (post == 0).mean()
        assert 0.35 < zero_frac < 0.65
        nz = post != 0
        np.testing.assert_allclose(post[nz], pre[nz] * 2.0, rtol=1e-5)
        # deterministic per key; different key -> different mask
        again = graph.apply_layers(
            cfg.layers, params, x, eps=cfg.bn_eps, train=True,
            return_all=True, dropout_rng=k1)
        np.testing.assert_array_equal(post, np.asarray(again[1]))
        other = graph.apply_layers(
            cfg.layers, params, x, eps=cfg.bn_eps, train=True,
            return_all=True, dropout_rng=jax.random.PRNGKey(8))
        assert ((post == 0) != (np.asarray(other[1]) == 0)).any()

    def test_dropout_cfg_trains(self, tmp_path):
        import jax.numpy as jnp

        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         make_train_step)

        text = CLS_CFG.replace("[avgpool]",
                               "[dropout]\nprobability=.3\n\n[avgpool]")
        cfg_path, names = _write_cls_cfg(tmp_path, text)
        cfg = config_from_cfg(cfg_path, names_path=names)
        params = dw.random_params(cfg.layers, np.random.default_rng(0),
                                  scale=0.05)
        tcfg = TrainConfig(learning_rate=0.05, optimizer="adam",
                           weight_decay=0.0)
        state = init_state(params, tcfg)
        step = make_train_step(cfg, tcfg)
        rng = np.random.default_rng(1)
        imgs, labels = _color_batch(rng)
        batch = {"images": jnp.asarray(imgs),
                 "labels": jnp.asarray(labels)}
        losses = []
        for _ in range(25):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7

    def test_tree_classifier_trains(self, tmp_path):
        import jax.numpy as jnp

        from tests.test_tree import TREE_TEXT
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         make_train_step)

        (tmp_path / "micro.tree").write_text(TREE_TEXT)
        text = CLS_CFG.replace("filters=3\nsize=1",
                               "filters=8\nsize=1").replace(
            "[softmax]\ngroups=1", "[softmax]\ngroups=1\ntree=micro.tree")
        p = tmp_path / "cls9k.cfg"
        p.write_text(text)
        cfg = config_from_cfg(str(p))
        params = dw.random_params(cfg.layers, np.random.default_rng(0),
                                  scale=0.05)
        tcfg = TrainConfig(learning_rate=0.05, optimizer="adam",
                           weight_decay=0.0)
        state = init_state(params, tcfg)
        step = make_train_step(cfg, tcfg)
        rng = np.random.default_rng(3)
        imgs, _ = _color_batch(rng, 8)
        # labels include an INTERNAL node (3 = dog) — paper: labels at
        # any tree level train the path above them
        labels = np.array([7, 4, 3, 5, 6, 7, 4, 3], np.int32)
        batch = {"images": jnp.asarray(imgs),
                 "labels": jnp.asarray(labels)}
        losses = []
        for _ in range(20):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7


class TestImagefolder:
    @pytest.mark.quick
    def test_batches_wrap_and_shuffle(self, tmp_path):
        import cv2

        from yolo_tpu.data.imagefolder import (classifier_train_batches,
                                               list_imagefolder)

        rng = np.random.default_rng(0)
        for cls in ("red", "green"):
            os.makedirs(tmp_path / "data" / cls)
        for i in range(5):
            cv2.imwrite(str(tmp_path / "data" / "red" / f"{i}.png"),
                        rng.integers(0, 255, (16, 16, 3), np.uint8))
        cv2.imwrite(str(tmp_path / "data" / "green" / "0.png"),
                    rng.integers(0, 255, (16, 16, 3), np.uint8))
        samples = list_imagefolder(str(tmp_path / "data"),
                                   ("red", "green"))
        assert len(samples) == 6
        batches = list(classifier_train_batches(
            samples, 4, 32, epochs=2, seed=0))
        # 6 samples / batch 4 -> 2 batches per epoch (last wraps)
        assert len(batches) == 4
        for b in batches:
            assert b["images"].shape == (4, 32, 32, 3)
            assert b["labels"].shape == (4,)

    @pytest.mark.quick
    def test_unknown_class_dir_rejected(self, tmp_path):
        from yolo_tpu.data.imagefolder import list_imagefolder

        os.makedirs(tmp_path / "data" / "typo")
        with pytest.raises(ValueError, match="typo"):
            list_imagefolder(str(tmp_path / "data"), ("red",))


class TestCli:
    def test_train_export_classify_loop(self, tmp_path, capsys):
        """The full in-framework pretrain workflow: train a classifier
        from scratch on a color imagefolder, export the checkpoint to
        darknet .weights, and verify classify --images accuracy."""
        import cv2

        from yolo_tpu import cli

        cfg_path, names = _write_cls_cfg(tmp_path)
        rng = np.random.default_rng(0)
        data = tmp_path / "data"
        for ci, cls in enumerate(("red", "green", "blue")):
            os.makedirs(data / cls)
            for i in range(6):
                img = np.zeros((32, 32, 3), np.uint8)
                img[:, :, 2 - ci] = rng.integers(160, 255)  # BGR write
                cv2.imwrite(str(data / cls / f"{i}.png"), img)
        ckdir = str(tmp_path / "ck")
        cli.main(["train", "--cfg", cfg_path, "--names", names,
                  "--imagefolder", str(data), "--epochs", "12",
                  "--batch", "8", "--lr", "0.05", "--optimizer", "adam",
                  "--precision", "fp32", "--seed", "0",
                  "--checkpoint-dir", ckdir])
        capsys.readouterr()
        wpath = str(tmp_path / "trained.weights")
        cli.main(["export", "--cfg", cfg_path, "--names", names,
                  "--checkpoint", os.path.join(ckdir, "final"),
                  "--output", wpath])
        capsys.readouterr()
        cli.main(["classify", "--cfg", cfg_path, "--names", names,
                  "--weights", wpath, "--images", str(data),
                  "--precision", "fp32", "--batch", "8"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["images"] == 18
        assert out["top1"] >= 0.9

    def test_detector_rejects_imagefolder_and_classifier_rejects_voc(
            self, tmp_path):
        from yolo_tpu import cli

        with pytest.raises(SystemExit, match="imagefolder"):
            cli.main(["train", "--model", "tiny-voc", "--weights",
                      "w.weights", "--imagefolder", str(tmp_path)])
        cfg_path, names = _write_cls_cfg(tmp_path)
        with pytest.raises(SystemExit, match="imagefolder"):
            cli.main(["train", "--cfg", cfg_path, "--names", names,
                      "--voc-root", str(tmp_path)])

    def test_detector_still_requires_weights(self):
        from yolo_tpu import cli

        with pytest.raises(SystemExit, match="--weights is required"):
            cli.main(["train", "--model", "tiny-voc",
                      "--voc-root", "/nonexistent"])


class TestEvalDuringTrain:
    def test_eval_every_logs_and_saves_best(self, tmp_path, capsys):
        import cv2

        from yolo_tpu import cli

        cfg_path, names = _write_cls_cfg(tmp_path)
        rng = np.random.default_rng(0)
        data = tmp_path / "data"
        for ci, cls in enumerate(("red", "green", "blue")):
            os.makedirs(data / cls)
            for i in range(4):
                img = np.zeros((32, 32, 3), np.uint8)
                img[:, :, 2 - ci] = rng.integers(160, 255)
                cv2.imwrite(str(data / cls / f"{i}.png"), img)
        ckdir = str(tmp_path / "ck")
        cli.main(["train", "--cfg", cfg_path, "--names", names,
                  "--imagefolder", str(data), "--epochs", "8",
                  "--batch", "8", "--lr", "0.05", "--optimizer", "adam",
                  "--precision", "fp32", "--seed", "0",
                  "--checkpoint-dir", ckdir, "--eval-every", "4"])
        err = capsys.readouterr().err
        assert "validation top-1" in err
        assert os.path.isdir(os.path.join(ckdir, "best"))

    def test_detector_rejects_eval_imagefolder(self):
        from yolo_tpu import cli

        with pytest.raises(SystemExit, match="imagefolder"):
            cli.main(["train", "--model", "tiny-voc", "--weights",
                      "w.weights", "--eval-imagefolder", "/x"])


class TestTemperature:
    @pytest.mark.quick
    def test_forward_and_round_trip(self, tmp_path):
        """[softmax] temperature=T: probs == softmax(logits/T), key
        survives cfg round-trip, T<=0 rejected."""
        import jax.numpy as jnp

        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.models import graph

        text = CLS_CFG.replace("[softmax]\ngroups=1",
                               "[softmax]\ngroups=1\ntemperature=3")
        cfg_path, names = _write_cls_cfg(tmp_path, text)
        cfg = config_from_cfg(cfg_path, names_path=names)
        assert cfg.layers[-1].temperature == 3.0
        assert "temperature=3" in cfg_to_string(cfg)
        params = graph.params_to_jax(
            dw.random_params(cfg.layers, np.random.default_rng(0)))
        x = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (2, 32, 32, 3)).astype(np.float32))
        probs = np.asarray(graph.apply_layers(
            cfg.layers, params, x, eps=cfg.bn_eps))
        logits = np.asarray(graph.apply_layers(
            cfg.layers, params, x, eps=cfg.bn_eps, softmax_logits=True))
        z = logits / 3.0
        z = z - z.max(-1, keepdims=True)
        want = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
        np.testing.assert_allclose(probs, want, rtol=1e-5, atol=1e-7)

        bad = text.replace("temperature=3", "temperature=0")
        (tmp_path / "cls.cfg").write_text(bad)
        with pytest.raises(ValueError, match="temperature"):
            config_from_cfg(cfg_path, names_path=names)

    @pytest.mark.quick
    def test_training_gradient_is_darknet_delta_no_1_over_T(self):
        """darknet backward_softmax_layer passes the softmax_x_ent
        delta (truth - p) straight to the input with NO temperature
        chain factor: gradient must be (p - onehot)/B with p computed
        at l/T — not (p - onehot)/(B*T) (code-review finding: the
        plain-scaling version trained the head at 1/T the reference's
        effective LR)."""
        import jax
        import jax.numpy as jnp

        from yolo_tpu.train.loss import classifier_loss

        rng = np.random.default_rng(2)
        logits = rng.normal(0, 1, (3, 4)).astype(np.float32)
        labels = np.array([0, 2, 1], np.int32)
        g = jax.grad(lambda l: classifier_loss(
            l, jnp.asarray(labels), temperature=2.0)[0]
        )(jnp.asarray(logits))
        z = logits / 2.0
        z = z - z.max(-1, keepdims=True)
        p = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
        onehot = np.eye(4)[labels]
        np.testing.assert_allclose(np.asarray(g), (p - onehot) / 3,
                                   rtol=1e-5, atol=1e-7)


class TestResumeDataPosition:
    @pytest.mark.quick
    def test_start_step_resumes_exact_stream(self, tmp_path):
        import cv2

        from yolo_tpu.data.imagefolder import (classifier_train_batches,
                                               list_imagefolder)

        rng = np.random.default_rng(0)
        for cls in ("red", "green"):
            os.makedirs(tmp_path / "d" / cls)
        for i in range(5):
            cv2.imwrite(str(tmp_path / "d" / "red" / f"{i}.png"),
                        rng.integers(0, 255, (16, 16, 3), np.uint8))
        for i in range(2):
            cv2.imwrite(str(tmp_path / "d" / "green" / f"{i}.png"),
                        rng.integers(0, 255, (16, 16, 3), np.uint8))
        samples = list_imagefolder(str(tmp_path / "d"),
                                   ("red", "green"))
        full = list(classifier_train_batches(samples, 4, 32, epochs=3,
                                             seed=7))
        assert len(full) == 6  # ceil(7/4)=2 per epoch * 3
        for k in (1, 3, 5):
            tail = list(classifier_train_batches(
                samples, 4, 32, epochs=3, seed=7, start_step=k))
            assert len(tail) == len(full) - k
            for a, b in zip(full[k:], tail):
                np.testing.assert_array_equal(a["labels"], b["labels"])
                np.testing.assert_array_equal(a["images"], b["images"])

    def test_cli_fail_then_resume(self, tmp_path, capsys):
        import cv2

        from yolo_tpu import cli

        cfg_path, names = _write_cls_cfg(tmp_path)
        rng = np.random.default_rng(0)
        data = tmp_path / "data"
        for ci, cls in enumerate(("red", "green", "blue")):
            os.makedirs(data / cls)
            for i in range(4):
                img = np.zeros((32, 32, 3), np.uint8)
                img[:, :, 2 - ci] = rng.integers(160, 255)
                cv2.imwrite(str(data / cls / f"{i}.png"), img)
        ckdir = str(tmp_path / "ck")
        common = ["train", "--cfg", cfg_path, "--names", names,
                  "--imagefolder", str(data), "--batch", "8",
                  "--lr", "0.05", "--optimizer", "adam",
                  "--precision", "fp32", "--seed", "0",
                  "--checkpoint-dir", ckdir, "--checkpoint-every", "2"]
        with pytest.raises(SystemExit, match="fail-after-step"):
            cli.main(common + ["--epochs", "4", "--fail-after-step", "2"])
        capsys.readouterr()
        cli.main(common + ["--epochs", "4", "--resume",
                           os.path.join(ckdir, "step_2")])
        err = capsys.readouterr().err
        assert "resuming the stream at step 2" in err
        assert os.path.isdir(os.path.join(ckdir, "final"))


    def test_cli_resume_adapts_ema_track(self, tmp_path, capsys):
        """A classifier checkpoint saved WITHOUT an EMA track resumed
        with --ema-alpha must start one from the restored weights
        instead of dying on a pytree mismatch — the adaptation the
        detector path already had (code-review finding)."""
        import cv2

        from yolo_tpu import cli

        cfg_path, names = _write_cls_cfg(tmp_path)
        rng = np.random.default_rng(1)
        data = tmp_path / "data"
        for ci, cls in enumerate(("red", "green", "blue")):
            os.makedirs(data / cls)
            for i in range(3):
                img = np.zeros((32, 32, 3), np.uint8)
                img[:, :, 2 - ci] = rng.integers(160, 255)
                cv2.imwrite(str(data / cls / f"{i}.png"), img)
        ckdir = str(tmp_path / "ck")
        common = ["train", "--cfg", cfg_path, "--names", names,
                  "--imagefolder", str(data), "--batch", "8",
                  "--precision", "fp32", "--seed", "0",
                  "--checkpoint-dir", ckdir, "--checkpoint-every", "2"]
        with pytest.raises(SystemExit):
            cli.main(common + ["--epochs", "4",
                               "--fail-after-step", "2"])
        capsys.readouterr()
        cli.main(common + ["--epochs", "4", "--ema-alpha", "0.9",
                           "--resume", os.path.join(ckdir, "step_2")])
        err = capsys.readouterr().err
        assert "checkpoint has no EMA track" in err


class TestAugment:
    @pytest.mark.quick
    def test_hsv_augment_position_independent(self, tmp_path):
        """augment_cfg distorts deterministically per (epoch, sample):
        the stream equals itself under start_step resume, and differs
        from the unaugmented stream."""
        import cv2

        from yolo_tpu.data.augment import AugmentConfig
        from yolo_tpu.data.imagefolder import (classifier_train_batches,
                                               list_imagefolder)

        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "d" / "red")
        for i in range(6):
            cv2.imwrite(str(tmp_path / "d" / "red" / f"{i}.png"),
                        rng.integers(30, 225, (20, 20, 3), np.uint8))
        samples = list_imagefolder(str(tmp_path / "d"), ("red",))
        aug = AugmentConfig(hue=0.1, saturation=1.5, exposure=1.5)
        full = list(classifier_train_batches(
            samples, 3, 32, epochs=2, seed=5, augment_cfg=aug))
        tail = list(classifier_train_batches(
            samples, 3, 32, epochs=2, seed=5, augment_cfg=aug,
            start_step=2))
        for a, b in zip(full[2:], tail):
            np.testing.assert_array_equal(a["images"], b["images"])
        plain = list(classifier_train_batches(
            samples, 3, 32, epochs=2, seed=5))
        assert any((a["images"] != b["images"]).any()
                   for a, b in zip(full, plain))

    def test_cli_cfg_keys_enable_augment(self, tmp_path, capsys):
        import cv2

        from yolo_tpu import cli

        text = CLS_CFG.replace(
            "momentum=0.9", "momentum=0.9\nsaturation=1.5\n"
                            "exposure=1.5\nhue=.1")
        cfg_path, names = _write_cls_cfg(tmp_path, text)
        rng = np.random.default_rng(0)
        data = tmp_path / "data"
        for ci, cls in enumerate(("red", "green", "blue")):
            os.makedirs(data / cls)
            for i in range(3):
                img = np.zeros((32, 32, 3), np.uint8)
                img[:, :, 2 - ci] = rng.integers(160, 255)
                cv2.imwrite(str(data / cls / f"{i}.png"), img)
        cli.main(["train", "--cfg", cfg_path, "--names", names,
                  "--imagefolder", str(data), "--epochs", "1",
                  "--batch", "8", "--precision", "fp32"])
        assert "HSV+flip augmentation enabled" in capsys.readouterr().err


class TestTreeSourceOfTruth:
    @pytest.mark.quick
    def test_programmatic_tree_head_trains_hierarchically(self, tmp_path):
        """A SoftmaxHead(tree=...) built WITHOUT ModelConfig.tree (the
        driver-dryrun construction) must still train the hierarchical
        CE — the head layer is the single source of truth
        (code-review regression)."""
        import jax.numpy as jnp

        from tests.test_tree import TREE_TEXT
        from yolo_tpu.configs.specs import (AvgPool, Conv, ModelConfig,
                                            SoftmaxHead)
        from yolo_tpu.configs.tree import parse_tree
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.ops.numpy_ref import tree_softmax
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         train_step)

        (tmp_path / "t.tree").write_text(TREE_TEXT)
        tree = parse_tree(str(tmp_path / "t.tree"))
        cfg = ModelConfig(
            name="prog-tree-cls",
            layers=(Conv(4, size=1, bn=False, act="linear"), AvgPool(),
                    Conv(8, size=1, bn=False, act="linear"),
                    SoftmaxHead(tree=tree)),
            anchors=(), class_names=tree.names, input_size=8)
        assert cfg.tree is None  # deliberately NOT set on the config
        params = dw.random_params(cfg.layers, np.random.default_rng(0))
        state = init_state(params, TrainConfig(weight_decay=0.0))
        batch = {"images": jnp.asarray(np.random.default_rng(1).uniform(
                     0, 1, (2, 8, 8, 3)).astype(np.float32)),
                 "labels": jnp.asarray(np.array([7, 4], np.int32))}
        _, metrics = train_step(state, batch, mcfg=cfg,
                                tcfg=TrainConfig(weight_decay=0.0))
        # recompute the HIERARCHICAL CE from the actual logits: the
        # metric must match it, not the flat-softmax CE
        from yolo_tpu.models import graph

        logits = np.asarray(graph.apply_layers(
            cfg.layers, graph.params_to_jax(params), batch["images"],
            eps=cfg.bn_eps, softmax_logits=True))
        want = 0.0
        for b, lab in enumerate([7, 4]):
            cond = tree_softmax(logits[b].astype(np.float64), tree)
            node = lab
            while node >= 0:
                want += -np.log(cond[node])
                node = tree.parents[node]
        want /= 2
        assert float(metrics["ce"]) == pytest.approx(want, rel=1e-4)


class TestHierarchicalAccuracy:
    @pytest.mark.quick
    def test_internal_node_labels_score_on_ancestry(self, tmp_path):
        """Tree top1: an internal-node label (dog) counts correct when
        the predicted leaf (collie) descends from it — both in the
        training metric and the imagefolder protocol."""
        import jax.numpy as jnp

        from tests.test_tree import TREE_TEXT
        from yolo_tpu.configs.tree import parse_tree
        from yolo_tpu.train.loss import classifier_loss

        (tmp_path / "t.tree").write_text(TREE_TEXT)
        tree = parse_tree(str(tmp_path / "t.tree"))
        # logits drive the leaf argmax to collie (node 7): boost the
        # whole path 0->1->3->7
        logits = np.full((2, 8), -5.0, np.float32)
        for n in (1, 3, 7):
            logits[:, n] = 8.0
        # labels: dog (3, internal — ancestor of collie) and cat (4,
        # leaf, NOT on collie's path)
        _, parts = classifier_loss(
            jnp.asarray(logits), jnp.asarray(np.array([3, 4], np.int32)),
            tree=tree)
        assert float(parts["top1"]) == pytest.approx(0.5)


class TestSoftmaxTreeProperty:
    @pytest.mark.quick
    def test_eval_paths_use_the_head_tree(self, tmp_path):
        """accuracy over a PROGRAMMATIC tree head (ModelConfig.tree
        unset) must run the hierarchical protocol — eval reads the same
        source of truth training does (code-review follow-up)."""
        from tests.test_tree import TREE_TEXT
        from yolo_tpu.configs.specs import (AvgPool, Conv, ModelConfig,
                                            SoftmaxHead)
        from yolo_tpu.configs.tree import parse_tree
        from yolo_tpu.models.classify import accuracy_from_arrays

        (tmp_path / "t.tree").write_text(TREE_TEXT)
        tree = parse_tree(str(tmp_path / "t.tree"))
        cfg = ModelConfig(
            name="prog-tree-eval",
            layers=(Conv(8, size=1, bn=False, act="linear"), AvgPool(),
                    SoftmaxHead(tree=tree)),
            anchors=(), class_names=tree.names, input_size=8)
        assert cfg.tree is None and cfg.softmax_tree is tree
        # identity-ish conv: channel 0 dominant drives node-0 logit
        # high... craft params so logits favor the collie path: only
        # feasible via direct kernel design — kernel maps 3 input
        # channels onto 8 outputs; set rows for nodes 1,3,7 high
        import numpy as np

        kernel = np.zeros((1, 1, 3, 8), np.float32)
        kernel[0, 0, :, 1] = 10.0
        kernel[0, 0, :, 3] = 10.0
        kernel[0, 0, :, 7] = 10.0
        params = [{"kernel": kernel, "bias": np.zeros(8, np.float32)}]
        xs = np.full((2, 8, 8, 3), 0.8, np.float32)
        # labels: dog (internal, ancestor of predicted leaf collie) and
        # cat (leaf, off-path)
        out = accuracy_from_arrays(cfg, params, xs,
                                   np.array([3, 4]), batch=2, k=1)
        assert out["top1"] == pytest.approx(0.5)


def test_cli_classifier_geometry_augment(tmp_path, capsys):
    """[net] angle/min_crop/max_crop activate darknet's classifier
    scale/rotation jitter (random_augment_image) in the CLI train
    path; training still learns the solid-color task."""
    import cv2

    from yolo_tpu import cli

    text = CLS_CFG.replace(
        "momentum=0.9",
        "momentum=0.9\nangle=10\nmin_crop=24\nmax_crop=40\nflip=1")
    cfg_path, names = _write_cls_cfg(tmp_path, text)
    data = tmp_path / "data"
    rng = np.random.default_rng(0)
    for ci, cls in enumerate(("red", "green", "blue")):
        os.makedirs(data / cls)
        for i in range(4):
            img = rng.integers(0, 40, (40, 48, 3)).astype(np.uint8)
            img[..., 2 - ci] = 220  # BGR on disk
            cv2.imwrite(str(data / cls / f"{i}.png"), img)
    cli.main(["train", "--cfg", cfg_path, "--names", names,
              "--imagefolder", str(data), "--epochs", "2",
              "--batch", "8", "--precision", "fp32"])
    err = capsys.readouterr().err
    assert "scale/rotation crops" in err
