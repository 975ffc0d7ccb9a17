"""YOLO9000 hierarchical softmax tree (configs/tree.py, the tree paths
in ops/decode.py and ops/numpy_ref.py, and the [region] tree=/map= cfg
keys). Semantics pinned to the YOLO9000 paper §4 (arXiv:1612.08242) and
the darknet .tree/.map file formats — the reference tree is absent
(SURVEY.md §0), so the jax path is cross-checked against an independent
loop-level numpy oracle."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from yolo_tpu.configs.tree import (SoftmaxTree, group_members_padded,
                                   parse_map, parse_tree,
                                   tree_paths_padded)
from yolo_tpu.ops import numpy_ref

TREE_TEXT = """\
physical_entity -1
animal 0
vehicle 0
dog 1
cat 1
car 2
truck 2
collie 3
"""
# groups: [0] roots, [1,2] under 0, [3,4] under 1, [5,6] under 2,
# [7] under 3; leaves 4,5,6,7; max path 0->1->3->7 (depth 4)


@pytest.fixture()
def tree(tmp_path):
    p = tmp_path / "micro.tree"
    p.write_text(TREE_TEXT)
    return parse_tree(str(p))


class TestParse:
    def test_structure(self, tree):
        assert tree.n_nodes == 8
        assert tree.parents == (-1, 0, 0, 1, 1, 2, 2, 3)
        assert tree.names[0] == "physical_entity"
        assert tree.names[7] == "collie"
        assert tree.n_groups == 5
        assert tree.group_offset == (0, 1, 3, 5, 7)
        assert tree.group_size == (1, 2, 2, 2, 1)
        assert tree.node_group == (0, 1, 1, 2, 2, 3, 3, 4)
        assert tree.child_group == (1, 2, 3, 4, -1, -1, -1, -1)
        assert [tree.leaf(i) for i in range(8)] == [
            False, False, False, False, True, True, True, True]
        assert tree.path(7) == (0, 1, 3, 7)
        assert tree.path(5) == (0, 2, 5)
        assert tree.max_depth == 4
        assert tree.max_group_size == 2

    def test_padded_tables(self, tree):
        paths = tree_paths_padded(tree)
        assert paths.shape == (8, 4)
        assert paths[7].tolist() == [0, 1, 3, 7]
        assert paths[2].tolist() == [0, 2, -1, -1]
        members = group_members_padded(tree)
        assert members.shape == (5, 2)
        assert members[0].tolist() == [0, -1]
        assert members[2].tolist() == [3, 4]

    def test_parent_must_precede_child(self, tmp_path):
        p = tmp_path / "bad.tree"
        p.write_text("a 1\nb -1\n")
        with pytest.raises(ValueError, match="precede"):
            parse_tree(str(p))

    def test_interleaved_sibling_runs_rejected(self, tmp_path):
        p = tmp_path / "bad.tree"
        # children of node 0 split into two runs around a child of 1
        p.write_text("r -1\na 0\nb 1\nc 0\n")
        with pytest.raises(ValueError, match="contiguous"):
            parse_tree(str(p))

    def test_roots_must_lead(self, tmp_path):
        p = tmp_path / "bad.tree"
        p.write_text("")
        with pytest.raises(ValueError, match="empty"):
            parse_tree(str(p))

    def test_malformed_line(self, tmp_path):
        p = tmp_path / "bad.tree"
        p.write_text("a -1 extra junk\n")
        with pytest.raises(ValueError, match="name.*parent"):
            parse_tree(str(p))

    def test_map(self, tree, tmp_path):
        m = tmp_path / "micro.map"
        m.write_text("4\n7\n5\n")
        assert parse_map(str(m), tree) == (4, 7, 5)
        m.write_text("9\n")
        with pytest.raises(ValueError, match="outside"):
            parse_map(str(m), tree)


class TestMath:
    def test_zero_size_batch(self, tree):
        """Empty leading dims flow through every tree op (the
        barrier-pinned 2-D forms back-reshape with the static C, not
        -1, which is unresolvable at 0 elements — code-review
        finding)."""
        from yolo_tpu.ops.decode import (tree_absolute_probs,
                                         tree_conditional_probs,
                                         tree_log_conditional,
                                         tree_top_prediction)

        empty = np.zeros((0, tree.n_nodes), np.float32)
        assert tree_conditional_probs(empty, tree).shape == (0, 8)
        assert tree_log_conditional(empty, tree).shape == (0, 8)
        assert tree_absolute_probs(empty, tree).shape == (0, 8)
        assert tree_top_prediction(empty, tree, 0.5).shape == (0,)
        empty3 = np.zeros((2, 0, tree.n_nodes), np.float32)
        assert tree_conditional_probs(empty3, tree).shape == (2, 0, 8)
        assert tree_top_prediction(empty3, tree, 0.5).shape == (2, 0)

    def test_conditional_probs_match_oracle(self, tree):
        from yolo_tpu.ops.decode import tree_conditional_probs

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 3, 8)).astype(np.float32) * 3
        got = np.asarray(tree_conditional_probs(logits, tree))
        for b in range(2):
            for i in range(3):
                want = numpy_ref.tree_softmax(
                    logits[b, i].astype(np.float64), tree)
                np.testing.assert_allclose(got[b, i], want, rtol=1e-5,
                                           atol=1e-6)
        # each sibling group sums to 1
        for g in range(tree.n_groups):
            members = list(tree.group_members(g))
            np.testing.assert_allclose(got[..., members].sum(-1), 1.0,
                                       rtol=1e-5)

    def test_absolute_probs_match_oracle(self, tree):
        from yolo_tpu.ops.decode import (tree_absolute_probs,
                                         tree_conditional_probs)

        rng = np.random.default_rng(1)
        logits = rng.normal(size=(4, 8)).astype(np.float32) * 2
        cond = tree_conditional_probs(logits, tree)
        got = np.asarray(tree_absolute_probs(cond, tree))
        for b in range(4):
            want = numpy_ref.tree_absolute(
                np.asarray(cond)[b].astype(np.float64), tree)
            np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-7)
        # absolute prob of a node >= any descendant's
        assert (got[:, 1] >= got[:, 3] - 1e-6).all()
        assert (got[:, 3] >= got[:, 7] - 1e-6).all()

    @pytest.mark.parametrize("thresh", [0.1, 0.5, 0.9])
    def test_top_prediction_fuzz_matches_oracle(self, tree, thresh):
        from yolo_tpu.ops.decode import (tree_conditional_probs,
                                         tree_top_prediction)

        rng = np.random.default_rng(2)
        logits = rng.normal(size=(64, 8)).astype(np.float32) * 3
        cond = tree_conditional_probs(logits, tree)
        got = np.asarray(tree_top_prediction(cond, tree, thresh))
        cond_np = np.asarray(cond, dtype=np.float64)
        for b in range(64):
            want = numpy_ref.tree_top_prediction(cond_np[b], tree, thresh)
            assert got[b] == want, f"row {b}: {got[b]} != {want}"

    def test_top_prediction_threshold_semantics(self, tree):
        from yolo_tpu.ops.decode import tree_top_prediction

        # hand-built conditionals: root 1.0; animal .9 / vehicle .1;
        # dog .8 / cat .2; collie .9
        cond = np.zeros((1, 8), np.float32)
        cond[0] = [1.0, 0.9, 0.1, 0.8, 0.2, 0.5, 0.5, 0.9]
        # path products: phys 1.0 -> animal .9 -> dog .72 -> collie .648
        assert int(tree_top_prediction(cond, tree, 0.95)[0]) == 0
        assert int(tree_top_prediction(cond, tree, 0.85)[0]) == 1
        assert int(tree_top_prediction(cond, tree, 0.70)[0]) == 3
        assert int(tree_top_prediction(cond, tree, 0.50)[0]) == 7
        # at the boundary the product must EXCEED thresh to descend
        assert int(tree_top_prediction(cond, tree, 0.9)[0]) == 0
        # root below threshold still yields the root argmax
        assert int(tree_top_prediction(cond, tree, 1.5)[0]) == 0


class TestDecode:
    ANCHORS = ((1.0, 1.5), (2.5, 2.0))

    def _logits(self, rng, h=3, w=3):
        return rng.normal(size=(h, w, 2 * (5 + 8))).astype(np.float32)

    def test_decode_traversal_matches_oracle(self, tree):
        from yolo_tpu.ops.decode import decode

        rng = np.random.default_rng(3)
        logits = self._logits(rng)
        jb, js = decode(logits[None], self.ANCHORS, 8, tree=tree,
                        hier_thresh=0.4)
        nb, ns = numpy_ref.decode_tree(
            logits.astype(np.float64), self.ANCHORS, tree, 0.4)
        np.testing.assert_allclose(np.asarray(jb)[0], nb, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(js)[0], ns, rtol=1e-4,
                                   atol=1e-5)
        # exactly one nonzero class per box, scoring the objectness
        nz = (np.asarray(js)[0] > 0).sum(-1)
        assert (nz == 1).all()

    def test_decode_default_path_unchanged(self, tree):
        """tree=None keeps the flat-softmax decode byte-identical."""
        from yolo_tpu.ops.decode import decode

        rng = np.random.default_rng(5)
        logits = self._logits(rng)
        jb, js = decode(logits[None], self.ANCHORS, 8)
        nb, ns = numpy_ref.decode(logits.astype(np.float64),
                                  self.ANCHORS, 8)
        np.testing.assert_allclose(np.asarray(js)[0], ns, rtol=1e-4,
                                   atol=1e-5)

    def test_decode_map_matches_oracle(self, tree):
        from yolo_tpu.ops.decode import decode

        rng = np.random.default_rng(4)
        logits = self._logits(rng)
        tree_map = (4, 7, 5, 6)
        jb, js = decode(logits[None], self.ANCHORS, 8, tree=tree,
                        tree_map=tree_map)
        nb, ns = numpy_ref.decode_tree(
            logits.astype(np.float64), self.ANCHORS, tree, 0.5,
            tree_map=tree_map)
        assert np.asarray(js).shape == (1, 18, 4)
        np.testing.assert_allclose(np.asarray(jb)[0], nb, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(js)[0], ns, rtol=1e-4,
                                   atol=1e-5)


TREE_CFG = """\
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

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

[convolutional]
filters=26
size=1
activation=linear

[region]
anchors = 1.0,1.5, 2.5,2.0
classes=8
num=2
thresh=0.6
tree=micro.tree
map=micro.map
"""


def _write_tree_model(tmp_path):
    (tmp_path / "micro.tree").write_text(TREE_TEXT)
    (tmp_path / "micro.map").write_text("4\n7\n5\n6\n")
    cfg_path = tmp_path / "micro9000.cfg"
    cfg_path.write_text(TREE_CFG)
    return str(cfg_path)


class TestCfg:
    def test_parse_populates_tree(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        cfg = config_from_cfg(_write_tree_model(tmp_path))
        assert cfg.tree is not None and cfg.tree.n_nodes == 8
        assert cfg.tree_map == (4, 7, 5, 6)
        # tree node names become the class vocabulary
        assert cfg.class_names == cfg.tree.names
        assert cfg.class_names[7] == "collie"
        assert cfg.num_detection_classes() == 8
        assert cfg.num_detection_classes(use_tree_map=True) == 4
        assert cfg.detection_names(use_tree_map=True) == (
            "cat", "collie", "car", "truck")

    def test_classes_tree_mismatch_rejected(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = _write_tree_model(tmp_path)
        bad = (tmp_path / "micro9000.cfg").read_text().replace(
            "classes=8", "classes=9")
        (tmp_path / "micro9000.cfg").write_text(bad)
        with pytest.raises(ValueError, match="tree has 8 nodes"):
            config_from_cfg(p)

    def test_map_requires_tree(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = _write_tree_model(tmp_path)
        bad = (tmp_path / "micro9000.cfg").read_text().replace(
            "tree=micro.tree\n", "")
        (tmp_path / "micro9000.cfg").write_text(bad)
        with pytest.raises(ValueError, match="map= requires tree="):
            config_from_cfg(p)

    def test_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)

        p = _write_tree_model(tmp_path)
        cfg = config_from_cfg(p)
        text = cfg_to_string(cfg)
        assert "tree=micro.tree" in text and "map=micro.map" in text
        again = tmp_path / "again.cfg"
        again.write_text(text)
        cfg2 = config_from_cfg(str(again), name=cfg.name)
        assert cfg2 == cfg


class TestEndToEnd:
    def test_detect_traversal_and_map(self, tmp_path):
        import numpy as np

        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.models import predict

        cfg = config_from_cfg(_write_tree_model(tmp_path))
        params = dw.random_params(cfg.layers, np.random.default_rng(0))
        imgs = np.random.default_rng(1).uniform(
            size=(2, 32, 32, 3)).astype(np.float32)
        dets = predict.detect(cfg, params, imgs, conf_threshold=0.05,
                              head="reference")
        assert dets["boxes"].shape[0] == 2
        cls = np.asarray(dets["classes"])
        valid = np.asarray(dets["valid"]).astype(bool)
        assert ((cls[valid] >= 0) & (cls[valid] < 8)).all()

        dets_m = predict.detect(cfg, params, imgs, conf_threshold=0.05,
                                head="reference", use_tree_map=True)
        cls_m = np.asarray(dets_m["classes"])
        valid_m = np.asarray(dets_m["valid"]).astype(bool)
        assert ((cls_m[valid_m] >= 0) & (cls_m[valid_m] < 4)).all()

    @pytest.mark.parametrize("use_map", [False, True])
    def test_fused_head_matches_reference_path(self, tmp_path, use_map):
        """The fused YOLO9000 head (objectness prefilter + hierarchy on
        the survivors) must be box/score/class-identical to the
        reference decode+NMS at production thresholds — in traversal
        mode the candidate cut is EXACT (score == conf)."""
        import numpy as np

        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.models import predict

        cfg = config_from_cfg(_write_tree_model(tmp_path))
        params = dw.random_params(cfg.layers, np.random.default_rng(0))
        imgs = np.random.default_rng(2).uniform(
            size=(2, 32, 32, 3)).astype(np.float32)
        ref = predict.detect(cfg, params, imgs, conf_threshold=0.3,
                             head="reference", use_tree_map=use_map)
        fus = predict.detect(cfg, params, imgs, conf_threshold=0.3,
                             head="fused", use_tree_map=use_map)
        # output PADDING widths differ between paths; the sets of
        # valid detections must be identical per image
        for bi in range(2):
            rv = np.asarray(ref["valid"][bi]).astype(bool)
            fv = np.asarray(fus["valid"][bi]).astype(bool)
            assert rv.sum() == fv.sum()
            rrows = np.concatenate(
                [np.asarray(ref["boxes"][bi])[rv],
                 np.asarray(ref["scores"][bi])[rv, None],
                 np.asarray(ref["classes"][bi])[rv, None]], axis=-1)
            frows = np.concatenate(
                [np.asarray(fus["boxes"][bi])[fv],
                 np.asarray(fus["scores"][bi])[fv, None],
                 np.asarray(fus["classes"][bi])[fv, None]], axis=-1)
            order_r = np.lexsort(rrows.T)
            order_f = np.lexsort(frows.T)
            np.testing.assert_allclose(rrows[order_r], frows[order_f],
                                       rtol=1e-5, atol=1e-5)

    def test_use_tree_map_requires_map(self, tmp_path):
        import numpy as np

        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.models import predict

        p = _write_tree_model(tmp_path)
        text = (tmp_path / "micro9000.cfg").read_text().replace(
            "map=micro.map\n", "")
        (tmp_path / "micro9000.cfg").write_text(text)
        cfg = config_from_cfg(p)
        params = dw.random_params(cfg.layers, np.random.default_rng(0))
        imgs = np.zeros((1, 32, 32, 3), np.float32)
        with pytest.raises(ValueError, match="no .region. map"):
            predict.detect(cfg, params, imgs, use_tree_map=True)


class TestCli:
    def test_predict_cli_traversal_and_map(self, tmp_path, capsys):
        """yolo9000-style predict through the argparse surface: tree
        names in the output; --use-tree-map switches to the projected
        vocabulary; the flags reject non-tree models loudly."""
        import cv2

        from yolo_tpu import cli
        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw

        cfg_path = _write_tree_model(tmp_path)
        cfg = config_from_cfg(cfg_path)
        wpath = str(tmp_path / "micro.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        img = str(tmp_path / "in.png")
        cv2.imwrite(img, np.random.default_rng(1).integers(
            0, 255, (48, 64, 3), dtype=np.uint8))

        cli.main(["predict", "--cfg", cfg_path, "--weights", wpath,
                  "--image", img, "--precision", "fp32",
                  "--conf", "0.05", "--hier-thresh", "0.3"])
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines() if l]
        tree_vocab = set(cfg.tree.names)
        assert all(d["class"] in tree_vocab for d in lines)

        cli.main(["predict", "--cfg", cfg_path, "--weights", wpath,
                  "--image", img, "--precision", "fp32",
                  "--conf", "0.05", "--use-tree-map"])
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines() if l]
        mapped = {"cat", "collie", "car", "truck"}
        assert all(d["class"] in mapped for d in lines)

    def test_flags_reject_non_tree_model(self, tmp_path):
        import cv2

        from yolo_tpu import cli
        from yolo_tpu.configs import get_variant
        from yolo_tpu.io import darknet_weights as dw

        cfg = get_variant("tiny-voc").with_input_size(96)
        wpath = str(tmp_path / "t.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        img = str(tmp_path / "in.png")
        cv2.imwrite(img, np.zeros((32, 32, 3), np.uint8))
        with pytest.raises(SystemExit, match="tree"):
            cli.main(["predict", "--model", "tiny-voc", "--input-size",
                      "96", "--weights", wpath, "--image", img,
                      "--hier-thresh", "0.3"])


class TestTraining:
    def test_region_loss_tree_matches_oracle(self, tree):
        import jax.numpy as jnp

        from tests.loss_oracle import region_loss_np
        from yolo_tpu.data import targets as tgt
        from yolo_tpu.train.loss import LossConfig, region_loss

        anchors = ((1.0, 1.5), (2.5, 2.0), (3.0, 3.0))
        rng = np.random.default_rng(7)
        b, s, c = 2, 4, 8
        boxes, classes = [], []
        for _ in range(b):
            g = rng.integers(1, 4)
            bx = np.stack([
                rng.uniform(0.2, 0.8, g), rng.uniform(0.2, 0.8, g),
                rng.uniform(0.05, 0.5, g), rng.uniform(0.05, 0.5, g),
            ], axis=-1)
            boxes.append(bx)
            # targets may be leaves OR internal nodes (paper: labels at
            # any tree level)
            classes.append(rng.integers(1, c, g))
        targets = tgt.encode_batch(boxes, classes, grid=s,
                                   anchors=anchors, num_classes=c)
        logits = rng.normal(0, 1, (b, s, s, 3 * (5 + c))).astype(
            np.float32)
        cfg = LossConfig()
        want_total, want_parts = region_loss_np(
            logits, targets, anchors, c, cfg, 20000, tree=tree)
        got_total, got_parts = region_loss(
            jnp.asarray(logits),
            {k: jnp.asarray(v) for k, v in targets.items()},
            anchors, c, cfg, jnp.asarray(20000), tree=tree)
        for k in want_parts:
            assert float(got_parts[k]) == pytest.approx(
                want_parts[k], rel=1e-4, abs=1e-6), k
        assert float(got_total) == pytest.approx(want_total, rel=1e-4)

    def test_tree_class_loss_zero_at_perfect_prediction(self, tree):
        """Driving the path groups' softmax to the target path zeroes
        the class term; siblings OFF the path stay gradient-free."""
        import jax
        import jax.numpy as jnp

        from yolo_tpu.train.loss import _tree_class_sq

        # target = collie (path 0 -> 1 -> 3 -> 7): logits hugely favor
        # animal over vehicle, dog over cat; single-member groups are
        # softmax-1 automatically
        logits = np.zeros((1, 8), np.float32)
        logits[0, 1] = 40.0   # animal >> vehicle
        logits[0, 3] = 40.0   # dog >> cat
        val = _tree_class_sq(jnp.asarray(logits),
                             jnp.asarray([7]), tree)
        assert float(val[0]) == pytest.approx(0.0, abs=1e-6)
        # gradient w.r.t. the car/truck group (nodes 5/6, off-path) is 0
        grad = jax.grad(
            lambda l: _tree_class_sq(l, jnp.asarray([7]), tree).sum()
        )(jnp.asarray(logits))
        assert float(jnp.abs(grad[0, 5])) == 0.0
        assert float(jnp.abs(grad[0, 6])) == 0.0

    def test_train_step_runs_and_learns(self, tmp_path):
        """Full jitted train step on the tree cfg: loss decreases."""
        import jax.numpy as jnp

        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.data import targets as tgt
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         make_train_step)

        cfg = config_from_cfg(_write_tree_model(tmp_path))
        rng = np.random.default_rng(0)
        params = dw.random_params(cfg.layers, rng)
        tcfg = TrainConfig(learning_rate=5e-3, optimizer="adam",
                           weight_decay=0.0)
        state = init_state(params, tcfg)
        step = make_train_step(cfg, tcfg)
        boxes = [np.array([[0.5, 0.5, 0.6, 0.6]])] * 2
        classes = [np.array([7]), np.array([4])]
        targets = tgt.encode_batch(boxes, classes, grid=cfg.grid_size,
                                   anchors=cfg.anchors,
                                   num_classes=cfg.num_classes)
        batch = {k: jnp.asarray(v) for k, v in targets.items()}
        batch["images"] = jnp.asarray(rng.uniform(
            0, 1, (2, 32, 32, 3)).astype(np.float32))
        losses = []
        for _ in range(15):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]


CLS_TREE_CFG = """\
[net]
width=32
height=32
channels=3

[convolutional]
batch_normalize=1
filters=4
size=3
stride=1
pad=1
activation=leaky

[avgpool]

[convolutional]
filters=8
size=1
activation=linear

[softmax]
groups=1
tree=micro.tree

[cost]
type=sse
"""


def _write_tree_classifier(tmp_path):
    (tmp_path / "micro.tree").write_text(TREE_TEXT)
    p = tmp_path / "cls9000.cfg"
    p.write_text(CLS_TREE_CFG)
    return str(p)


class TestClassifier:
    def test_parse_and_round_trip(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                                  config_from_cfg)
        from yolo_tpu.configs.specs import SoftmaxHead

        cfg = config_from_cfg(_write_tree_classifier(tmp_path))
        assert cfg.head_kind == "softmax"
        head = cfg.layers[-1]
        assert isinstance(head, SoftmaxHead)
        assert head.tree is not None and head.tree.n_nodes == 8
        assert cfg.tree is head.tree or cfg.tree == head.tree
        assert cfg.class_names == head.tree.names
        text = cfg_to_string(cfg)
        assert "tree=micro.tree" in text
        again = tmp_path / "again.cfg"
        again.write_text(text)
        cfg2 = config_from_cfg(str(again), name=cfg.name)
        assert cfg2 == cfg

    def test_nodes_must_match_head_width(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        p = _write_tree_classifier(tmp_path)
        bad = (tmp_path / "cls9000.cfg").read_text().replace(
            "filters=8\nsize=1", "filters=9\nsize=1")
        (tmp_path / "cls9000.cfg").write_text(bad)
        with pytest.raises(ValueError, match="softmax.*9 classes.*8 nodes"):
            config_from_cfg(p)

    def test_forward_emits_conditionals(self, tmp_path, tree):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.models.classify import make_classifier

        cfg = config_from_cfg(_write_tree_classifier(tmp_path))
        params = dw.random_params(cfg.layers, np.random.default_rng(0))
        run = make_classifier(cfg)
        x = np.random.default_rng(1).uniform(
            size=(3, 32, 32, 3)).astype(np.float32)
        cond = np.asarray(run(params, x))
        assert cond.shape == (3, 8)
        # every sibling group sums to 1 (conditional, NOT a flat softmax)
        for g in range(tree.n_groups):
            members = list(tree.group_members(g))
            np.testing.assert_allclose(cond[:, members].sum(-1), 1.0,
                                       rtol=1e-5)

    def test_leaf_probs_and_path(self, tree):
        from yolo_tpu.models.classify import (hierarchy_leaf_probs,
                                              hierarchy_path, top_k)

        cond = np.zeros((1, 8), np.float32)
        cond[0] = [1.0, 0.9, 0.1, 0.8, 0.2, 0.6, 0.4, 1.0]
        leafp = hierarchy_leaf_probs(cond, tree)
        # internal nodes zeroed; leaves carry path products
        assert (leafp[0, [0, 1, 2, 3]] == 0).all()
        np.testing.assert_allclose(
            leafp[0, [4, 5, 6, 7]],
            [0.9 * 0.2, 0.1 * 0.6, 0.1 * 0.4, 0.9 * 0.8 * 1.0],
            rtol=1e-5)
        names = [n for n, _ in top_k(leafp[0], tree.names, k=2)]
        assert names == ["collie", "cat"]
        path = hierarchy_path(cond[0], tree)
        assert [n for n, _, _ in path] == [
            "physical_entity", "animal", "dog", "collie"]
        np.testing.assert_allclose([p for _, _, p in path],
                                   [1.0, 0.9, 0.72, 0.72], rtol=1e-5)

    def test_classify_cli_hierarchy(self, tmp_path, capsys):
        import cv2

        from yolo_tpu import cli
        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw

        cfg_path = _write_tree_classifier(tmp_path)
        cfg = config_from_cfg(cfg_path)
        wpath = str(tmp_path / "c.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        img = str(tmp_path / "in.png")
        cv2.imwrite(img, np.random.default_rng(1).integers(
            0, 255, (40, 40, 3), dtype=np.uint8))

        # flat top-k over leaf-masked absolute probs: leaves only
        cli.main(["classify", "--cfg", cfg_path, "--weights", wpath,
                  "--image", img, "--precision", "fp32", "--top", "8"])
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        leaves = {"cat", "car", "truck", "collie"}
        positive = [d for d in lines if d["prob"] > 0]
        assert positive and all(d["class"] in leaves for d in positive)

        cli.main(["classify", "--cfg", cfg_path, "--weights", wpath,
                  "--image", img, "--precision", "fp32", "--hierarchy"])
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert lines[0]["node"] == "physical_entity"
        # monotone non-increasing absolute probability down the path
        probs = [d["prob"] for d in lines]
        assert all(a >= b - 1e-9 for a, b in zip(probs, probs[1:]))

    def test_hierarchy_flag_rejects_flat_classifier(self, tmp_path):
        from yolo_tpu import cli
        from yolo_tpu.configs import get_variant
        from yolo_tpu.io import darknet_weights as dw

        cfg = get_variant("darknet19").with_input_size(32)
        wpath = str(tmp_path / "d.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        with pytest.raises(SystemExit, match="tree"):
            cli.main(["classify", "--model", "darknet19",
                      "--input-size", "32", "--weights", wpath,
                      "--image", "x.png", "--hierarchy"])


class TestFuzz:
    def _random_tree(self, rng, tmp_path, idx):
        """Random topology honoring the file invariants: parents before
        children, contiguous sibling runs (children are appended in
        parent order), roots first."""
        n_roots = int(rng.integers(1, 4))
        parents = [-1] * n_roots
        frontier = list(range(n_roots))
        while frontier and len(parents) < 40:
            nxt = []
            for node in frontier:
                kids = int(rng.integers(0, 4))
                for _ in range(kids):
                    parents.append(node)
                    nxt.append(len(parents) - 1)
            frontier = nxt
        text = "".join(f"n{i} {p}\n" for i, p in enumerate(parents))
        p = tmp_path / f"fuzz{idx}.tree"
        p.write_text(text)
        return parse_tree(str(p))

    def test_random_trees_match_oracle(self, tmp_path):
        from yolo_tpu.ops.decode import (tree_absolute_probs,
                                         tree_conditional_probs,
                                         tree_top_prediction)

        rng = np.random.default_rng(42)
        for idx in range(12):
            tree = self._random_tree(rng, tmp_path, idx)
            c = tree.n_nodes
            logits = rng.normal(size=(8, c)).astype(np.float32) * 3
            cond = tree_conditional_probs(logits, tree)
            cond_np = np.asarray(cond, np.float64)
            absolute = np.asarray(tree_absolute_probs(cond, tree))
            thresh = float(rng.uniform(0.05, 0.95))
            top = np.asarray(tree_top_prediction(cond, tree, thresh))
            for b in range(8):
                want_c = numpy_ref.tree_softmax(
                    logits[b].astype(np.float64), tree)
                np.testing.assert_allclose(cond_np[b], want_c,
                                           rtol=1e-5, atol=1e-6)
                want_a = numpy_ref.tree_absolute(cond_np[b], tree)
                np.testing.assert_allclose(absolute[b], want_a,
                                           rtol=1e-5, atol=1e-7)
                want_t = numpy_ref.tree_top_prediction(
                    cond_np[b], tree, thresh)
                assert top[b] == want_t, (idx, b, thresh)


class TestEvalCli:
    def test_eval_use_tree_map_projects_gt(self, tmp_path, capsys):
        """eval --use-tree-map: ground truth maps onto the PROJECTED
        vocabulary (mapped tree-node names) and per-class AP keys carry
        those names — the darknet COCO-on-9k validation protocol shape."""
        import cv2

        from tests.test_data_eval import _write_xml
        from yolo_tpu import cli
        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw

        cfg_path = _write_tree_model(tmp_path)
        cfg = config_from_cfg(cfg_path)
        wpath = str(tmp_path / "w.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        root = tmp_path / "VOC"
        for d in ("Annotations", "JPEGImages", "ImageSets/Main"):
            (root / d).mkdir(parents=True)
        rng = np.random.default_rng(1)
        ids = []
        # GT labels use the MAPPED names (cat/collie/car/truck)
        for i, cls in enumerate(("cat", "collie", "car")):
            name = f"{i:06d}"
            ids.append(name)
            cv2.imwrite(str(root / "JPEGImages" / f"{name}.jpg"),
                        rng.integers(0, 255, (60, 80, 3), np.uint8))
            _write_xml(root / "Annotations" / f"{name}.xml",
                       [(cls, 0, 10, 10, 50, 40)], w=80, h=60)
        (root / "ImageSets/Main/test.txt").write_text("\n".join(ids))

        cli.main(["eval", "--cfg", cfg_path, "--weights", wpath,
                  "--voc-root", str(root), "--split", "test",
                  "--precision", "fp32", "--batch", "3",
                  "--use-tree-map"])
        out = json.loads(capsys.readouterr().out.strip())
        assert set(out) == {"map", "ap"}
        # AP keys come from the projected names, never tree internals
        assert set(out["ap"]) <= {"cat", "collie", "car", "truck"}


class TestScale:
    def test_large_tree_decode_and_fused_identity(self, tmp_path):
        """A generated ~500-node tree (branching like the real 9k
        hierarchy's shape): decode matches the loop oracle on a spot
        check, and the fused head stays identical to the reference
        path — guards the gather/scatter shapes at depth and width the
        micro tree can't reach."""
        rng = np.random.default_rng(11)
        parents = [-1]
        frontier = [0]
        while frontier and len(parents) < 500:
            nxt = []
            for node in frontier:
                for _ in range(int(rng.integers(1, 5))):
                    if len(parents) >= 500:
                        break
                    parents.append(node)
                    nxt.append(len(parents) - 1)
            frontier = nxt
        text = "".join(f"n{i} {p}\n" for i, p in enumerate(parents))
        (tmp_path / "big.tree").write_text(text)
        tree = parse_tree(str(tmp_path / "big.tree"))
        c = tree.n_nodes
        assert c >= 300 and tree.max_depth >= 4

        from yolo_tpu.ops.decode import decode

        anchors = ((1.0, 1.5), (2.5, 2.0))
        logits = rng.normal(size=(2, 2, 2 * (5 + c))).astype(np.float32)
        jb, js = decode(logits[None], anchors, c, tree=tree,
                        hier_thresh=0.2)
        nb, ns = numpy_ref.decode_tree(
            logits.astype(np.float64), anchors, tree, 0.2)
        np.testing.assert_allclose(np.asarray(js)[0], ns, rtol=1e-4,
                                   atol=1e-5)

        # fused-vs-reference identity on a full model at this width
        from yolo_tpu.configs.specs import Conv, ModelConfig
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.models import predict

        cfg = ModelConfig(
            name="big9000",
            layers=(Conv(8, stride=2), Conv(8, stride=2),
                    Conv(8, stride=2), Conv(8, stride=2),
                    Conv(8, stride=2),
                    Conv(2 * (5 + c), size=1, bn=False, act="linear")),
            anchors=anchors, class_names=tree.names, input_size=32,
            tree=tree, hier_thresh=0.3)
        params = dw.random_params(cfg.layers, np.random.default_rng(1))
        imgs = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
        ref = predict.detect(cfg, params, imgs, conf_threshold=0.3,
                             head="reference")
        fus = predict.detect(cfg, params, imgs, conf_threshold=0.3,
                             head="fused")
        rv = np.asarray(ref["valid"][0]).astype(bool)
        fv = np.asarray(fus["valid"][0]).astype(bool)
        assert rv.sum() == fv.sum()
        r = np.concatenate([np.asarray(ref["boxes"][0])[rv],
                            np.asarray(ref["classes"][0])[rv, None]], -1)
        f = np.concatenate([np.asarray(fus["boxes"][0])[fv],
                            np.asarray(fus["classes"][0])[fv, None]], -1)
        np.testing.assert_allclose(r[np.lexsort(r.T)], f[np.lexsort(f.T)],
                                   rtol=1e-5, atol=1e-5)


class TestTrainCli:
    def test_train_cli_tree_region(self, tmp_path, capsys):
        """CLI train on a tree [region] model over a synthetic VOC set
        whose GT names are tree NODES (dog/cat): the hierarchical class
        loss runs e2e through the full trainer."""
        from tests.test_data_eval import make_voc_root
        from yolo_tpu import cli
        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw

        cfg_path = _write_tree_model(tmp_path)
        cfg = config_from_cfg(cfg_path)
        wpath = str(tmp_path / "t.weights")
        dw.save(wpath, cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        names = tmp_path / "t.names"
        names.write_text("\n".join(cfg.tree.names) + "\n")
        root = make_voc_root(tmp_path, n_images=8, size=(64, 64))
        cli.main(["train", "--cfg", cfg_path, "--names", str(names),
                  "--weights", wpath, "--voc-root", root,
                  "--split", "train", "--epochs", "1", "--batch", "8",
                  "--lr", "1e-4", "--precision", "fp32"])


class TestTfOracleParity:
    def test_tree_classifier_full_graph_tf_parity(self, tmp_path):
        """Full tree-classifier graph vs the TF oracle, whose per-group
        softmax is an INDEPENDENT slice+concat derivation (the jax path
        scatters over a group-id table)."""
        from tests.tf_oracle import run_layers
        from yolo_tpu.configs.darknet_cfg import config_from_cfg
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.models import graph

        cfg = config_from_cfg(_write_tree_classifier(tmp_path))
        rng = np.random.default_rng(6)
        params = dw.random_params(cfg.layers, rng)
        x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        got = np.asarray(graph.apply_layers(
            cfg.layers, graph.params_to_jax(params), x, eps=cfg.bn_eps))
        want = np.asarray(run_layers(cfg.layers, params, x,
                                     eps=cfg.bn_eps))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
