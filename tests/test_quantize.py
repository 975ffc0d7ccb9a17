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


def test_int8_head_families_deviation_bounded():
    """int8 PTQ on the head families with no dedicated coverage:
    [Gaussian_yolo] (interleaved 9+C head convs), scaled-yolov4
    new_coords (LOGISTIC head convs — the int8 block must apply the
    activation on the dequantized fp32 value), and YOLO9000 tree
    (map-projection scores, continuous so the bound is meaningful).
    Same gate as the tiny-voc test: bounded score deviation + top-K
    rank agreement vs the fp32 path."""
    import pytest

    from tests.test_gaussian_yolo import MICRO_GAUSS
    from tests.test_scaled_yolov4 import MICRO_SCALED
    from tests.test_tree import TREE_TEXT
    from yolo_tpu.configs.specs import Conv, ModelConfig
    from yolo_tpu.configs.tree import SoftmaxTree
    from yolo_tpu.ops.decode import decode_yolo

    rng = np.random.default_rng(11)

    def check(s32, s8):
        dev = np.abs(np.asarray(s32) - np.asarray(s8)).max()
        assert dev < 0.3, f"int8 score deviation {dev}"
        n = min(50, np.asarray(s32).size)
        top32 = np.argsort(-np.asarray(s32).ravel())[:n]
        top8 = np.argsort(-np.asarray(s8).ravel())[:n]
        overlap = len(set(top32) & set(top8)) / n
        assert overlap > 0.6, f"top-{n} overlap only {overlap}"

    for cfg in (MICRO_GAUSS, MICRO_SCALED):
        params = dw.random_params(cfg.layers, rng, scale=0.05)
        h, w = cfg.input_hw
        x = jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32))
        folded = graph.params_to_jax(graph.fold_params(cfg.layers, params,
                                                       cfg.bn_eps))
        lo32 = forward(cfg, folded, x, compute_dtype=jnp.float32)
        qparams = quantize.prepare_int8(cfg, params, x)
        lo8 = forward(cfg, qparams, x, compute_dtype=jnp.float32)
        heads = cfg.yolo_heads
        kw = dict(scales=[hd.scale_xy for hd in heads],
                  new_coords=[hd.new_coords for hd in heads],
                  gaussian=[hd.gaussian for hd in heads])
        masks = [hd.mask for hd in heads]
        _, s32 = decode_yolo(lo32, cfg.anchors, masks, cfg.num_classes,
                             cfg.input_hw, **kw)
        _, s8 = decode_yolo(lo8, cfg.anchors, masks, cfg.num_classes,
                            cfg.input_hw, **kw)
        check(s32, s8)

    # tree: region head + map-projection scoring (continuous)
    import tempfile, os

    d = tempfile.mkdtemp()
    tp = os.path.join(d, "micro.tree")
    with open(tp, "w") as f:
        f.write(TREE_TEXT)
    from yolo_tpu.configs.tree import parse_tree

    tree = parse_tree(tp)
    tcfg = ModelConfig(
        name="micro9000-q",
        layers=(Conv(8, stride=2), Conv(16, stride=2), Conv(16, stride=2),
                Conv(32, stride=2), Conv(32, stride=2),
                Conv(2 * (5 + tree.n_nodes), size=1, bn=False,
                     act="linear")),
        anchors=((1.0, 1.5), (2.5, 2.0)), class_names=tree.names,
        input_size=96, tree=tree, hier_thresh=0.3)
    params = dw.random_params(tcfg.layers, rng, scale=0.05)
    x = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))
    folded = graph.params_to_jax(graph.fold_params(tcfg.layers, params,
                                                   tcfg.bn_eps))
    lo32 = forward(tcfg, folded, x, compute_dtype=jnp.float32)
    qparams = quantize.prepare_int8(tcfg, params, x)
    lo8 = forward(tcfg, qparams, x, compute_dtype=jnp.float32)
    leaf_map = tuple(i for i in range(tree.n_nodes) if tree.leaf(i))
    _, s32 = decode(lo32, tcfg.anchors, tree.n_nodes, tree=tree,
                    tree_map=leaf_map, hier_thresh=0.3)
    _, s8 = decode(lo8, tcfg.anchors, tree.n_nodes, tree=tree,
                   tree_map=leaf_map, hier_thresh=0.3)
    check(s32, s8)


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


def test_int8_map_parity_on_trained_model():
    """Calibration validated on a TRAINED network, not random weights
    (VERDICT r1 item 7): overfit the micro model to mAP 1.0, then both
    abs-max and percentile-99.9 int8 calibrations must hold mAP within
    0.01 of fp32 on the same dataset. This is the accuracy story behind
    the int8 serving mode; abs-max stays the default (no measured
    disadvantage, no saturation risk knob) — see models/quantize.py
    docstring."""
    from tests.test_map_integration import _dataset
    from tests.test_train import MICRO
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.eval.voc_map import evaluate
    from yolo_tpu.models.predict import detect
    from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step

    scenes = _dataset()
    enc = tgt.encode_batch([s[1] for s in scenes], [s[2] for s in scenes],
                           grid=MICRO.grid_size, anchors=MICRO.anchors,
                           num_classes=MICRO.num_classes)
    batch = {k: jnp.asarray(v) for k, v in enc.items()}
    batch["images"] = jnp.asarray(np.stack([s[0] for s in scenes]))
    tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                       weight_decay=0.0)
    state = init_state(dw.random_params(MICRO.layers,
                                        np.random.default_rng(0)), tcfg)
    step = make_train_step(MICRO, tcfg)
    for _ in range(800):
        state, _ = step(state, batch)
    raw = [{k: np.asarray(v) for k, v in p.items()}
           for p in state["params"]]

    def _map(params_jax):
        out = detect(MICRO, params_jax, batch["images"],
                     conf_threshold=0.05, head="reference",
                     nms_impl="xla")
        gt, detections = {}, {}
        for i, (_, boxes, classes) in enumerate(scenes):
            xyxy = np.stack([
                (boxes[:, 0] - boxes[:, 2] / 2) * 64,
                (boxes[:, 1] - boxes[:, 3] / 2) * 64,
                (boxes[:, 0] + boxes[:, 2] / 2) * 64,
                (boxes[:, 1] + boxes[:, 3] / 2) * 64], axis=-1)
            gt[i] = {"boxes": xyxy, "classes": classes,
                     "difficult": np.zeros(len(classes), np.int32)}
            valid = np.asarray(out["valid"][i])
            dets = []
            for j in np.nonzero(valid)[0]:
                cx, cy, w, h = np.asarray(out["boxes"][i][j], np.float64)
                dets.append((int(out["classes"][i][j]),
                             float(out["scores"][i][j]),
                             (cx - w / 2) * 64, (cy - h / 2) * 64,
                             (cx + w / 2) * 64, (cy + h / 2) * 64))
            detections[i] = dets
        return evaluate(detections, gt, MICRO.num_classes)["map"]

    base = _map(graph.params_to_jax(
        graph.fold_params(MICRO.layers, raw, MICRO.bn_eps)))
    assert base > 0.99, f"training did not converge (mAP {base})"
    for method in ("absmax", "percentile"):
        q = quantize.prepare_int8(MICRO, raw, batch["images"],
                                  method=method)
        m = _map(q)
        assert m > base - 0.01, f"{method} int8 mAP {m} vs fp32 {base}"


def test_calibrate_rejects_unknown_method():
    cfg = dataclasses.replace(TINY_YOLOV2_VOC, input_size=96)
    rng = np.random.default_rng(10)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    folded = graph.fold_params(cfg.layers, params, cfg.bn_eps)
    x = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    import pytest

    with pytest.raises(ValueError, match="calibration method"):
        quantize.calibrate(cfg.layers, folded, x, cfg.bn_eps,
                           method="entropy")


class TestChainedInt8:
    """Chained int8 serving: int8 activations between sole-consumer
    conv pairs (models/quantize._chain_out_scales). Measured +7% e2e
    over bf16 intermediates (docs/PERF.md)."""

    def test_straight_chain_exact_vs_unchained(self):
        """On straight conv/pool topologies the chained forward is
        BIT-IDENTICAL to unchained int8 in fp32 intermediates (direct
        requant == dequant+requant at the same scale; max-pooling
        commutes with the monotone quantization)."""
        import jax

        from yolo_tpu.configs import get_variant

        for name in ("tiny-voc", "yolov3-tiny"):
            cfg = get_variant(name, input_size=128)
            rng = np.random.default_rng(3)
            raw = dw.random_params(cfg.layers, rng, scale=0.05)
            x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)
                                        ).astype(np.float32))
            q0 = quantize.prepare_int8(cfg, raw, x, chain=False)
            q1 = quantize.prepare_int8(cfg, raw, x, chain=True)
            o0 = graph.apply_layers(cfg.layers, q0, x,
                                    compute_dtype=jnp.float32)
            o1 = graph.apply_layers(cfg.layers, q1, x,
                                    compute_dtype=jnp.float32)
            o0 = o0 if isinstance(o0, tuple) else (o0,)
            o1 = o1 if isinstance(o1, tuple) else (o1,)
            for a, b in zip(o0, o1):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b), err_msg=name)

    def test_chain_respects_route_consumers(self):
        """yolov2's passthrough source (conv 512 consumed by route -9
        AND the next pool) and the conv before route (-1,-4) must NOT
        be chained — the round-2 prototype quantized them with the
        sequential next conv's scale and saturated the whole head."""
        from yolo_tpu.configs import get_variant
        from yolo_tpu.configs.specs import Conv, Route, resolve_route

        cfg = get_variant("coco")
        rng = np.random.default_rng(4)
        raw = dw.random_params(cfg.layers, rng, scale=0.05)
        x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)
                                    ).astype(np.float32))
        q = quantize.prepare_int8(
            dataclasses.replace(cfg, input_size=128), raw, x, chain=True)
        conv_at = [i for i, l in enumerate(cfg.layers)
                   if isinstance(l, Conv)]
        route_srcs = set()
        for idx, l in enumerate(cfg.layers):
            if isinstance(l, Route):
                for r in l.layers:
                    route_srcs.add(resolve_route(idx, r))
        for ci, layer_idx in enumerate(conv_at):
            if layer_idx in route_srcs:
                assert "out_scale" not in q[ci], f"conv {ci} feeds a route"
        # the last conv (final head) is never chained
        assert "out_scale" not in q[-1]
        # but most of the backbone is
        assert sum(1 for p in q if "out_scale" in p) >= 15

    def test_int8_maxpool_matches_float_pool(self):
        """maxpool on int8 codes == quantize(maxpool(float)): the
        reduce_window init must be the int8 minimum, not -inf (wrapped
        garbage in the round-2 prototype)."""
        from yolo_tpu.ops.pool import maxpool_nhwc

        rng = np.random.default_rng(5)
        xf = rng.uniform(-2.0, 2.0, (1, 7, 7, 3)).astype(np.float32)
        scale = 2.0 / 127.0
        xq = np.clip(np.round(xf / scale), -127, 127).astype(np.int8)
        for size, stride in ((2, 2), (2, 1), (3, 1)):
            a = np.asarray(maxpool_nhwc(jnp.asarray(xq), size, stride))
            b = np.clip(np.round(np.asarray(
                maxpool_nhwc(jnp.asarray(xf), size, stride)) / scale),
                -127, 127).astype(np.int8)
            np.testing.assert_array_equal(a, b, err_msg=f"{size}s{stride}")

    def test_chained_boxes_match_unchained_at_production_thresholds(self):
        """Full yolov2 (routes + reorg + pool-widened chains): the
        chained detector's boxes agree with unchained int8 on a real
        detection drive (int8 is non-parity vs fp32, but chaining must
        not change WHICH objects are found)."""
        from yolo_tpu.configs import get_variant
        from yolo_tpu.models.predict import detect

        cfg = dataclasses.replace(get_variant("coco"), input_size=128)
        rng = np.random.default_rng(6)
        raw = dw.random_params(cfg.layers, rng, scale=0.03)
        x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)
                                    ).astype(np.float32))
        imgs = (np.asarray(x) * 255).astype(np.uint8)
        q0 = quantize.prepare_int8(cfg, raw, x, chain=False)
        q1 = quantize.prepare_int8(cfg, raw, x, chain=True)
        d0 = detect(cfg, q0, jnp.asarray(imgs), conf_threshold=0.3,
                    head="reference", nms_impl="xla")
        d1 = detect(cfg, q1, jnp.asarray(imgs), conf_threshold=0.3,
                    head="reference", nms_impl="xla")
        v0, v1 = np.asarray(d0["valid"]), np.asarray(d1["valid"])
        assert v0.sum() == v1.sum()
        np.testing.assert_allclose(
            np.asarray(d0["boxes"])[v0.astype(bool)],
            np.asarray(d1["boxes"])[v1.astype(bool)], rtol=0.1, atol=0.05)
