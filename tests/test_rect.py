"""Rectangular nets ([net] width != height) — end-to-end coverage.

Darknet's [net] width/height are independent cfg keys (rectangular nets
are a normal AlexeyAB video workflow); SURVEY.md §2.1 'Config' requires
any darknet cfg to run unmodified. These tests pin the full geometry
chain at W != H: cfg parse + round-trip, letterbox (jax / numpy oracle /
native C++), [yolo] and [region] decode vs the loop oracles, TF-oracle
logits parity, GT encoding, both families' train steps, the fused
multi-head identity, and the box un-mapping back to source pixels.
"""

import dataclasses

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from yolo_tpu.configs.darknet_cfg import (cfg_to_string, config_from_cfg)
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.ops import numpy_ref as npr

RECT_YOLO_CFG = """
[net]
width=192
height=128

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
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=18
activation=linear

[yolo]
mask = 2,3
anchors = 10,14, 23,27, 37,58, 81,82
classes=4
num=4
ignore_thresh = .7

[route]
layers = -3

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[upsample]
stride=2

[convolutional]
size=1
stride=1
pad=1
filters=18
activation=linear

[yolo]
mask = 0,1
anchors = 10,14, 23,27, 37,58, 81,82
classes=4
num=4
ignore_thresh = .7
"""

RECT_REGION_CFG = """
[net]
width=96
height=64

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=21
activation=linear

[region]
anchors = 1.08,1.19, 3.42,4.41, 6.63,11.38
classes=2
num=3
"""


def _cfg_from_text(tmp_path, text, name):
    p = tmp_path / f"{name}.cfg"
    p.write_text(text)
    return config_from_cfg(str(p))


def _params(cfg, seed=5, scale=0.05):
    rng = np.random.default_rng(seed)
    return graph.params_to_jax(dw.random_params(cfg.layers, rng,
                                                scale=scale))


def _assert_dets_equal(want, got, rtol=1e-5, atol=1e-6):
    vw = np.asarray(want["valid"]).astype(bool)
    vg = np.asarray(got["valid"]).astype(bool)
    assert vw.sum() == vg.sum()
    for k in ("boxes", "scores"):
        np.testing.assert_allclose(np.asarray(want[k])[vw],
                                   np.asarray(got[k])[vg],
                                   rtol=rtol, atol=atol)
    np.testing.assert_array_equal(np.asarray(want["classes"])[vw],
                                  np.asarray(got["classes"])[vg])


# ---------------------------------------------------------------------------
# cfg / config surface
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_parse_rect_cfg_and_round_trip(tmp_path):
    cfg = _cfg_from_text(tmp_path, RECT_YOLO_CFG, "rect_v3")
    assert cfg.input_hw == (128, 192)
    assert cfg.input_h == 128 and cfg.input_w == 192
    assert cfg.head_kind == "yolo"
    text = cfg_to_string(cfg)
    assert "width=192" in text and "height=128" in text
    # re-parse the emitted text: geometry survives the round trip
    p2 = tmp_path / "rt.cfg"
    p2.write_text(text)
    cfg2 = config_from_cfg(str(p2))
    assert cfg2.input_hw == (128, 192)
    assert cfg2.layers == cfg.layers


@pytest.mark.quick
def test_rect_resize_contract(tmp_path):
    cfg = _cfg_from_text(tmp_path, RECT_YOLO_CFG, "rect_v3")
    # with_input_size would silently square a rect net — rejected
    with pytest.raises(ValueError, match="with_input_hw"):
        cfg.with_input_size(416)
    # explicit rect resize works and keeps/clears input_width correctly
    r = cfg.with_input_hw(256, 384)
    assert r.input_hw == (256, 384)
    sq = cfg.with_input_hw(160, 160)
    assert sq.input_hw == (160, 160) and sq.input_width is None
    with pytest.raises(ValueError, match="multiple of 32"):
        cfg.with_input_hw(100, 192)
    # grid helpers
    assert cfg.grid_hw == (4, 6)
    with pytest.raises(ValueError, match="grid_hw"):
        cfg.grid_size


@pytest.mark.quick
def test_rect_region_cfg_parses(tmp_path):
    cfg = _cfg_from_text(tmp_path, RECT_REGION_CFG, "rect_v2")
    assert cfg.input_hw == (64, 96)
    assert cfg.head_kind == "region"
    assert cfg.grid_hw == (2, 3)


# ---------------------------------------------------------------------------
# letterbox geometry (jax / numpy oracle / native C++)
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_rect_letterbox_matches_oracle():
    from yolo_tpu.ops.letterbox import letterbox

    rng = np.random.default_rng(0)
    for src in ((50, 173), (200, 90), (128, 192)):
        img = rng.integers(0, 255, (2, *src, 3), dtype=np.uint8)
        out = np.asarray(letterbox(jnp.asarray(img), (128, 192)))
        ref = np.stack([npr.letterbox(i, 192, 128)[0] for i in img])
        assert out.shape == (2, 128, 192, 3)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_rect_native_letterbox_matches_oracle():
    from yolo_tpu.native import preproc

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (3, 77, 131, 3), dtype=np.uint8)
    out = preproc.letterbox_batch(img, (128, 192), n_threads=2)
    ref = np.stack([npr.letterbox(i, 192, 128)[0] for i in img])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_rect_letterbox_boxes_round_trip():
    """host letterbox_boxes -> device unletterbox is the identity on
    source boxes, at a rect canvas."""
    from yolo_tpu.data.pipeline import letterbox_boxes
    from yolo_tpu.ops.letterbox import unletterbox_boxes_xyxy

    src_h, src_w = 97, 211
    boxes = np.array([[0.5, 0.5, 0.4, 0.2],
                      [0.25, 0.75, 0.1, 0.3]], np.float32)
    net = (128, 192)
    in_net = letterbox_boxes(boxes, src_w, src_h, net)
    back = np.asarray(unletterbox_boxes_xyxy(
        jnp.asarray(in_net), src_h=src_h, src_w=src_w, net_size=net))
    want_xyxy = np.stack([
        (boxes[:, 0] - boxes[:, 2] / 2) * src_w,
        (boxes[:, 1] - boxes[:, 3] / 2) * src_h,
        (boxes[:, 0] + boxes[:, 2] / 2) * src_w,
        (boxes[:, 1] + boxes[:, 3] / 2) * src_h], axis=-1)
    np.testing.assert_allclose(back, want_xyxy, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# decode parity vs the loop oracles
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_rect_yolo_decode_matches_oracle(tmp_path):
    from yolo_tpu.ops.decode import decode_yolo

    cfg = _cfg_from_text(tmp_path, RECT_YOLO_CFG, "rect_v3")
    rng = np.random.default_rng(3)
    masks = [h.mask for h in cfg.yolo_heads]
    heads = [rng.normal(size=(1, 128 // st, 192 // st,
                              2 * (5 + 4))).astype(np.float32)
             for st in (8, 4)]
    bj, sj = decode_yolo([jnp.asarray(h) for h in heads], cfg.anchors,
                         masks, cfg.num_classes, cfg.input_hw)
    bo, so = npr.decode_yolo([h[0] for h in heads], cfg.anchors, masks,
                             cfg.num_classes, cfg.input_hw)
    np.testing.assert_allclose(np.asarray(bj)[0], bo, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sj)[0], so, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.quick
def test_rect_region_decode_matches_oracle(tmp_path):
    from yolo_tpu.ops.decode import decode

    cfg = _cfg_from_text(tmp_path, RECT_REGION_CFG, "rect_v2")
    rng = np.random.default_rng(4)
    gh, gw = cfg.grid_hw
    logits = rng.normal(size=(1, gh, gw,
                              3 * (5 + 2))).astype(np.float32)
    bj, sj = decode(jnp.asarray(logits), cfg.anchors, cfg.num_classes)
    bo, so = npr.decode(logits[0], cfg.anchors, cfg.num_classes)
    np.testing.assert_allclose(np.asarray(bj)[0], bo, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sj)[0], so, rtol=1e-5,
                               atol=1e-6)


def test_rect_tf_oracle_logits_parity(tmp_path):
    """JAX forward == TF oracle, layer stack run at the rect size."""
    import tests.tf_oracle as tfo
    from yolo_tpu.models import predict
    from yolo_tpu.ops.letterbox import letterbox

    cfg = _cfg_from_text(tmp_path, RECT_YOLO_CFG, "rect_v3")
    params = _params(cfg, seed=7, scale=0.1)
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (1, 97, 211, 3), dtype=np.uint8)
    x = np.asarray(letterbox(jnp.asarray(img), cfg.input_hw))
    got = predict.forward(cfg, params, jnp.asarray(x))
    want = tfo.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# fused head identity + e2e box un-mapping
# ---------------------------------------------------------------------------

def test_rect_fused_head_identity(tmp_path):
    from yolo_tpu.models.predict import detect

    cfg = _cfg_from_text(tmp_path, RECT_YOLO_CFG, "rect_v3")
    cfg = dataclasses.replace(cfg, conf_threshold=0.4)
    params = _params(cfg, seed=5, scale=0.05)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 192, 3)
                                ).astype(np.float32))
    want = detect(cfg, params, x, head="reference", nms_impl="xla")
    got = detect(cfg, params, x, head="fused")
    _assert_dets_equal(want, got)


def test_rect_e2e_boxes_land_in_source(tmp_path):
    """detect_raw on a rect net returns source-pixel xyxy inside the
    original image extents (letterbox AND stretch resize modes)."""
    from yolo_tpu.models.predict import detect_raw

    cfg = _cfg_from_text(tmp_path, RECT_YOLO_CFG, "rect_v3")
    params = _params(cfg, seed=5, scale=0.05)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (1, 73, 240, 3), dtype=np.uint8)
    for resize in ("letterbox", "stretch"):
        dets = detect_raw(cfg, params, jnp.asarray(img),
                          conf_threshold=0.01, head="reference",
                          resize=resize)
        v = np.asarray(dets["valid"])[0].astype(bool)
        assert v.any(), f"no detections to check ({resize})"
        xyxy = np.asarray(dets["boxes"])[0][v]
        assert (xyxy[:, 0] >= 0).all() and (xyxy[:, 2] <= 240).all()
        assert (xyxy[:, 1] >= 0).all() and (xyxy[:, 3] <= 73).all()
        assert (xyxy[:, 2] >= xyxy[:, 0]).all()
        assert (xyxy[:, 3] >= xyxy[:, 1]).all()


# ---------------------------------------------------------------------------
# GT encoding + training
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_rect_encode_yolo_geometry(tmp_path):
    """A GT box lands in the per-axis correct cell with per-axis wh
    targets (darknet delta_yolo_box: tw = log(w*net_w/anchor_w))."""
    from yolo_tpu.data import targets as tgt

    cfg = _cfg_from_text(tmp_path, RECT_YOLO_CFG, "rect_v3")
    # box centered at (0.75, 0.25): on the stride-8 head (16x24 grid:
    # gh=16, gw=24) -> cell ci=18, cj=4
    boxes = np.array([[0.75, 0.25, 81 / 192, 82 / 128]])
    classes = np.array([1])
    enc = tgt.encode_for(cfg, boxes, classes)
    assert enc["obj_mask_0"].shape == (16, 24, 2)
    assert enc["obj_mask_1"].shape == (32, 48, 2)
    # best anchor for 81x82 px is anchor 3 (81,82) -> head 0 slot 1
    cj, ci = 4, 18
    assert enc["obj_mask_0"][cj, ci, 1] == 1.0
    tc = enc["tcoord_0"][cj, ci, 1]
    np.testing.assert_allclose(tc[0], 0.75 * 24 - 18, atol=1e-6)
    np.testing.assert_allclose(tc[1], 0.25 * 16 - 4, atol=1e-6)
    # wh targets: log(w*net_w/pw) = log(81/81) = 0, same for h
    np.testing.assert_allclose(tc[2], 0.0, atol=1e-6)
    np.testing.assert_allclose(tc[3], 0.0, atol=1e-6)


@pytest.mark.quick
def test_rect_encode_region_geometry(tmp_path):
    from yolo_tpu.data import targets as tgt

    cfg = _cfg_from_text(tmp_path, RECT_REGION_CFG, "rect_v2")
    # grid (gh=2, gw=3); center (0.9, 0.4) -> ci=2, cj=0
    boxes = np.array([[0.9, 0.4, 0.5, 0.5]])
    enc = tgt.encode_for(cfg, boxes, np.array([0]))
    assert enc["obj_mask"].shape == (2, 3, 3)
    assert enc["obj_mask"][0, 2].sum() == 1.0
    slot = int(np.argmax(enc["obj_mask"][0, 2]))
    tc = enc["tcoord"][0, 2, slot]
    np.testing.assert_allclose(tc[0], 0.9 * 3 - 2, atol=1e-6)
    np.testing.assert_allclose(tc[1], 0.4 * 2 - 0, atol=1e-6)
    # per-axis cell-unit wh: log(w*gw/pw), log(h*gh/ph)
    pw, ph = cfg.anchors[slot]
    np.testing.assert_allclose(tc[2], np.log(0.5 * 3 / pw), atol=1e-6)
    np.testing.assert_allclose(tc[3], np.log(0.5 * 2 / ph), atol=1e-6)


def _overfit(cfg, steps=25, lr=5e-3):
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step

    rng = np.random.default_rng(11)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    params = graph.params_to_jax(params)
    tcfg = TrainConfig(learning_rate=lr)
    state = init_state(params, tcfg)
    boxes = [np.array([[0.3, 0.5, 0.2, 0.3]]),
             np.array([[0.7, 0.25, 0.4, 0.2]])]
    classes = [np.array([1]), np.array([0])]
    enc = tgt.encode_batch_for(cfg, boxes, classes)
    batch = {k: jnp.asarray(v) for k, v in enc.items()}
    batch["images"] = jnp.asarray(
        rng.random((2, cfg.input_h, cfg.input_w, 3)).astype(np.float32))
    step = make_train_step(cfg, tcfg)
    losses = []
    for _ in range(steps):
        state, metrics = step(state, {k: jnp.copy(v)
                                      for k, v in batch.items()})
        losses.append(float(np.asarray(metrics["loss"])))
    return losses


def test_rect_yolo_train_step_decreases_loss(tmp_path):
    cfg = _cfg_from_text(tmp_path, RECT_YOLO_CFG, "rect_v3")
    losses = _overfit(cfg)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses


def test_rect_region_train_step_decreases_loss(tmp_path):
    cfg = _cfg_from_text(tmp_path, RECT_REGION_CFG, "rect_v2")
    losses = _overfit(cfg)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses


# ---------------------------------------------------------------------------
# multi-scale on rectangular nets (aspect-preserving buckets)
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_proportional_sizes_ladder():
    """AlexeyAB resizes BOTH dims by one factor in [1/coef, coef]
    (detector.c; random=1 means coef 1.4): the bucket ladder steps the
    long side through its /32 ladder and scales the short side
    proportionally, floor 32, cfg size always a member."""
    from yolo_tpu.train.loop import proportional_sizes

    # 416x256 (w x h) at the default 1.4 coefficient, hand-derived:
    # long=416, lo=round(416/1.4/32)*32=288, hi=round(416*1.4/32)*32=576
    assert proportional_sizes(256, 416, 1.4) == (
        (192, 288), (192, 320), (224, 352), (224, 384), (256, 416),
        (288, 448), (288, 480), (320, 512), (320, 544), (352, 576))
    # square nets degrade to the plain /32 range ladder
    assert proportional_sizes(416, 416, 1.3) == tuple(
        (s, s) for s in range(320, 545, 32))
    # short side floors at 32; cfg size is a member even when tiny
    assert proportional_sizes(32, 64, 1.3) == ((32, 64), (64, 96))
    # aspect carries through when H is the long side (portrait)
    assert proportional_sizes(416, 256, 1.4) == tuple(
        (w, h) for (h, w) in proportional_sizes(256, 416, 1.4))
    with pytest.raises(ValueError):
        proportional_sizes(128, 192, 1.0)


@pytest.mark.quick
def test_pick_scale_tuple_buckets():
    """pick_scale returns (h, w) tuples untouched on resize boundaries
    and None elsewhere (the caller keeps the previous bucket)."""
    from yolo_tpu.train.loop import pick_scale

    sizes = ((128, 192), (160, 224), (192, 288))
    rng = np.random.default_rng(7)
    draws = [pick_scale(s, rng, 10, sizes) for s in range(40)]
    for i, d in enumerate(draws):
        if i % 10:
            assert d is None
        else:
            assert d in sizes and isinstance(d, tuple)
    # square ladders keep returning plain ints
    assert isinstance(pick_scale(0, rng, 10, (320, 352)), int)


@pytest.mark.quick
def test_parse_multi_scale_sizes_tokens(tmp_path):
    """--multi-scale-sizes: WIDTHxHEIGHT tokens become internal (h, w)
    buckets; bare square ints on a rect net reject (they would change
    the cfg's aspect silently)."""
    from yolo_tpu.cli.train_cmd import _parse_multi_scale_sizes

    rect = _cfg_from_text(tmp_path, RECT_REGION_CFG, "rect_v2")
    assert _parse_multi_scale_sizes("96x64,128x96", rect) == \
        ((64, 96), (96, 128))
    with pytest.raises(SystemExit, match="WIDTHxHEIGHT"):
        _parse_multi_scale_sizes("64,96", rect)

    from yolo_tpu.configs import get_variant

    square = get_variant("tiny-voc", input_size=64)
    assert _parse_multi_scale_sizes("64,96", square) == (64, 96)
    # explicit rect buckets are allowed on a square net too
    assert _parse_multi_scale_sizes("96x64", square) == ((64, 96),)


def test_rect_multi_scale_train_batches_and_step(tmp_path):
    """A rect bucket OTHER than the cfg size flows through GT encoding
    and the jitted train step (per-size jit bucket)."""
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step

    cfg = _cfg_from_text(tmp_path, RECT_REGION_CFG, "rect_v2")
    rng = np.random.default_rng(3)
    params = graph.params_to_jax(dw.random_params(cfg.layers, rng,
                                                  scale=0.05))
    tcfg = TrainConfig(learning_rate=1e-3)
    state = init_state(params, tcfg)
    step = make_train_step(cfg, tcfg)
    for hw in ((64, 96), (96, 128)):  # two non-cfg buckets
        enc = tgt.encode_batch_for(
            cfg, [np.array([[0.4, 0.5, 0.3, 0.4]])], [np.array([1])],
            input_size=hw)
        batch = {k: jnp.asarray(v) for k, v in enc.items()}
        batch["images"] = jnp.asarray(
            rng.random((1, hw[0], hw[1], 3), ).astype(np.float32))
        state, metrics = step(state, batch)
        assert np.isfinite(float(np.asarray(metrics["loss"])))


@pytest.mark.slow
def test_rect_cfg_random_multi_scale_cli_e2e(tmp_path, capsys):
    """cfg random=1.3 on a RECT net trains with aspect-preserving
    buckets (the old loud 'ignored: square buckets' path is gone)."""
    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli

    text = RECT_REGION_CFG.replace("[region]\n",
                                   "[region]\nrandom=1.3\n", 1)
    p = tmp_path / "rect_ms.cfg"
    p.write_text("".join(text))
    (tmp_path / "m.names").write_text("a\nb\n")
    cfg = config_from_cfg(str(p))
    w = tmp_path / "w.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=16, size=(70, 80))
    cli.main(["train", "--cfg", str(p), "--names",
              str(tmp_path / "m.names"), "--weights", str(w),
              "--voc-root", root, "--split", "train", "--batch", "8",
              "--epochs", "2", "--precision", "fp32", "--lr", "1e-4",
              "--seed", "5", "--log-every", "1"])
    err = capsys.readouterr().err
    assert "aspect-preserving multi-scale buckets" in err
    # ladder for 96x64 at coef 1.3: 64x32, 96x64, 128x96 (wxh)
    assert "64x32,96x64,128x96" in err
