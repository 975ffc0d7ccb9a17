"""Grayscale nets ([net] channels=1) — end-to-end coverage.

darknet's OpenCV image loader supports exactly channels=1
(cv2.IMREAD_GRAYSCALE, BT.601 luma) and channels=3 (RGB); SURVEY.md
§2.1 'Config' requires any darknet cfg to run unmodified. These tests
pin the channel plumbing end-to-end: cfg parse + round-trip (+ the
loud reject for other counts), weights IO at in_c=1, host decode,
device/numpy/native letterbox at C=1, the grayscale augmentation
semantics (exposure-only HSV, RNG draw parity with the RGB path),
mosaic/classifier preprocess/viz channel handling, forward parity vs
the TF oracle, detect_raw box un-mapping, a train step, the data
pipeline, video batches, and the CLI predict surface.
"""

import json
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from yolo_tpu.configs.darknet_cfg import cfg_to_string, config_from_cfg
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph
from yolo_tpu.ops import numpy_ref as npr

GRAY_REGION_CFG = """
[net]
width=96
height=96
channels=1

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


def _cfg_from_text(tmp_path, text, name="gray"):
    p = tmp_path / f"{name}.cfg"
    p.write_text(text)
    return config_from_cfg(str(p))


def _params(cfg, seed=5, scale=0.05):
    rng = np.random.default_rng(seed)
    return graph.params_to_jax(
        dw.random_params(cfg.layers, rng, input_channels=cfg.in_channels,
                         scale=scale))


# ---------------------------------------------------------------------------
# cfg / config surface
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_parse_gray_cfg_and_round_trip(tmp_path):
    cfg = _cfg_from_text(tmp_path, GRAY_REGION_CFG)
    assert cfg.in_channels == 1
    assert cfg.input_hw == (96, 96)
    text = cfg_to_string(cfg)
    assert "channels=1" in text
    p2 = tmp_path / "rt.cfg"
    p2.write_text(text)
    cfg2 = config_from_cfg(str(p2))
    assert cfg2.in_channels == 1
    assert cfg2.layers == cfg.layers


@pytest.mark.quick
def test_unsupported_channel_counts_reject(tmp_path):
    """channels outside {1, 3} reject at parse — darknet's own OpenCV
    loader errors on any other count."""
    for c in (0, 2, 4):
        bad = GRAY_REGION_CFG.replace("channels=1", f"channels={c}")
        with pytest.raises(ValueError, match="channels"):
            _cfg_from_text(tmp_path, bad, name=f"c{c}")


@pytest.mark.quick
def test_gray_weights_round_trip_and_size(tmp_path):
    """in_c=1 sizes the FIRST conv kernel (3,3,1,8); save/load
    round-trips byte-exactly and the zoo size formula agrees."""
    from yolo_tpu.io.zoo import expected_weights_bytes

    cfg = _cfg_from_text(tmp_path, GRAY_REGION_CFG)
    rng = np.random.default_rng(0)
    params = dw.random_params(cfg.layers, rng, input_channels=1,
                              scale=0.05)
    assert params[0]["kernel"].shape == (3, 3, 1, 8)
    wpath = str(tmp_path / "g.weights")
    dw.save(wpath, cfg.layers, params)
    assert os.path.getsize(wpath) == expected_weights_bytes(cfg.layers, 1)
    loaded, _ = dw.load(wpath, cfg.layers, input_channels=1)
    for a, b in zip(params, loaded):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # an RGB-sized file does NOT fit the grayscale walk
    rgb = dw.random_params(cfg.layers, rng, input_channels=3, scale=0.05)
    wpath3 = str(tmp_path / "rgb.weights")
    dw.save(wpath3, cfg.layers, rgb)
    with pytest.raises(ValueError):
        dw.load(wpath3, cfg.layers, input_channels=1)


# ---------------------------------------------------------------------------
# host decode + letterbox (device / numpy oracle / native wrapper)
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_gray_load_image_matches_cv2(tmp_path):
    """channels=1 decodes with cv2.IMREAD_GRAYSCALE (darknet-OpenCV's
    exact grayscale path) -> (H, W, 1) uint8."""
    import cv2

    from yolo_tpu.data.pipeline import load_image

    rng = np.random.default_rng(1)
    p = str(tmp_path / "t.png")
    cv2.imwrite(p, rng.integers(0, 255, (40, 60, 3), dtype=np.uint8))
    g = load_image(p, 1)
    assert g.shape == (40, 60, 1) and g.dtype == np.uint8
    np.testing.assert_array_equal(g[..., 0],
                                  cv2.imread(p, cv2.IMREAD_GRAYSCALE))
    # channels=3 stays the RGB loader
    assert load_image(p, 3).shape == (40, 60, 3)
    with pytest.raises(ValueError, match="channels=2"):
        load_image(p, 2)


@pytest.mark.quick
def test_gray_letterbox_matches_oracle():
    from yolo_tpu.ops.letterbox import letterbox

    rng = np.random.default_rng(2)
    for src in ((50, 73), (120, 40)):
        img = rng.integers(0, 255, (2, *src, 1), dtype=np.uint8)
        out = np.asarray(letterbox(jnp.asarray(img), 96))
        ref = np.stack([npr.letterbox(i, 96, 96)[0] for i in img])
        assert out.shape == (2, 96, 96, 1)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_gray_native_letterbox_batch_matches_oracle():
    """letterbox_batch at C=1 takes the numpy/cv2 oracle path (the C++
    kernel is RGB-only) with identical semantics."""
    from yolo_tpu.native import preproc

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (3, 77, 51, 1), dtype=np.uint8)
    out = preproc.letterbox_batch(img, 96, n_threads=2)
    ref = np.stack([npr.letterbox(i, 96, 96)[0] for i in img])
    assert out.shape == (3, 96, 96, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_gray_stretch_resize_keeps_channel_axis():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (37, 61, 1), dtype=np.uint8)
    out = npr.stretch_resize(img, 96, 64)
    assert out.shape == (64, 96, 1)


# ---------------------------------------------------------------------------
# augmentation semantics
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_gray_distort_is_exposure_only_with_rgb_draw_parity():
    """Grayscale HSV distortion is darknet's exposure-only scale, and
    the RNG draw SEQUENCE matches the RGB path (hue + sat draws still
    consumed) so one seed produces the same exposure in both modes."""
    from yolo_tpu.data.augment import AugmentConfig, _rand_scale, distort_hsv

    cfg = AugmentConfig(hue=0.1, saturation=1.5, exposure=1.5)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (32, 48, 1), dtype=np.uint8)

    got = distort_hsv(img, np.random.default_rng(11), cfg)
    # manual replay: hue and saturation draws happen, only exposure acts
    r = np.random.default_rng(11)
    r.uniform(-cfg.hue, cfg.hue)
    _rand_scale(r, cfg.saturation)
    dexp = _rand_scale(r, cfg.exposure)
    want = np.clip(np.rint(img.astype(np.float32) * dexp),
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    assert got.shape == img.shape

    # draw-count parity with the RGB path: after distorting, both
    # generators are at the same state
    r_gray = np.random.default_rng(13)
    r_rgb = np.random.default_rng(13)
    distort_hsv(img, r_gray, cfg)
    distort_hsv(np.repeat(img, 3, axis=-1), r_rgb, cfg)
    assert r_gray.uniform() == r_rgb.uniform()

    # parse defaults still no-op
    same = distort_hsv(img, np.random.default_rng(0),
                       AugmentConfig(hue=0, saturation=1, exposure=1))
    np.testing.assert_array_equal(same, img)


@pytest.mark.quick
def test_gray_mosaic4_canvas_is_single_channel():
    from yolo_tpu.data.augment import mosaic4

    rng = np.random.default_rng(8)
    samples = []
    for _ in range(4):
        img = rng.integers(0, 255, (40, 50, 1), dtype=np.uint8)
        samples.append((img, np.array([[0.5, 0.5, 0.4, 0.4]], np.float32),
                        np.array([0])))
    canvas, boxes, classes = mosaic4(samples, 96, rng)
    assert canvas.shape == (96, 96, 1) and canvas.dtype == np.uint8
    assert len(boxes) == len(classes)


@pytest.mark.quick
def test_gray_jitter_crop_keeps_channel_axis():
    from yolo_tpu.data.augment import AugmentConfig, jitter_crop

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (40, 50, 1), dtype=np.uint8)
    boxes = np.array([[0.5, 0.5, 0.4, 0.4]], np.float32)
    for seed in range(8):   # hit both zoom-in and zoom-out draws
        out, b, c = jitter_crop(img, boxes, np.array([0]),
                                np.random.default_rng(seed),
                                AugmentConfig(jitter=0.3))
        assert out.ndim == 3 and out.shape[2] == 1


@pytest.mark.quick
def test_gray_classifier_preprocess_and_viz():
    from yolo_tpu.models.classify import classifier_preprocess
    from yolo_tpu.utils.viz import draw_detections

    rng = np.random.default_rng(10)
    img = rng.integers(0, 255, (50, 70, 1), dtype=np.uint8)
    x = classifier_preprocess(img, 64)
    assert x.shape == (64, 64, 1)
    # viz expands grayscale to RGB so annotation colors render
    out = draw_detections(img, np.array([[5.0, 5.0, 30.0, 30.0]]),
                          np.array([0.9]), np.array([0]), ("cat",))
    assert out.shape == (50, 70, 3)


# ---------------------------------------------------------------------------
# forward / detect / train
# ---------------------------------------------------------------------------

def test_gray_tf_oracle_logits_parity(tmp_path):
    """JAX forward == TF oracle with a 1-channel input stack."""
    import tests.tf_oracle as tfo
    from yolo_tpu.models import predict
    from yolo_tpu.ops.letterbox import letterbox

    cfg = _cfg_from_text(tmp_path, GRAY_REGION_CFG)
    params = _params(cfg, seed=7, scale=0.1)
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (1, 80, 110, 1), dtype=np.uint8)
    x = np.asarray(letterbox(jnp.asarray(img), cfg.input_hw))
    got = predict.forward(cfg, params, jnp.asarray(x))
    want = tfo.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gray_detect_raw_boxes_land_in_source(tmp_path):
    from yolo_tpu.models.predict import detect_raw

    cfg = _cfg_from_text(tmp_path, GRAY_REGION_CFG)
    params = _params(cfg)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (1, 73, 120, 1), dtype=np.uint8)
    for resize in ("letterbox", "stretch"):
        dets = detect_raw(cfg, params, jnp.asarray(img),
                          conf_threshold=0.01, resize=resize)
        v = np.asarray(dets["valid"])[0].astype(bool)
        assert v.any(), f"no detections to check ({resize})"
        xyxy = np.asarray(dets["boxes"])[0][v]
        assert (xyxy[:, 0] >= 0).all() and (xyxy[:, 2] <= 120).all()
        assert (xyxy[:, 1] >= 0).all() and (xyxy[:, 3] <= 73).all()


def test_gray_train_step_decreases_loss(tmp_path):
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step

    cfg = _cfg_from_text(tmp_path, GRAY_REGION_CFG)
    rng = np.random.default_rng(11)
    params = _params(cfg, seed=11)
    tcfg = TrainConfig(learning_rate=5e-3)
    state = init_state(params, tcfg)
    enc = tgt.encode_batch_for(cfg, [np.array([[0.3, 0.5, 0.2, 0.3]]),
                                     np.array([[0.7, 0.25, 0.4, 0.2]])],
                               [np.array([1]), np.array([0])])
    batch = {k: jnp.asarray(v) for k, v in enc.items()}
    batch["images"] = jnp.asarray(
        rng.random((2, 96, 96, 1)).astype(np.float32))
    step = make_train_step(cfg, tcfg)
    losses = []
    for _ in range(25):
        state, metrics = step(state, {k: jnp.copy(v)
                                      for k, v in batch.items()})
        losses.append(float(np.asarray(metrics["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses


def test_gray_prewarm_compiles_single_channel(tmp_path):
    """prewarm builds its throwaway batch at mcfg.in_channels — a
    3-channel prewarm batch would crash the first conv (kernel in_c=1)
    before the real data ever arrived."""
    from yolo_tpu.train.loop import (TrainConfig, init_state,
                                     make_train_step, prewarm)

    cfg = _cfg_from_text(tmp_path, GRAY_REGION_CFG)
    tcfg = TrainConfig(learning_rate=1e-3)
    state = init_state(_params(cfg), tcfg)
    step = make_train_step(cfg, tcfg)
    prewarm(step, state, cfg, [96], batch_size=1)


# ---------------------------------------------------------------------------
# data pipeline + video + CLI
# ---------------------------------------------------------------------------

def test_gray_train_batches_shapes(tmp_path):
    from tests.test_data_eval import make_voc_root
    from yolo_tpu.data import pipeline as pipe
    from yolo_tpu.data.voc import list_split

    root = make_voc_root(tmp_path, n_images=4)
    pairs = list_split(root, "train")
    b = next(pipe.train_batches(
        pairs, class_names=("cat", "dog"),
        anchors=((1.0, 1.0), (2.0, 2.0)), num_classes=2, net_size=96,
        batch_size=2, rng=np.random.default_rng(0), workers=1,
        shuffle=False, channels=1))
    assert b["images"].shape == (2, 96, 96, 1)
    assert b["images"].dtype == np.float32


def test_gray_inference_batches_shapes(tmp_path):
    import cv2

    from yolo_tpu.data.pipeline import inference_batches

    rng = np.random.default_rng(12)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"i{i}.png")
        cv2.imwrite(p, rng.integers(0, 255, (50, 60, 3), dtype=np.uint8))
        paths.append(p)
    batches = list(inference_batches(paths, 2, net_size=96, channels=1))
    assert all(b["images"].shape[-1] == 1 for b in batches)
    assert batches[0]["images"].shape == (2, 96, 96, 1)


def test_gray_video_batches(tmp_path):
    from tests.test_video import _write_video
    from yolo_tpu.data.video import video_batches

    p = _write_video(tmp_path / "v.avi", n_frames=4)
    batches = list(video_batches(p, batch_size=2, channels=1))
    assert [b["images"].shape for b in batches] == [(2, 48, 64, 1)] * 2


def test_gray_cli_predict_e2e(tmp_path, capsys):
    """predict --cfg <channels=1 cfg>: full CLI wiring — config parse,
    weights load at in_c=1, grayscale decode, detect, viz output."""
    import cv2

    from yolo_tpu import cli

    cfg_path = tmp_path / "gray.cfg"
    cfg_path.write_text(GRAY_REGION_CFG)
    cfg = config_from_cfg(str(cfg_path))
    wpath = str(tmp_path / "g.weights")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0),
                             input_channels=1, scale=0.05))
    img_path = str(tmp_path / "in.png")
    cv2.imwrite(img_path, np.random.default_rng(1).integers(
        0, 255, (80, 100, 3), dtype=np.uint8))
    out_img = str(tmp_path / "out.png")
    cli.main(["predict", "--cfg", str(cfg_path), "--weights", wpath,
              "--image", img_path, "--conf", "0.05",
              "--precision", "fp32", "--output", out_img])
    for line in capsys.readouterr().out.strip().splitlines():
        d = json.loads(line)
        assert set(d) == {"class", "score", "box_xyxy"}
    assert os.path.exists(out_img)
