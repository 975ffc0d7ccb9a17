"""Weighted shortcuts — [shortcut] weights_type=per_feature|per_channel
(+ weights_normalization=none|relu|softmax), the AlexeyAB scaled-yolov4
csp-x-family key.

The load-bearing contract is the .weights layout: each weighted
shortcut inserts nweights floats (2 for per_feature, 2*C group-major
for per_channel) between the surrounding conv blocks, in file order —
getting this wrong desynchronizes the whole weights walk. Layout and
forward math are pinned in specs.Shortcut (recall-pinned; reference
tree absent) and enforced here byte-level and against the TF oracle's
independent derivation.
"""

import dataclasses
import io as _io

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from yolo_tpu.configs.darknet_cfg import cfg_to_string, config_from_cfg
from yolo_tpu.configs.specs import (Conv, ModelConfig, Shortcut,
                                    YoloHead, weighted_specs)
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models import graph

WCFG = """
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
filters=8
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
weights_type={wt}
{wn}activation=linear

[convolutional]
size=1
stride=1
pad=1
filters=14
activation=linear

[yolo]
mask = 0,1
anchors = 10,14, 23,27
classes=2
num=2
"""


def _wcfg(tmp_path, wt="per_feature", wn=None):
    text = WCFG.format(wt=wt,
                       wn=f"weights_normalization={wn}\n" if wn else "")
    p = tmp_path / f"w_{wt}_{wn}.cfg"
    p.write_text(text)
    return config_from_cfg(str(p))


@pytest.mark.quick
def test_parse_and_round_trip(tmp_path):
    cfg = _wcfg(tmp_path, "per_channel", "relu")
    sc = [l for l in cfg.layers if isinstance(l, Shortcut)][0]
    assert sc.weights_type == "per_channel"
    assert sc.weights_norm == "relu"
    text = cfg_to_string(cfg)
    assert "weights_type=per_channel" in text
    assert "weights_normalization=relu" in text
    p2 = tmp_path / "rt.cfg"
    p2.write_text(text)
    assert config_from_cfg(str(p2)).layers == cfg.layers


@pytest.mark.quick
def test_per_layer_alias_and_rejections(tmp_path):
    # parser.c accepts per_layer as an alias of per_feature
    cfg = _wcfg(tmp_path, "per_layer")
    sc = [l for l in cfg.layers if isinstance(l, Shortcut)][0]
    assert sc.weights_type == "per_feature"
    with pytest.raises(ValueError, match="weights_type"):
        _wcfg(tmp_path, "per_banana")
    with pytest.raises(ValueError, match="weights_normalization"):
        _wcfg(tmp_path, "per_feature", "l2")
    with pytest.raises(ValueError, match="no weights to normalize"):
        _wcfg(tmp_path, "none", "relu")


@pytest.mark.quick
def test_weighted_shortcut_in_weights_walk(tmp_path):
    cfg = _wcfg(tmp_path, "per_channel")
    specs = weighted_specs(cfg.layers)
    assert [type(s).__name__ for s in specs] == [
        "Conv", "Conv", "Shortcut", "Conv"]


@pytest.mark.quick
def test_byte_level_load(tmp_path):
    """Craft the .weights payload by hand: the shortcut's 2*C floats
    sit BETWEEN conv 2's kernel and conv 3's bias, group-major
    [w_in(0..C), w_from(0..C)]."""
    cfg = _wcfg(tmp_path, "per_channel")
    c = 8
    rng = np.random.default_rng(0)
    payload = []
    # conv1: bn 8 filters, 3x3x3 kernel
    conv1 = [rng.normal(size=(4, c)).astype(np.float32),
             rng.normal(size=(c, 3, 3, 3)).astype(np.float32)]
    # conv2: bn 8 filters, 3x3x8
    conv2 = [rng.normal(size=(4, c)).astype(np.float32),
             rng.normal(size=(c, c, 3, 3)).astype(np.float32)]
    sc_w = np.arange(2 * c, dtype=np.float32) / 10.0  # known bytes
    conv3 = [rng.normal(size=(1, 14)).astype(np.float32),
             rng.normal(size=(14, c, 1, 1)).astype(np.float32)]
    for blk in (conv1, conv2):
        payload += [blk[0].tobytes(), blk[1].tobytes()]
    payload.append(sc_w.tobytes())
    payload += [conv3[0].tobytes(), conv3[1].tobytes()]
    data = (np.asarray([0, 2, 0], np.int32).tobytes()
            + np.asarray([0], np.int64).tobytes() + b"".join(payload))
    params, header = dw.load(_io.BytesIO(data), cfg.layers)
    assert len(params) == 4
    np.testing.assert_array_equal(params[2]["weights"],
                                  sc_w.reshape(2, c))
    # w_in is the first group, w_from the second
    np.testing.assert_array_equal(params[2]["weights"][0], sc_w[:c])
    # save round-trips byte-identically
    out = dw.to_bytes(cfg.layers, params)
    assert out == data


@pytest.mark.quick
def test_per_feature_size_and_partial_boundary(tmp_path):
    cfg = _wcfg(tmp_path, "per_feature")
    rng = np.random.default_rng(1)
    params = dw.random_params(cfg.layers, rng)
    assert params[2]["weights"].shape == (2, 1)
    data = dw.to_bytes(cfg.layers, params)
    re_params, _ = dw.load(_io.BytesIO(data), cfg.layers)
    for p, q in zip(params, re_params):
        for k in p:
            np.testing.assert_array_equal(p[k], q[k])
    # a file truncated INSIDE the shortcut block must fail loudly
    with pytest.raises(ValueError, match="too short"):
        dw.load_partial(_io.BytesIO(data[:-4 * (1 + 14 + 14 * 8)]),
                        cfg.layers)
    from yolo_tpu.io.zoo import expected_weights_bytes

    assert expected_weights_bytes(cfg.layers) == len(data)


@pytest.mark.parametrize("wt", ["per_feature", "per_channel"])
@pytest.mark.parametrize("wn", [None, "relu", "softmax"])
def test_forward_matches_tf_oracle(tmp_path, wt, wn):
    import tests.tf_oracle as tfo

    cfg = _wcfg(tmp_path, wt, wn)
    rng = np.random.default_rng(2)
    params = dw.random_params(cfg.layers, rng)
    # exercise negative blend weights so relu/softmax normalization
    # actually bends values
    params[2]["weights"] = rng.normal(
        0, 1.0, params[2]["weights"].shape).astype(np.float32)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    got = graph.apply_layers(cfg.layers, graph.params_to_jax(params),
                             jnp.asarray(x), eps=cfg.bn_eps)
    want = tfo.run_layers(cfg.layers, params, x, eps=cfg.bn_eps)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.quick
def test_per_feature_forward_math():
    """Hand-computed: out = in*w0 + from*w1 (normalization=none)."""
    layers = (Conv(4, size=1, bn=False, act="linear"),
              Conv(4, size=1, bn=False, act="linear"),
              Shortcut(-2, weights_type="per_feature"))
    rng = np.random.default_rng(3)
    params = dw.random_params(layers, rng)
    params[2]["weights"] = np.asarray([[0.25], [2.0]], np.float32)
    x = rng.normal(size=(1, 2, 2, 3)).astype(np.float32)
    outs = graph.apply_layers(layers, graph.params_to_jax(params),
                              jnp.asarray(x), return_all=True)
    want = np.asarray(outs[1]) * 0.25 + np.asarray(outs[0]) * 2.0
    np.testing.assert_allclose(np.asarray(outs[2]), want,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.quick
def test_per_channel_mismatch_passthrough():
    """Channel-mismatched weighted shortcut: the overlap blends, the
    tail keeps in*w0 (shortcut_multilayer_cpu's src_i < add_outputs)."""
    layers = (Conv(2, size=1, bn=False, act="linear"),
              Conv(4, size=1, bn=False, act="linear"),
              Shortcut(-2, weights_type="per_channel"))
    rng = np.random.default_rng(4)
    params = dw.random_params(layers, rng)
    w = rng.normal(0, 1, (2, 4)).astype(np.float32)
    params[2]["weights"] = w
    x = rng.normal(size=(1, 2, 2, 3)).astype(np.float32)
    outs = graph.apply_layers(layers, graph.params_to_jax(params),
                              jnp.asarray(x), return_all=True)
    src = np.asarray(outs[0])   # 2 channels
    cur = np.asarray(outs[1])   # 4 channels
    want = cur * w[0]
    want[..., :2] += src * w[1, :2]
    np.testing.assert_allclose(np.asarray(outs[2]), want,
                               rtol=1e-5, atol=1e-6)


def test_weighted_shortcut_trains(tmp_path):
    """The blend weights are real trainable params: they receive
    gradient and the loss decreases."""
    from yolo_tpu.data import targets as tgt
    from yolo_tpu.train.loop import (TrainConfig, init_state,
                                     make_train_step)

    cfg = _wcfg(tmp_path, "per_channel", "relu")
    rng = np.random.default_rng(5)
    params = graph.params_to_jax(dw.random_params(cfg.layers, rng,
                                                  scale=0.05))
    tcfg = TrainConfig(learning_rate=5e-3)
    state = init_state(params, tcfg)
    w_before = np.asarray(state["params"][2]["weights"]).copy()
    enc = tgt.encode_batch_for(
        cfg, [np.array([[0.5, 0.5, 0.4, 0.4]])] * 2,
        [np.array([1])] * 2)
    batch = {k: jnp.asarray(v) for k, v in enc.items()}
    batch["images"] = jnp.asarray(
        rng.random((2, 64, 64, 3)).astype(np.float32))
    step = make_train_step(cfg, tcfg)
    losses = []
    for _ in range(20):
        state, metrics = step(state, {k: jnp.copy(v)
                                      for k, v in batch.items()})
        losses.append(float(np.asarray(metrics["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses
    assert not np.allclose(np.asarray(state["params"][2]["weights"]),
                           w_before)


@pytest.mark.quick
def test_fold_params_passthrough(tmp_path):
    cfg = _wcfg(tmp_path, "per_feature")
    rng = np.random.default_rng(6)
    params = dw.random_params(cfg.layers, rng)
    folded = graph.fold_params(cfg.layers, params, cfg.bn_eps)
    np.testing.assert_array_equal(folded[2]["weights"],
                                  params[2]["weights"])
    assert "bias" in folded[0]  # convs still folded


def test_int8_ptq_runs_with_weighted_shortcut(tmp_path):
    """int8 PTQ: the shortcut's blend weights stay fp and the conv
    feeding the weighted shortcut is chain-excluded (consumed by a
    shortcut) — the quantized graph runs and stays close to fp32."""
    from yolo_tpu.models import quantize
    from yolo_tpu.models.predict import forward

    cfg = _wcfg(tmp_path, "per_channel", "softmax")
    rng = np.random.default_rng(7)
    params = dw.random_params(cfg.layers, rng, scale=0.05)
    calib = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)
                                    ).astype(np.float32))
    q = quantize.prepare_int8(cfg, params, calib)
    assert "weights" in q[2] and "kernel_q" not in q[2]
    out_q = forward(cfg, graph.params_to_jax_quant(q), calib,
                    compute_dtype=jnp.bfloat16)
    folded = graph.params_to_jax(
        graph.fold_params(cfg.layers, params, cfg.bn_eps))
    out_f = forward(cfg, folded, calib)
    for a, b in zip(out_q, out_f):
        # int8 is approximate; just require same shape + sane range
        assert np.asarray(a).shape == np.asarray(b).shape
        assert np.isfinite(np.asarray(a)).all()


@pytest.mark.quick
def test_random_params_blend_init_is_darknet_ones(tmp_path):
    """random_params seeds the PRODUCTION partial-init tail (cli
    train), so blend weights must start at darknet's exact init of 1.0
    (make_shortcut_layer) — a jittered init silently diverged fine-tune
    runs from darknet (code-review)."""
    cfg = _wcfg(tmp_path, "per_channel", "softmax")
    params = dw.random_params(cfg.layers, np.random.default_rng(3))
    np.testing.assert_array_equal(params[2]["weights"],
                                  np.ones_like(params[2]["weights"]))


def test_train_partial_backbone_counts_weighted_layers(tmp_path, capsys):
    """Training from a darknet partial whose cutoff includes a weighted
    SHORTCUT: the fresh-tail init must count weighted layers (convs +
    weighted shortcuts), not convs — len(conv_specs) undercounts here
    and the old code skipped the tail init entirely, leaving a short
    params list to crash downstream (code-review)."""
    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli

    text = WCFG.format(wt="per_feature", wn="")
    cfg_path = tmp_path / "wsc.cfg"
    cfg_path.write_text(text)
    names = tmp_path / "wsc.names"
    names.write_text("cat\ndog\n")
    cfg = config_from_cfg(str(cfg_path))
    # full weighted walk: conv0, conv1, shortcut, conv2 -> 4 weighted,
    # but only 3 convs. Partial cutoff 3 = both backbone convs + the
    # shortcut blend weights; the head conv must be randomly appended.
    params = dw.random_params(cfg.layers, np.random.default_rng(0),
                              scale=0.05)
    backbone = str(tmp_path / "wsc.conv.3")
    dw.save(backbone, cfg.layers, params, cutoff_convs=3)

    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
    cli.main(["train", "--cfg", str(cfg_path), "--names", str(names),
              "--weights", backbone, "--voc-root", root,
              "--split", "train", "--batch", "8", "--epochs", "1",
              "--precision", "fp32"])
    err = capsys.readouterr().err
    assert "partial init: 3/4 weighted layers" in err
