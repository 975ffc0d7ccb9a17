"""Darknet .cfg parser tests (configs/darknet_cfg.py): the pinned
variants must be reproducible from their cfg files, and arbitrary
yolov2-family cfgs must run end-to-end."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast inner-loop tier (CLAUDE.md)
# (multi-second CLI train e2es live in test_cli.py — default tier —
#  to keep -m quick at its ~5 min billing)

from yolo_tpu.configs.darknet_cfg import (config_from_cfg, load_names,
                                          parse_cfg)
from yolo_tpu.configs.variants import (COCO_ANCHORS, TINY_VOC_ANCHORS,
                                       TINY_YOLOV2_VOC, YOLOV2_COCO)

TINY_VOC_CFG = """\
[net]
# training keys are ignored by inference builds
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
filters=1024
size=3
pad=1
activation=leaky

[convolutional]
filters=125
size=1
activation=linear

[region]
anchors = 1.08,1.19,  3.42,4.41,  6.63,11.38,  9.42,5.11,  16.62,10.52
classes=20
num=5
thresh=0.6
"""


def _full_coco_cfg():
    """yolov2.cfg reconstructed from the pinned layer map."""
    conv = ("[convolutional]\nbatch_normalize=1\nfilters={f}\nsize={s}\n"
            "pad=1\nactivation=leaky\n\n")
    mp = "[maxpool]\nsize=2\nstride=2\n\n"
    body = "[net]\nwidth=416\nheight=416\nchannels=3\n\n"
    body += conv.format(f=32, s=3) + mp
    body += conv.format(f=64, s=3) + mp
    body += (conv.format(f=128, s=3) + conv.format(f=64, s=1)
             + conv.format(f=128, s=3) + mp)
    body += (conv.format(f=256, s=3) + conv.format(f=128, s=1)
             + conv.format(f=256, s=3) + mp)
    body += (conv.format(f=512, s=3) + conv.format(f=256, s=1)
             + conv.format(f=512, s=3) + conv.format(f=256, s=1)
             + conv.format(f=512, s=3) + mp)
    body += (conv.format(f=1024, s=3) + conv.format(f=512, s=1)
             + conv.format(f=1024, s=3) + conv.format(f=512, s=1)
             + conv.format(f=1024, s=3))
    body += conv.format(f=1024, s=3) + conv.format(f=1024, s=3)
    body += "[route]\nlayers=-9\n\n"
    body += conv.format(f=64, s=1)
    body += "[reorg]\nstride=2\n\n"
    body += "[route]\nlayers=-1,-4\n\n"
    body += conv.format(f=1024, s=3)
    body += "[convolutional]\nfilters=425\nsize=1\npad=1\nactivation=linear\n\n"
    body += ("[region]\nanchors = 0.57273,0.677385, 1.87446,2.06253, "
             "3.33843,5.47434, 7.88282,3.52778, 9.77052,9.16828\n"
             "classes=80\nnum=5\n")
    return body


class TestParse:
    def test_tiny_voc_cfg_reproduces_variant(self, tmp_path):
        p = tmp_path / "t.cfg"
        p.write_text(TINY_VOC_CFG)
        cfg = config_from_cfg(str(p))
        assert cfg.layers == TINY_YOLOV2_VOC.layers
        assert cfg.anchors == TINY_VOC_ANCHORS
        assert cfg.input_size == 416
        assert cfg.num_classes == 20
        assert cfg.class_names[0] == "class0"  # no names file

    def test_full_coco_cfg_reproduces_variant(self, tmp_path):
        p = tmp_path / "f.cfg"
        p.write_text(_full_coco_cfg())
        cfg = config_from_cfg(str(p))
        assert cfg.layers == YOLOV2_COCO.layers
        assert cfg.anchors == COCO_ANCHORS
        assert cfg.num_classes == 80

    def test_names_file(self, tmp_path):
        p = tmp_path / "t.cfg"
        p.write_text(TINY_VOC_CFG)
        names = tmp_path / "v.names"
        names.write_text("\n".join(f"n{i}" for i in range(20)) + "\n")
        cfg = config_from_cfg(str(p), names_path=str(names))
        assert cfg.class_names == tuple(f"n{i}" for i in range(20))
        assert load_names(str(names))[3] == "n3"

    def test_comments_and_sections(self, tmp_path):
        p = tmp_path / "c.cfg"
        p.write_text("[net]\nwidth=64 # inline comment\nheight=64\n"
                     "[convolutional]\nfilters=10\nsize=1\n"
                     "activation=linear\n"
                     "[region]\nanchors=1,1,2,2\nclasses=0\nnum=2\n")
        sections = parse_cfg(str(p))
        assert [s[0] for s in sections] == ["net", "convolutional",
                                            "region"]
        assert sections[0][1]["width"] == "64"

    def test_errors(self, tmp_path):
        def write(body):
            p = tmp_path / "e.cfg"
            p.write_text(body)
            return str(p)

        with pytest.raises(ValueError, match="not a supported darknet"):
            config_from_cfg(write("[net]\nwidth=416\n[lstm]\noutput=256\n"))
        with pytest.raises(ValueError, match="unsupported activation"):
            config_from_cfg(write(
                "[net]\nwidth=416\n[convolutional]\nfilters=8\n"
                "activation=elu\n"))
        with pytest.raises(ValueError, match="no \\[region\\]"):
            config_from_cfg(write(
                "[net]\nwidth=416\n[convolutional]\nfilters=8\nsize=1\n"
                "activation=linear\n"))
        with pytest.raises(ValueError, match="final conv"):
            config_from_cfg(write(
                "[net]\nwidth=416\n[convolutional]\nfilters=8\nsize=1\n"
                "activation=linear\n[region]\nanchors=1,1\nclasses=20\n"
                "num=1\n"))
        p = tmp_path / "t.cfg"
        p.write_text(TINY_VOC_CFG)
        names = tmp_path / "bad.names"
        names.write_text("a\nb\n")
        with pytest.raises(ValueError, match="names file has 2"):
            config_from_cfg(str(p), names_path=str(names))


def test_cli_custom_cfg_e2e(tmp_path):
    """A custom 2-class, 3-anchor mini net defined ONLY by cfg+names
    runs predict end-to-end (weights round-trip through the same layer
    IR the darknet loader walks)."""
    import contextlib
    import io as _io

    import cv2

    from yolo_tpu import cli
    from yolo_tpu.configs.darknet_cfg import config_from_cfg
    from yolo_tpu.io import darknet_weights as dw

    cfg_text = """
[net]
width=96
height=96
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
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

[maxpool]
size=2
stride=2

[maxpool]
size=2
stride=2

[convolutional]
filters=21
size=1
activation=linear

[region]
anchors=1,1, 2,2, 4,3
classes=2
num=3
"""
    cfgp = tmp_path / "mini.cfg"
    cfgp.write_text(cfg_text)
    names = tmp_path / "mini.names"
    names.write_text("thing\nstuff\n")

    parsed = config_from_cfg(str(cfgp), names_path=str(names))
    assert parsed.num_classes == 2 and parsed.num_anchors == 3
    wpath = str(tmp_path / "mini.weights")
    dw.save(wpath, parsed.layers,
            dw.random_params(parsed.layers, np.random.default_rng(0)))

    img = tmp_path / "in.png"
    cv2.imwrite(str(img), np.random.default_rng(1).integers(
        0, 255, (80, 90, 3), dtype=np.uint8))
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["predict", "--cfg", str(cfgp), "--names", str(names),
                  "--weights", wpath, "--image", str(img),
                  "--conf", "0.1", "--precision", "fp32"])
    for line in buf.getvalue().strip().splitlines():
        d = json.loads(line)
        assert d["class"] in ("thing", "stuff")
        assert 0 <= d["score"] <= 1


def test_fuzz_random_topologies_round_trip(tmp_path):
    """Property test over the widened layer vocabulary: random valid
    detection topologies (strided/grouped convs, pools, routes,
    shortcuts, sam, SE blocks, upsample) emitted by cfg_to_string must
    parse back to the IDENTICAL layer list — any emit/parse asymmetry
    in a new section breaks this immediately."""
    import numpy as np

    from yolo_tpu.configs.darknet_cfg import cfg_to_string, config_from_cfg
    from yolo_tpu.configs.specs import (AvgPool, Conv, MaxPool,
                                        ModelConfig, Route, Sam,
                                        ScaleChannels, Shortcut, Upsample,
                                        YoloHead)

    rng = np.random.default_rng(123)
    for trial in range(12):
        layers = [Conv(16, stride=2)]
        ch = [16]
        # random middle section, channel/stride bookkeeping kept simple
        # by staying at one spatial stride
        for _ in range(int(rng.integers(2, 6))):
            kind = rng.integers(0, 6)
            if kind == 0:
                oc = int(rng.choice([8, 16]))
                g = int(rng.choice([1, 1, 8])) if oc % 8 == 0 and \
                    ch[-1] % 8 == 0 else 1
                layers.append(Conv(oc, size=int(rng.choice([1, 3])),
                                   groups=g,
                                   act=str(rng.choice(
                                       ["leaky", "mish", "swish"]))))
                ch.append(oc)
            elif kind == 1:
                layers.append(MaxPool(int(rng.choice([2, 3])), 1))
                ch.append(ch[-1])
            elif kind == 2 and len(layers) >= 2 and ch[-1] == ch[-2]:
                layers.append(Shortcut(-2))
                ch.append(ch[-1])
            elif kind == 3 and len(layers) >= 2 and ch[-1] == ch[-2]:
                layers.append(Sam(-2))
                ch.append(ch[-1])
            elif kind == 4:
                layers.append(Route((-1,)))
                ch.append(ch[-1])
            elif kind == 5:
                # SE block: avgpool -> 1x1 conv -> scale the trunk
                src_ch = ch[-1]
                layers += [AvgPool(), Conv(src_ch, 1, act="logistic"),
                           ScaleChannels(-3)]
                ch += [src_ch, src_ch, src_ch]
        layers.append(Conv(2 * 9, size=1, bn=False, act="linear"))
        layers.append(YoloHead((0, 1),
                               scale_xy=float(rng.choice([1.0, 1.05]))))
        cfg = ModelConfig(
            name=f"fuzz{trial}", layers=tuple(layers),
            anchors=((10, 14), (23, 27)),
            class_names=("a", "b", "c", "d"), input_size=64)
        p = tmp_path / f"f{trial}.cfg"
        p.write_text(cfg_to_string(cfg))
        got = config_from_cfg(str(p))
        assert got.layers == cfg.layers, f"trial {trial}"
        assert got.anchors == cfg.anchors


def test_region_thresh_parsed_and_round_trips(tmp_path):
    """[region] thresh (the darknet training noobj threshold) flows to
    ModelConfig.region_thresh and survives cfg export."""
    from yolo_tpu.configs.darknet_cfg import cfg_to_string

    p = tmp_path / "t.cfg"
    p.write_text(TINY_VOC_CFG)  # the fixture sets thresh=0.6
    cfg = config_from_cfg(str(p))
    assert cfg.region_thresh == 0.6
    p2 = tmp_path / "t2.cfg"
    p2.write_text(TINY_VOC_CFG.replace("thresh=0.6", "thresh=0.45"))
    cfg2 = config_from_cfg(str(p2))
    assert cfg2.region_thresh == 0.45
    p3 = tmp_path / "rt.cfg"
    p3.write_text(cfg_to_string(cfg2))
    assert config_from_cfg(str(p3)).region_thresh == 0.45


def test_parser_never_crashes_on_mangled_cfgs(tmp_path):
    """Property: random mutations of a valid cfg either parse or raise
    ValueError/KeyError with a message — never IndexError/TypeError/
    ZeroDivisionError or a silent mis-build."""
    import numpy as np

    from yolo_tpu.configs import get_variant
    from yolo_tpu.configs.darknet_cfg import cfg_to_string

    base = cfg_to_string(get_variant("yolov3-tiny")).splitlines()
    rng = np.random.default_rng(0)
    mutations = 0
    for trial in range(60):
        lines = list(base)
        op = trial % 4
        i = int(rng.integers(0, len(lines)))
        if op == 0:
            del lines[i]                      # drop a random line
        elif op == 1:
            lines[i], lines[-1] = lines[-1], lines[i]   # swap lines
        elif op == 2 and "=" in lines[i]:
            k, _ = lines[i].split("=", 1)
            lines[i] = f"{k}={int(rng.integers(-5, 99))}"  # mangle value
        elif op == 3:
            lines.insert(i, "[garbage]")      # unknown section
        p = tmp_path / f"m{trial}.cfg"
        p.write_text("\n".join(lines))
        try:
            config_from_cfg(str(p))
        except (ValueError, KeyError) as e:
            assert str(e), "error must carry a message"
            mutations += 1
    assert mutations > 10  # the harness actually exercised failures


def test_cfg_roundtrip_all_variants(tmp_path):
    """cfg_to_string(variant) parses back to the identical config —
    full darknet round-trip for every pinned topology."""
    from yolo_tpu.configs import get_variant
    from yolo_tpu.configs.darknet_cfg import cfg_to_string

    for v in ("tiny-voc", "voc", "coco", "tiny-coco",
              "yolov3", "yolov3-spp", "yolov3-tiny",
              "yolov4", "yolov4-tiny"):
        cfg = get_variant(v)
        p = tmp_path / f"{v}.cfg"
        p.write_text(cfg_to_string(cfg))
        back = config_from_cfg(str(p))
        assert back.layers == cfg.layers, v
        assert back.anchors == cfg.anchors, v
        assert back.input_size == cfg.input_size, v
        assert back.num_classes == cfg.num_classes, v


def test_downsample_validation(tmp_path):
    p = tmp_path / "d.cfg"
    p.write_text(
        "[net]\nwidth=64\n[maxpool]\nsize=2\nstride=2\n"
        "[convolutional]\nfilters=10\nsize=1\n"
        "activation=linear\n"
        "[region]\nanchors=1,1,2,2\nclasses=0\nnum=2\n")
    with pytest.raises(ValueError, match="downsample"):
        config_from_cfg(str(p))


def test_cli_export_save_cfg(tmp_path):
    """export --save-cfg writes a cfg+names pair that parses back to
    the exporting config — the .weights round-trip's missing half."""
    import jax

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.train.loop import TrainConfig, init_state

    cfg = get_variant("tiny-voc")
    state = init_state(
        dw.random_params(cfg.layers, np.random.default_rng(0)),
        TrainConfig())
    ck = str(tmp_path / "ck")
    ckpt.save(ck, jax.device_get(dict(state)))

    out_w = str(tmp_path / "out.weights")
    out_cfg = str(tmp_path / "out.cfg")
    cli.main(["export", "--model", "tiny-voc", "--checkpoint", ck,
              "--output", out_w, "--save-cfg", out_cfg])

    back = config_from_cfg(out_cfg,
                           names_path=str(tmp_path / "out.names"))
    assert back.layers == cfg.layers
    assert back.anchors == cfg.anchors
    assert back.class_names == cfg.class_names


def test_public_api_load_with_cfg(tmp_path):
    import cv2  # noqa: F401  (ensures cv2 present for detector path)

    import yolo_tpu
    from yolo_tpu.io import darknet_weights as dw

    cfg_text = ("[net]\nwidth=96\nheight=96\n"
                + "".join("[maxpool]\nsize=2\nstride=2\n" for _ in range(5))
                + "[convolutional]\nfilters=14\nsize=1\n"
                  "activation=linear\n"
                  "[region]\nanchors=1,1,3,2\nclasses=2\nnum=2\n")
    cfgp = tmp_path / "m.cfg"
    cfgp.write_text(cfg_text)
    names = tmp_path / "m.names"
    names.write_text("a\nb\n")
    parsed_w = str(tmp_path / "m.weights")
    from yolo_tpu.configs.darknet_cfg import config_from_cfg

    parsed = config_from_cfg(str(cfgp))
    dw.save(parsed_w, parsed.layers,
            dw.random_params(parsed.layers, np.random.default_rng(0)))

    model = yolo_tpu.load(parsed_w, cfg=str(cfgp), names=str(names),
                          precision="fp32", conf_threshold=0.1)
    assert model.cfg.class_names == ("a", "b")
    out = model(np.random.default_rng(1).integers(
        0, 256, (1, 64, 80, 3), dtype=np.uint8))
    assert out["boxes"].shape[0] == 1


def test_pad_zero_3x3_rejected(tmp_path):
    """A 3x3 conv without pad=1 means ZERO padding in darknet — the
    executor can't express it; must error, not silently mis-build."""
    p = tmp_path / "p.cfg"
    p.write_text("[net]\nwidth=416\n"
                 "[convolutional]\nfilters=8\nsize=3\nactivation=leaky\n"
                 "[region]\nanchors=1,1\nclasses=3\nnum=1\n")
    with pytest.raises(ValueError, match="pad"):
        config_from_cfg(str(p))


def test_nms_kind_parsed_and_round_trips(tmp_path):
    """AlexeyAB [yolo] nms_kind=diounms + beta_nms flow from cfg text
    into ModelConfig and survive cfg_to_string round-trip."""
    p = tmp_path / "d.cfg"
    p.write_text(
        "[net]\nwidth=32\n"
        "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
        "stride=2\npad=1\nactivation=leaky\n"
        "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
        "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
        "num=2\nnms_kind=diounms\nbeta_nms=0.8\n")
    cfg = config_from_cfg(str(p))
    assert cfg.nms_kind == "diou"
    assert cfg.beta_nms == 0.8
    from yolo_tpu.configs.darknet_cfg import cfg_to_string

    p2 = tmp_path / "rt.cfg"
    p2.write_text(cfg_to_string(cfg))
    back = config_from_cfg(str(p2))
    assert back.nms_kind == "diou" and back.beta_nms == 0.8
    # greedynms and default both mean plain IoU NMS
    p3 = tmp_path / "g.cfg"
    p3.write_text(p.read_text().replace("nms_kind=diounms\nbeta_nms=0.8",
                                        "nms_kind=greedynms"))
    assert config_from_cfg(str(p3)).nms_kind == "greedy"
    # unknown kinds are rejected, not silently ignored
    import pytest

    p4 = tmp_path / "bad.cfg"
    p4.write_text(p.read_text().replace("diounms", "cornersnms"))
    with pytest.raises(ValueError, match="unsupported nms_kind"):
        config_from_cfg(str(p4))


def test_net_training_params_random_and_jitter(tmp_path):
    from yolo_tpu.configs.darknet_cfg import net_training_params

    p = tmp_path / "r.cfg"
    p.write_text(
        "[net]\nwidth=64\n"
        "[convolutional]\nfilters=10\nsize=1\nactivation=linear\n"
        "[region]\nanchors=1,1,2,2\nclasses=0\nnum=2\n"
        "random=1\njitter=.3\n")
    hp = net_training_params(str(p))
    assert hp["random"] == 1.0 and hp["jitter"] == 0.3


def test_yolo_training_keys_parse(tmp_path):
    """focal_loss / truth_thresh now PARSE into the model config (their
    training semantics are pinned in train/loss.py — see
    tests/test_yolov3.py::TestFocalAndTruthThresh); the published-cfg
    values (absent / truth_thresh=1) stay the defaults."""
    base = ("[net]\nwidth=32\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n"
            "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
            "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
            "num=2\n{extra}")

    def parse(extra):
        p = tmp_path / "k.cfg"
        p.write_text(base.format(extra=extra))
        return config_from_cfg(str(p))

    d = parse("truth_thresh = 1\n")  # the published-cfg value
    assert d.truth_thresh == 1.0 and d.focal_loss is False
    f = parse("focal_loss=1\n")
    assert f.focal_loss is True
    t = parse("truth_thresh=0.9\n")
    assert t.truth_thresh == pytest.approx(0.9)


def test_random_jitter_from_last_head(tmp_path):
    """darknet reads random/jitter from the LAST layer (detector.c:
    net.layers[net.n-1]) — later [yolo] sections overwrite earlier
    ones."""
    from yolo_tpu.configs.darknet_cfg import net_training_params

    p = tmp_path / "two.cfg"
    p.write_text(
        "[net]\nwidth=32\n"
        "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
        "stride=2\npad=1\nactivation=leaky\n"
        "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
        "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
        "num=2\nrandom=0\njitter=.1\n"
        "[route]\nlayers = -2\n"
        "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
        "[yolo]\nmask = 1\nanchors = 10,14, 23,27\nclasses=4\n"
        "num=2\nrandom=1\njitter=.3\n")
    hp = net_training_params(str(p))
    assert hp["random"] == 1.0   # the LAST head's value
    assert hp["jitter"] == 0.3


def test_greedy_heads_with_differing_beta_accepted(tmp_path):
    """beta_nms is meaningless under greedy NMS: darknet accepts heads
    that differ only in an unused beta value — so must we."""
    p = tmp_path / "b.cfg"
    p.write_text(
        "[net]\nwidth=32\n"
        "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
        "stride=2\npad=1\nactivation=leaky\n"
        "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
        "[yolo]\nmask = 0\nanchors = 10,14, 23,27\nclasses=4\n"
        "num=2\nnms_kind=greedynms\n"
        "[route]\nlayers = -2\n"
        "[convolutional]\nfilters=9\nsize=1\nactivation=linear\n"
        "[yolo]\nmask = 1\nanchors = 10,14, 23,27\nclasses=4\n"
        "num=2\nnms_kind=greedynms\nbeta_nms=0.9\n")
    cfg = config_from_cfg(str(p))
    assert cfg.nms_kind == "greedy"


def test_fuzz_v1_and_classifier_topologies_round_trip(tmp_path):
    """Property test over the v1/classifier vocabulary: random
    crop/conv/pool trunks with local + spatial-connected + detection
    heads, or classifier tails with temperature, must survive
    cfg_to_string -> config_from_cfg identically (including the
    parse-time geometry pinning, which the emitted cfg must
    re-derive)."""
    import numpy as np

    from yolo_tpu.configs.darknet_cfg import cfg_to_string, config_from_cfg
    from yolo_tpu.configs.specs import (AvgPool, Connected, Conv, Crop,
                                        DetectionHead, Dropout, Local,
                                        MaxPool, ModelConfig,
                                        SoftmaxHead)

    rng = np.random.default_rng(321)
    for trial in range(10):
        size = 64
        layers = []
        if rng.integers(0, 2):
            layers.append(Crop(size, size))
        h = size
        ch = 3
        for _ in range(int(rng.integers(1, 3))):
            oc = int(rng.choice([4, 8]))
            layers.append(Conv(oc, size=3,
                               act=str(rng.choice(["leaky", "relu",
                                                   "ramp"]))))
            ch = oc
            layers.append(MaxPool(2, 2))
            h //= 2
        # shrink to a small grid
        while h > 4:
            layers.append(MaxPool(2, 2))
            h //= 2
        classifier = bool(rng.integers(0, 2))
        if classifier:
            nclasses = int(rng.integers(2, 6))
            layers += [AvgPool(), Connected(nclasses),
                       SoftmaxHead(temperature=float(
                           rng.choice([1.0, 2.0, 3.0])))]
            names = tuple(f"class{i}" for i in range(nclasses))
            cfg = ModelConfig(name=f"fz{trial}", layers=tuple(layers),
                              anchors=(), class_names=names,
                              input_size=size)
        else:
            lf = int(rng.choice([4, 8]))
            layers.append(Local(filters=lf, size=3, stride=1, pad=True,
                                out_h=h, out_w=h, in_c=ch))
            if rng.integers(0, 2):
                layers.append(Dropout(0.3))
            side, num, ncl = h, int(rng.integers(1, 3)), 3
            out = side * side * (ncl + num * 5)
            layers.append(Connected(out, in_features=h * h * lf))
            layers.append(DetectionHead(
                side=side, num=num, classes=ncl,
                sqrt=bool(rng.integers(0, 2)),
                rescore=bool(rng.integers(0, 2))))
            cfg = ModelConfig(name=f"fz{trial}", layers=tuple(layers),
                              anchors=(),
                              class_names=("a", "b", "c"),
                              input_size=size)
        p = tmp_path / f"fz{trial}.cfg"
        p.write_text(cfg_to_string(cfg))
        got = config_from_cfg(str(p), name=cfg.name)
        assert got.layers == cfg.layers, f"trial {trial}"


@pytest.mark.quick
def test_upsample_scale_and_maxpool_padding_guard(tmp_path):
    """[upsample] scale multiplies the values (upsample_layer.c) and
    round-trips; an explicit non-default [maxpool] padding rejects
    loudly instead of silently building the wrong geometry."""
    import jax.numpy as jnp

    from yolo_tpu.configs.darknet_cfg import (cfg_to_string,
                                              config_from_cfg)
    from yolo_tpu.configs.specs import Upsample
    from yolo_tpu.models import graph

    base = ("[net]\nwidth=64\nheight=64\nchannels=3\n\n"
            "[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n\n"
            "[upsample]\nstride=2\nscale=2.5\n\n"
            "[convolutional]\nfilters=12\nsize=1\nactivation=linear\n\n"
            "[yolo]\nmask=0,1\nanchors=10,14, 23,27\nclasses=1\nnum=2\n")
    p = tmp_path / "up.cfg"
    p.write_text(base)
    cfg = config_from_cfg(str(p))
    up = [l for l in cfg.layers if isinstance(l, Upsample)][0]
    assert up.scale == 2.5
    assert "scale=2.5" in cfg_to_string(cfg)
    # executor multiplies the upsampled values
    x = jnp.ones((1, 2, 2, 3))
    y = graph.apply_layers((Upsample(2, scale=2.5),), [], x)
    np.testing.assert_allclose(np.asarray(y), 2.5)

    bad = tmp_path / "mp.cfg"
    bad.write_text(base.replace(
        "[upsample]\nstride=2\nscale=2.5\n",
        "[maxpool]\nsize=2\nstride=1\npadding=0\n"))
    with pytest.raises(ValueError, match="padding=0"):
        config_from_cfg(str(bad))


@pytest.mark.quick
def test_region_loss_keys_flow(tmp_path, capsys):
    """[region] object/noobject/class/coord_scale + rescore parse with
    darknet's PARSE defaults (parser.c parse_region: 1/1/1/1/0 — NOT
    the official-cfg values), flow into LossConfig via
    region_loss_config, survive a cfg round-trip; softmax=0 rejects;
    bias_match=0 notes the static-assignment deviation."""
    from yolo_tpu.configs.darknet_cfg import cfg_to_string
    from yolo_tpu.train.loss import region_loss_config

    custom = TINY_VOC_CFG.replace(
        "thresh=0.6\n",
        "thresh=0.55\nobject_scale=2.5\nnoobject_scale=0.7\n"
        "class_scale=1.5\ncoord_scale=3\nrescore=1\n")
    p = tmp_path / "r.cfg"
    p.write_text(custom)
    cfg = config_from_cfg(str(p))
    assert cfg.region_object_scale == pytest.approx(2.5)
    assert cfg.region_noobject_scale == pytest.approx(0.7)
    assert cfg.region_class_scale == pytest.approx(1.5)
    assert cfg.region_coord_scale == pytest.approx(3.0)
    assert cfg.region_rescore is True
    lc = region_loss_config(cfg)
    assert (lc.object_scale, lc.noobject_scale, lc.class_scale,
            lc.coord_scale, lc.rescore, lc.iou_thresh) == (
        2.5, 0.7, 1.5, 3.0, True, pytest.approx(0.55))

    # round-trip preserves the custom values
    p2 = tmp_path / "rt.cfg"
    p2.write_text(cfg_to_string(cfg))
    cfg2 = config_from_cfg(str(p2))
    assert region_loss_config(cfg2) == lc

    # absent keys: darknet parse defaults, not the official-cfg values
    p3 = tmp_path / "bare.cfg"
    p3.write_text(TINY_VOC_CFG)
    bare = config_from_cfg(str(p3))
    assert (bare.region_object_scale, bare.region_rescore) == (1.0, False)

    # the pinned variants keep the OFFICIAL yolov2 cfg values
    from yolo_tpu.configs import get_variant

    v = get_variant("tiny-voc")
    assert (v.region_object_scale, v.region_rescore) == (5.0, True)

    p4 = tmp_path / "nosoft.cfg"
    p4.write_text(TINY_VOC_CFG.replace("thresh=0.6\n",
                                       "thresh=0.6\nsoftmax=0\n"))
    with pytest.raises(ValueError, match="softmax=0"):
        config_from_cfg(str(p4))

    p5 = tmp_path / "bm.cfg"
    p5.write_text(TINY_VOC_CFG.replace("thresh=0.6\n",
                                       "thresh=0.6\nbias_match=0\n"))
    config_from_cfg(str(p5))
    assert "bias_match=0" in capsys.readouterr().err


@pytest.mark.quick
def test_cfg_key_audit(tmp_path, capsys):
    """Unconsumed cfg keys warn once per (section, key) — darknet
    trains from the cfg alone, so a silently-dropped key is a silently
    different run; unimplemented-but-recognized keys stay silent at
    their darknet no-op value and warn away from it; anisotropic
    conv/maxpool strides reject."""
    # typo'd key warns as unrecognized (once, despite two sections
    # carrying it)
    p = tmp_path / "typo.cfg"
    p.write_text(TINY_VOC_CFG.replace(
        "[convolutional]\n", "[convolutional]\nbatch_normalise=1\n", 2))
    config_from_cfg(str(p))
    err = capsys.readouterr().err
    assert err.count("batch_normalise") == 1
    assert "not a recognized key" in err

    # [net] cutmix: silent at darknet's no-op 0, warns at 1
    p2 = tmp_path / "c0.cfg"
    p2.write_text(TINY_VOC_CFG.replace("momentum=0.9\n",
                                       "momentum=0.9\ncutmix=0\n"))
    config_from_cfg(str(p2))
    assert "cutmix" not in capsys.readouterr().err
    p3 = tmp_path / "c1.cfg"
    p3.write_text(TINY_VOC_CFG.replace("momentum=0.9\n",
                                       "momentum=0.9\ncutmix=1\n"))
    config_from_cfg(str(p3))
    err = capsys.readouterr().err
    assert "cutmix=1" in err and "not implemented" in err

    # consumed training keys never warn
    p4 = tmp_path / "ok.cfg"
    p4.write_text(TINY_VOC_CFG.replace(
        "momentum=0.9\n",
        "momentum=0.9\nbatch=64\nsubdivisions=8\nburn_in=100\n"
        "policy=steps\nsteps=100,200\nscales=.1,.1\n"))
    config_from_cfg(str(p4))
    assert capsys.readouterr().err == ""

    # anisotropic strides reject loudly
    p5 = tmp_path / "sx.cfg"
    p5.write_text(TINY_VOC_CFG.replace(
        "[convolutional]\n", "[convolutional]\nstride_x=2\n", 1))
    with pytest.raises(ValueError, match="anisotropic"):
        config_from_cfg(str(p5))
    p6 = tmp_path / "mp.cfg"
    p6.write_text(TINY_VOC_CFG.replace(
        "[maxpool]\n", "[maxpool]\nstride_y=1\n", 1))
    with pytest.raises(ValueError, match="anisotropic"):
        config_from_cfg(str(p6))


@pytest.mark.quick
def test_cfg_parser_fuzz_never_crashes(tmp_path):
    """Deterministic mutation fuzz: random line drops/duplications/
    value garblings of a real cfg must either build or raise a CLEAN
    ValueError/KeyError — never an unhandled TypeError/IndexError/
    ZeroDivisionError (a darknet user's hand-edited cfg is the input
    surface here)."""
    rng = np.random.default_rng(0)
    base_lines = TINY_VOC_CFG.splitlines()
    garble = ("0", "-1", "1e9", "abc", "", "0.0.1", "999999", "-3.5")
    built = failed = 0
    for trial in range(120):
        lines = list(base_lines)
        for _ in range(int(rng.integers(1, 4))):
            kind = rng.integers(0, 3)
            i = int(rng.integers(0, len(lines)))
            if kind == 0:
                lines.pop(i)
            elif kind == 1:
                lines.insert(i, lines[int(rng.integers(0, len(lines)))])
            else:
                ln = lines[i]
                if "=" in ln:
                    key = ln.split("=")[0]
                    lines[i] = f"{key}={garble[rng.integers(0, len(garble))]}"
        p = tmp_path / f"f{trial}.cfg"
        p.write_text("\n".join(lines) + "\n")
        try:
            config_from_cfg(str(p))
            built += 1
        except (ValueError, KeyError):
            failed += 1
    # both outcomes must occur across 120 trials (the fuzz is real),
    # and nothing else may escape
    assert built > 0 and failed > 0


@pytest.mark.quick
def test_darknet_parse_defaults(tmp_path, capsys):
    """Absent cfg keys get darknet's PARSE defaults, not the values
    the official cfgs happen to set (code-review findings): bare
    [maxpool] is stride-1/size-1 (parse_maxpool: stride default 1,
    size default stride), bare [reorg] is stride 1, maskless [yolo]
    uses all num anchors, [yolo] ignore_thresh defaults 0.5,
    [region] thresh defaults 0.5; duplicate [region] sections and
    [detection] softmax=1 reject."""
    from yolo_tpu.configs.specs import MaxPool, Reorg, YoloHead

    base = TINY_VOC_CFG
    # bare maxpool: stride-1 near-identity pool (not size-2/stride-2)
    # — classifier topology, free of the region head's downsample-32
    # contract
    cls_cfg = ("[net]\nwidth=32\nheight=32\nchannels=3\n\n"
               "[convolutional]\nbatch_normalize=1\nfilters=8\n"
               "size=3\npad=1\nactivation=leaky\n\n"
               "[maxpool]\n\n[avgpool]\n\n"
               "[convolutional]\nfilters=3\nsize=1\n"
               "activation=linear\n\n[softmax]\n")
    p = tmp_path / "mp.cfg"
    p.write_text(cls_cfg)
    mp = [l for l in config_from_cfg(str(p)).layers
          if isinstance(l, MaxPool)][0]
    assert (mp.size, mp.stride) == (1, 1)

    # region thresh parse default 0.5
    p2 = tmp_path / "th.cfg"
    p2.write_text(base.replace("thresh=0.6\n", ""))
    assert config_from_cfg(str(p2)).region_thresh == pytest.approx(0.5)

    # duplicate [region] rejects
    p3 = tmp_path / "dup.cfg"
    p3.write_text(base + "\n[region]\nanchors=1,1\nclasses=20\nnum=1\n")
    with pytest.raises(ValueError, match="multiple \\[region\\]"):
        config_from_cfg(str(p3))

    # yolo: maskless uses all num anchors; ignore_thresh default 0.5
    yolo_cfg = """\
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=14
size=1
activation=linear

[yolo]
anchors = 10,14, 23,27
classes=2
num=2
"""
    p4 = tmp_path / "y.cfg"
    p4.write_text(yolo_cfg)
    ycfg = config_from_cfg(str(p4))
    head = [l for l in ycfg.layers if isinstance(l, YoloHead)][0]
    assert head.mask == (0, 1)
    assert ycfg.ignore_thresh == pytest.approx(0.5)

    # [detection] softmax=1 rejects (v1 family pinned to softmax=0)
    from tests.test_yolov1 import V1_CFG

    p5 = tmp_path / "v1.cfg"
    p5.write_text(V1_CFG.replace("[detection]\n",
                                 "[detection]\nsoftmax=1\n", 1))
    with pytest.raises(ValueError, match="softmax=1"):
        config_from_cfg(str(p5))
