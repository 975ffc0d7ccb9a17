"""Darknet .weights loader tests (SURVEY.md §4.2.2): synthetic files with
known bytes, exact round-trips, full-consumption asserts, BN folding."""

import io

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast inner-loop tier (CLAUDE.md)

from yolo_tpu.configs.specs import Conv, MaxPool
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models.graph import fold_params
from yolo_tpu.ops import numpy_ref as npr

TINY_LAYERS = (
    Conv(4, size=3, bn=True),
    MaxPool(2, 2),
    Conv(6, size=1, bn=False, act="linear"),
)


def test_known_bytes_exact():
    """Hand-build a 2-layer file and check every tensor lands where the
    format says (darknet parse.c order: biases, [gamma, mean, var], kernel
    OIHW)."""
    oc1, ic1, k1 = 4, 3, 3
    oc2, ic2, k2 = 6, 4, 1
    rng = np.random.default_rng(0)
    beta = rng.normal(size=oc1).astype(np.float32)
    gamma = rng.normal(size=oc1).astype(np.float32)
    mean = rng.normal(size=oc1).astype(np.float32)
    var = np.abs(rng.normal(size=oc1)).astype(np.float32)
    kern1 = rng.normal(size=(oc1, ic1, k1, k1)).astype(np.float32)
    bias2 = rng.normal(size=oc2).astype(np.float32)
    kern2 = rng.normal(size=(oc2, ic2, k2, k2)).astype(np.float32)

    blob = io.BytesIO()
    blob.write(np.asarray([0, 2, 0], dtype=np.int32).tobytes())
    blob.write(np.asarray([12345], dtype=np.int64).tobytes())   # 20-byte header
    for arr in (beta, gamma, mean, var, kern1, bias2, kern2):
        blob.write(arr.tobytes())
    blob.seek(0)

    params, header = dw.load(blob, TINY_LAYERS)
    assert header == {"major": 0, "minor": 2, "revision": 0, "seen": 12345}
    np.testing.assert_array_equal(params[0]["beta"], beta)
    np.testing.assert_array_equal(params[0]["gamma"], gamma)
    np.testing.assert_array_equal(params[0]["mean"], mean)
    np.testing.assert_array_equal(params[0]["var"], var)
    np.testing.assert_array_equal(params[0]["kernel"], kern1.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(params[1]["bias"], bias2)
    np.testing.assert_array_equal(params[1]["kernel"], kern2.transpose(2, 3, 1, 0))


def test_roundtrip_save_load():
    rng = np.random.default_rng(1)
    params = dw.random_params(TINY_LAYERS, rng)
    blob = dw.to_bytes(TINY_LAYERS, params, seen=7)
    loaded, header = dw.load(io.BytesIO(blob), TINY_LAYERS)
    assert header["seen"] == 7
    for p, q in zip(params, loaded):
        assert set(p) == set(q)
        for key in p:
            np.testing.assert_array_equal(p[key], q[key])


def test_old_16_byte_header():
    rng = np.random.default_rng(2)
    params = dw.random_params(TINY_LAYERS, rng)
    blob = dw.to_bytes(TINY_LAYERS, params, seen=3, version=(0, 1, 0))
    # header is 16 bytes for major*10+minor < 2
    loaded, header = dw.load(io.BytesIO(blob), TINY_LAYERS)
    assert header == {"major": 0, "minor": 1, "revision": 0, "seen": 3}
    np.testing.assert_array_equal(loaded[0]["kernel"], params[0]["kernel"])


def test_truncated_file_raises():
    rng = np.random.default_rng(3)
    params = dw.random_params(TINY_LAYERS, rng)
    blob = dw.to_bytes(TINY_LAYERS, params)
    with pytest.raises(ValueError, match="too short"):
        dw.load(io.BytesIO(blob[:-8]), TINY_LAYERS)


def test_trailing_bytes_raise():
    rng = np.random.default_rng(4)
    params = dw.random_params(TINY_LAYERS, rng)
    blob = dw.to_bytes(TINY_LAYERS, params) + b"\x00" * 8
    with pytest.raises(ValueError, match="not fully consumed"):
        dw.load(io.BytesIO(blob), TINY_LAYERS)


def test_full_variant_inferred_channels():
    """Channel inference must walk routes/reorg correctly on full YOLOv2."""
    from yolo_tpu.configs.variants import YOLOV2_COCO

    conv_in = dw._infer_in_channels(YOLOV2_COCO.layers)
    # last conv (1x1 to 425) sees 1024; the conv after the concat sees 1280
    assert conv_in[-1] == 1024
    assert conv_in[-2] == 256 + 1024
    # the 1x1 passthrough conv sees the 512-ch route
    assert conv_in[-3] == 512


def test_bn_fold_unfold_equivalence():
    rng = np.random.default_rng(5)
    params = dw.random_params(TINY_LAYERS, rng)
    p = params[0]
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)  # post-conv activations
    want = npr.batchnorm(x, p["gamma"], p["beta"], p["mean"], p["var"])
    folded = fold_params(TINY_LAYERS, params)[0]
    # folding scales the kernel; applying the same scale to conv *outputs*
    # is equivalent because conv is linear in the kernel
    scale = p["gamma"] / np.sqrt(p["var"] + 1e-5)
    np.testing.assert_allclose(x * scale + folded["bias"], want, rtol=1e-5, atol=1e-5)


def test_fuzz_random_specs_roundtrip():
    """Property test: random layer specs -> random params -> save -> load
    must reproduce every tensor exactly — including grouped/depthwise
    convs and classifier tails (avgpool + connected)."""
    from yolo_tpu.configs.specs import AvgPool, Connected, SoftmaxHead

    rng = np.random.default_rng(99)
    for trial in range(12):
        layers = []
        prev = 3
        for _ in range(int(rng.integers(1, 6))):
            oc = int(rng.choice([2, 4, 8]))
            # groups must divide both sides: pick from common divisors
            divs = [g for g in (1, 2, 4) if oc % g == 0 and prev % g == 0]
            layers.append(Conv(oc,
                               size=int(rng.choice([1, 3])),
                               bn=bool(rng.integers(0, 2)),
                               groups=int(rng.choice(divs))))
            prev = oc
            if rng.integers(0, 2):
                layers.append(MaxPool(2, 2))
        if rng.integers(0, 2):  # classifier tail
            layers.append(AvgPool())
            layers.append(Connected(int(rng.integers(2, 7))))
            layers.append(SoftmaxHead())
        layers = tuple(layers)
        params = dw.random_params(layers, rng)
        blob = dw.to_bytes(layers, params, seen=int(rng.integers(0, 10**6)))
        loaded, _ = dw.load(io.BytesIO(blob), layers)
        for p, q in zip(params, loaded):
            assert set(p) == set(q)
            for key in p:
                np.testing.assert_array_equal(p[key], q[key])


class TestPartialWeights:
    """darknet `partial` workflow: backbone-prefix files
    (darknet19_448.conv.23-style) round-trip and drive training init."""

    def test_partial_roundtrip(self, tmp_path):
        from yolo_tpu.configs import get_variant
        from yolo_tpu.configs.specs import Conv

        cfg = get_variant("coco")
        full = dw.random_params(cfg.layers, np.random.default_rng(0))
        p = tmp_path / "backbone.weights"
        # first 23 darknet layers == first 18 convs (the .conv.23 cut)
        n_convs = sum(1 for l in cfg.layers[:23] if isinstance(l, Conv))
        assert n_convs == 18
        dw.save(str(p), cfg.layers, full, seen=7, cutoff_convs=n_convs)

        from yolo_tpu.io.zoo import load_manifest

        assert (p.stat().st_size ==
                load_manifest()["darknet19-448-conv23"]["size_bytes"])

        params, header, n = dw.load_partial(str(p), cfg.layers)
        assert n == 18 and header["seen"] == 7
        for got, want in zip(params, full[:18]):
            for k in got:
                np.testing.assert_array_equal(got[k], want[k])

    def test_full_file_loads_fully(self, tmp_path):
        from yolo_tpu.configs import get_variant

        cfg = get_variant("tiny-voc")
        full = dw.random_params(cfg.layers, np.random.default_rng(1))
        p = tmp_path / "full.weights"
        dw.save(str(p), cfg.layers, full)
        params, header, n = dw.load_partial(str(p), cfg.layers)
        assert n == len(full)

    def test_mid_layer_truncation_rejected(self, tmp_path):
        from yolo_tpu.configs import get_variant

        cfg = get_variant("tiny-voc")
        full = dw.random_params(cfg.layers, np.random.default_rng(2))
        p = tmp_path / "bad.weights"
        dw.save(str(p), cfg.layers, full)
        data = p.read_bytes()
        (tmp_path / "bad2.weights").write_bytes(data[:len(data) - 12])
        with pytest.raises(ValueError, match="mid-layer|not fully"):
            dw.load_partial(str(tmp_path / "bad2.weights"), cfg.layers)
        (tmp_path / "bad3.weights").write_bytes(data[:len(data) - 13])
        with pytest.raises(ValueError, match="mid-float"):
            dw.load_partial(str(tmp_path / "bad3.weights"), cfg.layers)


def test_fuzz_v1_specs_roundtrip():
    """Property test over the v1 weight vocabulary: random [local]
    layers (varying geometry) and SPATIAL connected layers must
    save -> load bit-exactly, and the byte size must match the zoo
    derivation."""
    from yolo_tpu.configs.specs import Connected, Local
    from yolo_tpu.io.zoo import expected_weights_bytes

    rng = np.random.default_rng(7)
    for trial in range(10):
        layers = []
        prev = 3
        for _ in range(int(rng.integers(1, 4))):
            oc = int(rng.choice([2, 4, 8]))
            layers.append(Conv(oc, size=int(rng.choice([1, 3])),
                               bn=bool(rng.integers(0, 2))))
            prev = oc
        # a local layer with random pinned geometry
        lf = int(rng.choice([2, 4]))
        hh, ww = int(rng.integers(2, 5)), int(rng.integers(2, 5))
        layers.append(Local(filters=lf, size=int(rng.choice([1, 3])),
                            stride=1, pad=True, out_h=hh, out_w=ww,
                            in_c=prev))
        prev = lf
        if rng.integers(0, 2):  # spatial dense tail
            feats = hh * ww * prev
            layers.append(Connected(int(rng.integers(4, 9)),
                                    in_features=feats))
        layers = tuple(layers)
        params = dw.random_params(layers, rng)
        blob = dw.to_bytes(layers, params)
        assert len(blob) == expected_weights_bytes(layers), trial
        loaded, _ = dw.load(io.BytesIO(blob), layers)
        for p, q in zip(params, loaded):
            assert set(p) == set(q)
            for key in p:
                np.testing.assert_array_equal(p[key], q[key])
