"""Native image decode + fused decode->letterbox loader
(native/decode.cpp, the darknet data.c role): decode parity vs cv2,
batch-loader parity vs the Python host path, failure-slot handling,
and the CLI --decoder switch."""

import os

import numpy as np
import pytest

from yolo_tpu.native import preproc

pytestmark = pytest.mark.skipif(not preproc.available(),
                                reason="native library unavailable")


def _write_images(tmp_path, sizes, ext="png", seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    paths, imgs = [], []
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.{ext}")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
        imgs.append(img)
    return paths, imgs


@pytest.mark.quick
def test_png_decode_exact_vs_cv2(tmp_path):
    paths, imgs = _write_images(tmp_path, [(37, 53), (64, 64), (1, 7)])
    for p, want in zip(paths, imgs):
        got = preproc.decode_image(p)
        np.testing.assert_array_equal(got, want)


@pytest.mark.quick
def test_jpeg_decode_matches_cv2(tmp_path):
    import cv2

    paths, _ = _write_images(tmp_path, [(48, 80), (123, 97)], ext="jpg")
    for p in paths:
        got = preproc.decode_image(p)
        want = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert got.shape == want.shape
        # same system libjpeg family — allow a whisker of IDCT slack
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


@pytest.mark.quick
def test_decode_failures_return_none(tmp_path):
    assert preproc.decode_image(str(tmp_path / "missing.png")) is None
    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0junkjunkjunk")
    assert preproc.decode_image(str(bad)) is None
    txt = tmp_path / "not_an_image.png"
    txt.write_text("hello")
    assert preproc.decode_image(str(txt)) is None


@pytest.mark.quick
def test_batch_loader_matches_python_path(tmp_path):
    from yolo_tpu.ops import numpy_ref as npr

    paths, imgs = _write_images(
        tmp_path, [(40, 60), (60, 40), (64, 64), (100, 30)])
    out, dims, ok = preproc.decode_letterbox_batch(paths, 64, n_threads=2)
    assert ok.all()
    for i, img in enumerate(imgs):
        assert tuple(dims[i]) == img.shape[:2]
        ref = npr.letterbox(img, 64, 64)[0]
        np.testing.assert_allclose(out[i], ref, atol=1e-6)


@pytest.mark.quick
def test_batch_loader_flags_failures(tmp_path):
    paths, imgs = _write_images(tmp_path, [(32, 32)])
    out, dims, ok = preproc.decode_letterbox_batch(
        [paths[0], str(tmp_path / "nope.png")], 32, n_threads=2)
    assert ok.tolist() == [True, False]
    assert tuple(dims[1]) == (0, 0)


@pytest.mark.quick
def test_inference_batches_native_equals_cv2(tmp_path):
    """The fused native path yields batches identical to the Python
    host-preprocess path — order, shapes metadata, pad semantics, and
    pixels (PNG decode is exact on both) — including a cv2-fallback
    slot for a format the native decoder doesn't cover (bmp)."""
    import cv2

    from yolo_tpu.data import pipeline

    paths, imgs = _write_images(
        tmp_path, [(40, 60), (64, 48), (52, 52), (30, 90), (64, 64)])
    bmp = str(tmp_path / "extra.bmp")
    rng = np.random.default_rng(9)
    bmp_img = rng.integers(0, 256, (45, 45, 3), dtype=np.uint8)
    cv2.imwrite(bmp, cv2.cvtColor(bmp_img, cv2.COLOR_RGB2BGR))
    paths.append(bmp)

    def run():
        return list(pipeline.inference_batches(
            paths, batch_size=4, workers=2, net_size=64))

    want = run()
    pipeline.set_decoder("native")
    try:
        got = run()
    finally:
        pipeline.set_decoder("cv2")
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g["paths"] == w["paths"]
        assert g["shapes"] == w["shapes"]
        assert g.get("pad") == w.get("pad")
        np.testing.assert_allclose(g["images"], w["images"], atol=1e-6)


@pytest.mark.quick
def test_load_image_rgb_native_switch(tmp_path):
    from yolo_tpu.data import pipeline

    paths, imgs = _write_images(tmp_path, [(33, 44)])
    pipeline.set_decoder("native")
    try:
        got = pipeline.load_image_rgb(paths[0])
    finally:
        pipeline.set_decoder("cv2")
    np.testing.assert_array_equal(got, imgs[0])
    # unknown names reject
    with pytest.raises(ValueError, match="unknown decoder"):
        pipeline.set_decoder("turbo")


def test_cli_detect_decoder_native(tmp_path, capsys):
    """--decoder native plumbs through `detect` end-to-end and yields
    the same detections as the cv2 run (PNG decode is exact)."""
    import json

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc", input_size=64)
    w = tmp_path / "w.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    d = tmp_path / "imgs"
    os.makedirs(d)
    _write_images(d, [(70, 50), (40, 80), (64, 64)], seed=3)

    def run(dec):
        cli.main(["detect", "--model", "tiny-voc", "--input-size", "64",
                  "--weights", str(w), "--images", str(d),
                  "--batch", "2", "--conf", "0.05", "--decoder", dec,
                  "--host-preprocess", "--precision", "fp32"])
        lines = capsys.readouterr().out.strip().splitlines()
        return sorted(json.loads(l)["image"].split("/")[-1] + ":" +
                      json.dumps(json.loads(l)["detections"])
                      for l in lines)

    assert run("native") == run("cv2")


@pytest.mark.quick
def test_decode_image_bytes(tmp_path):
    import cv2

    paths, imgs = _write_images(tmp_path, [(29, 41)])
    data = open(paths[0], "rb").read()
    got = preproc.decode_image_bytes(data)
    np.testing.assert_array_equal(got, imgs[0])
    # jpeg bytes match cv2.imdecode
    jpaths, _ = _write_images(tmp_path, [(50, 34)], ext="jpg", seed=5)
    jdata = open(jpaths[0], "rb").read()
    gj = preproc.decode_image_bytes(jdata)
    cj = cv2.cvtColor(cv2.imdecode(np.frombuffer(jdata, np.uint8),
                                   cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    assert np.abs(gj.astype(int) - cj.astype(int)).max() <= 2
    assert preproc.decode_image_bytes(b"nonsense") is None
    assert preproc.decode_image_bytes(b"") is None


@pytest.mark.quick
def test_exif_rotated_jpeg_declines_to_cv2(tmp_path):
    """cv2.imread auto-applies EXIF rotation; the native decoder must
    DECLINE oriented JPEGs (return None) so the fallback keeps pixels
    identical whichever decoder is selected — code-review finding."""
    import struct

    import cv2

    from yolo_tpu.data import pipeline

    paths, _ = _write_images(tmp_path, [(40, 60)], ext="jpg", seed=7)
    plain = open(paths[0], "rb").read()
    # splice an APP1 Exif segment with Orientation=6 after SOI
    tiff = (b"II*\x00\x08\x00\x00\x00"        # little-endian, IFD @ 8
            b"\x01\x00"                        # 1 entry
            b"\x12\x01\x03\x00\x01\x00\x00\x00\x06\x00\x00\x00"
            b"\x00\x00\x00\x00")               # no next IFD
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    rotated = tmp_path / "rot.jpg"
    rotated.write_bytes(plain[:2] + app1 + plain[2:])

    assert preproc.decode_image(str(rotated)) is None
    assert preproc.decode_image_bytes(rotated.read_bytes()) is None
    # the un-oriented original still decodes natively
    assert preproc.decode_image(paths[0]) is not None
    # and load_image_rgb under the native decoder equals cv2 via the
    # fallback
    pipeline.set_decoder("native")
    try:
        got = pipeline.load_image_rgb(str(rotated))
    finally:
        pipeline.set_decoder("cv2")
    want = cv2.cvtColor(cv2.imread(str(rotated)), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(got, want)


@pytest.mark.quick
def test_png_alpha_and_16bit_decline_gray_decodes(tmp_path):
    import cv2

    rng = np.random.default_rng(3)
    # RGBA: cv2 drops alpha, libpng composites — must decline
    rgba = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
    p_rgba = str(tmp_path / "a.png")
    cv2.imwrite(p_rgba, rgba)
    assert preproc.decode_image(p_rgba) is None
    # 16-bit: cv2 >>8s, libpng rescales — must decline
    p16 = str(tmp_path / "b.png")
    cv2.imwrite(p16, rng.integers(0, 65536, (20, 30, 3),
                                  dtype=np.uint16))
    assert preproc.decode_image(p16) is None
    # grayscale: both replicate channels — decodes natively, equal
    gray = rng.integers(0, 256, (25, 35), dtype=np.uint8)
    pg = str(tmp_path / "g.png")
    cv2.imwrite(pg, gray)
    got = preproc.decode_image(pg)
    want = cv2.cvtColor(cv2.imread(pg, cv2.IMREAD_COLOR),
                        cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(got, want)


@pytest.mark.quick
def test_grayscale_decode_parity_vs_cv2(tmp_path):
    """channels=1 native decode vs cv2.IMREAD_GRAYSCALE: gray-source
    PNG is byte-exact passthrough; COLOR PNG DECLINES (libpng's
    simplified-API rgb->gray uses Rec-709/cHRM defaults, cv2 passes
    BT.601 — parity first); JPEG decodes natively for BOTH sources
    (cv2's grayscale JPEG path IS libjpeg JCS_GRAYSCALE)."""
    import cv2

    rng = np.random.default_rng(11)
    # gray-source PNG: exact
    gray = rng.integers(0, 256, (33, 47), dtype=np.uint8)
    pg = str(tmp_path / "g.png")
    cv2.imwrite(pg, gray)
    got = preproc.decode_image(pg, channels=1)
    want = cv2.imread(pg, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(got[..., 0], want)
    # color PNG at channels=1: decline -> load_image falls back to cv2
    pc = str(tmp_path / "c.png")
    cv2.imwrite(pc, rng.integers(0, 256, (30, 40, 3), dtype=np.uint8))
    assert preproc.decode_image(pc, channels=1) is None
    # gray-source JPEG: same libjpeg path both sides
    pjg = str(tmp_path / "g.jpg")
    cv2.imwrite(pjg, gray)
    gj = preproc.decode_image(pjg, channels=1)
    wj = cv2.imread(pjg, cv2.IMREAD_GRAYSCALE)
    assert np.abs(gj[..., 0].astype(int) - wj.astype(int)).max() <= 2
    # color-source JPEG: libjpeg does the BT.601 conversion both ways
    pjc = str(tmp_path / "c.jpg")
    cv2.imwrite(pjc, rng.integers(0, 256, (28, 36, 3), dtype=np.uint8))
    gc = preproc.decode_image(pjc, channels=1)
    wc = cv2.imread(pjc, cv2.IMREAD_GRAYSCALE)
    assert gc.shape == wc.shape + (1,)
    assert np.abs(gc[..., 0].astype(int) - wc.astype(int)).max() <= 2
    # bytes variant mirrors the path variant
    gb = preproc.decode_image_bytes(open(pjc, "rb").read(), channels=1)
    np.testing.assert_array_equal(gb, gc)


@pytest.mark.quick
def test_grayscale_load_image_native_switch(tmp_path):
    """load_image(path, 1) under --decoder native: native where parity
    holds, cv2 fallback on the declined color PNG — pixels identical
    to the pure-cv2 run either way."""
    import cv2

    from yolo_tpu.data import pipeline

    rng = np.random.default_rng(4)
    pg = str(tmp_path / "g.png")
    cv2.imwrite(pg, rng.integers(0, 256, (26, 31), dtype=np.uint8))
    pc = str(tmp_path / "c.png")
    cv2.imwrite(pc, rng.integers(0, 256, (26, 31, 3), dtype=np.uint8))
    for p in (pg, pc):
        want = pipeline.load_image(p, 1)
        pipeline.set_decoder("native")
        try:
            got = pipeline.load_image(p, 1)
        finally:
            pipeline.set_decoder("cv2")
        np.testing.assert_array_equal(got, want)


@pytest.mark.quick
def test_grayscale_batch_loader_matches_python_path(tmp_path):
    """The fused native decode->letterbox loader at channels=1 equals
    the numpy oracle per image (gray PNGs decode exactly), and the
    native letterbox kernel at C=1 equals npr.letterbox."""
    import cv2

    from yolo_tpu.ops import numpy_ref as npr

    rng = np.random.default_rng(6)
    paths, imgs = [], []
    for i, (h, w) in enumerate([(40, 60), (64, 40), (52, 52)]):
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        p = str(tmp_path / f"g{i}.png")
        cv2.imwrite(p, g)
        paths.append(p)
        imgs.append(g[..., None])
    out, dims, ok = preproc.decode_letterbox_batch(
        paths, 64, n_threads=2, channels=1)
    assert ok.all() and out.shape == (3, 64, 64, 1)
    for i, img in enumerate(imgs):
        assert tuple(dims[i]) == img.shape[:2]
        ref = npr.letterbox(img, 64, 64)[0]
        np.testing.assert_allclose(out[i], ref, atol=1e-6)
    # the in-memory batch letterbox at C=1 (native kernel, not the
    # numpy fallback) also matches the oracle
    batch = np.stack([cv2.resize(im, (48, 48),
                                 interpolation=cv2.INTER_NEAREST)
                      for im in imgs])[..., None]
    lb = preproc.letterbox_batch(batch, (32, 64), n_threads=2)
    assert lb.shape == (3, 32, 64, 1)
    for i in range(3):
        ref = npr.letterbox(batch[i], 64, 32)[0]
        np.testing.assert_allclose(lb[i], ref, atol=1e-6)


@pytest.mark.quick
def test_grayscale_inference_batches_native_equals_cv2(tmp_path):
    """channels=1 rides the fused native loader and yields batches
    identical to the cv2 host path — including a color-PNG slot that
    declines natively and retries through cv2's BT.601 conversion."""
    import cv2

    from yolo_tpu.data import pipeline

    rng = np.random.default_rng(8)
    paths = []
    for i, (h, w) in enumerate([(40, 60), (64, 48), (52, 52)]):
        p = str(tmp_path / f"g{i}.png")
        cv2.imwrite(p, rng.integers(0, 256, (h, w), dtype=np.uint8))
        paths.append(p)
    pc = str(tmp_path / "color.png")
    cv2.imwrite(pc, rng.integers(0, 256, (45, 45, 3), dtype=np.uint8))
    paths.append(pc)

    def run():
        return list(pipeline.inference_batches(
            paths, batch_size=2, workers=2, net_size=64, channels=1))

    want = run()
    pipeline.set_decoder("native")
    try:
        got = run()
    finally:
        pipeline.set_decoder("cv2")
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g["paths"] == w["paths"]
        assert g["shapes"] == w["shapes"]
        assert g["images"].shape[-1] == 1
        np.testing.assert_allclose(g["images"], w["images"], atol=1e-6)


@pytest.mark.quick
def test_corrupt_jpeg_scan_data_declines(tmp_path):
    """Header parses but the scan data is truncated/garbled: the
    longjmp cleanup path must hand back None (and not crash/leak —
    the volatile-buf fix)."""
    paths, _ = _write_images(tmp_path, [(60, 80)], ext="jpg", seed=9)
    data = open(paths[0], "rb").read()
    for cut in (len(data) // 2, len(data) - 10):
        bad = tmp_path / f"cut{cut}.jpg"
        bad.write_bytes(data[:cut])
        preproc.decode_image(str(bad))  # None or partial-decline; no crash
    garbled = bytearray(data)
    garbled[len(data) // 2:len(data) // 2 + 50] = b"\x00" * 50
    (tmp_path / "garbled.jpg").write_bytes(bytes(garbled))
    preproc.decode_image(str(tmp_path / "garbled.jpg"))


@pytest.mark.quick
def test_classifier_crop_range_darknet_defaults():
    """Absent min_crop/max_crop fall back to darknet's parse defaults
    (net w .. 2*net w) — an angle-only cfg still zooms 1-2x like
    darknet, not a fixed whole-image resize (code-review finding)."""
    from yolo_tpu.data.augment import (AugmentConfig,
                                       random_augment_classifier,
                                       rotate_scale_crop)

    rng = np.random.default_rng(0)
    img = np.zeros((40, 40, 3), np.uint8)
    img[..., 0] = np.arange(40, dtype=np.uint8)[None, :] * 6
    cfg = AugmentConfig(angle=0.0001)  # geometry on, no crop keys
    whole = rotate_scale_crop(img, 32, rad=0.0, scale=32 / 40,
                              aspect=1.0, dx=0.0, dy=0.0)
    zoomed = 0
    for s in range(8):
        out = random_augment_classifier(
            img, np.random.default_rng(s), cfg, 32)
        if not np.allclose(out, whole, atol=2):
            zoomed += 1
    assert zoomed >= 4  # the 1-2x zoom range is actually in play
