"""Weights-zoo manifest + integrity tests (io/zoo.py)."""

import json
import os

import numpy as np
import pytest

from yolo_tpu.configs import get_variant
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.io import zoo


class TestExpectedBytes:
    def test_matches_actual_file_tiny(self, tmp_path):
        cfg = get_variant("tiny-voc")
        p = tmp_path / "w.weights"
        dw.save(str(p), cfg.layers,
                dw.random_params(cfg.layers, np.random.default_rng(0)))
        assert os.path.getsize(p) == zoo.expected_weights_bytes(cfg.layers)

    def test_manifest_sizes_are_current(self):
        """The checked-in manifest's sizes must track the layer specs."""
        manifest = zoo.load_manifest()
        assert set(manifest) == {"yolov2", "yolov2-voc", "yolov2-tiny-voc",
                                 "yolov2-tiny", "darknet19-448-conv23",
                                 "yolov3", "yolov3-spp", "yolov3-tiny",
                                 "darknet53-conv74",
                                 "yolov4", "yolov4-tiny", "yolov4-conv137",
                                 "darknet19", "darknet19-448", "darknet53"}
        for name, e in manifest.items():
            layers = get_variant(e["variant"]).layers
            if e.get("cutoff_layers"):
                layers = layers[:e["cutoff_layers"]]
            assert e["size_bytes"] == zoo.expected_weights_bytes(layers), name
            assert e["url"].startswith("https://")


def _mini_manifest(tmp_path, size):
    m = {"mini": {"variant": "tiny-voc", "filename": "mini.weights",
                  "url": "https://example.com/mini.weights",
                  "size_bytes": size, "sha256": None}}
    mp = tmp_path / "manifest.json"
    mp.write_text(json.dumps(m))
    return str(mp)


class TestResolveVerify:
    def test_resolve_ok_and_errors(self, tmp_path, monkeypatch):
        monkeypatch.setenv("YOLO_TPU_WEIGHTS_DIR", str(tmp_path))
        wpath = tmp_path / "mini.weights"
        wpath.write_bytes(b"\x00" * 64)
        mp = _mini_manifest(tmp_path, 64)

        assert zoo.resolve("zoo://mini", manifest_path=mp) == str(wpath)

        with pytest.raises(KeyError, match="unknown zoo entry"):
            zoo.resolve("zoo://nope", manifest_path=mp)

        os.remove(wpath)
        with pytest.raises(FileNotFoundError, match="example.com"):
            zoo.resolve("zoo://mini", manifest_path=mp)  # msg carries URL

    def test_size_mismatch_fatal(self, tmp_path, monkeypatch):
        monkeypatch.setenv("YOLO_TPU_WEIGHTS_DIR", str(tmp_path))
        (tmp_path / "mini.weights").write_bytes(b"\x00" * 63)  # truncated
        mp = _mini_manifest(tmp_path, 64)
        with pytest.raises(ValueError, match="truncated"):
            zoo.resolve("zoo://mini", manifest_path=mp)

    def test_16_byte_header_variant_accepted(self, tmp_path, monkeypatch):
        """darknet version < 0.2 files have a 16-byte header (4 bytes
        smaller); same tensors, must verify OK."""
        monkeypatch.setenv("YOLO_TPU_WEIGHTS_DIR", str(tmp_path))
        (tmp_path / "mini.weights").write_bytes(b"\x00" * 60)
        mp = _mini_manifest(tmp_path, 64)
        assert zoo.resolve("zoo://mini", manifest_path=mp)

    def test_sha_pin_and_verify(self, tmp_path, monkeypatch):
        monkeypatch.setenv("YOLO_TPU_WEIGHTS_DIR", str(tmp_path))
        wpath = tmp_path / "mini.weights"
        wpath.write_bytes(b"\x01" * 64)
        mp = _mini_manifest(tmp_path, 64)

        sha = zoo.record_sha("mini", str(wpath), manifest_path=mp)
        assert json.load(open(mp))["mini"]["sha256"] == sha
        # pinned hash now verifies...
        assert zoo.resolve("zoo://mini", manifest_path=mp) == str(wpath)
        # ...and a swapped file of the same size is rejected
        wpath.write_bytes(b"\x02" * 64)
        with pytest.raises(ValueError, match="sha256"):
            zoo.resolve("zoo://mini", manifest_path=mp)
        # re-pinning a different hash is refused
        with pytest.raises(ValueError, match="refusing"):
            zoo.record_sha("mini", str(wpath), manifest_path=mp)


def test_cli_zoo_and_zoo_weights_load(tmp_path, monkeypatch):
    """e2e: `zoo list`, `zoo verify`, and predict-path loading via
    --weights zoo://yolov2-tiny-voc (synthesized file of the exact
    official size)."""
    import contextlib
    import io as _io

    import cv2

    from yolo_tpu import cli

    monkeypatch.setenv("YOLO_TPU_WEIGHTS_DIR", str(tmp_path))
    cfg = get_variant("tiny-voc")
    dw.save(str(tmp_path / "yolov2-tiny-voc.weights"), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["zoo", "list"])
    listing = json.loads(buf.getvalue())
    assert listing["yolov2-tiny-voc"]["present"] is True
    assert listing["yolov2"]["present"] is False

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["zoo", "verify", "--name", "yolov2-tiny-voc"])
    assert json.loads(buf.getvalue())["ok"] is True

    img = tmp_path / "in.png"
    cv2.imwrite(str(img), np.random.default_rng(1).integers(
        0, 255, (80, 96, 3), dtype=np.uint8))
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["predict", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", "zoo://yolov2-tiny-voc",
                  "--image", str(img), "--precision", "fp32"])
    # predict prints one JSON object per detection (possibly none);
    # the point here is that zoo:// resolution fed the real load path
    for line in buf.getvalue().strip().splitlines():
        d = json.loads(line)
        assert {"class", "score", "box_xyxy"} <= set(d)


def test_api_load_rejects_backbone_entry(tmp_path, monkeypatch):
    """yolo_tpu.load on a partial (cutoff) zoo entry must explain
    itself instead of crashing in the full-topology loader."""
    import yolo_tpu

    monkeypatch.setenv("YOLO_TPU_WEIGHTS_DIR", str(tmp_path))
    with pytest.raises(ValueError, match="partial backbone"):
        yolo_tpu.load("zoo://darknet19-448-conv23")


def test_train_resolves_zoo_backbone(tmp_path, monkeypatch, capsys):
    """train --weights zoo://darknet19-448-conv23 resolves and
    partial-inits (the feature's whole point)."""
    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.configs.specs import Conv

    monkeypatch.setenv("YOLO_TPU_WEIGHTS_DIR", str(tmp_path))
    cfg = get_variant("coco")
    # synthesize the backbone file at its exact official size
    full = dw.random_params(cfg.layers, np.random.default_rng(0))
    n23 = sum(1 for l in cfg.layers[:23] if isinstance(l, Conv))
    dw.save(str(tmp_path / "darknet19_448.conv.23"), cfg.layers, full,
            cutoff_convs=n23)

    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
    cli.main(["train", "--model", "coco", "--input-size", "64",
              "--weights", "zoo://darknet19-448-conv23",
              "--voc-root", root, "--split", "train", "--batch", "8",
              "--epochs", "1", "--precision", "fp32"])
    assert "partial init: 18/" in capsys.readouterr().err


def test_infer_variant_all_pinned_sizes(tmp_path):
    """Every pinned variant's official byte size auto-detects (sparse
    files: only the size matters to infer_variant)."""
    import os

    from yolo_tpu.configs.variants import VARIANTS

    for name, cfg in VARIANTS.items():
        p = tmp_path / f"{name}.weights"
        with open(p, "wb") as f:
            f.truncate(zoo.expected_weights_bytes(cfg.layers))
        got = zoo.infer_variant(str(p))
        # topology-identical variants at different net sizes
        # (darknet19 vs darknet19-448) are size-indistinguishable:
        # accept any variant with the same byte count
        assert got is not None and (
            zoo.expected_weights_bytes(VARIANTS[got].layers)
            == zoo.expected_weights_bytes(cfg.layers)), name


@pytest.mark.slow
@pytest.mark.parametrize("name,input_size", [("yolov2", 128),
                                             ("yolov3", 128)])
def test_zoo_runbook_offline_e2e(tmp_path, monkeypatch, capsys, name,
                                 input_size):
    """The full real-weights runbook, proven offline (VERDICT r1 item 3):
    synthesize a FULL-SIZE official-byte-count .weights file into the
    cache, then drive zoo:// resolve -> TOFU sha pin -> corruption
    detection -> CLI predict -> CLI eval, so the first networked run has
    zero untested steps (only the download itself is new).
    """
    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli

    manifest = zoo.load_manifest()
    entry = manifest[name]
    cfg = get_variant(entry["variant"])

    # 1. synthetic full-size weights in the cache dir the CLI resolves
    wdir = tmp_path / "cache"
    wdir.mkdir()
    monkeypatch.setenv("YOLO_TPU_WEIGHTS_DIR", str(wdir))
    wpath = wdir / entry["filename"]
    dw.save(str(wpath), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(7),
                             scale=0.05))
    assert os.path.getsize(wpath) == entry["size_bytes"]  # official count

    # 2. resolve passes on size alone (the shipped manifest pins no sha)
    assert zoo.resolve(f"zoo://{name}") == str(wpath)

    # 3. TOFU pin into a manifest COPY (never mutate the shipped one),
    #    then verify the pinned sha gates future resolves
    mp = tmp_path / "manifest.json"
    zoo.save_manifest(manifest, str(mp))
    sha = zoo.record_sha(name, str(wpath), manifest_path=str(mp))
    assert zoo.load_manifest(str(mp))[name]["sha256"] == sha
    assert zoo.resolve(f"zoo://{name}", manifest_path=str(mp)) == str(wpath)
    with open(wpath, "r+b") as f:         # flip one payload byte
        f.seek(entry["size_bytes"] // 2)
        b = f.read(1)
        f.seek(-1, os.SEEK_CUR)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="sha256"):
        zoo.resolve(f"zoo://{name}", manifest_path=str(mp))
    with open(wpath, "r+b") as f:         # restore
        f.seek(entry["size_bytes"] // 2)
        f.write(b)

    # 4. CLI predict through zoo:// (load -> detect -> report)
    import cv2

    img = tmp_path / "frame.png"
    cv2.imwrite(str(img), np.random.default_rng(0).integers(
        0, 255, (96, 120, 3), dtype=np.uint8))
    cli.main(["predict", "--model", entry["variant"],
              "--weights", f"zoo://{name}", "--image", str(img),
              "--input-size", str(input_size), "--precision", "fp32"])
    capsys.readouterr()

    # 5. CLI eval through zoo:// (detect over a VOC split -> mAP JSON)
    root = make_voc_root(tmp_path, n_images=2, size=(80, 90))
    cli.main(["eval", "--model", entry["variant"],
              "--weights", f"zoo://{name}", "--voc-root", root,
              "--split", "train", "--batch", "2",
              "--input-size", str(input_size), "--precision", "fp32"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "map" in res and 0.0 <= res["map"] <= 1.0
