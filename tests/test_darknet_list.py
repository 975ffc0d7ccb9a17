"""Darknet-native dataset format: image list files + YOLO .txt labels
+ .data metadata (data/darknet_list.py) — the format darknet itself
trains from (data.c get_paths/read_boxes/replace_image_to_label,
option_list.c read_data_cfg). Pure-format tests are quick; the CLI
e2es ride the default tier."""

import json
import os

import numpy as np
import pytest

from yolo_tpu.data import darknet_list as dl


# ---------------------------------------------------------------------------
# .data parser
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_parse_data_file(tmp_path):
    p = tmp_path / "obj.data"
    p.write_text(
        "# a comment\n"
        "; another\n"
        "classes = 3\n"
        "train  =  data/train.txt\n"
        "valid=data/test.txt\n"
        "names = obj.names\n"
        "backup = backup/\n"
        "\n"
        "classes = 99\n")  # duplicate: FIRST wins (option_find walk)
    kv = dl.parse_data_file(str(p))
    assert kv == {"classes": "3", "train": "data/train.txt",
                  "valid": "data/test.txt", "names": "obj.names",
                  "backup": "backup/"}


@pytest.mark.quick
def test_parse_data_file_warns_and_skips_non_kv(tmp_path, capsys):
    """darknet's read_data_cfg prints 'Config file error line N' and
    CONTINUES on a non-kv line — same tolerance here, with a
    warning."""
    p = tmp_path / "bad.data"
    p.write_text("classes = 3\njust a line\ntrain = t.txt\n")
    kv = dl.parse_data_file(str(p))
    assert kv == {"classes": "3", "train": "t.txt"}
    assert "bad.data:2" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# label path derivation (replace_image_to_label)
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_label_path_for():
    # the /images/ -> /labels/ swap (AlexeyAB), first occurrence only
    assert dl.label_path_for("/d/images/a.jpg") == "/d/labels/a.txt"
    assert (dl.label_path_for("/d/images/sub/images/a.jpg")
            == "/d/labels/sub/images/a.txt")
    # pjreddie-era VOC layout
    assert (dl.label_path_for("/d/JPEGImages/000.jpg")
            == "/d/labels/000.txt")
    # no matching directory: sibling .txt
    assert dl.label_path_for("/d/obj/a.jpeg") == "/d/obj/a.txt"
    assert dl.label_path_for("rel/a.PNG") == "rel/a.txt"
    # non-image extension: .txt appended, path otherwise untouched
    assert dl.label_path_for("/d/a.weird") == "/d/a.weird.txt"
    # 'images' must be a full path component (no 'preimages' mangling)
    assert dl.label_path_for("/preimages/a.jpg") == "/preimages/a.txt"
    # the find_replace calls CHAIN (each on the previous result), so
    # both /images/ and /JPEGImages/ can fire on one path — darknet
    # yields /labels/labels/ here (code-review finding: an early
    # break reproduced only the first substitution)
    assert (dl.label_path_for("/d/images/JPEGImages/0001.jpg")
            == "/d/labels/labels/0001.txt")


# ---------------------------------------------------------------------------
# YOLO label files (read_boxes)
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_read_label_file(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("1 0.5 0.5 0.25 0.3\n"
                 "\n"
                 "0   0.1 0.2   0.05 0.05\n"
                 "7 0.9 0.9 0.1 0.1\n")  # class id out of range: drops
    boxes, classes, dropped, missing = dl.read_label_file(
        str(p), n_classes=3)
    np.testing.assert_allclose(boxes, [[0.5, 0.5, 0.25, 0.3],
                                       [0.1, 0.2, 0.05, 0.05]])
    np.testing.assert_array_equal(classes, [1, 0])
    assert dropped == 1 and not missing


@pytest.mark.quick
def test_read_label_file_missing_is_background(tmp_path, capsys):
    boxes, classes, dropped, missing = dl.read_label_file(
        str(tmp_path / "nope.txt"), n_classes=3)
    assert boxes.shape == (0, 4) and len(classes) == 0
    assert missing and dropped == 0
    assert "missing" in capsys.readouterr().err
    # quiet mode: the caller aggregates, no per-file print
    dl.read_label_file(str(tmp_path / "nope.txt"), n_classes=3,
                       quiet=True)
    assert "missing" not in capsys.readouterr().err


@pytest.mark.quick
def test_read_label_file_is_token_stream_like_fscanf(tmp_path, capsys):
    """read_boxes is `while (fscanf(file, "%d %f %f %f %f", ...) == 5)`
    — a NEWLINE-AGNOSTIC token stream (code-review finding: a
    line-based parse dropped a second box sharing a line and aborted
    on a box wrapped across lines)."""
    p = tmp_path / "a.txt"
    # two boxes on ONE line: darknet reads both
    p.write_text("0 .5 .5 .2 .2 1 .3 .3 .1 .1\n")
    boxes, classes, dropped, missing = dl.read_label_file(
        str(p), n_classes=3)
    np.testing.assert_allclose(boxes, [[0.5, 0.5, 0.2, 0.2],
                                       [0.3, 0.3, 0.1, 0.1]])
    np.testing.assert_array_equal(classes, [0, 1])
    # one box WRAPPED over two lines: darknet reads it fine
    p.write_text("0 .5 .5\n.2 .2\n")
    boxes, classes, _, _ = dl.read_label_file(str(p), n_classes=3)
    np.testing.assert_allclose(boxes, [[0.5, 0.5, 0.2, 0.2]])
    capsys.readouterr()


@pytest.mark.quick
def test_read_label_file_malformed_stops_like_fscanf(tmp_path, capsys):
    """fscanf stops at the first non-conforming token (silently); we
    stop the file's read too but say so, keeping the boxes before it.
    Under token-stream semantics a short line is NOT malformed — the
    next line's tokens complete the tuple — so the stop cases are a
    non-numeric token and a trailing partial tuple."""
    p = tmp_path / "a.txt"
    # "1 0.5 0.5" + "1 0.6" complete a (garbage but numeric) box;
    # ".6 .1 .1" is a trailing partial — darknet reads TWO boxes here
    p.write_text("1 0.5 0.5 0.25 0.3\n1 0.5 0.5\n1 0.6 0.6 0.1 0.1\n")
    boxes, classes, dropped, missing = dl.read_label_file(
        str(p), n_classes=3)
    assert len(classes) == 2
    np.testing.assert_allclose(boxes[1], [0.5, 0.5, 1.0, 0.6])
    assert "trailing partial" in capsys.readouterr().err
    # a non-numeric token stops the read at that tuple
    p.write_text("1 0.5 0.5 0.25 0.3\n1 x y w h\n")
    boxes, classes, _, _ = dl.read_label_file(str(p), n_classes=3)
    assert len(classes) == 1
    assert "stopping" in capsys.readouterr().err
    p.write_text("1 x y w h\n")
    boxes, classes, _, _ = dl.read_label_file(str(p), n_classes=3)
    assert len(classes) == 0


# ---------------------------------------------------------------------------
# image dimensions (header sniff vs cv2)
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_image_dims_matches_cv2(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    for ext in (".jpg", ".png", ".bmp"):  # bmp exercises the fallback
        p = str(tmp_path / f"im{ext}")
        assert cv2.imwrite(p, img)
        w, h = dl.image_dims(p)
        got = cv2.imread(p)
        assert (w, h) == (got.shape[1], got.shape[0]), ext


def _exif_app1(orientation, byte_order=b"II"):
    import struct as st

    bo = "<" if byte_order == b"II" else ">"
    tiff = (byte_order + st.pack(bo + "H", 42) + st.pack(bo + "I", 8)
            + st.pack(bo + "H", 1)                       # 1 IFD entry
            + st.pack(bo + "HHI", 0x0112, 3, 1)          # orientation
            + st.pack(bo + "H", orientation) + b"\x00\x00"
            + st.pack(bo + "I", 0))                      # next IFD
    return b"Exif\x00\x00" + tiff


@pytest.mark.quick
def test_image_dims_exif_rotation_swaps_without_decode(tmp_path):
    """A JPEG carrying EXIF orientation 6 (90-degree rotation): cv2
    auto-rotates, so the header sniff must report the SWAPPED dims —
    via the APP1 orientation tag, not a full-decode fallback."""
    import struct as st

    for orient, byte_order, want in ((6, b"II", (37, 53)),
                                     (8, b"MM", (37, 53)),
                                     (1, b"II", (53, 37)),
                                     (3, b"MM", (53, 37))):
        app1 = _exif_app1(orient, byte_order)
        jpg = (b"\xff\xd8"
               + b"\xff\xe1" + st.pack(">H", len(app1) + 2) + app1
               + b"\xff\xc0" + st.pack(">H", 17)
               + b"\x08" + st.pack(">HH", 37, 53))  # H=37, W=53
        p = tmp_path / f"exif{orient}_{byte_order.decode()}.jpg"
        p.write_bytes(jpg)
        assert dl.image_dims(str(p)) == want, (orient, byte_order)


@pytest.mark.quick
def test_image_dims_exif_survives_xmp_app1(tmp_path):
    """Phone JPEGs commonly carry a SECOND APP1 segment (XMP) after
    the Exif one; its payload fails the Exif check and must not reset
    the already-parsed orientation (code-review finding: dims came
    back transposed for every such image)."""
    import struct as st

    app1 = _exif_app1(6)
    xmp = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
    jpg = (b"\xff\xd8"
           + b"\xff\xe1" + st.pack(">H", len(app1) + 2) + app1
           + b"\xff\xe1" + st.pack(">H", len(xmp) + 2) + xmp
           + b"\xff\xc0" + st.pack(">H", 17)
           + b"\x08" + st.pack(">HH", 37, 53))  # H=37, W=53
    p = tmp_path / "exif_xmp.jpg"
    p.write_bytes(jpg)
    assert dl.image_dims(str(p)) == (37, 53)  # swapped (orient 6)


# ---------------------------------------------------------------------------
# end-to-end listing
# ---------------------------------------------------------------------------

def _make_darknet_root(tmp_path, n=4, size=(100, 120), layout="images"):
    """A darknet-style dataset: <root>/images/*.jpg + <root>/labels/
    *.txt (or sibling labels), one 'dog' box per image, matching
    tests.test_data_eval.make_voc_root's geometry (pixel box
    20,20..80,70 on a 120x100 image)."""
    import cv2

    root = tmp_path / "dk"
    img_dir = root / ("images" if layout == "images" else "obj")
    img_dir.mkdir(parents=True, exist_ok=True)
    if layout == "images":
        (root / "labels").mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    h, w = size
    paths = []
    # VOC 1-based corners (20,20)-(80,70) == parse_annotation's 0-based
    # (19,19)-(79,69): center (49, 44), wh (60, 50)
    cx, cy = (19 + 79) / 2 / w, (19 + 69) / 2 / h
    bw, bh = 60 / w, 50 / h
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = img_dir / f"im{i}.jpg"
        cv2.imwrite(str(p), img)
        label = (root / "labels" / f"im{i}.txt" if layout == "images"
                 else img_dir / f"im{i}.txt")
        label.write_text(f"11 {cx} {cy} {bw} {bh}\n")  # VOC dog = 11
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths) + "\n")
    return root


@pytest.mark.quick
def test_list_images_both_layouts(tmp_path):
    from yolo_tpu.configs import get_variant

    names = get_variant("tiny-voc").class_names
    for layout in ("images", "sibling"):
        # NB the parent dir must not be named 'images': the swap takes
        # the FIRST /images/ component, exactly like darknet's
        # find_replace (test_label_path_for pins that)
        root = _make_darknet_root(tmp_path / f"lay_{layout}",
                                  layout=layout)
        samples = dl.list_images(str(root / "train.txt"), names)
        assert len(samples) == 4
        for p, ann in samples:
            assert os.path.exists(p)
            assert ann["width"] == 120 and ann["height"] == 100
            np.testing.assert_array_equal(ann["classes"], [11])
            np.testing.assert_allclose(
                ann["boxes"], [[49 / 120, 44 / 100, 0.5, 0.5]],
                atol=1e-6)


@pytest.mark.quick
def test_list_images_relative_paths_resolve_against_list_dir(
        tmp_path, monkeypatch):
    root = _make_darknet_root(tmp_path)
    rel = "\n".join(os.path.join("images", f"im{i}.jpg")
                    for i in range(4))
    (root / "rel.txt").write_text(rel + "\n")
    monkeypatch.chdir("/")  # ensure CWD resolution fails
    samples = dl.list_images(str(root / "rel.txt"), ["x"] * 12)
    assert len(samples) == 4


@pytest.mark.quick
def test_list_images_warns_on_dropped_and_missing(tmp_path, capsys):
    """Wrong-class-count and missing-label tripwires: aggregate
    warnings at list time (the review found the out-of-range drops
    were silent — unlike darknet's per-line 'Wrong annotation' print
    and this repo's own VOC wrong---names tripwire)."""
    root = _make_darknet_root(tmp_path)  # class id 11 in the labels
    # 3-class vocabulary: EVERY line drops -> the loud all-background
    # warning
    dl.list_images(str(root / "train.txt"), ["a", "b", "c"])
    err = capsys.readouterr().err
    assert "4 label lines dropped" in err
    assert "EVERY label line was dropped" in err
    # remove one label file -> aggregate missing warning (once)
    os.remove(root / "labels" / "im0.txt")
    dl.list_images(str(root / "train.txt"), ["x"] * 12)
    err = capsys.readouterr().err
    assert "1/4 label files missing" in err


def test_ground_truth_matches_voc_xml_stack(tmp_path):
    """The SAME dataset expressed as VOC XML and as darknet list+txt
    produces identical eval ground truth."""
    from tests.test_data_eval import make_voc_root
    from yolo_tpu.configs import get_variant
    from yolo_tpu.data.voc import list_split
    from yolo_tpu.eval.runner import build_ground_truth

    names = get_variant("tiny-voc").class_names
    voc = make_voc_root(tmp_path, n_images=4, size=(100, 120))
    gt_voc, _ = build_ground_truth(list_split(voc, "train"), names)
    dk = _make_darknet_root(tmp_path)
    gt_dk, _ = build_ground_truth(
        dl.list_images(str(dk / "train.txt"), names), names)
    assert gt_voc.keys() == gt_dk.keys()
    for k in gt_voc:
        np.testing.assert_allclose(gt_voc[k]["boxes"],
                                   gt_dk[k]["boxes"], atol=1e-4)
        np.testing.assert_array_equal(gt_voc[k]["classes"],
                                      gt_dk[k]["classes"])


# ---------------------------------------------------------------------------
# CLI integration
# ---------------------------------------------------------------------------

def _write_data_file(root, names, *, valid=False):
    (root / "obj.names").write_text("\n".join(names) + "\n")
    txt = (f"classes = {len(names)}\n"
           f"train = train.txt\n"
           f"names = obj.names\n"
           f"backup = backup/\n")
    if valid:
        txt += "valid = train.txt\n"
    (root / "obj.data").write_text(txt)
    return root / "obj.data"


def test_cli_eval_from_data_file(tmp_path, capsys):
    """eval --data: valid= list + names= resolve relative to the .data
    file; scoring injected perfect detections gives mAP 1.0 (the GT
    came from the YOLO txt labels)."""
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant

    names = get_variant("tiny-voc").class_names
    root = _make_darknet_root(tmp_path)
    (root / "obj.data").write_text(
        f"classes = {len(names)}\nvalid = train.txt\n"
        f"names = obj.names\n")
    (root / "obj.names").write_text("\n".join(names) + "\n")
    # perfect detections: the GT box in pixel xyxy, top-left xywh form
    res = [{"image_id": i, "category_id": 11,
            "bbox": [19.0, 19.0, 60.0, 50.0], "score": 0.9}
           for i in range(4)]
    rf = tmp_path / "dets.json"
    rf.write_text(json.dumps(res))
    cli.main(["eval", "--model", "tiny-voc", "--data",
              str(root / "obj.data"), "--from-detections", str(rf)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ap"]["dog"] == pytest.approx(1.0)


def test_cli_eval_data_classes_mismatch_rejects(tmp_path):
    from yolo_tpu import cli

    root = _make_darknet_root(tmp_path)
    (root / "obj.data").write_text("classes = 3\nvalid = train.txt\n")
    with pytest.raises(SystemExit, match="classes=3"):
        cli.main(["eval", "--model", "tiny-voc", "--data",
                  str(root / "obj.data"), "--from-detections",
                  "/dev/null"])


def test_cli_train_from_image_list_e2e(tmp_path):
    """train --image-list: one epoch end-to-end from the darknet-native
    format (8 images, YOLO txt labels)."""
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc", input_size=64)
    w = tmp_path / "w.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = _make_darknet_root(tmp_path, n=8)
    cli.main(["train", "--model", "tiny-voc", "--input-size", "64",
              "--weights", str(w), "--image-list",
              str(root / "train.txt"), "--batch", "8", "--epochs", "1",
              "--precision", "fp32", "--lr", "1e-4"])


def test_cli_train_from_data_file_with_map_eval(tmp_path, capsys):
    """train --data + --eval-every: the .data valid= list auto-fills
    the held-out eval set (darknet's -map behavior) and names= is
    picked up without --names."""
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.configs.darknet_cfg import cfg_to_string
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc", input_size=64)
    root = _make_darknet_root(tmp_path, n=8)
    _write_data_file(root, cfg.class_names, valid=True)
    (tmp_path / "m.cfg").write_text(cfg_to_string(cfg))
    w = tmp_path / "w.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    cli.main(["train", "--cfg", str(tmp_path / "m.cfg"),
              "--weights", str(w), "--data", str(root / "obj.data"),
              "--batch", "8", "--epochs", "1", "--precision", "fp32",
              "--lr", "1e-4", "--eval-every", "1",
              "--eval-max-images", "4"])
    err = capsys.readouterr().err
    assert "scores the TRAINING samples" not in err  # valid= was used


def test_cli_anchors_from_image_list(tmp_path, capsys):
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant

    root = _make_darknet_root(tmp_path, n=6)
    names = get_variant("tiny-voc").class_names
    (root / "obj.names").write_text("\n".join(names) + "\n")
    cli.main(["anchors", "--model", "tiny-voc", "--image-list",
              str(root / "train.txt"), "--num-anchors", "2"])
    out = capsys.readouterr().out
    assert "anchors" in out.lower() or "," in out
