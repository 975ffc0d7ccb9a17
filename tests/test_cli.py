"""End-to-end CLI tests (SURVEY.md §4.2.6): predict/detect/train/eval/
export driven through the argparse surface, in-process, on the fake-8-CPU
mesh."""

import json
import os

import numpy as np
import pytest

from tests.test_data_eval import make_voc_root
from yolo_tpu import cli
from yolo_tpu.configs import get_variant
from yolo_tpu.io import darknet_weights as dw


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    path = tmp_path_factory.mktemp("w") / "tiny.weights"
    cfg = get_variant("tiny-voc")
    dw.save(str(path), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)), seen=100)
    return str(path)


@pytest.fixture()
def sample_image(tmp_path):
    import cv2

    p = str(tmp_path / "in.png")
    cv2.imwrite(p, np.random.default_rng(1).integers(
        0, 255, (96, 128, 3), dtype=np.uint8))
    return p


def test_predict_e2e(tiny_weights, sample_image, tmp_path, capsys):
    out_img = str(tmp_path / "out.png")
    cli.main(["predict", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--image", sample_image,
              "--conf", "0.1", "--precision", "fp32",
              "--output", out_img])
    lines = capsys.readouterr().out.strip().splitlines()
    for line in lines:
        d = json.loads(line)
        assert set(d) == {"class", "score", "box_xyxy"}
        assert 0 <= d["score"] <= 1
    assert os.path.exists(out_img)


def test_predict_stretch_resize(tiny_weights, sample_image, capsys):
    """--resize stretch (AlexeyAB plain-resize geometry) runs e2e and
    emits valid in-image boxes."""
    cli.main(["predict", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--image", sample_image,
              "--conf", "0.1", "--precision", "fp32",
              "--resize", "stretch"])
    for line in capsys.readouterr().out.strip().splitlines():
        d = json.loads(line)
        x1, y1, x2, y2 = d["box_xyxy"]
        assert 0 <= x1 <= x2 <= 128 and 0 <= y1 <= y2 <= 96


def test_eval_stretch_resize(tiny_weights, tmp_path, capsys):
    """eval --resize stretch (AlexeyAB map-tool geometry) runs e2e."""
    root = make_voc_root(tmp_path, n_images=4, size=(80, 90))
    cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--voc-root", root,
              "--split", "train", "--batch", "4", "--precision", "fp32",
              "--resize", "stretch"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "map" in res and 0.0 <= res["map"] <= 1.0


# (train --resize stretch is now a supported AlexeyAB-parity mode —
# covered by test_train_stretch_e2e below)


def test_detect_host_preprocess_stretch(tiny_weights, tmp_path, capsys):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    for i, shape in enumerate([(64, 64), (50, 90)]):  # heterogeneous
        cv2.imwrite(str(img_dir / f"i{i}.png"),
                    rng.integers(0, 255, (*shape, 3), dtype=np.uint8))
    cli.main(["detect", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--images", str(img_dir),
              "--batch", "2", "--conf", "0.1", "--host-preprocess",
              "--resize", "stretch"])
    recs = [json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert len(recs) == 2
    dims = {"i0.png": (64, 64), "i1.png": (90, 50)}  # (w, h) per file
    for r in recs:
        w, h = dims[os.path.basename(r["image"])]
        for d in r["detections"]:
            x1, y1, x2, y2 = d["box_xyxy"]
            # bounds vs the SOURCE dims catch an un-stretch axis swap
            assert 0 <= x1 <= x2 <= w and 0 <= y1 <= y2 <= h


def test_detect_batched_e2e(tiny_weights, tmp_path, capsys):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"i{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    out_dir = str(tmp_path / "annotated")
    cli.main(["detect", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--images", str(img_dir),
              "--batch", "2", "--conf", "0.1", "--output-dir", out_dir])
    lines = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(l) for l in lines]
    assert len(recs) == 3  # padded batch must not duplicate outputs
    assert {os.path.basename(r["image"]) for r in recs} == {"i0.png", "i1.png", "i2.png"}
    assert sorted(os.listdir(out_dir)) == ["i0.png", "i1.png", "i2.png"]
    annotated = cv2.imread(os.path.join(out_dir, "i0.png"))
    assert annotated.shape == (64, 64, 3)  # source-size, not net-size


def test_train_fail_and_resume_e2e(tiny_weights, tmp_path, capsys):
    """Exercise checkpoint/resume via --fail-after-step (SURVEY.md §5.3)."""
    root = make_voc_root(tmp_path, n_images=16, size=(80, 90))
    ckdir = str(tmp_path / "ck")
    common = ["train", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--voc-root", root,
              "--split", "train", "--batch", "8", "--lr", "1e-4",
              "--precision", "fp32", "--checkpoint-dir", ckdir,
              "--checkpoint-every", "1", "--log-every", "1"]
    with pytest.raises(SystemExit, match="fail-after-step"):
        cli.main(common + ["--fail-after-step", "1", "--epochs", "1"])
    assert os.path.isdir(os.path.join(ckdir, "step_1"))

    cli.main(common + ["--resume", os.path.join(ckdir, "step_1"),
                       "--epochs", "1"])
    assert os.path.isdir(os.path.join(ckdir, "final"))

    from yolo_tpu.io import checkpoint as ckpt

    final = ckpt.restore(os.path.join(ckdir, "final"))
    assert int(np.asarray(final["step"])) == 3  # 1 before fail + 2 after


@pytest.mark.slow
def test_resume_adapts_ema_track_mismatch(tiny_weights, tmp_path, capsys):
    """A pre-EMA checkpoint resumed with --ema-alpha starts an EMA
    track from the restored weights; an EMA checkpoint resumed without
    it drops the track — neither direction dies on a pytree-structure
    mismatch (code-review finding)."""
    root = make_voc_root(tmp_path, n_images=16, size=(80, 90))
    ckdir = str(tmp_path / "ck")
    common = ["train", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--voc-root", root,
              "--split", "train", "--batch", "8", "--lr", "1e-4",
              "--precision", "fp32", "--checkpoint-dir", ckdir,
              "--checkpoint-every", "1", "--log-every", "1"]
    with pytest.raises(SystemExit, match="fail-after-step"):
        cli.main(common + ["--fail-after-step", "1", "--epochs", "1"])

    from yolo_tpu.io import checkpoint as ckpt

    step1 = os.path.join(ckdir, "step_1")
    assert not ckpt.has_top_level_key(step1, "ema_params")

    # no-EMA checkpoint + --ema-alpha: track starts from the weights
    cli.main(common + ["--resume", step1, "--epochs", "1",
                       "--ema-alpha", "0.9"])
    assert "starting one from the restored weights" in \
        capsys.readouterr().err
    final = os.path.join(ckdir, "final")
    assert ckpt.has_top_level_key(final, "ema_params")

    # EMA checkpoint resumed withOUT ema: track dropped, no crash;
    # the new final overwrites the old one without the track
    cli.main(common + ["--resume", final, "--epochs", "1"])
    assert "dropping it" in capsys.readouterr().err
    assert not ckpt.has_top_level_key(final, "ema_params")


def test_eval_and_export_e2e(tiny_weights, tmp_path, capsys):
    root = make_voc_root(tmp_path, n_images=4, size=(80, 90))
    pr_file = str(tmp_path / "pr.json")
    cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--voc-root", root,
              "--split", "train", "--batch", "4", "--precision", "fp32",
              "--save-pr", pr_file])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert "map" in res and 0.0 <= res["map"] <= 1.0
    curves = json.loads(open(pr_file).read())
    for name, c in curves.items():
        assert name in get_variant("tiny-voc").class_names
        assert len(c["scores"]) == len(c["recall"]) == len(c["precision"])
    # --save-pr is VOC-protocol only — and the conflict is validated
    # BEFORE the model runs: a weights file that does not exist never
    # gets the chance to fail first (code-review finding: the check
    # used to fire after the full eval sweep)
    with pytest.raises(SystemExit, match="save-pr"):
        cli.main(["eval", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", str(tmp_path / "never_loaded.weights"),
                  "--voc-root", root,
                  "--split", "train", "--metric", "coco",
                  "--save-pr", pr_file])
    capsys.readouterr()

    # export path: train checkpoint -> darknet file, reloadable
    ck = tmp_path / "ck2"
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.train.loop import TrainConfig, init_state

    cfg = get_variant("tiny-voc")
    params = dw.random_params(cfg.layers, np.random.default_rng(3))
    state = init_state(params, TrainConfig(), seen=42)
    import jax
    ckpt.save(str(ck), jax.device_get(dict(state)))
    out_w = str(tmp_path / "exported.weights")
    cli.main(["export", "--model", "tiny-voc", "--checkpoint", str(ck),
              "--output", out_w])
    loaded, header = dw.load(out_w, cfg.layers)
    assert header["seen"] == 42
    np.testing.assert_allclose(loaded[0]["kernel"], params[0]["kernel"],
                               rtol=1e-6)


def test_train_multi_scale_e2e(tiny_weights, tmp_path):
    """Config-5 shape (BASELINE.json:11) at CPU-friendly sizes: the jit
    cache must bucket per input size and GT grids must follow."""
    root = make_voc_root(tmp_path, n_images=16, size=(70, 80))
    cli.main(["train", "--model", "tiny-voc", "--input-size", "64",
              "--weights", tiny_weights, "--voc-root", root,
              "--split", "train", "--batch", "8", "--epochs", "1",
              "--precision", "fp32", "--multi-scale",
              "--multi-scale-sizes", "64,96", "--seed", "3",
              "--log-every", "1"])


def test_profile_trace_written(tiny_weights, sample_image, tmp_path, capsys):
    trace_dir = str(tmp_path / "trace")
    cli.main(["predict", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--image", sample_image,
              "--precision", "fp32", "--profile-dir", trace_dir])
    capsys.readouterr()
    import glob
    assert glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True), \
        "no trace files written"


def test_predict_int8_e2e(tiny_weights, sample_image, capsys):
    cli.main(["predict", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--image", sample_image,
              "--conf", "0.1", "--precision", "int8"])
    out = capsys.readouterr()
    assert "int8 PTQ: calibrated" in out.err
    for line in out.out.strip().splitlines():
        d = json.loads(line)
        assert 0 <= d["score"] <= 1


def test_train_with_augment_e2e(tiny_weights, tmp_path):
    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
    cli.main(["train", "--model", "tiny-voc", "--input-size", "64",
              "--weights", tiny_weights, "--voc-root", root,
              "--split", "train", "--batch", "8", "--epochs", "1",
              "--precision", "fp32", "--augment", "--seed", "1"])


def test_detect_host_preprocess_mixed_sizes(tiny_weights, tmp_path, capsys):
    import cv2

    img_dir = tmp_path / "mixed"
    img_dir.mkdir()
    rng = np.random.default_rng(6)
    for i, (h, w) in enumerate([(64, 96), (96, 64), (80, 80)]):
        cv2.imwrite(str(img_dir / f"m{i}.png"),
                    rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    cli.main(["detect", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--images", str(img_dir),
              "--batch", "2", "--conf", "0.1", "--precision", "fp32",
              "--host-preprocess"])
    recs = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(recs) == 3
    for r in recs:
        for d in r["detections"]:
            assert 0 <= d["score"] <= 1


def test_public_api_load(tiny_weights):
    import yolo_tpu

    model = yolo_tpu.load(tiny_weights, "tiny-voc", input_size=96,
                          precision="fp32", conf_threshold=0.1)
    imgs = np.random.default_rng(0).integers(0, 256, (2, 64, 80, 3),
                                             dtype=np.uint8)
    out = model(imgs)
    assert out["boxes"].shape[0] == 2
    assert out["valid"].dtype == bool


def test_public_api_variant_autodetect(tiny_weights, tmp_path):
    """yolo_tpu.load with variant=None matches the file size against the
    darknet topologies (io/zoo.infer_variant)."""
    import pytest

    import yolo_tpu
    from yolo_tpu.io.zoo import infer_variant

    assert infer_variant(tiny_weights) == "tiny-voc"
    model = yolo_tpu.load(tiny_weights, input_size=96, precision="fp32")
    assert model.cfg.name == "tiny-yolov2-voc"

    bogus = tmp_path / "b.weights"
    bogus.write_bytes(b"\x00" * 1000)
    with pytest.raises(ValueError, match="cannot infer"):
        yolo_tpu.load(str(bogus))


def test_train_partial_backbone_init(tiny_weights, tmp_path, capsys):
    """Training from a darknet `partial` backbone file: prefix loaded,
    head randomly initialized (the darknet19_448.conv.23 workflow)."""
    cfg = get_variant("tiny-voc")
    params, header, n = dw.load_partial(tiny_weights, cfg.layers)
    backbone = str(tmp_path / "tiny.conv.12")
    dw.save(backbone, cfg.layers, params, cutoff_convs=6)

    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
    cli.main(["train", "--model", "tiny-voc", "--input-size", "64",
              "--weights", backbone, "--voc-root", root,
              "--split", "train", "--batch", "8", "--epochs", "1",
              "--precision", "fp32"])
    err = capsys.readouterr().err
    assert "partial init: 6/9 weighted layers" in err


def test_train_eval_every(tiny_weights, tmp_path, capsys):
    """--eval-every logs mid-training validation mAP (folded from the
    live train params)."""
    root = make_voc_root(tmp_path, n_images=16, size=(70, 80))
    log = str(tmp_path / "m.jsonl")
    ckdir = str(tmp_path / "ck")
    cli.main(["train", "--model", "tiny-voc", "--input-size", "64",
              "--weights", tiny_weights, "--voc-root", root,
              "--split", "train", "--batch", "8", "--epochs", "1",
              "--precision", "fp32", "--eval-every", "2",
              "--eval-max-images", "4", "--log-file", log,
              "--checkpoint-dir", ckdir, "--checkpoint-every", "1000"])
    err = capsys.readouterr().err
    assert "validation mAP" in err
    vals = [json.loads(l) for l in open(log) if "val_map" in l]
    assert vals and all(0.0 <= v["val_map"] <= 1.0 for v in vals)
    # first eval always improves on -1 -> a best checkpoint exists
    assert os.path.isdir(os.path.join(ckdir, "best"))


def test_detect_recursive(tiny_weights, tmp_path, capsys):
    import cv2

    root = tmp_path / "nested"
    (root / "a" / "b").mkdir(parents=True)
    rng = np.random.default_rng(5)
    cv2.imwrite(str(root / "top.png"),
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    cv2.imwrite(str(root / "a" / "b" / "deep.png"),
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    cli.main(["detect", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--images", str(root),
              "--batch", "2", "--conf", "0.1", "--recursive"])
    recs = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {os.path.basename(r["image"]) for r in recs} == {"top.png",
                                                            "deep.png"}


def test_train_stretch_e2e(tiny_weights, tmp_path, capsys):
    """train --resize stretch (AlexeyAB letter_box=0 geometry) runs
    end-to-end, including the stretch-geometry validation eval."""
    root = make_voc_root(tmp_path, n_images=8, size=(80, 90))
    cli.main(["train", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--voc-root", root,
              "--split", "train", "--batch", "8", "--lr", "1e-4",
              "--precision", "fp32", "--epochs", "1",
              "--resize", "stretch", "--eval-every", "1"])
    err = capsys.readouterr().err
    assert "stretch (letter_box=0) geometry" in err
    assert "validation mAP" in err


def test_doctor(capsys):
    """doctor prints one JSON environment report; the bounded compute
    probe either succeeds or reports a stall (never hangs doctor)."""
    cli.main(["doctor", "--probe-timeout", "30"])
    rep = json.loads(capsys.readouterr().out)
    assert "compute_probe" in rep and "device_count" in rep
    assert rep["native_letterbox"] in ("native", "numpy-fallback")
    assert isinstance(rep["zoo_present"], list)
    assert rep["cv2"] is True
    assert rep["compute_probe"] == "ok" or "STALLED" in \
        rep["compute_probe"] or "failed" in rep["compute_probe"]


def test_eval_save_voc_dir_comp4(tmp_path, capsys):
    """--save-voc-dir writes darknet `detector valid` comp4 files:
    one comp4_det_test_<class>.txt PER class (empty ones included,
    like darknet's upfront fopen loop), VOC-devkit 1-based pixel
    corners (+1, clamped to [1, w] x [1, h]), '%f' formatting, image
    id = basename sans extension. Driven via --from-detections so the
    exact numbers are deterministic (no model run)."""
    root = make_voc_root(tmp_path, n_images=2, size=(100, 120))
    cfg = get_variant("tiny-voc")
    dog = cfg.class_names.index("dog")
    cat = cfg.class_names.index("cat")
    res = [
        # x1=-5 -> xmin clamps to 1; y2=202 -> ymax clamps to h=100
        {"image_id": 0, "category_id": dog,
         "bbox": [-5.0, 2.0, 30.0, 200.0], "score": 0.9},
        # interior box on the second image, different class
        {"image_id": 1, "category_id": cat,
         "bbox": [10.0, 20.0, 40.0, 30.0], "score": 0.25},
    ]
    res_file = tmp_path / "dets.json"
    res_file.write_text(json.dumps(res))
    out_dir = tmp_path / "results"
    cli.main(["eval", "--model", "tiny-voc", "--voc-root", root,
              "--split", "train", "--from-detections", str(res_file),
              "--save-voc-dir", str(out_dir)])
    err = capsys.readouterr().err
    assert "comp4_det_test_*.txt" in err
    files = sorted(os.listdir(out_dir))
    assert files == sorted(f"comp4_det_test_{n}.txt"
                           for n in cfg.class_names)
    dog_lines = (out_dir / "comp4_det_test_dog.txt").read_text()
    assert dog_lines == ("000000 0.900000 1.000000 3.000000 "
                         "26.000000 100.000000\n")
    cat_lines = (out_dir / "comp4_det_test_cat.txt").read_text()
    assert cat_lines == ("000001 0.250000 11.000000 21.000000 "
                         "51.000000 51.000000\n")
    # every other class file exists and is empty
    for n in cfg.class_names:
        if n not in ("dog", "cat"):
            assert (out_dir / f"comp4_det_test_{n}.txt").read_text() == ""


# --- cfg-key -> CLI training behavior e2es (moved out of the
# quick-marked test_darknet_cfg.py module: 15-55 s apiece, they
# pin CLI behavior, not an oracle — quick-tier budget hygiene) ---

def test_cli_train_cfg_random_enables_multiscale(tmp_path, capsys):
    """A cfg with random=1 turns on darknet multi-scale training
    without --multi-scale (and says so)."""
    import numpy as np

    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.configs.darknet_cfg import cfg_to_string
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc", input_size=64)
    text = cfg_to_string(cfg).replace("[region]\n", "[region]\nrandom=1\n",
                                      1)
    (tmp_path / "m.cfg").write_text(text)
    (tmp_path / "m.names").write_text("\n".join(cfg.class_names) + "\n")
    w = tmp_path / "w.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
    cli.main(["train", "--cfg", str(tmp_path / "m.cfg"),
              "--names", str(tmp_path / "m.names"), "--weights", str(w),
              "--voc-root", root, "--split", "train", "--batch", "8",
              "--epochs", "1", "--precision", "fp32", "--lr", "1e-4"])
    assert "random=1: multi-scale training enabled" in capsys.readouterr().err


def test_cli_train_fractional_random_sets_resize_range(tmp_path, capsys):
    """AlexeyAB fractional random (random=1.3): the multi-scale sizes
    become the [net/1.3, net*1.3] range snapped to 32-multiples
    (64 -> 64..96 here), not darknet's fixed 320..608 ladder."""
    import numpy as np

    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.configs.darknet_cfg import cfg_to_string
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc", input_size=64)
    text = cfg_to_string(cfg).replace("[region]\n",
                                      "[region]\nrandom=1.3\n", 1)
    (tmp_path / "m.cfg").write_text(text)
    (tmp_path / "m.names").write_text("\n".join(cfg.class_names) + "\n")
    w = tmp_path / "w.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
    cli.main(["train", "--cfg", str(tmp_path / "m.cfg"),
              "--names", str(tmp_path / "m.names"), "--weights", str(w),
              "--voc-root", root, "--split", "train", "--batch", "8",
              "--epochs", "1", "--precision", "fp32", "--lr", "1e-4"])
    # 64/1.3 = 49.2 -> 64 (max(32, round(49.2/32)*32) = 64... round
    # gives 2*32=64? 49.2/32=1.54 -> round 2 -> 64); 64*1.3 = 83.2 ->
    # round(2.6)*32 = 96
    assert "multi-scale range 64..96" in capsys.readouterr().err


def test_cfg_augment_keys_auto_enable_and_no_augment(tmp_path, capsys):
    """A cfg carrying augmentation keys enables darknet-style
    augmentation without --augment (with a note); --no-augment turns
    it off."""
    import numpy as np

    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.configs.darknet_cfg import cfg_to_string
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc", input_size=64)
    text = cfg_to_string(cfg).replace("[net]\n",
                                      "[net]\nsaturation=1.3\n", 1)
    (tmp_path / "m.cfg").write_text(text)
    (tmp_path / "m.names").write_text("\n".join(cfg.class_names) + "\n")
    w = tmp_path / "w.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
    common = ["train", "--cfg", str(tmp_path / "m.cfg"),
              "--names", str(tmp_path / "m.names"), "--weights", str(w),
              "--voc-root", root, "--split", "train", "--batch", "8",
              "--epochs", "1", "--precision", "fp32", "--lr", "1e-4"]
    cli.main(common)
    assert "augmentation enabled (disable with --no-augment)" \
        in capsys.readouterr().err
    cli.main(common + ["--no-augment"])
    assert "augmentation enabled" not in capsys.readouterr().err


def test_save_labels_pseudo_labeling(tiny_weights, tmp_path, capsys):
    """--save-labels (darknet -save_labels): detect over an images/
    dir writes YOLO-format .txt labels into the derived labels/ dir
    (replace_image_to_label chain), each line '%d %2.4f x4' with
    relative cx/cy/w/h that round-trip through read_label_file to the
    printed pixel detections; predict writes the sibling .txt."""
    import cv2

    from yolo_tpu.data.darknet_list import read_label_file

    img_dir = tmp_path / "ds" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(4)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"i{i}.png"),
                    rng.integers(0, 255, (64, 80, 3), dtype=np.uint8))
    cli.main(["detect", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--images", str(img_dir),
              "--batch", "2", "--conf", "0.1", "--precision", "fp32",
              "--save-labels"])
    recs = {os.path.basename(json.loads(l)["image"]): json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()}
    lbl_dir = tmp_path / "ds" / "labels"
    assert sorted(os.listdir(lbl_dir)) == ["i0.txt", "i1.txt"]
    for i in range(2):
        txt = (lbl_dir / f"i{i}.txt").read_text()
        dets = recs[f"i{i}.png"]["detections"]
        lines = [l for l in txt.splitlines() if l]
        assert len(lines) == len(dets)
        for l in lines:  # darknet's exact %d %2.4f formatting
            parts = l.split(" ")
            assert len(parts) == 5 and parts[0].isdigit()
            assert all("." in p and len(p.split(".")[1]) == 4
                       for p in parts[1:])
        # round-trip: read_label_file returns relative cxcywh that
        # must reproduce the printed pixel boxes
        rel_boxes, _cls, dropped, missing = read_label_file(
            str(lbl_dir / f"i{i}.txt"), 20)
        assert not missing and dropped == 0
        assert len(rel_boxes) == len(dets)
        want = sorted(
            [((x1 + x2) / 2 / 80, (y1 + y2) / 2 / 64,
              (x2 - x1) / 80, (y2 - y1) / 64)
             for (x1, y1, x2, y2) in (d["box_xyxy"] for d in dets)])
        np.testing.assert_allclose(
            sorted(map(tuple, rel_boxes.tolist())), want,
            atol=3e-3)  # %2.4f quantization + the JSON's 0.1-px
        # rounding (two rounded corners differenced: up to 0.1 px)

    # predict: sibling .txt next to the image (no /images/ component)
    solo = tmp_path / "solo.png"
    cv2.imwrite(str(solo),
                rng.integers(0, 255, (64, 80, 3), dtype=np.uint8))
    cli.main(["predict", "--model", "tiny-voc", "--input-size", "96",
              "--weights", tiny_weights, "--image", str(solo),
              "--conf", "0.1", "--precision", "fp32", "--save-labels"])
    out_lines = capsys.readouterr().out.strip().splitlines()
    assert (tmp_path / "solo.txt").exists()
    n_lines = len([l for l in
                   (tmp_path / "solo.txt").read_text().splitlines()
                   if l])
    assert n_lines == len(out_lines)


def test_save_labels_rejected_on_video(tiny_weights, tmp_path):
    with pytest.raises(SystemExit, match="save-labels"):
        cli.main(["detect", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", tiny_weights, "--video", "0",
                  "--save-labels"])
