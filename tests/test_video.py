"""Video input pipeline + CLI video detection tests (data/video.py)."""

import json

import numpy as np
import pytest

from yolo_tpu.data.video import video_batches, video_info


def _write_video(path, n_frames=7, w=64, h=48, fps=10):
    import cv2

    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                             fps, (w, h))
    assert writer.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(n_frames):
        writer.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()
    return str(path)


class TestVideoBatches:
    def test_shapes_and_padding(self, tmp_path):
        p = _write_video(tmp_path / "v.avi", n_frames=7)
        batches = list(video_batches(p, batch_size=3))
        assert [b["images"].shape for b in batches] == [(3, 48, 64, 3)] * 3
        assert [b["frames"] for b in batches] == [[0, 1, 2], [3, 4, 5], [6]]
        assert batches[-1]["pad"] == 2
        # padded rows repeat the last real frame
        np.testing.assert_array_equal(batches[-1]["images"][1],
                                      batches[-1]["images"][0])

    def test_stride_and_max_frames(self, tmp_path):
        p = _write_video(tmp_path / "v.avi", n_frames=10)
        batches = list(video_batches(p, batch_size=2, stride=3))
        assert [b["frames"] for b in batches] == [[0, 3], [6, 9]]
        batches = list(video_batches(p, batch_size=2, max_frames=3))
        assert sum(len(b["frames"]) for b in batches) == 3

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            list(video_batches("/nonexistent.avi", 2))

    def test_video_info(self, tmp_path):
        p = _write_video(tmp_path / "v.avi", n_frames=5, w=64, h=48, fps=10)
        info = video_info(p)
        assert (info["width"], info["height"]) == (64, 48)
        assert info["frames"] == 5
        assert info["fps"] == pytest.approx(10, abs=0.5)


def test_cli_detect_video(tmp_path):
    """e2e: one jit bucket over a whole stream + annotated MJPG copy."""
    import contextlib
    import io as _io

    import cv2

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    vid = _write_video(tmp_path / "in.avi", n_frames=5, w=96, h=80)
    wpath = str(tmp_path / "w.weights")
    cfg = get_variant("tiny-voc")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(1)))

    out_vid = str(tmp_path / "out.avi")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["detect", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", wpath, "--video", vid, "--batch", "2",
                  "--precision", "fp32", "--save-video", out_vid])
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert [l["frame"] for l in lines] == [0, 1, 2, 3, 4]
    for l in lines:
        for d in l["detections"]:
            assert {"class", "score", "box_xyxy"} <= set(d)

    cap = cv2.VideoCapture(out_vid)
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 5


def test_stride_validation():
    import pytest

    with pytest.raises(ValueError, match="stride"):
        list(video_batches("whatever.avi", 2, stride=0))


def test_cli_detect_video_int8(tmp_path):
    """detect --video --precision int8 must actually quantize (was
    silently skipped before): calibrates on the stream's first frames."""
    import contextlib
    import io as _io
    import sys

    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw

    vid = _write_video(tmp_path / "in.avi", n_frames=3, w=96, h=80)
    wpath = str(tmp_path / "w.weights")
    cfg = get_variant("tiny-voc")
    dw.save(wpath, cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(1)))

    buf, err = _io.StringIO(), _io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(err):
        cli.main(["detect", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", wpath, "--video", vid, "--batch", "2",
                  "--precision", "int8"])
    assert "int8 PTQ: calibrated" in err.getvalue()
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert [l["frame"] for l in lines] == [0, 1, 2]
