"""Video-stream input (SURVEY.md §2.1 Preprocess / §3.2 batched
inference — the reference class's webcam/video demo mode, served here by
the batched device-preprocess path).

Video frames are the ideal input for this framework's design: every
frame has the SAME shape, so the whole stream rides exactly one jit
specialization of the raw-RGB detector (models/predict.make_detector),
with the same double-buffered device staging as directory inference.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


def _open_capture(path: str):
    """cv2.VideoCapture for a file path OR a webcam index ("0")."""
    import cv2

    return cv2.VideoCapture(int(path) if path.isdigit() else path)


def video_info(path: str) -> Dict:
    """{'fps', 'width', 'height', 'frames'} for a video source."""
    import cv2

    cap = _open_capture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    info = {"fps": cap.get(cv2.CAP_PROP_FPS) or 30.0,
            "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            "frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT))}
    cap.release()
    return info


def video_batches(path: str, batch_size: int,
                  stride: int = 1,
                  max_frames: Optional[int] = None,
                  channels: int = 3) -> Iterator[Dict]:
    """Decode a video into fixed-shape batches at the model's channel
    count (channels=1: BGR2GRAY, the same BT.601 luma as
    cv2.IMREAD_GRAYSCALE still decode).

    Yields {'images': (B, H, W, C) uint8, 'frames': [frame_index, ...]}
    with the final partial batch padded (repeating its last frame) and
    tagged with 'pad' — the schema `cmd_detect`'s loop already consumes.
    ``stride`` samples every Nth frame (e.g. 3 = 10 Hz from 30 fps).
    A webcam index (e.g. "0") also works where a camera exists.
    """
    import cv2

    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    cap = _open_capture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    try:
        chunk, idxs = [], []
        taken = 0
        idx = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % stride == 0:
                chunk.append(
                    cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)[..., None]
                    if channels == 1
                    else cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                idxs.append(idx)
                taken += 1
                if len(chunk) == batch_size:
                    yield {"images": np.stack(chunk), "frames": idxs}
                    chunk, idxs = [], []
                if max_frames is not None and taken >= max_frames:
                    break
            idx += 1
        if chunk:
            pad = batch_size - len(chunk)
            yield {"images": np.stack(chunk + [chunk[-1]] * pad),
                   "frames": idxs, "pad": pad}
    finally:
        cap.release()


class VideoAnnotator:
    """Write an annotated copy of the stream (detect --save-video)."""

    def __init__(self, out_path: str, fps: float, width: int, height: int):
        import cv2

        self._cv2 = cv2
        self._writer = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
            (width, height))
        if not self._writer.isOpened():
            raise RuntimeError(f"cannot open video writer: {out_path}")

    def write(self, frame_rgb: np.ndarray, boxes, scores, classes,
              class_names, valid) -> None:
        from yolo_tpu.utils.viz import draw_detections

        annotated = draw_detections(frame_rgb, boxes, scores, classes,
                                    class_names, valid)
        self._writer.write(self._cv2.cvtColor(annotated,
                                              self._cv2.COLOR_RGB2BGR))

    def close(self) -> None:
        self._writer.release()
