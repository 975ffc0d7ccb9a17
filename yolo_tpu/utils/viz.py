"""Draw detections on images and save (SURVEY.md §2.1 'Viz/output').
Host-side cv2; deterministic per-class colors."""

from __future__ import annotations

from typing import Sequence

import numpy as np


def class_color(cls: int) -> tuple:
    rng = np.random.default_rng(cls * 7919 + 17)
    return tuple(int(v) for v in rng.integers(60, 255, 3))


def draw_detections(image_rgb: np.ndarray, boxes_xyxy, scores, classes,
                    class_names: Sequence[str], valid=None) -> np.ndarray:
    """Returns a copy of image_rgb (H, W, 3 uint8) with boxes+labels.
    Grayscale model inputs ((H, W, 1) or (H, W)) are expanded to RGB
    so the annotation colors render."""
    import cv2

    if image_rgb.ndim == 2:
        image_rgb = image_rgb[..., None]
    if image_rgb.shape[-1] == 1:
        image_rgb = np.repeat(image_rgb, 3, axis=-1)
    out = np.ascontiguousarray(image_rgb.copy())
    n = len(boxes_xyxy)
    for i in range(n):
        if valid is not None and not bool(valid[i]):
            continue
        x1, y1, x2, y2 = (int(round(float(v))) for v in boxes_xyxy[i])
        cls = int(classes[i])
        color = class_color(cls)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        label = f"{class_names[cls]} {float(scores[i]):.2f}"
        (tw, th), _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(out, (x1, max(y1 - th - 6, 0)), (x1 + tw + 2, y1), color, -1)
        cv2.putText(out, label, (x1 + 1, y1 - 4), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (0, 0, 0), 1, cv2.LINE_AA)
    return out


def save_image(path: str, image_rgb: np.ndarray) -> None:
    import cv2

    if not cv2.imwrite(path, cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR)):
        # cv2 returns False (no exception) for missing dirs or
        # unsupported extensions — callers then printed 'wrote <path>'
        # with nothing on disk (code-review finding)
        raise OSError(f"cv2.imwrite failed for {path} (missing "
                      f"directory or unsupported extension?)")
