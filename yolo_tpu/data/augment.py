"""Darknet-style training augmentation (data_augmentation in darknet's
load_data_detection: random crop/jitter, horizontal flip, HSV distortion
— yolov2-voc.cfg: jitter=0.3, hue=0.1, saturation=1.5, exposure=1.5).

Host-side numpy/cv2, applied per image in the data-pipeline workers
before letterboxing. Boxes are normalized (cx, cy, w, h)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    flip: bool = True
    jitter: float = 0.3
    hue: float = 0.1
    saturation: float = 1.5
    exposure: float = 1.5
    min_box_visibility: float = 0.25  # drop boxes mostly cropped away
    # yolov4 mosaic (AlexeyAB mosaic=1): each training image is a
    # 4-image composite at a random cut point (pipeline-level; needs
    # the dataset, so train_batches drives it, not augment())
    mosaic: bool = False
    # AlexeyAB mixup=1: blend each training image 0.5/0.5 with a second
    # random sample (blend_images_cv) and CONCATENATE the truths —
    # pipeline-level like mosaic (cross-record); combining with mosaic
    # is rejected (darknet's mosaic+mixup combos are a separate mode)
    mixup: bool = False
    # CLASSIFIER scale/rotation augmentation (darknet data.c
    # random_augment_image, driven by [net] angle/aspect/min_crop/
    # max_crop in classifier cfgs; detector training ignores them,
    # like darknet's load_data_detection does): pick a target short
    # side r ~ U{min_crop..max_crop}, an aspect distortion
    # rand_scale(aspect), a rotation U(-angle, angle) degrees and a
    # random center offset, then resample one net-size output with the
    # rotate_crop_image inverse map. "darknet-style" like jitter_crop:
    # the geometry is random_augment_image's formula, the resampling
    # is cv2 bilinear with edge replication (darknet clamps coords).
    # angle=0/aspect=1/min_crop=max_crop=0 disables.
    angle: float = 0.0
    aspect: float = 1.0
    min_crop: int = 0
    max_crop: int = 0
    # AlexeyAB [net] blur (image_opencv.cpp image_data_augmentation):
    # 0 disables. Per image a tri-state draw picks none / BACKGROUND
    # blur (cv2.GaussianBlur ksize 17, sigma 0 i.e. cv2's
    # ksize-derived sigma, with every truth-box region copied back
    # sharp) / FULL-frame blur with ksize = (blur//2)*2 + 1 (blur=1
    # cfgs collapse to the background mode). The GaussianBlur formula
    # is cv2-pinned; the tri-state split and the application site
    # (here: after HSV, before letterbox — darknet blurs the
    # network-sized image) are RECALL-GRADE, labeled like the
    # weighted-shortcut normalization constants (reference absent,
    # zero egress — re-verify the day tooling exists).
    blur: int = 0
    # AlexeyAB [net] gaussian_noise: additive zero-mean gaussian,
    # sigma = min(value, 127) (image_opencv.cpp clamps), saturate-
    # clipped into u8; applied to half the images (coin flip). The
    # distribution/clamp is the pinned formula; the per-image gate and
    # darknet's u8-saturation order (cv2.randn writes the noise into a
    # u8 mat BEFORE adding) are RECALL-GRADE — this implementation
    # adds float noise then saturates, the formula-clean reading.
    gaussian_noise: float = 0.0

    @property
    def classifier_geometry(self) -> bool:
        """True when any classifier scale/rotation key is active."""
        return bool(self.angle or self.aspect != 1.0
                    or self.min_crop or self.max_crop)


def _rand_scale(rng: np.random.Generator, s: float) -> float:
    """darknet rand_scale: uniform in [1, s], inverted half the time.
    s < 1 samples [s, 1] — darknet's rand_uniform swaps a reversed
    range (numpy's Generator.uniform rejects it instead)."""
    lo, hi = (1.0, s) if s >= 1.0 else (s, 1.0)
    v = rng.uniform(lo, hi)
    return v if rng.uniform() < 0.5 else 1.0 / v


def distort_hsv(img_u8: np.ndarray, rng: np.random.Generator,
                cfg: AugmentConfig) -> np.ndarray:
    import cv2

    # no-op ONLY at darknet's parse defaults (sat/exp 1, hue 0):
    # saturation/exposure BELOW 1 still distort in darknet —
    # rand_scale over the reversed range (code-review finding: a
    # <=1 gate silently disabled them)
    if cfg.hue == 0 and cfg.saturation == 1 and cfg.exposure == 1:
        return img_u8
    if img_u8.ndim == 2 or img_u8.shape[-1] == 1:
        # grayscale ([net] channels=1): AlexeyAB image_data_augmentation
        # applies ONLY the exposure scale when the image isn't
        # 3-channel (no HSV space to distort) — recall-pinned like the
        # weighted-shortcut constants. The hue/saturation draws still
        # happen, in the RGB path's order, so a seed produces the same
        # exposure factor in both channel modes.
        rng.uniform(-cfg.hue, cfg.hue)
        _rand_scale(rng, cfg.saturation)
        dexp = _rand_scale(rng, cfg.exposure)
        return np.clip(np.rint(img_u8.astype(np.float32) * dexp),
                       0, 255).astype(np.uint8)
    hsv = cv2.cvtColor(img_u8, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 0] = (hsv[..., 0] + rng.uniform(-cfg.hue, cfg.hue) * 180.0) % 180.0
    hsv[..., 1] = np.clip(hsv[..., 1] * _rand_scale(rng, cfg.saturation), 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] * _rand_scale(rng, cfg.exposure), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def jitter_crop(img_u8: np.ndarray, boxes: np.ndarray, classes: np.ndarray,
                rng: np.random.Generator, cfg: AugmentConfig):
    """Random crop with darknet-style jitter on each edge; boxes
    re-normalized to the crop, clipped, low-visibility boxes dropped."""
    h, w = img_u8.shape[:2]
    dw, dh = int(w * cfg.jitter), int(h * cfg.jitter)
    left = rng.integers(-dw, dw + 1)
    right = rng.integers(-dw, dw + 1)
    top = rng.integers(-dh, dh + 1)
    bottom = rng.integers(-dh, dh + 1)
    # darknet crop_image lets the window extend BEYOND the image
    # (negative pleft/ptop or swidth past the edge), reading clamped
    # coordinates = edge replication — the zoom-out half of the
    # jitter distribution; clamping the window to the image collapsed
    # every expansion draw onto a no-op (code-review finding)
    x1, x2 = int(left), int(w - right)
    y1, y2 = int(top), int(h - bottom)
    if x2 - x1 < w // 4 or y2 - y1 < h // 4:
        return img_u8, boxes, classes
    pad_l, pad_t = max(0, -x1), max(0, -y1)
    pad_r, pad_b = max(0, x2 - w), max(0, y2 - h)
    src = img_u8
    if pad_l or pad_t or pad_r or pad_b:
        import cv2

        src = cv2.copyMakeBorder(img_u8, pad_t, pad_b, pad_l, pad_r,
                                 cv2.BORDER_REPLICATE)
        if src.ndim == 2 and img_u8.ndim == 3:
            src = src[..., None]   # cv2 drops the C=1 axis (gray)
    crop = src[y1 + pad_t:y2 + pad_t, x1 + pad_l:x2 + pad_l]
    cw, ch = x2 - x1, y2 - y1

    if len(boxes) == 0:
        return crop, boxes, classes
    b = boxes.astype(np.float64)
    # to pixel corners, shift, clip to crop, back to normalized xywh
    px1 = np.clip(b[:, 0] * w - b[:, 2] * w / 2 - x1, 0, cw)
    py1 = np.clip(b[:, 1] * h - b[:, 3] * h / 2 - y1, 0, ch)
    px2 = np.clip(b[:, 0] * w + b[:, 2] * w / 2 - x1, 0, cw)
    py2 = np.clip(b[:, 1] * h + b[:, 3] * h / 2 - y1, 0, ch)
    nw, nh = (px2 - px1) / cw, (py2 - py1) / ch
    visibility = np.where(
        b[:, 2] * b[:, 3] > 0,
        (nw * cw / w / np.maximum(b[:, 2], 1e-9)) *
        (nh * ch / h / np.maximum(b[:, 3], 1e-9)), 0.0)
    keep = (nw > 0.001) & (nh > 0.001) & (visibility >= cfg.min_box_visibility)
    out = np.stack([(px1 + px2) / 2 / cw, (py1 + py2) / 2 / ch, nw, nh],
                   axis=-1)[keep].astype(np.float32)
    return crop, out, classes[keep]


def rotate_scale_crop(img_u8: np.ndarray, size: int, *, rad: float,
                      scale: float, aspect: float, dx: float,
                      dy: float) -> np.ndarray:
    """darknet image.c rotate_crop_image as one cv2 warpAffine: output
    pixel (x, y) samples the input at
      R(rad) @ diag(aspect/scale, 1/scale) @ (x - size/2 + dx,
                                              y - size/2 + dy) + center
    (bilinear, coordinates clamped to the image = BORDER_REPLICATE)."""
    import cv2

    h, w = img_u8.shape[:2]
    cosr, sinr = float(np.cos(rad)), float(np.sin(rad))
    ax, ay = aspect / scale, 1.0 / scale
    ox, oy = dx - size / 2.0, dy - size / 2.0
    m = np.array(
        [[cosr * ax, -sinr * ay, w / 2.0 + cosr * ax * ox - sinr * ay * oy],
         [sinr * ax, cosr * ay, h / 2.0 + sinr * ax * ox + cosr * ay * oy]],
        np.float32)
    out = cv2.warpAffine(
        img_u8, m, (size, size),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_REPLICATE)
    return out[..., None] if out.ndim == 2 and img_u8.ndim == 3 else out


def random_augment_classifier(img_u8: np.ndarray,
                              rng: np.random.Generator,
                              cfg: AugmentConfig,
                              size: int) -> np.ndarray:
    """darknet data.c random_augment_image: aspect = rand_scale(aspect);
    r = rand_int(min_crop, max_crop) becomes the scaled short side
    (scale = r / min(h, w*aspect)); rotation U(-angle, angle) degrees;
    center offset U(±(scaled_extent - size)/2) per axis; one size×size
    resample. Returns uint8 (size, size, 3)."""
    h, w = img_u8.shape[:2]
    aspect = _rand_scale(rng, cfg.aspect) if cfg.aspect != 1.0 else 1.0
    # darknet PARSE defaults for absent keys (parser.c:
    # min_crop = net->w, max_crop = net->w * 2): a cfg that activates
    # the geometry with angle/aspect alone still zooms 1-2x in darknet
    lo = cfg.min_crop or size
    hi = cfg.max_crop or 2 * size
    if lo > hi:
        raise ValueError(f"min_crop={lo} > max_crop={hi}")
    r = int(rng.integers(lo, hi + 1))
    scale = r / min(h, w * aspect)
    rad = (np.deg2rad(rng.uniform(-cfg.angle, cfg.angle))
           if cfg.angle else 0.0)
    # darknet rand_uniform swaps a reversed range, i.e. the offset is
    # symmetric in |extent|/2 whether the scaled image is larger or
    # smaller than the output window
    dxm = abs(w * scale / aspect - size) / 2.0
    dym = abs(h * scale - size) / 2.0
    return rotate_scale_crop(
        img_u8, size, rad=rad, scale=scale, aspect=aspect,
        dx=float(rng.uniform(-dxm, dxm)), dy=float(rng.uniform(-dym, dym)))


def flip_horizontal(img_u8: np.ndarray, boxes: np.ndarray):
    img = img_u8[:, ::-1]
    if len(boxes):
        boxes = boxes.copy()
        boxes[:, 0] = 1.0 - boxes[:, 0]
    return np.ascontiguousarray(img), boxes


def apply_blur(img_u8: np.ndarray, boxes: np.ndarray,
               rng: np.random.Generator,
               cfg: AugmentConfig) -> np.ndarray:
    """[net] blur (see the AugmentConfig field note: GaussianBlur
    formula cv2-pinned, tri-state draw recall-grade). boxes are
    normalized xywh — the background mode copies each truth region
    back sharp (darknet's `blur == 1` branch)."""
    if not cfg.blur:
        return img_u8
    import cv2

    mode = int(rng.integers(0, 3))   # none / background / full
    if mode == 0:
        return img_u8
    background = mode == 1 or int(cfg.blur) == 1
    ksize = 17 if background else (int(cfg.blur) // 2) * 2 + 1
    dst = cv2.GaussianBlur(img_u8, (ksize, ksize), 0)
    if dst.ndim == 2:                # cv2 drops the C=1 axis
        dst = dst[..., None]
    if background:
        h, w = img_u8.shape[:2]
        for cx, cy, bw, bh in np.asarray(boxes,
                                         np.float64).reshape(-1, 4):
            x1 = max(int((cx - bw / 2) * w), 0)
            y1 = max(int((cy - bh / 2) * h), 0)
            x2 = min(int((cx + bw / 2) * w) + 1, w)
            y2 = min(int((cy + bh / 2) * h) + 1, h)
            if x2 > x1 and y2 > y1:
                dst[y1:y2, x1:x2] = img_u8[y1:y2, x1:x2]
    return dst


def apply_gaussian_noise(img_u8: np.ndarray, rng: np.random.Generator,
                         cfg: AugmentConfig) -> np.ndarray:
    """[net] gaussian_noise (AugmentConfig field note: distribution
    and the 127 sigma clamp pinned; per-image coin flip recall-grade)."""
    if not cfg.gaussian_noise:
        return img_u8
    if int(rng.integers(0, 2)) == 0:
        return img_u8
    sigma = min(float(cfg.gaussian_noise), 127.0)
    noise = rng.normal(0.0, sigma, img_u8.shape)
    return np.clip(img_u8.astype(np.float64) + noise, 0.0,
                   255.0).astype(np.uint8)


def augment(img_u8: np.ndarray, boxes: np.ndarray, classes: np.ndarray,
            rng: np.random.Generator,
            cfg: AugmentConfig = AugmentConfig()
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full darknet-style augmentation for one training sample."""
    img_u8, boxes, classes = jitter_crop(img_u8, boxes, classes, rng, cfg)
    if cfg.flip and rng.uniform() < 0.5:
        img_u8, boxes = flip_horizontal(img_u8, boxes)
    img_u8 = distort_hsv(img_u8, rng, cfg)
    img_u8 = apply_blur(img_u8, boxes, rng, cfg)
    img_u8 = apply_gaussian_noise(img_u8, rng, cfg)
    return img_u8, boxes, classes


def mosaic4(samples, net_size, rng: np.random.Generator,
            cfg: AugmentConfig = AugmentConfig()
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """yolov4 mosaic (AlexeyAB load_data_detection mosaic=1 style):
    a random cut point splits the net-size canvas into 4 quadrants;
    each of the 4 (already-augmented) samples is stretch-resized to
    net size and contributes its ALIGNED quadrant. Boxes map through
    the stretch, are clipped to their quadrant, and are dropped below
    min_box_visibility of their pre-clip area.

    samples: 4 tuples (img_u8 HxWxC, boxes (G,4) normalized xywh,
    classes (G,)). net_size: int or (net_h, net_w) — rectangular nets
    get a rectangular canvas with per-axis geometry. Returns
    (canvas u8 (net_h,net_w,C), boxes, classes) with boxes normalized
    to the canvas.
    """
    import cv2

    assert len(samples) == 4
    from yolo_tpu.data.targets import _as_hw

    nh, nw = _as_hw(net_size)
    cx = int(nw * rng.uniform(0.25, 0.75))
    cy = int(nh * rng.uniform(0.25, 0.75))
    c = samples[0][0].shape[2] if samples[0][0].ndim == 3 else 1
    canvas = np.zeros((nh, nw, c), np.uint8)
    regions = ((0, 0, cx, cy), (cx, 0, nw, cy),
               (0, cy, cx, nh), (cx, cy, nw, nh))
    out_boxes, out_classes = [], []
    for (img, boxes, classes), (x1, y1, x2, y2) in zip(samples, regions):
        # produce only the kept quadrant, but sample the EXACT
        # full-image-stretch mapping (cv2.resize half-pixel centers):
        # src_x(dst_x) = (dst_x + x1 + 0.5) * w/nw - 0.5 — a warpAffine
        # with the inverse map, ~4x cheaper than whole-image resize
        h, w = img.shape[:2]
        m = np.array([[w / nw, 0.0, (x1 + 0.5) * w / nw - 0.5],
                      [0.0, h / nh, (y1 + 0.5) * h / nh - 0.5]],
                     np.float64)
        quad = cv2.warpAffine(
            img, m, (x2 - x1, y2 - y1),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_REPLICATE)
        canvas[y1:y2, x1:x2] = (quad[..., None] if quad.ndim == 2
                                else quad)
        for box, cls in zip(np.asarray(boxes, np.float64), classes):
            bx1 = (box[0] - box[2] / 2) * nw
            by1 = (box[1] - box[3] / 2) * nh
            bx2 = (box[0] + box[2] / 2) * nw
            by2 = (box[1] + box[3] / 2) * nh
            area = max(bx2 - bx1, 0) * max(by2 - by1, 0)
            nx1, ny1 = max(bx1, x1), max(by1, y1)
            nx2, ny2 = min(bx2, x2), min(by2, y2)
            vis = max(nx2 - nx1, 0) * max(ny2 - ny1, 0)
            if area <= 0 or vis <= 0 or vis / area < cfg.min_box_visibility:
                continue
            out_boxes.append([(nx1 + nx2) / 2 / nw, (ny1 + ny2) / 2 / nh,
                              (nx2 - nx1) / nw, (ny2 - ny1) / nh])
            out_classes.append(int(cls))
    return (canvas,
            np.asarray(out_boxes, np.float64).reshape(-1, 4),
            np.asarray(out_classes, np.int64))


# darknet's PARSE defaults for absent keys (parse_net_options /
# parse_region: saturation=1, exposure=1, hue=0 — i.e. NO HSV
# distortion unless the cfg asks; flip=1; jitter=0.2)
_DARKNET_PARSE_DEFAULTS = {"jitter": 0.2, "saturation": 1.0,
                           "exposure": 1.0, "hue": 0.0, "flip": True}


def config_from_net_params(net_hp: dict, *, mosaic: bool = False,
                           mixup: bool = False,
                           force_defaults: bool = False
                           ) -> "AugmentConfig":
    """AugmentConfig from a darknet cfg's training keys
    (`configs.darknet_cfg.net_training_params`): [net]
    saturation/exposure/hue/flip/mosaic/mixup + the head sections'
    jitter. Absent keys fall back to DARKNET'S PARSE DEFAULTS
    (saturation/exposure 1, hue 0 — a cfg that sets only e.g. flip=0
    must NOT silently gain HSV distortion; code-review finding).
    force_defaults=True (the CLI's bare --augment with no cfg keys)
    instead fills them with the classic yolov2-voc training values
    (the AugmentConfig field defaults). mosaic=True / mixup=True force
    the mode on regardless of the cfg (--mosaic / --mixup)."""
    kwargs = {} if force_defaults else dict(_DARKNET_PARSE_DEFAULTS)
    for k in ("jitter", "saturation", "exposure", "hue",
              # classifier scale/rotation keys (disabled by default,
              # both here and in darknet's parse defaults)
              "angle", "aspect"):
        if k in net_hp:
            kwargs[k] = float(net_hp[k])
    for k in ("min_crop", "max_crop", "blur"):
        if k in net_hp:
            kwargs[k] = int(net_hp[k])
    if "gaussian_noise" in net_hp:
        kwargs["gaussian_noise"] = float(net_hp["gaussian_noise"])
    if "flip" in net_hp:
        kwargs["flip"] = bool(net_hp["flip"])
    return AugmentConfig(mosaic=mosaic or bool(net_hp.get("mosaic", 0)),
                         mixup=mixup or bool(net_hp.get("mixup", 0)),
                         **kwargs)
