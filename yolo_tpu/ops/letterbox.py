"""Device-side letterbox: resize + pad + normalize inside the compiled graph.

The reference letterboxes on host with PIL/cv2 per image (SURVEY.md §3.1-3.2,
the serial bottleneck); here the compiled graph starts at raw RGB
(BASELINE.json:5 'fused into the input pipeline'; JPEG decode stays on host —
TPUs can't decode JPEG, SURVEY.md §5.8).

Resize filter pinned (SURVEY.md §7.2): half-pixel-center bilinear WITHOUT
antialiasing == cv2.INTER_LINEAR == the numpy_ref.letterbox oracle. We can't
use jax.image.resize (it antialiases on downscale), so bilinear resize is
expressed as two small dense interpolation matmuls (exact, separable, and
MXU-friendly): out = R_h @ img @ R_w^T.

Source shape is static per jit specialization (bucketed compile cache, same
policy as multi-scale training, SURVEY.md §5.7).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _lerp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, half-pixel
    centers, clamped borders (cv2.INTER_LINEAR semantics)."""
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(coords).astype(np.int64)
    frac = (coords - i0).astype(np.float64)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    i0 = np.clip(i0, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), (1.0 - frac).astype(np.float32))
    np.add.at(m, (rows, i1), frac.astype(np.float32))
    return m


def as_hw(net) -> tuple:
    """Normalize a net-size argument: int -> (net, net); (h, w) kept.
    Shape order (height, width) everywhere, matching image arrays —
    the single convention for rectangular ([net] width != height)
    support across ops/data/train."""
    if isinstance(net, (tuple, list)):
        h, w = net
        return int(h), int(w)
    return int(net), int(net)


def letterbox_geometry(src_h: int, src_w: int, net_size):
    """Static geometry: scale, resized (rh, rw), pad offsets (px, py).
    net_size: int (square) or (net_h, net_w)."""
    net_h, net_w = as_hw(net_size)
    scale = min(net_w / src_w, net_h / src_h)
    rw, rh = int(round(src_w * scale)), int(round(src_h * scale))
    px, py = (net_w - rw) // 2, (net_h - rh) // 2
    return scale, rh, rw, px, py


def letterbox(images: jnp.ndarray, net_size,
              dtype=jnp.float32) -> jnp.ndarray:
    """images: (B, H, W, 3) uint8 (or float in [0,255]) raw RGB ->
    (B, net_h, net_w, 3) in [0,1], gray(0.5)-padded. net_size: int or
    (net_h, net_w).

    dtype=bfloat16 halves the interpolation-matmul cost in the
    throughput path (accumulation stays fp32 via preferred_element_type;
    u8 inputs are exactly representable in bf16 after /256-scale, so the
    only loss is the final rounding — below the fp32-parity tolerance at
    box level)."""
    b, h, w, c = images.shape
    net_h, net_w = as_hw(net_size)
    scale, rh, rw, px, py = letterbox_geometry(h, w, net_size)
    x = images.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
    if rh != h:
        mh = jnp.asarray(_lerp_matrix(h, rh), dtype)
        x = jnp.einsum("oh,bhwc->bowc", mh, x,
                       preferred_element_type=jnp.float32).astype(dtype)
    if rw != w:
        mw = jnp.asarray(_lerp_matrix(w, rw), dtype)
        x = jnp.einsum("ow,bhwc->bhoc", mw, x,
                       preferred_element_type=jnp.float32).astype(dtype)
    return jnp.pad(
        x,
        ((0, 0), (py, net_h - rh - py), (px, net_w - rw - px), (0, 0)),
        constant_values=jnp.asarray(0.5, dtype),
    )


def stretch_resize(images: jnp.ndarray, net_size,
                   dtype=jnp.float32) -> jnp.ndarray:
    """images: (B, H, W, 3) uint8 raw RGB -> (B, net_h, net_w, 3) in
    [0,1] by PLAIN bilinear resize, aspect ratio NOT preserved — the
    AlexeyAB-darknet default preprocessing (letter_box=0), in contrast
    to pjreddie's letterbox. Same pinned cv2-INTER_LINEAR filter.
    net_size: int or (net_h, net_w)."""
    b, h, w, c = images.shape
    net_h, net_w = as_hw(net_size)
    x = images.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
    if h != net_h:
        mh = jnp.asarray(_lerp_matrix(h, net_h), dtype)
        x = jnp.einsum("oh,bhwc->bowc", mh, x,
                       preferred_element_type=jnp.float32).astype(dtype)
    if w != net_w:
        mw = jnp.asarray(_lerp_matrix(w, net_w), dtype)
        x = jnp.einsum("ow,bhwc->bhoc", mw, x,
                       preferred_element_type=jnp.float32).astype(dtype)
    return x


def unstretch_boxes_xyxy(boxes_xywh: jnp.ndarray, *, src_h: int,
                         src_w: int) -> jnp.ndarray:
    """Inverse of stretch_resize for net-normalized xywh boxes ->
    original-image pixel xyxy, clipped."""
    b = boxes_xywh
    cx, cy = b[..., 0] * src_w, b[..., 1] * src_h
    bw, bh = b[..., 2] * src_w, b[..., 3] * src_h
    x1 = jnp.clip(cx - bw / 2, 0, src_w)
    y1 = jnp.clip(cy - bh / 2, 0, src_h)
    x2 = jnp.clip(cx + bw / 2, 0, src_w)
    y2 = jnp.clip(cy + bh / 2, 0, src_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def unletterbox_boxes_xyxy(boxes_xywh: jnp.ndarray, *, src_h: int, src_w: int,
                           net_size) -> jnp.ndarray:
    """Map net-normalized xywh boxes to original-image pixel xyxy, clipped
    (same math as numpy_ref.unletterbox_boxes; static geometry).
    net_size: int or (net_h, net_w) — x/w unmap through net_w, y/h
    through net_h."""
    net_h, net_w = as_hw(net_size)
    scale, rh, rw, px, py = letterbox_geometry(src_h, src_w, net_size)
    b = boxes_xywh
    cx = (b[..., 0] * net_w - px) / scale
    cy = (b[..., 1] * net_h - py) / scale
    bw = b[..., 2] * net_w / scale
    bh = b[..., 3] * net_h / scale
    x1 = jnp.clip(cx - bw / 2, 0, src_w)
    y1 = jnp.clip(cy - bh / 2, 0, src_h)
    x2 = jnp.clip(cx + bw / 2, 0, src_w)
    y2 = jnp.clip(cy + bh / 2, 0, src_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
