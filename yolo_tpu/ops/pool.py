"""Darknet maxpool via lax.reduce_window.

Darknet pads ``size - 1`` at the END (right/bottom) with -inf when
stride == 1 (the tiny-YOLO layer-6 stride-1 SAME pool, SURVEY.md §7.2);
the common stride-2 pools need no padding at the sizes YOLOv2 uses
(all dims are even).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def maxpool_nhwc(x: jnp.ndarray, size: int, stride: int) -> jnp.ndarray:
    pad = size - 1 if stride == 1 else 0
    padding = ((0, 0), (0, pad), (0, pad), (0, 0))
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
