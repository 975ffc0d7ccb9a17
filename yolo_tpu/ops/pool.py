"""Darknet maxpool via lax.reduce_window.

Darknet maxpool pads ``size - 1`` with the window origin shifted by
``-(size - 1) // 2`` (maxpool_layer semantics): lead = (size-1)//2
rows/cols, trail = the rest, fill -inf. For the yolov2-era 2x2 pools
this is end-padding only (the tiny-YOLO layer-6 stride-1 SAME pool,
SURVEY.md §7.2) and a no-op for stride-2 pools on even dims; for the
yolov3-spp 5/9/13 stride-1 pools it is symmetric SAME padding.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def maxpool_nhwc(x: jnp.ndarray, size: int, stride: int) -> jnp.ndarray:
    pad = size - 1
    lead = pad // 2
    padding = ((0, 0), (lead, pad - lead), (lead, pad - lead), (0, 0))
    # identity element for max in x's dtype: -inf for floats, the
    # integer minimum for int8 activations (the chained-int8 serving
    # path pools quantized tensors; -inf would wrap)
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype))
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
