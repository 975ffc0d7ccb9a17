"""Darknet reorg (passthrough) as an XLA reshape/transpose chain.

yolov2.cfg's ``[reorg] stride=2`` layer (forward=0 path of reorg_cpu) is NOT
space_to_depth — its flat-buffer reinterpretation scrambles channels in a way
the pretrained weights of the following conv bake in (SURVEY.md §7.2).

Derivation (NCHW, s = stride, oc = C/s^2):
  the layer writes out[k, j, i] = v[k % oc, j*s + (k//oc)//s, i*s + (k//oc)%s]
  where v is the input flat buffer reinterpreted as (oc, H*s, W*s), and the
  output flat buffer is then reinterpreted as (C*s^2, H/s, W/s) by the next
  layer. Expressed as pure reshapes/transposes this is:
    x(B,C,H,W) -> reshape (B, oc, H*s, W*s)          # flat reinterpret
               -> reshape (B, oc, H, s, W, s)
               -> transpose (B, s_h, s_w, oc, H, W)
               -> reshape (B, C*s^2, H/s, W/s)        # flat reinterpret
Golden-tested against the loop-level numpy_ref.reorg_nchw oracle.
"""

from __future__ import annotations

import jax.numpy as jnp


def reorg_nchw(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    b, c, h, w = x.shape
    s = stride
    oc = c // (s * s)
    v = x.reshape(b, oc, h * s, w * s)
    v = v.reshape(b, oc, h, s, w, s)
    v = v.transpose(0, 3, 5, 1, 2, 4)
    return v.reshape(b, c * s * s, h // s, w // s)


def reorg_nhwc(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """NHWC layer API used by the model executor. The two transposes
    bracket a tiny (43k-element at 416^2) shuffle; XLA fuses the chain."""
    y = reorg_nchw(x.transpose(0, 3, 1, 2), stride)
    return y.transpose(0, 2, 3, 1)
