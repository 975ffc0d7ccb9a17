"""Pallas fused conv(3x3 or 1x1) + bias + leaky-ReLU block for the MXU.

The darknet conv+BN+leaky block with BN folded into weight+bias
(models/graph.fold_params) collapses to conv+bias+leaky; this kernel
computes it as 9 (or 1) shifted MXU matmuls with an fp32 VMEM
accumulator and the bias+leaky epilogue fused — one HBM round trip.

Measured honestly on v5e (batch 64, 13x13x1024 -> 1024 3x3, bf16):
XLA's native conv hits ~96 TFLOP/s, this kernel ~72 TFLOP/s (the
169-row dots under-fill the 128x128 MXU and XLA pipelines HBM better).
XLA therefore stays the default backbone path (graph.apply_layers
conv_impl="xla"); the kernel is kept as an A/B-able block
(conv_impl="pallas") and as the substrate for future fusions XLA can't
express. Eligibility: stride 1, CIN a lane multiple (>=128); other
layers fall back to XLA automatically.

Grid: (batch, CO tiles); each program holds one padded image
(H+2, W+2, CIN) in VMEM — YOLOv2's deep layers are small enough
spatially that no halo exchange is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, h, w, cin, tn, ks, act):
    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    for dy in range(ks):
        for dx in range(ks):
            xs = x_ref[0, dy:dy + h, dx:dx + w, :].reshape(h * w, cin)
            acc_ref[:, :] += jnp.dot(xs, w_ref[dy, dx, :, :],
                                     preferred_element_type=jnp.float32)
    y = acc_ref[:, :] + b_ref[0, :]
    if act == "leaky":
        y = jnp.where(y > 0, y, 0.1 * y)
    o_ref[0, :, :, :] = y.reshape(h, w, tn).astype(o_ref.dtype)


def eligible(kernel_hwio, stride: int) -> bool:
    ks, _, cin, co = kernel_hwio.shape
    return (stride == 1 and ks in (1, 3) and cin % 128 == 0
            and co % 128 == 0)


@functools.partial(jax.jit,
                   static_argnames=("act", "tn", "interpret"))
def fused_conv_bias_act(x, kernel_hwio, bias, *, act: str = "leaky",
                        tn: int = 256, interpret: bool = False):
    """x (B, H, W, CIN) bf16/f32, kernel (ks, ks, CIN, CO), bias (CO,)
    -> (B, H, W, CO) in x.dtype. SAME padding, stride 1."""
    b, h, w, cin = x.shape
    ks, _, _, co = kernel_hwio.shape
    tn = min(tn, co)
    while co % tn:   # grid tiles must cover co exactly (co % 128 == 0)
        tn //= 2
    pad = ks // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    dtype = x.dtype
    kern = functools.partial(_kernel, h=h, w=w, cin=cin, tn=tn, ks=ks,
                             act=act)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), dtype),
        grid=(b, co // tn),
        in_specs=[
            pl.BlockSpec((1, h + 2 * pad, w + 2 * pad, cin),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ks, ks, cin, tn), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, tn), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h * w, tn), jnp.float32)],
        interpret=interpret,
    )(x.astype(dtype), kernel_hwio.astype(dtype),
      bias.reshape(1, -1).astype(jnp.float32))
