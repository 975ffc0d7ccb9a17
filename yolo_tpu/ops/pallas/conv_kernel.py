"""Pallas fused conv(3x3 or 1x1) + bias + leaky-ReLU block for the MXU.

The darknet conv+BN+leaky block with BN folded into weight+bias
(models/graph.fold_params) collapses to conv+bias+leaky; this kernel
computes it as ks*ks shifted MXU matmuls with an fp32 VMEM accumulator
and the bias+leaky epilogue fused — one HBM round trip.

Tuning history on v5e (batch 64, 13x13x1024 -> 1024 3x3, bf16):
  * grid (batch, co): 72 TFLOP/s — the co-tile weights (4.7 MB) were
    re-DMA'd every program.
  * grid (co, batch) [weights stay resident across the fast batch axis]
    + 2 images per program (338-row dots fill the MXU better than 169):
    88 TFLOP/s, vs XLA's 90-108 on the same layer.
XLA stays the default backbone path (graph.apply_layers conv_impl="xla");
the kernel is the A/B block (conv_impl="pallas") and the substrate for
fusions XLA can't express. Eligibility: stride 1, CIN/CO lane multiples;
other layers fall back to XLA automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 2 ** 20


def _kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, h, w, cin, tn, ks,
            tb, act):
    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    for dy in range(ks):
        for dx in range(ks):
            xs = x_ref[:, dy:dy + h, dx:dx + w, :].reshape(tb * h * w, cin)
            acc_ref[:, :] += jnp.dot(xs, w_ref[dy, dx, :, :],
                                     preferred_element_type=jnp.float32)
    y = acc_ref[:, :] + b_ref[0, :]
    if act == "leaky":
        y = jnp.where(y > 0, y, 0.1 * y)
    o_ref[:, :, :, :] = y.reshape(tb, h, w, tn).astype(o_ref.dtype)


def eligible(kernel_hwio, stride: int) -> bool:
    ks, _, cin, co = kernel_hwio.shape
    return (stride == 1 and ks in (1, 3) and cin % 128 == 0
            and co % 128 == 0)


def _vmem(tb, tn, hp, wp, h, w, cin, ks, itemsize):
    return (2 * tb * hp * wp * cin * itemsize         # input blocks
            + 2 * ks * ks * cin * tn * itemsize       # weight blocks
            + tb * h * w * tn * 4                     # fp32 accumulator
            + 2 * tb * h * w * tn * itemsize)         # output blocks


def feasible(x_shape, kernel_shape, itemsize: int) -> bool:
    """Whether even the SMALLEST tile config (tb=1, tn=128) fits the
    VMEM budget — callers fall back to XLA otherwise. The tile picker
    used to return an over-budget config once its knobs were
    exhausted, dying at Mosaic compile instead of routing the layer
    to XLA as the module docstring promises (code-review finding:
    e.g. yolov4-608's 76x76 cin-256 1x1 convs at fp32)."""
    _, h, w, cin = x_shape
    ks, _, _, co = kernel_shape
    pad = ks // 2
    hp, wp = h + 2 * pad, w + 2 * pad
    tn = min(128, co)
    return _vmem(1, tn, hp, wp, h, w, cin, ks, itemsize) <= VMEM_BUDGET


def _pick_tiles(b, hp, wp, h, w, cin, co, ks, itemsize):
    """(tb, tn) under the VMEM budget (double-buffered in/w + fp32
    acc); callers gate on feasible() first."""
    tb = 2 if b % 2 == 0 else 1
    tn = min(256, co)
    while co % tn:
        tn //= 2
    while _vmem(tb, tn, hp, wp, h, w, cin, ks, itemsize) > VMEM_BUDGET \
            and tb > 1:
        tb //= 2
    while _vmem(tb, tn, hp, wp, h, w, cin, ks, itemsize) > VMEM_BUDGET \
            and tn > 128:
        tn //= 2
    return tb, tn


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def fused_conv_bias_act(x, kernel_hwio, bias, *, act: str = "leaky",
                        interpret: bool = False):
    """x (B, H, W, CIN) bf16/f32, kernel (ks, ks, CIN, CO), bias (CO,)
    -> (B, H, W, CO) in x.dtype. SAME padding, stride 1."""
    b, h, w, cin = x.shape
    ks, _, _, co = kernel_hwio.shape
    pad = ks // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    dtype = x.dtype
    tb, tn = _pick_tiles(b, hp, wp, h, w, cin, co, ks, dtype.itemsize)
    if b % tb:
        tb = 1
    kern = functools.partial(_kernel, h=h, w=w, cin=cin, tn=tn, ks=ks,
                             tb=tb, act=act)
    # grid order (co, batch): batch iterates fastest, so each co tile's
    # weights stay VMEM-resident across the whole batch
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), dtype),
        grid=(co // tn, b // tb),
        in_specs=[
            pl.BlockSpec((tb, hp, wp, cin), lambda j, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ks, ks, cin, tn), lambda j, i: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, h, w, tn), lambda j, i: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tb * h * w, tn), jnp.float32)],
        interpret=interpret,
    )(x.astype(dtype), kernel_hwio.astype(dtype),
      bias.reshape(1, -1).astype(jnp.float32))
