"""Pallas TPU kernel for the greedy-NMS suppression pass.

Why a kernel: the XLA formulation (ops/nms.py::_suppress_xla) runs the
K-step greedy recurrence as a lax.fori_loop — K sequential XLA loop
iterations of tiny vector work, dominated by per-iteration loop overhead,
and it materializes the (B*C, K, K) IoU tensor in HBM (~335 MB at
batch 64 / 80 classes / K=128). Here each pallas_call program handles a
tile of TILE_G rows: the (TILE_G, K, K) suppressability block lives in
VMEM and the sequential suppression runs as an in-kernel
fori_loop over 128-lane VPU rows — no XLA loop overhead, no HBM IoU.

Semantics identical to the XLA path (oracle: numpy_ref.nms_per_class):
a box suppresses lower-ranked overlaps iff it is kept AND above the
confidence threshold; inputs arrive sorted by (score desc, index asc).

Layout: boxes arrive as (G, 5, K) rows [x1, y1, x2, y2, area] so K sits
in the 128-wide lane dimension; G is padded to a multiple of 8 to satisfy
the fp32 (8, 128) tile constraint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_G = 32  # pairs per program: big enough to fill VPU rows; the
             # (TILE_G, K, K) IoU scratch plus its computation
             # temporaries (~5x 2.1 MB at K=128) must fit in 16 MB VMEM


def _suppress_kernel(geom_ref, scores_ref, cls_ref, keep_ref, iou_ref, *,
                     conf_threshold, iou_threshold, k):
    x1 = geom_ref[:, 0, :]          # (TILE_G, K)
    y1 = geom_ref[:, 1, :]
    x2 = geom_ref[:, 2, :]
    y2 = geom_ref[:, 3, :]
    area = geom_ref[:, 4, :]
    cls = cls_ref[:, :]             # (TILE_G, K) f32 class ids (-1 = off)

    # (TILE_G, K, K) "suppressability": IoU > t AND same class,
    # into VMEM scratch (rows: suppressor i). Cross-class pairs can
    # never suppress (class-wise NMS), so the class mask is baked in.
    iw = jnp.maximum(
        0.0, jnp.minimum(x2[:, :, None], x2[:, None, :]) -
        jnp.maximum(x1[:, :, None], x1[:, None, :]))
    ih = jnp.maximum(
        0.0, jnp.minimum(y2[:, :, None], y2[:, None, :]) -
        jnp.maximum(y1[:, :, None], y1[:, None, :]))
    inter = iw * ih
    union = area[:, :, None] + area[:, None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    same_cls = cls[:, :, None] == cls[:, None, :]
    iou_ref[:, :, :] = jnp.where(
        same_cls & (iou > iou_threshold), 1.0, 0.0)

    scores = scores_ref[:, :]       # (tile_g, K)
    rank = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    keep_ref[:, :] = jnp.ones(scores.shape, jnp.float32)

    # Sequential greedy pass; dynamic row access goes through refs
    # (Mosaic supports pl.ds on refs, not dynamic_slice on values).
    def body(i, _):
        # column i extracted via masked max (dynamic slices in the lane
        # dimension need 128-alignment Mosaic can't prove here)
        keep = keep_ref[:, :]
        col = (rank == i)
        keep_i = jnp.max(jnp.where(col, keep, 0.0), axis=1)
        score_i = jnp.max(jnp.where(col, scores, -jnp.inf), axis=1)
        active = (keep_i > 0.5) & (score_i >= conf_threshold)
        row_sup = iou_ref[:, pl.ds(i, 1), :][:, 0, :]
        suppress = (active[:, None] & (row_sup > 0.5) & (rank > i))
        keep_ref[:, :] = jnp.where(suppress, 0.0, keep)
        return 0

    lax.fori_loop(0, k, body, 0)
    keep_ref[:, :] = keep_ref[:, :] * (scores >= conf_threshold).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("conf_threshold",
                                             "iou_threshold", "interpret"))
def suppress(boxes_xyxy_area: jnp.ndarray, scores: jnp.ndarray,
             classes: jnp.ndarray, *, conf_threshold: float,
             iou_threshold: float, interpret: bool = False) -> jnp.ndarray:
    """boxes_xyxy_area (G, 5, K) fp32, scores (G, K) sorted desc,
    classes (G, K) fp32 class ids -> keep mask (G, K) fp32 in {0, 1}.

    G is the per-image grid (global-top-K candidates, classes mixed) or
    a batch*classes grid (per-class candidates, constant class rows) —
    the kernel is the same: only same-class pairs suppress.
    """
    g, _, k = boxes_xyxy_area.shape
    tile_g = TILE_G
    while tile_g > 8 and tile_g * k * k * 4 * 5 > 12 * 2 ** 20:
        tile_g //= 2  # scratch+temps VMEM cap
    if tile_g * k * k * 4 * 5 > 12 * 2 ** 20:
        # (8, 128) is the minimum fp32 tile — beyond K=256 the IoU block
        # cannot fit VMEM; callers fall back to the XLA path (ops/nms.py)
        raise ValueError(f"pallas NMS supports K <= 256, got K={k}")
    g_pad = -(-g // tile_g) * tile_g
    if g_pad != g:
        boxes_xyxy_area = jnp.pad(boxes_xyxy_area,
                                  ((0, g_pad - g), (0, 0), (0, 0)))
        scores = jnp.pad(scores, ((0, g_pad - g), (0, 0)),
                         constant_values=-1.0)
        classes = jnp.pad(classes, ((0, g_pad - g), (0, 0)),
                          constant_values=-1.0)
    kernel = functools.partial(_suppress_kernel,
                               conf_threshold=conf_threshold,
                               iou_threshold=iou_threshold, k=k)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g_pad, k), jnp.float32),
        grid=(g_pad // tile_g,),
        in_specs=[
            pl.BlockSpec((tile_g, 5, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_g, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_g, k, k), jnp.float32)],
        interpret=interpret,
    )(boxes_xyxy_area, scores, classes)
    return keep[:g]
