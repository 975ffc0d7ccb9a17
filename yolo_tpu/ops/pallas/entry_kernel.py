"""Fused entry-layer Pallas kernel: conv1(3x3, 3->cout) + bias + leaky
+ maxpool(2x2, stride 2) in ONE pass — no HBM round trip for the
conv1 activation (1.4 GB bf16 at batch 128, the single largest
intermediate in the network; docs/PERF.md 'Entry-layer study').

This overturns the round-1 'conclusively blocked' verdict: the blocked
approaches packed the 12-channel im2col into the LANE (minor) dim,
hitting Mosaic's 128-lane alignment rules everywhere (vector concat,
lane reshape, bf16 roll, DMA slices). The working orientation puts the
K=48 im2col taps on SUBLANES instead:

  * every scratch write is a full-lane row:  xt[k, :] = plane_row ✂
  * the 4 pool phases stack into the matmul M dim:
    acc(4*cout, N) = W_stacked(4*cout, 48) @ xt(48, N)
  * leaky is monotone and the bias is phase-uniform, so pooling
    commutes: out = leaky(max_phase(acc) + b)

Inputs are 6 parity planes (2 column-parities x 3 channels) built from
the padded image so that all 48 tap rows are CONTIGUOUS (or +1-offset,
an unaligned lane slice Mosaic supports) slices of plane rows:
tap (dy, dx, c) of output column j reads plane[(dx&1)*3+c] at row
2i+dy, cols j+(dx>>1).

Measured (v5e, batch 128, 416x416): 7.0 ms vs XLA's fused
conv+leaky+pool at 8.95 ms — with BOTH near the chip's measured
bf16-tiled write floor (a bare 0.35 GB jnp.full write costs 4-5 ms in
XLA and Pallas alike). Output layout is NCHW (full-lane 208-col minor;
a channel-minor block pays ~2x DMA padding). The planes pre-pass costs
~4.6 ms standalone in bf16 — folding it into the letterbox op (which
already computes per-channel) is what makes the kernel a net win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_planes(x_f32: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, 3) fp32 -> planes (B, 6, H+2, (W+4)//2):
    plane[p*3+c][r, q] = xpad[r, 2q+p, c], xpad padded 1 top/left,
    1 bottom, 2 right (covers all 4x4 window taps at stride 2)."""
    B, H, W, _ = x_f32.shape
    xp = jnp.pad(x_f32, ((0, 0), (1, 1), (1, 2), (0, 0)))
    even = xp[:, :, 0::2, :]
    odd = xp[:, :, 1::2, :]
    n = even.shape[2]
    odd = jnp.pad(odd, ((0, 0), (0, 0), (0, n - odd.shape[2]), (0, 0)))
    planes = jnp.stack([even, odd], axis=1)           # (B, 2, H+2, n, 3)
    return jnp.transpose(planes, (0, 1, 4, 2, 3)).reshape(B, 6, H + 2, n)


def build_wstack(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, cout) HWIO -> (4*cout, 48) phase-stacked fp32 weights:
    row phi*cout+o, col (dy*4+dx)*3+c = w[dy-di, dx-dj, c, o] for
    phase phi=(di*2+dj), zero outside the 3x3 support."""
    cout = w_hwio.shape[-1]
    blocks = []
    for di in range(2):
        for dj in range(2):
            wp = jnp.pad(w_hwio.astype(jnp.float32),
                         ((di, 1 - di), (dj, 1 - dj), (0, 0), (0, 0)))
            blocks.append(wp.reshape(48, cout).T)
    return jnp.concatenate(blocks, axis=0)


def _kernel(pl_ref, w_ref, b_ref, o_ref, xt, *, TI, WO, cout):
    t = pl.program_id(1)
    for il in range(TI):
        i = TI * t + il
        for dy in range(4):
            for pc in range(6):  # one dynamic row read per (plane, row)
                row = pl_ref[0, pc, pl.ds(2 * i + dy, 1), :]
                p, c = pc // 3, pc % 3
                for off in range(2):  # dx = 2*off + p shares this row
                    k = (dy * 4 + 2 * off + p) * 3 + c
                    xt[k, :] = row[0, off:off + WO].astype(jnp.float32)
        acc = jnp.dot(w_ref[:, :], xt[:, :],
                      preferred_element_type=jnp.float32)
        m = jnp.max(acc.reshape(4, cout, WO), axis=0)
        y = m + b_ref[:, 0:1]
        y = jnp.where(y > 0, y, 0.1 * y)
        o_ref[0, il, :, :] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_entry_from_planes(planes, w_hwio, bias, *,
                            out_dtype=jnp.bfloat16, interpret=False):
    """planes (B, 6, H+2, n) fp32 -> (B, H/2, cout, W/2) "NHCW"
    (full-lane W-minor; the channel-minor NHWC block pays ~2x DMA lane
    padding, and an NCHW slab write hits a Mosaic shape-cast limit).
    Exact conv(3x3 SAME, stride 1) + bias + leaky(0.1) + maxpool(2,2)
    in fp32 accumulation; output cast to out_dtype."""
    B, _, Hp2, n = planes.shape
    H = Hp2 - 2
    HO = H // 2
    WO = (2 * n - 4) // 2  # n = (W + 4) // 2
    cout = w_hwio.shape[-1]
    ws = build_wstack(w_hwio)
    b128 = jnp.broadcast_to(
        jnp.asarray(bias, jnp.float32)[:, None], (cout, 128))
    TI = HO  # one plane fetch per image; whole image per program
    kern = functools.partial(_kernel, TI=TI, WO=WO, cout=cout)
    return pl.pallas_call(
        kern,
        grid=(B, HO // TI),
        in_specs=[
            pl.BlockSpec((1, 6, Hp2, n), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec((4 * cout, 48), lambda b_, t: (0, 0)),
            pl.BlockSpec((cout, 128), lambda b_, t: (0, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((B, HO, cout, WO), out_dtype),
        out_specs=pl.BlockSpec((1, TI, cout, WO),
                               lambda b_, t: (b_, t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((48, WO), jnp.float32)],
        interpret=interpret,
    )(planes.astype(jnp.float32), ws, b128)


def fused_entry(x, w_hwio, bias, *, out_dtype=jnp.bfloat16,
                interpret=False):
    """Convenience wrapper: (B, H, W, 3) image -> (B, H/2, cout, W/2).
    Production use should build planes inside the letterbox op instead
    (the standalone pre-pass costs ~half the kernel, docs/PERF.md)."""
    return fused_entry_from_planes(build_planes(x.astype(jnp.float32)),
                                   w_hwio, bias, out_dtype=out_dtype,
                                   interpret=interpret)


@functools.lru_cache(maxsize=64)
def _wplane_matrices(src_w: int, src_h: int, net: int):
    """Per-parity W-interp matrices for letterbox_planes: plane p col q
    = sum_w M_p[q, w] * x[w] + 0.5 * g_p[q], with all-zero rows (g=0)
    at the conv zero-pad borders and g=0.5 in the letterbox gray bands.
    Splitting the letterbox's own interp matrix by output-column parity
    costs ZERO extra FLOPs vs the plain letterbox matmul."""
    from yolo_tpu.ops.letterbox import _lerp_matrix, letterbox_geometry

    scale, rh, rw, px, py = letterbox_geometry(src_h, src_w, net)
    mw = _lerp_matrix(src_w, rw)
    n = (net + 4) // 2
    out = []
    for p in range(2):
        M = np.zeros((n, src_w), np.float32)
        g = np.zeros((n,), np.float32)
        for q in range(n):
            v = 2 * q + p - 1  # column in the (net, net) letterboxed image
            if v < 0 or v >= net:
                continue  # conv zero-pad border
            if px <= v < px + rw:
                M[q] = mw[v - px]
            else:
                g[q] = 0.5  # letterbox gray
        out.append((M, g))
    # per-plane mask zeroing the conv-border columns in the gray rows
    n = out[0][0].shape[0]
    cm = np.ones((2, n), np.float32)
    for p in range(2):
        for q in range(n):
            if not 0 <= 2 * q + p - 1 < net:
                cm[p, q] = 0.0
    col_mask = np.repeat(cm, 3, axis=0)  # (6, n)
    return out, col_mask


def letterbox_planes(images_u8: jnp.ndarray, net: int,
                     interp_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Raw RGB (B, H, W, 3) -> the entry kernel's parity planes
    (B, 6, net+2, (net+4)//2) fp32, EXACTLY equal to
    build_planes(letterbox(images, net)) but emitted directly from the
    interpolation matmuls (no channel-minor NHWC intermediate — measured
    slightly FASTER than the plain letterbox, docs/PERF.md)."""
    from yolo_tpu.ops.letterbox import _lerp_matrix, letterbox_geometry

    b, h, w, _ = images_u8.shape
    scale, rh, rw, px, py = letterbox_geometry(h, w, net)
    x = images_u8.astype(interp_dtype) * jnp.asarray(
        1.0 / 255.0, interp_dtype)
    if rh != h:
        mh = jnp.asarray(_lerp_matrix(h, rh), interp_dtype)
        x = jnp.einsum("oh,bhwc->bowc", mh, x,
                       preferred_element_type=jnp.float32
                       ).astype(interp_dtype)
    mats, col_mask = _wplane_matrices(w, h, net)
    n = mats[0][0].shape[0]
    pieces = []
    for p in range(2):
        Mp = jnp.asarray(mats[p][0], interp_dtype)
        gp = jnp.asarray(mats[p][1], jnp.float32)
        xp = jnp.einsum("qw,bhwc->bhqc", Mp, x,
                        preferred_element_type=jnp.float32)
        pieces.append(xp + gp[None, None, :, None])
    pl6 = jnp.stack(pieces, axis=1)              # (B, 2, rh, n, 3)
    pl6 = jnp.transpose(pl6, (0, 1, 4, 2, 3)).reshape(b, 6, rh, n)
    body = [jnp.zeros((b, 6, 1, n), jnp.float32)]          # conv pad row
    if py:
        body.append(jnp.full((b, 6, py, n), 0.5, jnp.float32))
    body.append(pl6)
    if net - py - rh:
        body.append(jnp.full((b, 6, net - py - rh, n), 0.5, jnp.float32))
    body.append(jnp.zeros((b, 6, 1, n), jnp.float32))      # conv pad row
    out = jnp.concatenate(body, axis=2)
    # gray rows must still be ZERO in the conv-border columns
    cmask = jnp.asarray(col_mask, jnp.float32)
    return out * cmask[None, :, None, :]


def eligible(layers) -> bool:
    """The fusion applies when the graph starts conv(3x3, leaky, bn-
    foldable) -> maxpool(2, 2)."""
    from yolo_tpu.configs.specs import Conv, MaxPool

    return (len(layers) >= 2 and isinstance(layers[0], Conv)
            and layers[0].size == 3 and layers[0].act == "leaky"
            # the kernel implements a stride-1 ungrouped UNDILATED 3x3
            # only — a stride-2/grouped/dilated first conv must stay on
            # the XLA path (code-review findings: unchecked before)
            and layers[0].stride == 1 and layers[0].groups == 1
            and layers[0].dilation == 1
            and isinstance(layers[1], MaxPool)
            and layers[1].size == 2 and layers[1].stride == 2)
