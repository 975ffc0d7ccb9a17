"""Per-conv-shape backward attribution for the train step.

docs/PERF.md's training roofline showed the jitted train step at 41-45 %
MFU with the gap concentrated in the backward conv kernels (~78 % of
fprop's rate). This bench decomposes that number: for every distinct
conv shape in a variant at a given net size it measures fprop, dgrad
(input gradient) and wgrad (weight gradient) separately — each as its
own jitted program so XLA's DCE isolates the kernel under test — and
reports achieved TFLOP/s per phase.

It also A/Bs an alternative wgrad formulation for the 3x3 stride-1
blocks: decompose the kernel into its 9 taps and compute each tap's
gradient as a lax.dot_general contracting over (B, H, W) — a plain
(B*H*W, Cin)^T @ (B*H*W, Cout) MXU matmul per tap — against XLA's
native wgrad conv lowering (which reduces over batch AND spatial dims
inside one conv op and historically tiles worse).

Usage:  python benchmarks/bwd_layer_bench.py [--model coco] [--size 416]
        [--batch 128] [--min-share 0.02]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import OrderedDict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from yolo_tpu.configs import get_variant
from yolo_tpu.configs.specs import Conv
from yolo_tpu.models import graph
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.utils.profiling import timeit


def conv_shapes(model: str, size: int, batch: int):
    """Distinct conv shapes (Hin, Cin, Cout, k, stride) with multiplicity,
    derived by abstract shape inference over the variant's layer IR."""
    cfg = get_variant(model)
    params = graph.params_to_jax(
        dw.random_params(cfg.layers, np.random.default_rng(0)))
    x = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
    outs = jax.eval_shape(
        lambda p, x: graph.apply_layers(cfg.layers, p, x, return_all=True),
        params, x)
    shapes: "OrderedDict[tuple, int]" = OrderedDict()
    for idx, layer in enumerate(cfg.layers):
        if not isinstance(layer, Conv):
            continue
        src = x if idx == 0 else outs[idx - 1]
        key = (src.shape[1], src.shape[3], layer.filters, layer.size,
               layer.stride)
        shapes[key] = shapes.get(key, 0) + 1
    return shapes


def _conv(x, w, stride):
    pad = w.shape[0] // 2
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)  # train-path semantics: bf16 out


def wgrad_taps(x, gy, k):
    """3x3/1x1 stride-1 wgrad as k*k tap-wise dot_generals over (B,H,W).

    grad_w[dy,dx,ci,co] = sum_{b,h,w} xpad[b,h+dy,w+dx,ci] * gy[b,h,w,co]
    Each tap is one MXU matmul with contraction length B*H*W; fp32
    accumulation matches the conv VJP's preferred_element_type.
    """
    b, h, w_, ci = x.shape
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))) if pad else x
    taps = []
    for dy in range(k):
        for dx in range(k):
            xs = lax.slice(xp, (0, dy, dx, 0), (b, dy + h, dx + w_, ci))
            taps.append(lax.dot_general(
                xs, gy, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(k, k, ci, gy.shape[-1]).astype(gy.dtype)


def bench_shape(hin, cin, cout, k, stride, batch, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    hout = hin // stride
    x = jnp.asarray(rng.standard_normal((batch, hin, hin, cin)), dtype)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, dtype)
    gy = jnp.asarray(rng.standard_normal((batch, hout, hout, cout)), dtype)

    f = lambda x, w: _conv(x, w, stride)
    fwd = jax.jit(f)
    dgrad = jax.jit(lambda x, w, gy: jax.vjp(f, x, w)[1](gy)[0])
    wgrad = jax.jit(lambda x, w, gy: jax.vjp(f, x, w)[1](gy)[1])

    flops = 2 * batch * hout * hout * k * k * cin * cout
    res = {
        "fwd": timeit(fwd, x, w, n=10),
        "dgrad": timeit(dgrad, x, w, gy, n=10),
        "wgrad": timeit(wgrad, x, w, gy, n=10),
    }
    if stride == 1:
        wg_alt = jax.jit(lambda x, gy: wgrad_taps(x, gy, k))
        # correctness vs the conv VJP before timing
        ref = np.asarray(wgrad(x, w, gy), np.float32)
        alt = np.asarray(wg_alt(x, gy), np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        err = np.abs(ref - alt).max() / scale
        assert err < 2e-2, f"tap wgrad mismatch rel={err}"
        res["wgrad_taps"] = timeit(wg_alt, x, gy, n=10)
    return flops, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="coco")
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--min-share", type=float, default=0.02,
                    help="skip shapes below this share of total conv FLOPs")
    args = ap.parse_args()

    shapes = conv_shapes(args.model, args.size, args.batch)
    flops_of = {s: 2 * args.batch * (s[0] // s[4]) ** 2 * s[3] ** 2
                * s[1] * s[2] * n for s, n in shapes.items()}
    total = sum(flops_of.values())
    print(f"# {args.model} @{args.size} b{args.batch}: "
          f"{sum(shapes.values())} convs, {len(shapes)} distinct shapes, "
          f"{total / 1e12:.2f} TFLOP fprop")
    hdr = (f"{'shape':>24} {'n':>2} {'share':>6} | "
           f"{'fwd':>7} {'dgrad':>7} {'wgrad':>7} {'taps':>7} (ms)  | "
           f"{'fwd':>5} {'dgrad':>5} {'wgrad':>5} {'taps':>5} (TF/s)")
    print(hdr)
    agg = {"fwd": 0.0, "dgrad": 0.0, "wgrad": 0.0, "wgrad_best": 0.0}
    for s, n in sorted(shapes.items(), key=lambda kv: -flops_of[kv[0]]):
        share = flops_of[s] / total
        if share < args.min_share:
            print(f"{str(s):>24} {n:>2} {share:6.1%} | (skipped)")
            continue
        flops, res = bench_shape(*s, args.batch)
        tf = {p: flops / (ms * 1e9) for p, ms in res.items()}
        taps_ms = res.get("wgrad_taps")
        taps_s = (f"{taps_ms:7.2f}" if taps_ms else "      -")
        taps_tf = (f"{tf['wgrad_taps']:5.1f}" if taps_ms else "    -")
        print(f"{str(s):>24} {n:>2} {share:6.1%} | "
              f"{res['fwd']:7.2f} {res['dgrad']:7.2f} {res['wgrad']:7.2f} "
              f"{taps_s}  | {tf['fwd']:5.1f} {tf['dgrad']:5.1f} "
              f"{tf['wgrad']:5.1f} {taps_tf}")
        for p in ("fwd", "dgrad", "wgrad"):
            agg[p] += res[p] * n
        agg["wgrad_best"] += min(res["wgrad"], taps_ms or res["wgrad"]) * n
    print(f"# benched totals (ms x multiplicity): fwd {agg['fwd']:.1f}, "
          f"dgrad {agg['dgrad']:.1f}, wgrad {agg['wgrad']:.1f}, "
          f"wgrad w/ best-of-taps {agg['wgrad_best']:.1f}")


if __name__ == "__main__":
    main()
