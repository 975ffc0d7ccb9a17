"""Post-training int8 quantization for the inference path.

The v5e MXU runs int8 x int8 -> int32 ~35% faster than bf16 (measured:
130 TOP/s vs 96 TFLOP/s on the 13x13x1024 layer), so the framework
offers a quantized serving mode beyond the reference's capability
surface:

  * weights: symmetric per-output-channel int8
    (w_scale[oc] = max|w[..., oc]| / 127)
  * activations: symmetric per-tensor int8, scales calibrated from a
    representative batch (abs-max of each conv's input in fp32)
  * each conv block: quantize input -> int8 conv (int32 accum) ->
    dequantize * (x_scale * w_scale) + bias -> leaky. Non-conv ops
    (pool/reorg/route/decode/NMS) stay in bf16/fp32.

Quantized params keep the graph.apply_layers pytree shape, adding
{"kernel_q", "w_scale", "x_scale"} per conv — conv_block dispatches on
their presence, so detect()/make_detector() work unchanged.

This mode trades exactness for speed: it does NOT satisfy the fp32
box/score parity gate (use fp32/bf16 for parity); accuracy is bounded
by tests/test_quantize.py score-deviation checks.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.configs.specs import (Conv, LayerSpec, MaxPool, Route,
                                    Sam, ScaleChannels, Shortcut,
                                    resolve_route)
from yolo_tpu.models import graph


def calibrate(layers: Sequence[LayerSpec], folded_params, x,
              eps: float = 1e-5, method: str = "absmax",
              percentile: float = 99.9,
              return_out_maxes: bool = False):
    """Run a representative batch in fp32 and record each conv's input
    range statistic. x: (B, S, S, 3) in [0, 1]. Returns one scale per
    conv.

    method="absmax" (default) maps the observed abs-max to 127;
    method="percentile" clips to the given percentile of |x| (ignoring
    the outlier tail buys resolution for the bulk at the cost of
    saturating the tail). Default choice is DATA-DRIVEN on a trained
    network (tests/test_quantize.py::test_int8_map_parity_on_trained_model
    trains the micro model to mAP 1.0 and scores both): abs-max int8
    holds mAP 1.0 vs fp32 on that model while percentile-99.9 also
    holds 1.0 — with no measured advantage and a saturation risk on
    long-tailed activations (leaky negatives), abs-max stays the
    default. Random-weight A/Bs were inconclusive (docs/ROADMAP.md r1);
    the trained-model gate is the accuracy story."""
    if method not in ("absmax", "percentile"):
        raise ValueError(f"unknown calibration method '{method}' "
                         "(absmax | percentile)")
    params_jax = graph.params_to_jax(folded_params)
    conv_idx = [i for i, l in enumerate(layers) if isinstance(l, Conv)]

    def stats(params, x):
        """One traced pass collecting every conv's input stat and
        output abs-max — jitted so calibration is ONE compile + ONE
        device round-trip, not per-op eager dispatch (374 s -> ~40 s
        on the remote-compile relay). The forward walk is
        graph.apply_layers(return_all=True) — the ONE authoritative
        interpreter — with conv i's input read as outputs[i-1]
        (code-review finding: a hand-rolled ~75-line mirror walk here
        silently treated unhandled layer types as identity and had
        already drifted on [crop]'s input*2-1 scale)."""
        x = jnp.asarray(x, jnp.float32)
        outs = graph.apply_layers(layers, params, x, eps=eps,
                                  train=False,
                                  compute_dtype=jnp.float32,
                                  return_all=True)
        maxes, out_maxes = [], []
        for i in conv_idx:
            inp = x if i == 0 else outs[i - 1]
            ax = jnp.abs(inp)
            maxes.append(jnp.max(ax) if method == "absmax"
                         else jnp.percentile(ax, percentile))
            out_maxes.append(jnp.max(jnp.abs(outs[i])))
        return jnp.stack(maxes), jnp.stack(out_maxes)

    m, om = jax.jit(stats)(params_jax, jnp.asarray(x, jnp.float32))
    maxes = [float(v) for v in np.asarray(m)]
    out_maxes = [float(v) for v in np.asarray(om)]
    scales = [v / 127.0 for v in maxes]
    if return_out_maxes:
        return scales, out_maxes
    return scales


def _chain_out_scales(layers: Sequence[LayerSpec],
                      act_scales: List[float],
                      out_maxes: Optional[List[float]] = None):
    """Returns (out_scales, x_scales): per conv, the int8 scale its
    output is emitted at (None = fp output), and each conv's possibly
    WIDENED input scale.

    Chained-int8 serving: when a conv's output feeds EXACTLY ONE conv
    (directly or through maxpools — max commutes with the monotone
    quantization, so pooling int8 is exact), the block can emit int8
    already quantized at the consumer's scale. The activation tensor
    between the blocks is then 1 byte/elem instead of 2 (bf16), halving
    HBM traffic on the chain (~7% e2e, docs/PERF.md). Convs consumed by
    route/reorg/shortcut/upsample or by multiple layers (e.g. yolov2's
    passthrough source) emit the usual compute-dtype tensor — getting
    this wrong quantizes a ~2000-range tensor with a ~6-range scale and
    saturates everything, which is why the rule is consumer-derived, not
    'the sequentially next conv' (the round-2 prototype bug).

    Pool-mediated chains have a second trap: the consumer's x_scale is
    calibrated on the POOLED tensor, whose abs-max can be SMALLER than
    the pre-pool tensor's (max-pooling discards deep leaky negatives).
    Quantizing the pre-pool tensor with that narrower scale would
    saturate them, so for such chains the shared scale is widened to
    max(consumer_scale, producer_out_absmax/127) — applied to BOTH the
    producer's out_scale and the consumer's x_scale (they must agree:
    the consumer's dequant constant bakes its x_scale in)."""
    n = len(layers)
    consumers: Dict[int, List[int]] = {i: [] for i in range(-1, n)}
    for idx, l in enumerate(layers):
        if isinstance(l, Route):
            for r in l.layers:
                consumers[resolve_route(idx, r)].append(idx)
        elif isinstance(l, (Shortcut, Sam, ScaleChannels)):
            consumers[resolve_route(idx, l.frm)].append(idx)
            consumers[idx - 1].append(idx)
        elif idx > 0:
            consumers[idx - 1].append(idx)
    conv_ordinal = {}
    ci = 0
    for idx, l in enumerate(layers):
        if isinstance(l, Conv):
            conv_ordinal[idx] = ci
            ci += 1
    x_scales = list(act_scales)
    chains = []  # (producer_conv_ordinal, consumer_conv_ordinal, pooled?)
    for idx, l in enumerate(layers):
        if not isinstance(l, Conv):
            continue
        cur, pooled = idx, False
        while True:
            cons = consumers[cur]
            if len(cons) != 1:
                break
            nxt = cons[0]
            if isinstance(layers[nxt], Conv):
                chains.append((conv_ordinal[idx], conv_ordinal[nxt],
                               pooled))
                break
            if isinstance(layers[nxt], MaxPool):
                cur, pooled = nxt, True
                continue
            break  # reorg/route/shortcut/upsample/head need fp input
    if out_maxes is None:
        # no pre-pool stats: pool-mediated chains can't be widened
        # safely, so they stay fp boundaries
        chains = [c for c in chains if not c[2]]
    # widen pool-mediated consumers first so every reader of x_scales
    # below (including direct producers of a widened conv) agrees
    for prod, cons, pooled in chains:
        if pooled:
            x_scales[cons] = max(x_scales[cons], out_maxes[prod] / 127.0)
    out_scales: List[Optional[float]] = [None] * len(conv_ordinal)
    for prod, cons, _pooled in chains:
        out_scales[prod] = x_scales[cons]
    return out_scales, x_scales


def quantize(layers: Sequence[LayerSpec], folded_params,
             act_scales: List[float], chain: bool = True,
             out_maxes: Optional[List[float]] = None):
    """Folded (kernel+bias) params + calibrated activation scales ->
    int8 inference pytree. chain=True additionally emits int8
    activations between sole-consumer conv pairs (see
    _chain_out_scales; pool-mediated chains need out_maxes from
    `calibrate(..., return_out_maxes=True)` to widen safely — without
    it they fall back to fp boundaries); chain=False reproduces the
    unchained blocks (bf16 intermediates everywhere)."""
    from yolo_tpu.configs.specs import weighted_specs

    n_convs = sum(1 for l in layers if isinstance(l, Conv))
    if chain:
        out_scales, act_scales = _chain_out_scales(layers, act_scales,
                                                   out_maxes)
    else:
        out_scales = [None] * n_convs
    out = []
    ci = 0
    for spec, p in zip(weighted_specs(tuple(layers)), folded_params):
        if not isinstance(spec, Conv):
            # classifier [connected] tail: stays fp (a single tiny
            # matmul — not worth a quantization error budget)
            out.append({k: np.asarray(v) for k, v in p.items()})
            continue
        x_scale, o_scale = act_scales[ci], out_scales[ci]
        ci += 1
        kernel = np.asarray(p["kernel"], np.float32)
        w_scale = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)), 1e-8) / 127.0
        kq = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
        q = {
            "kernel_q": kq,
            "w_scale": w_scale.astype(np.float32),
            "x_scale": np.float32(max(x_scale, 1e-8)),
            "bias": np.asarray(p["bias"], np.float32),
        }
        if o_scale is not None:
            q["out_scale"] = np.float32(max(o_scale, 1e-8))
        out.append(q)
    return out


def conv_block_int8(x, p, spec: Conv, compute_dtype=jnp.bfloat16):
    """Quantize -> int8 conv -> dequantize + bias -> activation.

    Chained mode: an int8 input is taken as already quantized at this
    block's x_scale (the producer used our scale via "out_scale"), and
    a block carrying "out_scale" emits int8 quantized at its consumer's
    scale — the inter-block tensor stays 1 byte/elem."""
    from jax import lax

    pad = (spec.size // 2) * spec.dilation  # darknet pad * dilation
    if x.dtype == jnp.int8:
        xq = x
    else:
        inv = 1.0 / p["x_scale"]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                      ).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq, p["kernel_q"],
        window_strides=(spec.stride, spec.stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
        rhs_dilation=(spec.dilation, spec.dilation),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (p["x_scale"] * p["w_scale"]) + p["bias"]
    # dequantized value is fp32 — any activation applies directly
    y = graph._activate(y, spec.act)
    if "out_scale" in p:
        return jnp.clip(jnp.round(y / p["out_scale"]), -127, 127
                        ).astype(jnp.int8)
    return y.astype(compute_dtype)


def prepare_int8(cfg, params, calibration_images,
                 method: str = "absmax", chain: bool = True) -> list:
    """darknet/raw params -> calibrated int8 inference pytree.

    calibration_images: (B, S, S, 3) preprocessed [0,1] fp32 batch.
    method: calibration statistic, see `calibrate`. chain: int8
    activations between sole-consumer conv pairs (see quantize)."""
    from yolo_tpu.configs.specs import Crop, DetectionHead, Local

    if any(isinstance(l, (Crop, Local, DetectionHead))
           for l in cfg.layers):
        raise NotImplementedError(
            "int8 PTQ does not support the yolov1 family "
            "([crop]/[local]/[detection] layers) — use fp32/bf16")
    folded = graph.fold_params(cfg.layers, params, cfg.bn_eps)
    scales, out_maxes = calibrate(cfg.layers, folded, calibration_images,
                                  cfg.bn_eps, method=method,
                                  return_out_maxes=True)
    return graph.params_to_jax_quant(quantize(cfg.layers, folded, scales,
                                              chain=chain,
                                              out_maxes=out_maxes))
