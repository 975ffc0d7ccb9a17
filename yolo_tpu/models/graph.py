"""Functional executor for the darknet-equivalent layer IR.

One pure function interprets ModelConfig.layers (tiny-YOLOv2 and full
YOLOv2 both run through here — the reference hardcodes each graph in TF
ops instead, SURVEY.md §2.1). Everything is traceable: static shapes,
no Python data-dependence, NHWC layout for TPU conv efficiency.

Precision policy (SURVEY.md §7.2 'fp32 parity vs speed'):
  * compute_dtype="float32" + HIGHEST precision — the parity/CI mode.
  * compute_dtype="bfloat16" — throughput mode; convs accumulate in fp32
    (preferred_element_type), activations/BN in bf16.

Batch-norm:
  * inference: rolling stats; or fold BN into conv weight+bias up front
    via fold_params() so each block is a single fused conv+bias+leaky
    (XLA fuses bias+leaky into the conv epilogue).
  * training: batch stats over (N, H, W) + EMA update of rolling stats
    (darknet momentum 0.99), returned functionally.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yolo_tpu.configs.specs import (AvgPool, Connected, Conv, Crop,
                                    DetectionHead, Dropout, Local,
                                    LayerSpec, MaxPool, Reorg, Route, Sam,
                                    ScaleChannels, Shortcut, SoftmaxHead,
                                    Upsample, YoloHead, resolve_route)
from yolo_tpu.ops.pool import maxpool_nhwc
from yolo_tpu.ops.reorg import reorg_nhwc

Params = List[Dict[str, Any]]

BN_MOMENTUM = 0.99


def _conv2d(x, kernel, stride, compute_dtype, train=False,
            input_layout="NHWC", groups=1, dilation=1):
    k = kernel.shape[0]
    # darknet pad = size // 2, symmetric; dilated convs pad by
    # pad * dilation (darknet passes l.pad * l.dilation to im2col and
    # cudnn alike), preserving the undilated SAME geometry
    pad = (k // 2) * dilation
    if compute_dtype == jnp.float32:
        precision = lax.Precision.HIGHEST
    else:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        precision = lax.Precision.DEFAULT
    # Inference: fp32 epilogue via preferred_element_type (MXU accumulates
    # fp32 either way). Training must emit compute_dtype — the conv VJP
    # rejects bf16 primals against an fp32 cotangent.
    out_dtype = compute_dtype if train else jnp.float32
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        # input_layout="NHCW" consumes the fused entry kernel's native
        # output (ops/pallas/entry_kernel.py) without a transpose pass;
        # the conv always emits NHWC
        dimension_numbers=(input_layout, "HWIO", "NHWC"),
        feature_group_count=groups,
        rhs_dilation=(dilation, dilation),
        precision=precision,
        preferred_element_type=out_dtype,
    )


def _activate(x, act: str):
    if act == "leaky":
        return jnp.where(x > 0, x, 0.1 * x)
    if act == "linear":
        return x
    if act == "mish":  # yolov4: x * tanh(softplus(x))
        return x * jnp.tanh(jax.nn.softplus(x))
    if act == "logistic":  # scaled-yolov4 new_coords head convs
        return jax.nn.sigmoid(x)
    if act == "swish":  # yolov4-csp-swish family: x * sigmoid(x)
        return x * jax.nn.sigmoid(x)
    if act == "relu":
        return jnp.maximum(x, 0.0)
    if act == "ramp":  # darknet ramp_activate: x*(x>0) + 0.1*x
        return jnp.maximum(x, 0.0) + 0.1 * x
    raise ValueError(f"unknown activation {act!r}")


def conv_block(x, p: Dict[str, Any], spec: Conv, *, eps: float,
               train: bool, compute_dtype, conv_impl: str = "xla",
               input_layout: str = "NHWC", bn_stats_fp32: bool = True
               ) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """conv (+BN) (+bias) + activation. Returns (y, new_bn_stats|None).

    conv_impl="pallas" routes eligible folded-BN inference blocks through
    the fused Pallas conv+bias+leaky kernel (ops/pallas/conv_kernel.py —
    A/B path; XLA is the measured-faster default on v5e)."""
    if "kernel_q" in p:  # int8 post-training-quantized block
        from yolo_tpu.models.quantize import conv_block_int8

        assert not train, "int8 params are inference-only"
        return conv_block_int8(x, p, spec, compute_dtype=compute_dtype), None
    if (conv_impl == "pallas" and not train and "bias" in p
            and spec.act in ("leaky", "linear") and spec.groups == 1
            and spec.dilation == 1 and input_layout == "NHWC"):
        from yolo_tpu.ops.pallas.conv_kernel import (eligible, feasible,
                                                     fused_conv_bias_act)

        if (eligible(p["kernel"], spec.stride)
                and feasible(x.shape, p["kernel"].shape,
                             jnp.dtype(compute_dtype).itemsize)):
            y = fused_conv_bias_act(
                x.astype(compute_dtype),
                jnp.asarray(p["kernel"], compute_dtype),
                jnp.asarray(p["bias"]), act=spec.act)
            return y, None
    y = _conv2d(x, p["kernel"], spec.stride, compute_dtype, train=train,
                input_layout=input_layout, groups=spec.groups,
                dilation=spec.dilation)
    new_stats = None
    if "gamma" in p:
        if train:
            # batch-stat math defaults to fp32 (bf16 mean/var over big
            # B*S*S populations loses mantissa); bn_stats_fp32=False is
            # the measured A/B that keeps stats in the compute dtype —
            # see docs/PERF.md training roofline for the verdict. The
            # EMA accumulators are always stored fp32.
            if bn_stats_fp32:
                y = y.astype(jnp.float32)
            mean = jnp.mean(y, axis=(0, 1, 2))
            # darknet variance_cpu normalizes by 1/(batch*spatial - 1)
            # (Bessel), NOT 1/n — both the in-step normalization and
            # the EMA'd rolling_var inference later uses carry that
            # factor (code-review finding). n==1 would divide by zero
            # in darknet too; clamp for safety.
            n = y.shape[0] * y.shape[1] * y.shape[2]
            var = jnp.var(y, axis=(0, 1, 2)) * (n / max(n - 1, 1))
            new_stats = {
                "mean": (BN_MOMENTUM * p["mean"]
                         + (1 - BN_MOMENTUM) * mean.astype(jnp.float32)),
                "var": (BN_MOMENTUM * p["var"]
                        + (1 - BN_MOMENTUM) * var.astype(jnp.float32)),
            }
        else:
            mean, var = p["mean"], p["var"]
        scale = p["gamma"] * lax.rsqrt(var + eps)
        y = (y - mean) * scale + p["beta"]
    elif "bias" in p:
        y = y + p["bias"]
    y = _activate(y, spec.act)
    if compute_dtype != jnp.float32:
        y = y.astype(compute_dtype)
    return y, new_stats


def _local_layer(x, p, layer, *, compute_dtype=jnp.float32):
    """darknet local_layer forward: per-output-position unshared conv.
    Patches are built in darknet's im2col (c, ky, kx) order so the
    loader's location-major (filters, in_c, k, k) blocks line up;
    fp32 accumulate, per-element biases (outputs-sized, see
    io/darknet_weights)."""
    k, s = layer.size, layer.stride
    pad = layer.size // 2 if layer.pad else 0
    xin = x.astype(jnp.float32)
    if pad:
        xin = jnp.pad(xin, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hh, ww = layer.out_h, layer.out_w
    rows = []
    for ky in range(k):
        cols = []
        for kx in range(k):
            cols.append(xin[:, ky:ky + hh * s:s, kx:kx + ww * s:s, :])
        rows.append(jnp.stack(cols, axis=-1))          # (B,H,W,C,k)
    patches = jnp.stack(rows, axis=-2)                 # (B,H,W,C,ky,kx)
    b_dim = x.shape[0]
    patches = patches.reshape(b_dim, hh, ww, -1)       # (c,ky,kx) order
    kern = jnp.asarray(p["kernel"], jnp.float32).reshape(
        hh, ww, layer.filters, -1)
    y = jnp.einsum("bhwp,hwfp->bhwf", patches, kern,
                   precision=lax.Precision.HIGHEST)
    y = _activate(y + jnp.asarray(p["bias"], jnp.float32), layer.act)
    if compute_dtype != jnp.float32:
        y = y.astype(compute_dtype)
    return y


def apply_layers(layers: Sequence[LayerSpec], params: Params, x: jnp.ndarray,
                 *, eps: float = 1e-5, train: bool = False,
                 compute_dtype=jnp.float32, conv_impl: str = "xla",
                 return_all: bool = False, remat: bool = False,
                 input_layout: str = "NHWC", bn_stats_fp32: bool = True,
                 softmax_logits: bool = False, dropout_rng=None):
    """Run the layer list. x: (B, H, W, 3) float.

    input_layout="NHCW" marks x as the fused entry kernel's native
    layout; the FIRST conv consumes it via dimension_numbers and emits
    NHWC (only valid when the first layer is a Conv).

    Returns logits (B, S, S, A*(5+C)) in fp32 — or, when the layer list
    contains YoloHead markers (yolov3 family), a TUPLE of per-head logit
    arrays in cfg order; when train=True returns
    (logits, new_bn_stats) where new_bn_stats is a dict {conv_idx: stats};
    return_all=True returns every layer's output (layer-by-layer parity
    testing, SURVEY.md §4.2.3). remat=True rematerializes each conv
    block's activations in the backward pass (jax.checkpoint — trades
    FLOPs for HBM, enabling larger batches at 608).
    """
    if input_layout != "NHWC" and not isinstance(layers[0], Conv):
        raise ValueError("input_layout=NHCW needs a leading Conv layer")
    outputs: List[jnp.ndarray] = []
    head_logits: List[jnp.ndarray] = []  # [yolo] layers' inputs, fp32
    bn_updates: Dict[int, Dict] = {}
    conv_i = 0
    for idx, layer in enumerate(layers):
        if isinstance(layer, Conv):
            layout = input_layout if idx == 0 else "NHWC"
            block = conv_block
            if remat and train:
                block = jax.checkpoint(
                    functools.partial(conv_block, eps=eps, train=train,
                                      compute_dtype=compute_dtype,
                                      conv_impl=conv_impl,
                                      input_layout=layout,
                                      bn_stats_fp32=bn_stats_fp32),
                    static_argnums=(2,))
                x, stats = block(x, params[conv_i], layer)
            else:
                x, stats = conv_block(x, params[conv_i], layer, eps=eps,
                                      train=train,
                                      compute_dtype=compute_dtype,
                                      conv_impl=conv_impl,
                                      input_layout=layout,
                                      bn_stats_fp32=bn_stats_fp32)
            if stats is not None:
                bn_updates[conv_i] = stats
            conv_i += 1
        elif isinstance(layer, MaxPool):
            x = maxpool_nhwc(x, layer.size, layer.stride)
        elif isinstance(layer, Reorg):
            x = reorg_nhwc(x, layer.stride)
        elif isinstance(layer, Route):
            srcs = [outputs[resolve_route(idx, r)] for r in layer.layers]
            if layer.groups > 1:
                # yolov4 CSP slice: darknet route_layer slices EACH
                # source into groups before concatenating
                srcs = [s[..., layer.group_id * (s.shape[-1]
                        // layer.groups):(layer.group_id + 1)
                        * (s.shape[-1] // layer.groups)] for s in srcs]
            x = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
        elif isinstance(layer, Shortcut):
            src = outputs[resolve_route(idx, layer.frm)]
            minc = min(src.shape[-1], x.shape[-1])
            if layer.weights_type != "none":
                # weighted shortcut (blas.c shortcut_multilayer_cpu;
                # layout/normalization pinned in specs.Shortcut):
                # out = in*W0 + from*W1 on the overlap, in*W0 alone on
                # passthrough channels; normalization rescales the
                # (2,)/(2, C) blend weights along the input axis
                wts = params[conv_i]["weights"].astype(jnp.float32)
                conv_i += 1
                if layer.weights_norm == "relu":
                    lw = jnp.maximum(wts, 0.001)
                    wts = lw / (1e-4 + jnp.sum(lw, axis=0,
                                               keepdims=True))
                elif layer.weights_norm == "softmax":
                    e = jnp.exp(wts - jnp.max(wts, axis=0,
                                              keepdims=True))
                    wts = e / (1e-4 + jnp.sum(e, axis=0,
                                              keepdims=True))
                w0 = wts[0] if layer.weights_type == "per_channel" \
                    else wts[0, 0]
                w1 = wts[1] if layer.weights_type == "per_channel" \
                    else wts[1, 0]
                w1c = w1[:minc] if layer.weights_type == "per_channel" \
                    else w1
                y = x.astype(jnp.float32) * w0
                y = jnp.concatenate(
                    [y[..., :minc]
                     + src[..., :minc].astype(jnp.float32) * w1c,
                     y[..., minc:]], axis=-1) \
                    if minc < x.shape[-1] else \
                    y + src[..., :minc].astype(jnp.float32) * w1c
                x = _activate(y, layer.act)
                if compute_dtype != jnp.float32:
                    x = x.astype(compute_dtype)
            elif src.shape[-1] == x.shape[-1]:
                x = _activate(x + src, layer.act)
            else:
                # darknet shortcut_cpu adds over min(c1, c2) channels
                # and passes the rest through (partial residual — the
                # yolov3-tiny-prn family); output keeps the INPUT's
                # channel count
                x = _activate(jnp.concatenate(
                    [x[..., :minc] + src[..., :minc], x[..., minc:]],
                    axis=-1), layer.act)
        elif isinstance(layer, Sam):
            # darknet sam_layer: elementwise multiply (spatial attention)
            x = _activate(x * outputs[resolve_route(idx, layer.frm)],
                          layer.act)
        elif isinstance(layer, ScaleChannels):
            # darknet scale_channels_layer (SE multiply): the CURRENT
            # input is the small attention tensor ((B,1,1,C) channel
            # mode / (B,H,W,1) spatial mode), broadcast over the from
            # layer's extent; output adopts the from layer's shape
            x = _activate(outputs[resolve_route(idx, layer.frm)] * x,
                          layer.act)
        elif isinstance(layer, Upsample):
            s = layer.stride
            x = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
            if layer.scale != 1.0:
                x = x * jnp.asarray(layer.scale, x.dtype)
        elif isinstance(layer, AvgPool):
            # darknet avgpool_layer: global mean over the full extent;
            # kept (B, 1, 1, C) so downstream 1x1 convs work unchanged
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                         keepdims=True)
            if compute_dtype != jnp.float32:
                x = x.astype(compute_dtype)
        elif isinstance(layer, Crop):
            # darknet crop_layer (configs.specs.Crop docstring): test
            # mode center-crops; train mode draws ONE (dy, dx, flip)
            # per batch — rand() once per forward in crop_layer.c; both
            # modes emit input*2 - 1 unless noadjust
            _, ih, iw, _ = x.shape
            jitter = (train and dropout_rng is not None
                      and (ih > layer.crop_h or iw > layer.crop_w
                           or layer.flip))
            if jitter:
                kdy, kdx, kf = jax.random.split(
                    jax.random.fold_in(dropout_rng, idx), 3)
                dy = jax.random.randint(kdy, (), 0,
                                        ih - layer.crop_h + 1)
                dx = jax.random.randint(kdx, (), 0,
                                        iw - layer.crop_w + 1)
                x = jax.lax.dynamic_slice(
                    x, (0, dy, dx, 0),
                    (x.shape[0], layer.crop_h, layer.crop_w,
                     x.shape[3]))
                if layer.flip:
                    x = jnp.where(jax.random.bernoulli(kf),
                                  x[:, :, ::-1], x)
            else:
                dy = (ih - layer.crop_h) // 2
                dx = (iw - layer.crop_w) // 2
                if dy or dx or (ih, iw) != (layer.crop_h, layer.crop_w):
                    x = x[:, dy:dy + layer.crop_h,
                          dx:dx + layer.crop_w, :]
            if not layer.noadjust:
                # crop_layer.c scale=2/trans=-1: v1 nets see [-1, 1]
                x = x * 2.0 - 1.0
        elif isinstance(layer, Local):
            x = _local_layer(x, params[conv_i], layer,
                             compute_dtype=compute_dtype)
            conv_i += 1
        elif isinstance(layer, DetectionHead):
            # yolov1 [detection]: the INPUT (the connected head's flat
            # activations) IS the detection tensor — identity, decoded
            # by ops/decode.decode_detection in the predict path
            pass
        elif isinstance(layer, Connected):
            # darknet connected_layer: flatten CHW-order, dense matmul.
            # kernel stored (in, out) by the loader; fp32 accumulate.
            b_dim = x.shape[0]
            xf = jnp.transpose(x, (0, 3, 1, 2)).reshape(b_dim, -1)
            k = params[conv_i]["kernel"]
            if compute_dtype == jnp.float32:
                y = jnp.dot(xf, k, precision=lax.Precision.HIGHEST)
            else:
                y = jnp.dot(xf.astype(compute_dtype),
                            k.astype(compute_dtype),
                            preferred_element_type=jnp.float32)
            y = _activate(y + params[conv_i]["bias"], layer.act)
            x = y.reshape(b_dim, 1, 1, -1)
            if compute_dtype != jnp.float32:
                x = x.astype(compute_dtype)
            conv_i += 1
        elif isinstance(layer, Dropout):
            # inference: identity (darknet test-mode forward). Training
            # with a key: inverted dropout exactly as darknet's
            # dropout_layer — zero with prob p, scale survivors by
            # 1/(1-p) so the expected activation is unchanged. The key
            # folds in the layer index (independent masks per [dropout])
            # and the caller folds in the step (fresh masks per step).
            if train and dropout_rng is not None and layer.prob > 0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, idx),
                    1.0 - layer.prob, x.shape)
                x = jnp.where(keep, x / (1.0 - layer.prob),
                              jnp.zeros((), x.dtype))
        elif isinstance(layer, SoftmaxHead):
            # classifier output: (B, C) probabilities, fp32. With a
            # hierarchy ([softmax] tree=, darknet9000) the output is
            # the per-sibling-group CONDITIONAL probabilities — the
            # forward pass mirrors darknet's softmax_tree; consumers
            # derive leaf-masked absolute probs for top-k
            # (models/classify.hierarchy_leaf_probs).
            # softmax_logits=True returns the PRE-softmax flat logits
            # instead: the classifier-training loss computes its CE via
            # log-softmax for stability (train/loss.classifier_loss).
            flat = x.astype(jnp.float32).reshape(x.shape[0], -1)
            if layer.temperature != 1.0 and not softmax_logits:
                # darknet softmax temperature: logits / T (training
                # applies it inside classifier_loss on the raw logits)
                flat = flat / layer.temperature
            if softmax_logits:
                x = flat
            elif layer.tree is not None:
                from yolo_tpu.ops.decode import tree_conditional_probs

                x = tree_conditional_probs(flat, layer.tree)
            else:
                x = jax.nn.softmax(flat, axis=-1)
        elif isinstance(layer, YoloHead):
            head_logits.append(x.astype(jnp.float32))
            # routed output = input (identity), keeping darknet indices
        else:
            raise TypeError(f"unknown layer spec {layer!r}")
        outputs.append(x)
    if return_all:
        return outputs
    # yolov3 family: the outputs are the [yolo] layers' inputs, coarsest
    # head first (cfg order); yolov2 family: the last layer's output.
    result = tuple(head_logits) if head_logits else x.astype(jnp.float32)
    if train:
        return result, bn_updates
    return result


def fold_params(layers: Sequence[LayerSpec], params: Params,
                eps: float = 1e-5) -> Params:
    """Fold inference BN into conv weight+bias (SURVEY.md §3.4):
    w' = w * g/sqrt(v+eps), b' = beta - mean * g/sqrt(v+eps)."""
    from yolo_tpu.configs.specs import weighted_specs

    n_weighted = len(weighted_specs(layers))
    if len(params) != n_weighted:
        # layers exists in the signature for exactly this check — a
        # params list from a different topology would fold without
        # complaint and fail obscurely downstream
        raise ValueError(f"fold_params: {len(params)} param blocks for "
                         f"{n_weighted} weighted layers")
    folded = []
    for p in params:
        if "weights" in p:  # weighted shortcut: nothing to fold
            folded.append({"weights": np.asarray(p["weights"])})
            continue
        if "gamma" in p:
            scale = np.asarray(p["gamma"]) / np.sqrt(np.asarray(p["var"]) + eps)
            k = np.asarray(p["kernel"])
            # conv kernels are HWIO (scale over O); a BN'd [connected]
            # kernel is (in, out) — broadcast over the LAST axis for
            # both (the fixed 4-D index built a (1,1,in,out) kernel
            # for dense layers)
            folded.append({
                "kernel": k * scale.reshape((1,) * (k.ndim - 1) + (-1,)),
                "bias": np.asarray(p["beta"]) - np.asarray(p["mean"]) * scale,
            })
        else:
            folded.append({"kernel": np.asarray(p["kernel"]),
                           "bias": np.asarray(p["bias"])})
    return folded


def apply_bn_updates(params: Params, bn_updates: Dict[int, Dict]) -> Params:
    """Merge EMA stats from a training step back into the params pytree."""
    out = []
    for i, p in enumerate(params):
        if i in bn_updates:
            q = dict(p)
            q.update(bn_updates[i])
            out.append(q)
        else:
            out.append(p)
    return out


def params_to_jax(params: Params, dtype=jnp.float32) -> Params:
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype=dtype), params)


def params_to_jax_quant(params: Params) -> Params:
    """Device placement preserving each leaf's dtype (int8 kernels)."""
    return jax.tree_util.tree_map(jnp.asarray, params)
