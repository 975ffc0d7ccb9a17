"""TF-2.x oracle implementing the documented reference semantics
(SURVEY.md §4.2.3): an INDEPENDENT implementation of the same layer IR in
TF ops, used to golden-test the JAX stack layer-by-layer and end-to-end.

The reference itself is TF-1.x and unavailable (SURVEY.md §0); parity is a
property of the graphs, so seeded random darknet weights through both
stacks is the gate.
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.configs.specs import (AvgPool, Connected, Conv, Crop,
                                    DetectionHead, Dropout, Local,
                                    MaxPool, Reorg, Route, Sam,
                                    ScaleChannels, Shortcut, SoftmaxHead,
                                    Upsample, YoloHead, resolve_route)


def _reorg_indices(c: int, h: int, w: int, stride: int) -> np.ndarray:
    """Flat gather indices for darknet reorg (forward=0), from the
    reorg_cpu index formula — deliberately NOT the reshape/transpose chain
    used by the production op, so the two derivations check each other."""
    s = stride
    out_c = c // (s * s)
    idx = np.empty(c * h * w, dtype=np.int64)
    for k in range(c):
        for j in range(h):
            for i in range(w):
                in_index = i + w * (j + h * k)
                c2 = k % out_c
                offset = k // out_c
                w2 = i * s + offset % s
                h2 = j * s + offset // s
                out_index = w2 + w * s * (h2 + h * s * c2)
                idx[in_index] = out_index
    return idx


def run_layers(layers, params, x_nhwc: np.ndarray, eps: float = 1e-5,
               return_all: bool = False):
    import tensorflow as tf

    x = tf.constant(x_nhwc, dtype=tf.float32)
    outputs = []
    heads = []
    conv_i = 0
    for idx, layer in enumerate(layers):
        if isinstance(layer, Conv):
            p = params[conv_i]
            conv_i += 1
            d = getattr(layer, "dilation", 1)
            kern = p["kernel"].astype(np.float32)
            if d > 1:
                # dilated conv as an explicitly zero-inserted kernel —
                # an independent derivation vs lax rhs_dilation (and it
                # sidesteps TF's stride>1 + dilations>1 restriction)
                k = kern.shape[0]
                ke = np.zeros((d * (k - 1) + 1, d * (k - 1) + 1)
                              + kern.shape[2:], np.float32)
                ke[::d, ::d] = kern
                kern = ke
            # darknet padding = pad * dilation (im2col/cudnn both)
            pad = (layer.size // 2) * d
            if pad:
                x = tf.pad(x, [[0, 0], [pad, pad], [pad, pad], [0, 0]])
            g = getattr(layer, "groups", 1)
            if g > 1:
                # grouped conv as explicit split/conv/concat — an
                # independent derivation vs lax feature_group_count
                oc_g = kern.shape[-1] // g
                ins = tf.split(x, g, axis=-1)
                outs = [tf.nn.conv2d(ins[i],
                                     kern[..., i * oc_g:(i + 1) * oc_g],
                                     strides=layer.stride,
                                     padding="VALID")
                        for i in range(g)]
                x = tf.concat(outs, axis=-1)
            else:
                x = tf.nn.conv2d(x, kern,
                                 strides=layer.stride, padding="VALID")
            if "gamma" in p:
                x = tf.nn.batch_normalization(
                    x, p["mean"], p["var"], p["beta"], p["gamma"], eps)
            else:
                x = tf.nn.bias_add(x, p["bias"])
            if layer.act == "leaky":
                x = tf.nn.leaky_relu(x, alpha=0.1)
            elif layer.act == "mish":
                x = x * tf.math.tanh(tf.math.softplus(x))
            elif layer.act == "logistic":
                x = tf.math.sigmoid(x)
            elif layer.act == "swish":
                x = x * tf.math.sigmoid(x)
        elif isinstance(layer, MaxPool):
            padn = layer.size - 1
            lead = padn // 2
            x = tf.pad(x, [[0, 0], [lead, padn - lead],
                           [lead, padn - lead], [0, 0]],
                       constant_values=float("-inf"))
            x = tf.nn.max_pool2d(x, ksize=layer.size, strides=layer.stride,
                                 padding="VALID")
        elif isinstance(layer, Reorg):
            b = x.shape[0]
            xn = tf.transpose(x, [0, 3, 1, 2])  # NCHW, darknet layout
            c, h, w = xn.shape[1], xn.shape[2], xn.shape[3]
            gather = _reorg_indices(int(c), int(h), int(w), layer.stride)
            flat = tf.reshape(xn, [b, -1])
            out = tf.gather(flat, gather, axis=1)
            s = layer.stride
            xn = tf.reshape(out, [b, int(c) * s * s, int(h) // s, int(w) // s])
            x = tf.transpose(xn, [0, 2, 3, 1])
        elif isinstance(layer, Route):
            srcs = [outputs[resolve_route(idx, r)] for r in layer.layers]
            if layer.groups > 1:  # darknet slices EACH source
                srcs = [s[..., layer.group_id * (int(s.shape[-1])
                        // layer.groups):(layer.group_id + 1)
                        * (int(s.shape[-1]) // layer.groups)]
                        for s in srcs]
            x = tf.concat(srcs, axis=-1) if len(srcs) > 1 else srcs[0]
        elif isinstance(layer, Shortcut):
            src = outputs[resolve_route(idx, layer.frm)]
            minc = min(int(src.shape[-1]), int(x.shape[-1]))
            if getattr(layer, "weights_type", "none") != "none":
                # weighted shortcut — independent numpy derivation of
                # the blend-weight math (specs.Shortcut)
                wts = params[conv_i]["weights"].astype(np.float64)
                conv_i += 1
                if layer.weights_norm == "relu":
                    lw = np.maximum(wts, 0.001)
                    wts = lw / (1e-4 + lw.sum(axis=0, keepdims=True))
                elif layer.weights_norm == "softmax":
                    e = np.exp(wts - wts.max(axis=0, keepdims=True))
                    wts = e / (1e-4 + e.sum(axis=0, keepdims=True))
                wts = wts.astype(np.float32)
                if layer.weights_type == "per_feature":
                    w0 = float(wts[0, 0])
                    w1 = float(wts[1, 0])
                    y = x * w0
                    add = src[..., :minc] * w1
                else:
                    w0 = tf.constant(wts[0])
                    w1 = tf.constant(wts[1][:minc])
                    y = x * w0
                    add = src[..., :minc] * w1
                if minc < int(x.shape[-1]):
                    x = tf.concat([y[..., :minc] + add, y[..., minc:]],
                                  axis=-1)
                else:
                    x = y + add
            elif int(src.shape[-1]) == int(x.shape[-1]):
                x = x + src
            else:  # darknet shortcut_cpu: add over min channels (PRN)
                x = tf.concat([x[..., :minc] + src[..., :minc],
                               x[..., minc:]], axis=-1)
            if layer.act == "leaky":
                x = tf.nn.leaky_relu(x, alpha=0.1)
        elif isinstance(layer, Sam):
            x = x * outputs[resolve_route(idx, layer.frm)]
            if layer.act == "leaky":
                x = tf.nn.leaky_relu(x, alpha=0.1)
        elif isinstance(layer, ScaleChannels):
            x = outputs[resolve_route(idx, layer.frm)] * x
            if layer.act == "leaky":
                x = tf.nn.leaky_relu(x, alpha=0.1)
            elif layer.act == "logistic":
                x = tf.math.sigmoid(x)
        elif isinstance(layer, Upsample):
            s = layer.stride
            b, h, w, c = x.shape
            x = tf.image.resize(x, [int(h) * s, int(w) * s],
                                method="nearest")
            if layer.scale != 1.0:
                x = x * layer.scale
        elif isinstance(layer, AvgPool):
            x = tf.reduce_mean(x, axis=[1, 2], keepdims=True)
        elif isinstance(layer, Connected):
            p = params[conv_i]
            conv_i += 1
            b = x.shape[0]
            # darknet flattens CHW-order
            xf = tf.reshape(tf.transpose(x, [0, 3, 1, 2]), [b, -1])
            y = tf.matmul(xf, p["kernel"].astype(np.float32))
            y = tf.nn.bias_add(y, p["bias"])
            if layer.act == "leaky":
                y = tf.nn.leaky_relu(y, alpha=0.1)
            elif layer.act == "logistic":
                y = tf.math.sigmoid(y)
            x = tf.reshape(y, [b, 1, 1, -1])
        elif isinstance(layer, Crop):
            # crop_layer.c test mode: center crop + input*2 - 1 unless
            # noadjust (independent derivation of the same spec)
            _, ih, iw, _ = x.shape
            dy = (ih - layer.crop_h) // 2
            dx = (iw - layer.crop_w) // 2
            x = x[:, dy:dy + layer.crop_h, dx:dx + layer.crop_w, :]
            if not layer.noadjust:
                x = x * 2.0 - 1.0
        elif isinstance(layer, Local):
            # independent derivation via tf.image.extract_patches,
            # whose patch order is (ky, kx, c) — the loader's
            # (c, ky, kx) kernels are REORDERED here, cross-checking
            # the executor's patch-order assumption
            p = params[conv_i]
            conv_i += 1
            k, s = layer.size, layer.stride
            pad = k // 2 if layer.pad else 0
            xp = tf.pad(x, [[0, 0], [pad, pad], [pad, pad], [0, 0]])
            patches = tf.image.extract_patches(
                xp, sizes=[1, k, k, 1], strides=[1, s, s, 1],
                rates=[1, 1, 1, 1], padding="VALID")
            kern = p["kernel"].astype(np.float32)  # (H',W',F,C,k,k)
            kt = np.ascontiguousarray(
                kern.transpose(0, 1, 2, 4, 5, 3)).reshape(
                layer.out_h, layer.out_w, layer.filters, -1)
            y = tf.einsum("bhwp,hwfp->bhwf",
                          tf.cast(patches, tf.float32),
                          tf.constant(kt))
            y = y + p["bias"].astype(np.float32)
            if layer.act == "leaky":
                y = tf.nn.leaky_relu(y, alpha=0.1)
            elif layer.act == "relu":
                y = tf.nn.relu(y)
            x = y
        elif isinstance(layer, DetectionHead):
            pass  # identity: the connected output IS the v1 tensor
        elif isinstance(layer, Dropout):
            pass  # inference identity
        elif isinstance(layer, SoftmaxHead):
            flat = tf.reshape(x, [x.shape[0], -1])
            if layer.temperature != 1.0:
                flat = flat / layer.temperature
            if layer.tree is not None:
                # independent per-sibling-group softmax: slice + concat
                # with tf.nn.softmax per group (the jax path scatters
                # over a group-id table instead)
                pieces = [None] * layer.tree.n_nodes
                for g in range(layer.tree.n_groups):
                    members = list(layer.tree.group_members(g))
                    sm = tf.nn.softmax(
                        tf.gather(flat, members, axis=-1), axis=-1)
                    for slot, node in enumerate(members):
                        pieces[node] = sm[:, slot:slot + 1]
                x = tf.concat(pieces, axis=-1)
            else:
                x = tf.nn.softmax(flat, axis=-1)
        elif isinstance(layer, YoloHead):
            heads.append(x)  # head logits = the [yolo] layer's input
        outputs.append(x)
    if return_all:
        return [o.numpy() for o in outputs]
    if heads:
        return tuple(h.numpy() for h in heads)
    return x.numpy()
