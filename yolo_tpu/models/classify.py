"""Darknet classifier inference (darknet classifier.c
``predict_classifier``): min-side resize + center crop, one jitted
forward through the softmax-head graph, top-k labels.

Preprocess pins darknet's exact geometry: ``resize_min(im, net->w)``
scales so the SMALLER side equals the net size (bilinear, cv2
INTER_LINEAR — the established darknet resize_image equivalence, see
ops/letterbox.py), then ``crop_image`` takes the centered net x net
window. The classifier families this serves (darknet19/darknet53) are
the pretrained-backbone sources for yolov2/yolov3 fine-tuning
(`cli partial` extracts the .conv.NN files from them).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.configs.specs import ModelConfig
from yolo_tpu.models import graph


def classifier_preprocess(image_u8: np.ndarray, net_size
                          ) -> np.ndarray:
    """(H, W, 3) uint8 -> (net_h, net_w, 3) float32 in [0,1]: darknet
    resize_min (min side -> net_size, aspect preserved) + center crop.
    net_size: int or (net_h, net_w) — rectangular classifier nets scale
    so BOTH target extents are covered (the resize_min generalization)
    then center-crop per axis; the square case keeps darknet's exact
    integer arithmetic."""
    import cv2

    h, w = image_u8.shape[:2]
    from yolo_tpu.data.targets import _as_hw

    net_h, net_w = _as_hw(net_size)
    if net_h == net_w:
        # darknet resize_min's integer arithmetic, kept exactly
        if w < h:
            new_w, new_h = net_w, (h * net_w) // w
        else:
            new_w, new_h = (w * net_h) // h, net_h
    else:
        scale = max(net_w / w, net_h / h)
        new_w = max(net_w, int(round(w * scale)))
        new_h = max(net_h, int(round(h * scale)))
    resized = cv2.resize(image_u8.astype(np.float32) / 255.0,
                         (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    if resized.ndim == 2:
        resized = resized[..., None]   # cv2 drops the C=1 axis (gray)
    dx, dy = (new_w - net_w) // 2, (new_h - net_h) // 2
    return resized[dy:dy + net_h, dx:dx + net_w]


@functools.partial(jax.jit, static_argnames=("layers", "eps",
                                             "compute_dtype"))
def _forward(params, images, *, layers, eps, compute_dtype):
    return graph.apply_layers(layers, params, images, eps=eps,
                              compute_dtype=compute_dtype)


def make_classifier(cfg: ModelConfig, compute_dtype=jnp.float32):
    """-> fn(params, images_f32 (B, net, net, 3)) -> (B, C) probs."""
    if cfg.head_kind != "softmax":
        raise ValueError(f"{cfg.name} is not a classifier "
                         f"(head_kind={cfg.head_kind})")

    def run(params, images):
        return _forward(params, jnp.asarray(images, jnp.float32),
                        layers=cfg.layers, eps=cfg.bn_eps,
                        compute_dtype=compute_dtype)

    return run


def top_k(probs: np.ndarray, class_names: Tuple[str, ...], k: int = 5
          ) -> List[Tuple[str, float]]:
    """One image's probs -> [(name, prob)] best-first."""
    probs = np.asarray(probs).reshape(-1)
    idx = np.argsort(-probs)[:k]
    return [(class_names[i], float(probs[i])) for i in idx]


def preprocess_samples(samples, net_size, channels: int = 3) -> tuple:
    """(path, label) samples -> (xs (N, net_h, net_w, C) f32, labels (N,)).
    Factored out so mid-train evaluation can pay the decode+resize cost
    ONCE instead of per --eval-every invocation (code-review)."""
    from yolo_tpu.data.pipeline import load_image

    xs = np.stack([classifier_preprocess(load_image(p, channels),
                                         net_size)
                   for p, _ in samples]).astype(np.float32)
    labels = np.asarray([lab for _, lab in samples], np.int64)
    return xs, labels


def accuracy_counts(cfg: ModelConfig, params, xs, labels, *,
                    batch: int = 32, k: int = 5,
                    compute_dtype=jnp.float32,
                    quantize_first_batch=None):
    """(n, top1_hits, topk_hits) integer counts over preprocessed
    arrays — the compute core of the darknet `classifier valid`
    protocol (ONE padded jit bucket; tree classifiers score on
    leaf-masked absolute probs, with internal-node labels correct when
    they are ancestors of the predicted leaf). Counts stay EXACT so
    streaming callers can aggregate without rounding error.
    quantize_first_batch(xs) -> params hooks int8 PTQ calibration on
    the first batch."""
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    run = make_classifier(cfg, compute_dtype=compute_dtype)
    n = len(labels)
    top1 = topk = 0
    for i in range(0, n, batch):
        chunk = xs[i:i + batch]
        real = len(chunk)
        if real < batch:
            chunk = np.concatenate(
                [chunk, np.zeros((batch - real,) + chunk.shape[1:],
                                 chunk.dtype)])
        if i == 0 and quantize_first_batch is not None:
            params = quantize_first_batch(chunk)
        probs = np.asarray(run(params, chunk))[:real]
        tree = cfg.softmax_tree
        if tree is not None:
            probs = hierarchy_leaf_probs(probs, tree)
        order = np.argsort(-probs, axis=-1)
        for true_idx, o in zip(labels[i:i + batch], order):
            if tree is not None:
                # hierarchical protocol: predictions are leaves, so an
                # internal-node label is correct when it is an ancestor
                # of the predicted leaf (equality for leaf labels)
                hits = [true_idx in tree.path(int(p))
                        for p in o[:k]]
                top1 += int(hits[0])
                topk += int(any(hits))
            else:
                top1 += int(o[0] == true_idx)
                topk += int(true_idx in o[:k])
    return n, top1, topk


def accuracy_from_arrays(cfg: ModelConfig, params, xs, labels, *,
                         batch: int = 32, k: int = 5,
                         compute_dtype=jnp.float32,
                         quantize_first_batch=None) -> dict:
    """accuracy_counts rendered as the `classify --images` JSON dict."""
    n, top1, topk = accuracy_counts(
        cfg, params, xs, labels, batch=batch, k=k,
        compute_dtype=compute_dtype,
        quantize_first_batch=quantize_first_batch)
    if n == 0:
        raise ValueError("no images to score (empty input — check the "
                         "folder layout and --names class list)")
    return {"images": n, "top1": round(top1 / n, 4),
            f"top{k}": round(topk / n, 4)}


def imagefolder_accuracy(cfg: ModelConfig, params, samples, *,
                         batch: int = 32, k: int = 5,
                         compute_dtype=jnp.float32,
                         quantize_first_batch=None) -> dict:
    """Streaming accuracy over (path, label) samples — the one-shot
    `cli classify --images` entry point. Decodes ONE batch at a time
    (O(batch) memory: a 50k-image folder must not materialize a ~40 GB
    array — code-review finding); the mid-train eval path instead
    caches arrays once and calls accuracy_from_arrays directly."""
    from yolo_tpu.data.pipeline import load_image

    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    if not samples:
        raise ValueError("no images to score (empty imagefolder — "
                         "check the folder layout and --names class "
                         "list)")
    n_done = hits1 = hitsk = 0
    for i in range(0, len(samples), batch):
        chunk = samples[i:i + batch]
        xs = np.stack([classifier_preprocess(
                           load_image(p, cfg.in_channels), cfg.input_hw)
                       for p, _ in chunk]).astype(np.float32)
        labels = np.asarray([lab for _, lab in chunk], np.int64)
        if i == 0 and quantize_first_batch is not None:
            # calibrate ONCE on the first (zero-padded) batch, then
            # every chunk runs the quantized params
            calib = xs
            if len(chunk) < batch:
                calib = np.concatenate(
                    [xs, np.zeros((batch - len(chunk),) + xs.shape[1:],
                                  xs.dtype)])
            params = quantize_first_batch(calib)
        n, h1, hk = accuracy_counts(
            cfg, params, xs, labels, batch=batch, k=k,
            compute_dtype=compute_dtype)
        n_done += n
        hits1 += h1
        hitsk += hk
    return {"images": n_done, "top1": round(hits1 / n_done, 4),
            f"top{k}": round(hitsk / n_done, 4)}


def hierarchy_leaf_probs(cond, tree) -> np.ndarray:
    """Tree-classifier conditionals (B, C) -> ABSOLUTE probs with the
    internal nodes zeroed: the YOLO9000 classification protocol
    (paper §4 — classification assumes an object is present, so the
    probability mass lands on the leaves; darknet masks non-leaves for
    imagenet-9k top-k). Output still sums to <= 1 over the leaves."""
    from yolo_tpu.ops.decode import _tree_np_consts, tree_absolute_probs

    absolute = np.asarray(tree_absolute_probs(jnp.asarray(cond), tree))
    # leaf mask cached per tree (the 9k-iteration Python rebuild per
    # /classify request was a measured hot-path cost — code-review)
    return np.where(_tree_np_consts(tree)["leaf"], absolute, 0.0)


def hierarchy_path(cond_row: np.ndarray, tree
                   ) -> List[Tuple[str, float, float]]:
    """One image's conditionals -> the greedy root-to-leaf path as
    [(name, conditional, absolute)] — the `classify --hierarchy`
    display (each split takes the max-conditional child)."""
    cond_row = np.asarray(cond_row).reshape(-1)
    out: List[Tuple[str, float, float]] = []
    group, p = 0, 1.0
    while True:
        members = list(tree.group_members(group))
        node = members[int(np.argmax(cond_row[members]))]
        c = float(cond_row[node])
        p *= c
        out.append((tree.names[node], c, p))
        if tree.leaf(node):
            return out
        group = tree.child_group[node]
