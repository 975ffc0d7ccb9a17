"""High-level public API — the three-line path from weights to boxes.

    import yolo_tpu

    model = yolo_tpu.load("yolov2.weights", "coco")
    detections = model(images_u8)            # (B, H, W, 3) raw RGB
    # {'boxes' (B,D,4) pixel xyxy, 'scores', 'classes', 'valid'}

Classifiers load symmetrically:

    clf = yolo_tpu.load_classifier("darknet19.weights", "darknet19")
    top = clf(images_u8)          # [(name, prob), ...] per image

Everything else (training, eval, serving, quantization) is reachable
from the subpackages or the CLI (python -m yolo_tpu.cli --help).
"""

from __future__ import annotations

from typing import Optional


class Model:
    """A loaded detector: callable on raw uint8 RGB batches."""

    def __init__(self, cfg, params, detector):
        self.cfg = cfg
        self.params = params
        self._detector = detector

    def __call__(self, images_u8):
        import jax.numpy as jnp

        return self._detector(self.params, jnp.asarray(images_u8))


def load(weights_path: str, variant: Optional[str] = None, *,
         cfg: Optional[str] = None, names: Optional[str] = None,
         input_size: Optional[int] = None, precision: str = "bf16",
         conf_threshold: Optional[float] = None,
         nms_threshold: Optional[float] = None) -> Model:
    """Load darknet ``.weights`` (or an orbax checkpoint dir, or a
    ``zoo://<name>`` entry) into a ready-to-call detector.

    variant=None auto-detects: zoo entries carry their variant; plain
    .weights files are matched by exact byte size against the four
    darknet topologies (io/zoo.infer_variant). ``cfg``/``names`` load a
    custom darknet .cfg topology instead (configs/darknet_cfg.py).
    precision: "fp32" (parity) | "bf16"."""
    import os

    from yolo_tpu.configs import get_variant

    if weights_path.startswith("zoo://"):
        from yolo_tpu.io import zoo

        entry = zoo.load_manifest().get(weights_path[len("zoo://"):])
        if entry and entry.get("cutoff_layers"):
            raise ValueError(
                f"{weights_path} is a partial backbone file for "
                f"training init (cli train --weights ...); it cannot "
                f"drive a detector")
        if variant is None and cfg is None:
            variant = entry["variant"] if entry else None
        weights_path = zoo.resolve(weights_path)
    if cfg is not None:
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        model_cfg = config_from_cfg(cfg, names_path=names)
        if input_size is not None:
            model_cfg = model_cfg.with_input_size(input_size)
        return _finish_load(weights_path, model_cfg, precision,
                            conf_threshold, nms_threshold)
    if variant is None:
        if os.path.isdir(weights_path):
            raise ValueError("variant= is required for checkpoint dirs")
        from yolo_tpu.io import zoo

        variant = zoo.infer_variant(weights_path)
        if variant is None:
            raise ValueError(
                f"cannot infer the model variant from {weights_path}'s "
                f"size; pass variant= explicitly")
    return _finish_load(weights_path,
                        get_variant(variant, input_size=input_size),
                        precision, conf_threshold, nms_threshold)


def _api_compute_dtype(precision: str):
    import jax.numpy as jnp

    if precision == "fp32":
        return jnp.float32
    if precision == "bf16":
        return jnp.bfloat16
    # 'int8' (a CLI-only serving mode) or a typo must not silently
    # run bf16 (code-review finding)
    raise ValueError(f"precision={precision!r}: the API supports "
                     f"'fp32' | 'bf16' (int8 PTQ is the CLI/"
                     f"models.quantize surface)")


def _load_folded_params(mcfg, weights_path: str):
    """Shared .weights-file / checkpoint-dir loading + EMA preference
    + BN fold (one copy of the 'every consumer prefers the EMA track'
    rule — code-review finding: it lived in three)."""
    import os

    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph

    if os.path.isdir(weights_path):
        from yolo_tpu.io import checkpoint as ckpt

        state = ckpt.restore(weights_path)
        # training runs with ema_alpha carry two weight tracks; every
        # consumer prefers the EMA (darknet ema_apply-before-save)
        params = state.get("ema_params", state["params"])
    else:
        params, _ = dw.load(weights_path, mcfg.layers,
                            input_channels=mcfg.in_channels)
    return graph.params_to_jax(
        graph.fold_params(mcfg.layers, params, mcfg.bn_eps))


def _finish_load(weights_path, cfg, precision, conf_threshold,
                 nms_threshold) -> Model:
    from yolo_tpu.models.predict import make_detector

    if cfg.head_kind == "softmax":
        raise ValueError(
            f"{cfg.name} is a classifier — yolo_tpu.load builds "
            f"detectors; use yolo_tpu.models.classify.make_classifier "
            f"or `cli classify` for top-k labels")
    folded = _load_folded_params(cfg, weights_path)
    detector = make_detector(
        cfg, compute_dtype=_api_compute_dtype(precision),
        conf_threshold=conf_threshold, nms_threshold=nms_threshold)
    return Model(cfg, folded, detector)


class Classifier:
    """A loaded classifier: callable on raw uint8 RGB batches, returns
    per-image top-k [(name, prob), ...] using the darknet preprocess
    (resize_min + center crop) and, for tree classifiers, leaf-masked
    absolute probabilities."""

    def __init__(self, cfg, params, run, k: int = 5):
        self.cfg = cfg
        self.params = params
        self._run = run
        self.k = k

    def __call__(self, images_u8):
        import numpy as np

        from yolo_tpu.models.classify import (classifier_preprocess,
                                              hierarchy_leaf_probs,
                                              top_k)

        xs = np.stack([classifier_preprocess(im, self.cfg.input_hw)
                       for im in images_u8])
        probs = np.asarray(self._run(self.params, xs))
        tree = self.cfg.softmax_tree
        if tree is not None:
            probs = hierarchy_leaf_probs(probs, tree)
        return [top_k(p, self.cfg.class_names, k=self.k)
                for p in probs]


def load_classifier(weights_path: str, variant: Optional[str] = None, *,
                    cfg: Optional[str] = None,
                    names: Optional[str] = None,
                    precision: str = "bf16", k: int = 5) -> Classifier:
    """Load a darknet classifier (.weights file, orbax checkpoint dir,
    or zoo:// entry) into a callable top-k model — the API twin of
    `cli classify`."""
    from yolo_tpu.configs import get_variant
    from yolo_tpu.models.classify import make_classifier

    if cfg is not None:
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        mcfg = config_from_cfg(cfg, names_path=names)
    else:
        if variant is None:
            raise ValueError("load_classifier needs a variant name "
                             "(e.g. 'darknet19') or cfg=")
        mcfg = get_variant(variant)
    if mcfg.head_kind != "softmax":
        raise ValueError(f"{mcfg.name} is a detector — use yolo_tpu.load")
    if weights_path.startswith("zoo://"):
        from yolo_tpu.io import zoo

        weights_path = zoo.resolve(weights_path)
    folded = _load_folded_params(mcfg, weights_path)
    run = make_classifier(mcfg,
                          compute_dtype=_api_compute_dtype(precision))
    return Classifier(mcfg, folded, run, k=k)
