"""Shared CLI plumbing: common flags, config/weights resolution,
precision/quantization helpers (split out of the former monolithic
cli.py — same behavior, per-command modules)."""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="tiny-voc",
                   choices=["tiny-voc", "voc", "coco", "tiny-coco",
                            "yolov3", "yolov3-spp", "yolov3-tiny",
                            "yolov4", "yolov4-tiny", "darknet19",
                            "darknet19-448", "darknet53"])
    p.add_argument("--cfg", default=None,
                   help="darknet .cfg file (overrides --model; any "
                        "yolov2/v3/v4-family or classifier topology)")
    p.add_argument("--names", default=None,
                   help="darknet .names file (class names for --cfg)")
    p.add_argument("--input-size", type=int, default=None,
                   help="net input size (multiple of 32; default per model)")
    p.add_argument("--precision", default="bf16",
                   choices=["fp32", "bf16", "int8"],
                   help="fp32 = parity mode, bf16 = throughput (fp32 "
                        "accum), int8 = PTQ serving mode (calibrated on "
                        "the first inputs; not parity-exact)")
    p.add_argument("--conf", type=float, default=None, help="score threshold")
    p.add_argument("--nms", type=float, default=None, help="NMS IoU threshold")
    p.add_argument("--resize", default="letterbox",
                   choices=["letterbox", "stretch"],
                   help="preprocess geometry: letterbox (pjreddie "
                        "darknet) or stretch = plain resize (AlexeyAB "
                        "darknet letter_box=0 default) — applies to "
                        "predict/detect/eval/serve AND train")
    p.add_argument("--decoder", default="cv2",
                   choices=["cv2", "native"],
                   help="host image decoder: native = first-party "
                        "C++ libjpeg/libpng loader (native/decode.cpp;"
                        " decode-parity-tested vs cv2) with the fused "
                        "decode+letterbox batch path on "
                        "--host-preprocess runs")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--hier-thresh", type=float, default=None,
                   help="YOLO9000 tree models: hierarchy traversal "
                        "threshold (descend while the path probability "
                        "product exceeds this; darknet -hier, default "
                        "0.5)")
    p.add_argument("--use-tree-map", action="store_true",
                   help="YOLO9000 tree models: decode through the "
                        "[region] map= projection (score = conf * "
                        "absolute tree prob of each mapped node — the "
                        "darknet COCO-eval path) instead of the "
                        "hierarchy traversal")


def _compute_dtype(precision: str):
    import jax.numpy as jnp

    # int8 quantizes the convs only; surrounding math runs in bf16
    return jnp.float32 if precision == "fp32" else jnp.bfloat16


def _quantize_classifier(cfg, params, calib_01):
    """int8 PTQ for CLASSIFIER geometry: calibration images are already
    classifier-preprocessed [0,1] floats (resize_min + center crop —
    the /classify and `classify` input path). One implementation for
    cmd_classify and cmd_serve (code-review dedupe); the detector-
    geometry sibling is _maybe_quantize."""
    import jax.numpy as jnp

    from yolo_tpu.models import quantize

    try:
        # prepare_int8 returns an already device-placed quant pytree
        q = quantize.prepare_int8(cfg, params, jnp.asarray(calib_01))
    except NotImplementedError as e:
        raise SystemExit(str(e))
    print(f"int8 PTQ: calibrated on {len(calib_01)} images",
          file=sys.stderr)
    return q


def _maybe_quantize(args, cfg, params, sample_images_u8):
    """precision=int8: calibrate on the given raw images and return the
    int8 params pytree (models/quantize.py). Otherwise pass through."""
    if args.precision != "int8":
        return params
    import jax.numpy as jnp

    from yolo_tpu.models import quantize

    # images may differ in size; preprocess each to the uniform net
    # size with the SAME geometry inference will use (calibration must
    # see the real activation distribution)
    if args.resize == "stretch":
        from yolo_tpu.ops.numpy_ref import stretch_resize

        calib = jnp.asarray(np.stack([
            stretch_resize(im, cfg.input_w, cfg.input_h)
            for im in sample_images_u8]))
    else:
        from yolo_tpu.native.preproc import letterbox_batch

        calib = jnp.asarray(np.stack([
            letterbox_batch(im[None], cfg.input_hw)[0]
            for im in sample_images_u8]))
    # prepare_int8 folds BN itself; already-folded params fold to identity
    try:
        qparams = quantize.prepare_int8(cfg, params, calib)
    except NotImplementedError as e:
        raise SystemExit(str(e))  # e.g. yolov1 topologies
    print(f"int8 PTQ: calibrated on {len(sample_images_u8)} images",
          file=sys.stderr)
    return qparams


def _load_params(args, cfg, folded: bool = True):
    """Weights from a darknet .weights file or an orbax checkpoint dir."""
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.models import graph

    weights = _resolve_weights(args.weights)
    if os.path.isdir(weights):  # orbax train checkpoint
        from yolo_tpu.io import checkpoint as ckpt

        state = ckpt.restore(weights)
        source = state.get("ema_params", state["params"])
        if "ema_params" in state:
            print("using the checkpoint's EMA weight track (darknet "
                  "ema_apply semantics)", file=sys.stderr)
        params = [
            {k: np.asarray(v) for k, v in p.items()}
            for p in source
        ]
    else:
        params, header = dw.load(weights, cfg.layers,
                                 input_channels=cfg.in_channels)
        print(f"loaded darknet weights: version "
              f"{header['major']}.{header['minor']}.{header['revision']}, "
              f"seen {header['seen']}", file=sys.stderr)
    if folded:
        params = graph.fold_params(cfg.layers, params, cfg.bn_eps)
    return graph.params_to_jax(params)


def _resolve_weights(spec: str) -> str:
    """zoo://<name> -> verified local path (pass-through otherwise),
    translating library exceptions to clean CLI errors."""
    if not spec.startswith("zoo://"):
        return spec
    from yolo_tpu.io import zoo

    try:
        return zoo.resolve(spec)
    except (KeyError, FileNotFoundError, ValueError) as e:
        raise SystemExit(str(e).strip("'\""))


def _apply_data_file(args) -> None:
    """Resolve a darknet `.data` file into the equivalent flags BEFORE
    the command runs: the command's list (train= for training/anchors,
    valid= for eval — parser-set `_data_list_key`) becomes
    --image-list, and names= fills --names when absent (relative
    paths resolve against the CWD first — darknet reads them relative
    to where it runs — with the .data file's own directory as the
    fallback). classes= is validated later against the model
    (`_dataset_samples`)."""
    from yolo_tpu.data.darknet_list import parse_data_file

    if getattr(args, "image_list", None):
        raise SystemExit("give --data or --image-list, not both (the "
                         ".data file's train=/valid= entry IS the "
                         "image list)")
    try:
        kv = parse_data_file(args.data)
    except OSError as e:
        raise SystemExit(f"--data: {e}")
    key = getattr(args, "_data_list_key", "train")
    if key not in kv:
        raise SystemExit(f"{args.data}: no '{key} = <list file>' entry "
                         f"(this command reads the {key}= list)")
    base = os.path.dirname(os.path.abspath(args.data))

    def _resolve(p):
        if os.path.isabs(p) or os.path.exists(p):
            return p
        alt = os.path.join(base, p)
        return alt if os.path.exists(alt) else p

    args.image_list = _resolve(kv[key])
    if "names" in kv and not getattr(args, "names", None):
        args.names = _resolve(kv["names"])
    args._data_classes = int(kv["classes"]) if "classes" in kv else None
    if (key == "train" and "valid" in kv
            and hasattr(args, "eval_image_list")
            and not args.eval_image_list):
        # darknet -map scores the .data valid= list during training
        args.eval_image_list = _resolve(kv["valid"])


def _dataset_samples(args, cfg, names=None):
    """(image_path, annotation) samples from --voc-root, --coco-json,
    or --image-list/--data (darknet-native list + YOLO .txt labels).
    The annotation is a VOC XML path (str) or a pre-parsed dict;
    both downstream paths accept either. ``names`` overrides the
    class vocabulary GT labels map onto (the tree-map eval
    projection); default cfg.class_names."""
    n_sources = sum(bool(s) for s in (
        args.voc_root, args.coco_json, getattr(args, "image_list", None)))
    if n_sources != 1:
        raise SystemExit("give exactly one of --voc-root / --coco-json "
                         "/ --image-list (or --data)")
    if getattr(args, "image_list", None):
        from yolo_tpu.data.darknet_list import list_images

        want = names or cfg.class_names
        data_ncls = getattr(args, "_data_classes", None)
        if data_ncls is not None and data_ncls != len(want):
            # AlexeyAB's tools error when the .data classes= count and
            # the network's class list disagree — same tripwire here
            raise SystemExit(
                f"--data classes={data_ncls} but the model has "
                f"{len(want)} classes — wrong .data file or wrong "
                f"cfg/--names")
        return list_images(args.image_list, want)
    if args.coco_json:
        from yolo_tpu.data.coco import load_coco

        root = args.image_root or os.path.dirname(args.coco_json)
        return load_coco(args.coco_json, names or cfg.class_names,
                         image_root=root)
    from yolo_tpu.data.voc import list_split

    return list_split(args.voc_root, args.split)


def _get_cfg(args):
    if getattr(args, "cfg", None):
        from yolo_tpu.configs.darknet_cfg import config_from_cfg

        cfg = config_from_cfg(args.cfg, names_path=args.names)
        if args.input_size is not None:
            cfg = cfg.with_input_size(args.input_size)
    else:
        from yolo_tpu.configs import get_variant

        cfg = get_variant(args.model, input_size=args.input_size)
    if args.conf is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, conf_threshold=args.conf)
    if args.nms is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, nms_threshold=args.nms)
    return cfg


def _require_detection(cfg, cmd: str) -> None:
    if cfg.head_kind == "softmax":
        raise SystemExit(
            f"{cfg.name} is a classifier (softmax head) — `{cmd}` needs "
            f"a detection model; use `classify` for top-k labels or "
            f"`partial` to extract its backbone for detector training")


def _tree_kw(args, cfg) -> dict:
    """YOLO9000 hierarchy knobs for predict/detect/eval: validated
    loudly (the flags mean nothing without a [region] tree=), returned
    as the make_detector*/collect_detections kwargs."""
    use_map = getattr(args, "use_tree_map", False)
    hier = getattr(args, "hier_thresh", None)
    if (use_map or hier is not None) and cfg.tree is None:
        raise SystemExit("--use-tree-map/--hier-thresh apply only to "
                         "YOLO9000 tree models ([region] tree=<file>); "
                         f"{cfg.name} has no tree")
    if use_map and cfg.tree_map is None:
        raise SystemExit("--use-tree-map needs a [region] map=<file> "
                         f"projection in the cfg; {cfg.name} has none")
    return {"use_tree_map": use_map, "hier_thresh": hier}
