"""CLI entry points (SURVEY.md §1 L7, §2.1 'CLI entry'): the reference's
train / predict / test mode surface, plus batched detection, VOC mAP
evaluation, darknet export and the benchmark.

  python -m yolo_tpu.cli predict --model tiny-voc --weights v.weights --image dog.jpg
  python -m yolo_tpu.cli detect  --model coco --weights y.weights --images dir/ --batch 32
  python -m yolo_tpu.cli train   --model voc --voc-root VOC2007 --weights init.weights
  python -m yolo_tpu.cli eval    --model voc --voc-root VOC2007 --split test --weights x
  python -m yolo_tpu.cli export  --model voc --checkpoint ck/ --output out.weights
  python -m yolo_tpu.cli bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

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
            stretch_resize(im, cfg.input_size, cfg.input_size)
            for im in sample_images_u8]))
    else:
        from yolo_tpu.native.preproc import letterbox_batch

        calib = jnp.asarray(np.stack([
            letterbox_batch(im[None], cfg.input_size)[0]
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
        params, header = dw.load(weights, cfg.layers)
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


def _dataset_samples(args, cfg, names=None):
    """(image_path, annotation) samples from --voc-root or --coco-json.
    The annotation is a VOC XML path (str) or a pre-parsed dict (COCO,
    `data/coco.load_coco`); both downstream paths accept either.
    ``names`` overrides the class vocabulary GT labels map onto (the
    tree-map eval projection); default cfg.class_names."""
    if bool(args.voc_root) == bool(args.coco_json):
        raise SystemExit("give exactly one of --voc-root / --coco-json")
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


def cmd_classify(args) -> None:
    """Darknet classifier predict (classifier.c predict_classifier):
    min-side resize + center crop, forward, top-k labels as JSON.
    ``--images DIR`` evaluates an imagefolder tree (each subdirectory
    named after its true class — darknet `classifier valid` equivalent)
    and reports top-1/top-5 accuracy."""
    from yolo_tpu.data.pipeline import load_image_rgb
    from yolo_tpu.models.classify import (classifier_preprocess,
                                          hierarchy_leaf_probs,
                                          hierarchy_path,
                                          make_classifier, top_k)

    cfg = _get_cfg(args)
    if cfg.head_kind != "softmax":
        raise SystemExit(f"{cfg.name} is not a classifier "
                         f"(head_kind={cfg.head_kind}) — use `predict`")
    if bool(args.image) == bool(args.images):
        raise SystemExit("give exactly one of --image / --images")
    if args.use_tree_map or args.hier_thresh is not None:
        raise SystemExit("--use-tree-map/--hier-thresh shape the "
                         "DETECTION decode — classify uses leaf-masked "
                         "absolute probs (--hierarchy prints the path)")
    if args.hierarchy and cfg.softmax_tree is None:
        raise SystemExit("--hierarchy applies only to tree classifiers "
                         f"([softmax] tree=<file>); {cfg.name} has none")
    if args.hierarchy and args.images:
        raise SystemExit("--hierarchy prints one image's tree path — "
                         "use it with --image")
    params = _load_params(args, cfg)

    def _quantize_on(calib_01):
        return _quantize_classifier(cfg, params, calib_01)

    run = make_classifier(cfg, compute_dtype=_compute_dtype(args.precision))
    if args.image:
        img = load_image_rgb(args.image)
        x = classifier_preprocess(img, cfg.input_size)
        if args.precision == "int8":
            params = _quantize_on(x[None])
        probs = np.asarray(run(params, x[None]))[0]
        if cfg.softmax_tree is not None:
            # the graph emits per-group conditionals; top-k runs over
            # leaf-masked absolute probs (the imagenet-9k protocol)
            if args.hierarchy:
                for name, c, p in hierarchy_path(probs,
                                                 cfg.softmax_tree):
                    print(json.dumps({"node": name,
                                      "conditional": round(c, 6),
                                      "prob": round(p, 6)}))
                return
            probs = hierarchy_leaf_probs(probs[None],
                                         cfg.softmax_tree)[0]
        for name, p in top_k(probs, cfg.class_names, k=args.top):
            print(json.dumps({"class": name, "prob": round(p, 6)}))
        return

    # imagefolder accuracy: <dir>/<class_name>/*.{jpg,png,...}
    from yolo_tpu.data.imagefolder import list_imagefolder
    from yolo_tpu.models.classify import imagefolder_accuracy

    try:
        samples = list_imagefolder(args.images, cfg.class_names)
    except ValueError as e:
        raise SystemExit(str(e))
    try:
        out = imagefolder_accuracy(
            cfg, params, samples, batch=args.batch, k=args.top,
            compute_dtype=_compute_dtype(args.precision),
            quantize_first_batch=(_quantize_on
                                  if args.precision == "int8" else None))
    except ValueError as e:
        raise SystemExit(f"--batch: {e}" if "batch" in str(e) else str(e))
    print(json.dumps(out))


def cmd_predict(args) -> None:
    """Single-image detection (reference 'predict' mode, SURVEY.md §3.1)."""
    import jax.numpy as jnp

    from yolo_tpu.data.pipeline import load_image_rgb
    from yolo_tpu.models.predict import make_detector
    from yolo_tpu.utils.profiling import maybe_trace
    from yolo_tpu.utils.viz import draw_detections, save_image

    cfg = _get_cfg(args)
    _require_detection(cfg, "predict")
    tree_kw = _tree_kw(args, cfg)
    names = cfg.detection_names(tree_kw["use_tree_map"])
    params = _load_params(args, cfg)
    img = load_image_rgb(args.image)
    params = _maybe_quantize(args, cfg, params, [img])
    det = make_detector(cfg, compute_dtype=_compute_dtype(args.precision),
                        resize=args.resize, **tree_kw)
    with maybe_trace(args.profile_dir):
        out = det(params, jnp.asarray(img[None]))
    boxes = np.asarray(out["boxes"][0])
    scores = np.asarray(out["scores"][0])
    classes = np.asarray(out["classes"][0])
    valid = np.asarray(out["valid"][0])

    for i in np.nonzero(valid)[0]:
        x1, y1, x2, y2 = boxes[i]
        print(json.dumps({
            "class": names[int(classes[i])],
            "score": round(float(scores[i]), 4),
            "box_xyxy": [round(float(v), 1) for v in (x1, y1, x2, y2)],
        }))
    if args.output:
        save_image(args.output,
                   draw_detections(img, boxes, scores, classes,
                                   names, valid))
        print(f"wrote {args.output}", file=sys.stderr)


def cmd_detect(args) -> None:
    """Batched detection over a directory (BASELINE.json:9 config 3)."""
    import jax.numpy as jnp

    from yolo_tpu.data.pipeline import DevicePrefetcher, inference_batches
    from yolo_tpu.models.predict import make_detector

    cfg = _get_cfg(args)
    _require_detection(cfg, "detect")
    tree_kw = _tree_kw(args, cfg)
    names = cfg.detection_names(tree_kw["use_tree_map"])
    params = _load_params(args, cfg)
    det = make_detector(cfg, compute_dtype=_compute_dtype(args.precision),
                        resize=args.resize, **tree_kw)

    if args.video:
        if args.precision == "int8":
            from yolo_tpu.data.video import video_batches

            # calibrate on the stream's own first frames; CLOSE the
            # generator so its VideoCapture releases before
            # _detect_video reopens the same source (a webcam refuses
            # a second open while held — code-review finding)
            gen = video_batches(args.video, 8, stride=args.stride,
                                max_frames=8)
            try:
                first = next(gen)
            finally:
                gen.close()
            params = _maybe_quantize(args, cfg, params,
                                     list(first["images"]))
        _detect_video(args, cfg, params, det, names=names)
        return

    exts = (".jpg", ".jpeg", ".png", ".bmp")
    if args.recursive:
        paths = sorted(
            os.path.join(root, f)
            for root, _dirs, files in os.walk(args.images)
            for f in files if f.lower().endswith(exts))
    else:
        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith(exts))
    if not paths:
        raise SystemExit(f"no images found in {args.images}")
    if args.precision == "int8":
        from yolo_tpu.data.pipeline import load_image_rgb

        params = _maybe_quantize(args, cfg, params,
                                 [load_image_rgb(p) for p in paths[:8]])

    if args.host_preprocess:
        # heterogeneous directories: one jit bucket, host preprocessing
        # (letterbox or stretch geometry)
        from yolo_tpu.models.predict import make_detector_preprocessed
        from yolo_tpu.ops import numpy_ref as npr
        from yolo_tpu.ops.letterbox import letterbox_geometry

        det = make_detector_preprocessed(
            cfg, compute_dtype=_compute_dtype(args.precision),
            **tree_kw)
        host_iter = inference_batches(paths, args.batch,
                                      net_size=cfg.input_size,
                                      resize=args.resize)
    else:
        host_iter = inference_batches(paths, args.batch)

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    net = cfg.input_size
    for batch in DevicePrefetcher(host_iter, depth=2):
        out = det(params, jnp.asarray(batch["images"]))
        n_real = len(batch["paths"])
        # ONE fetch per output array per batch (the relay pays a round
        # trip per fetch — same fix as serve/eval; code-review finding)
        valid_np = np.asarray(out["valid"])
        boxes_all = np.asarray(out["boxes"], np.float64)
        scores_np = np.asarray(out["scores"])
        classes_np = np.asarray(out["classes"])
        for bi in range(n_real):
            valid = np.nonzero(valid_np[bi])[0]
            if args.host_preprocess:
                src_h, src_w = batch["shapes"][bi]
                boxes_net = boxes_all[bi][valid]
                if args.resize == "stretch":
                    xyxy = npr.unstretch_boxes(boxes_net, src_w, src_h)
                else:
                    scale, rh, rw, px, py = letterbox_geometry(
                        src_h, src_w, net)
                    xyxy = npr.unletterbox_boxes(boxes_net, scale, px, py,
                                                 net, net, src_w, src_h)
            else:
                xyxy = boxes_all[bi][valid]
            dets = [{
                "class": names[int(classes_np[bi][i])],
                "score": round(float(scores_np[bi][i]), 4),
                "box_xyxy": [round(float(v), 1) for v in xyxy[j]],
            } for j, i in enumerate(valid)]
            print(json.dumps({"image": batch["paths"][bi], "detections": dets}))
            if args.output_dir:
                from yolo_tpu.utils.viz import draw_detections, save_image

                if args.host_preprocess:
                    # batch images are letterboxed; re-read the source
                    from yolo_tpu.data.pipeline import load_image_rgb

                    src = load_image_rgb(batch["paths"][bi])
                else:  # batch already holds the raw source pixels
                    src = np.asarray(batch["images"][bi])
                # mirror the source tree: --recursive makes basename
                # collisions routine (a/img.jpg vs b/img.jpg)
                rel = os.path.relpath(batch["paths"][bi], args.images)
                dst = os.path.join(args.output_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                save_image(
                    dst,
                    draw_detections(
                        src, xyxy, scores_np[bi][valid],
                        classes_np[bi][valid], names))


def _detect_video(args, cfg, params, det, names=None) -> None:
    """Video/webcam detection: fixed frame shape = ONE jit bucket for
    the whole stream (data/video.py). Prints one JSON line per frame;
    --save-video writes an annotated MJPG copy."""
    import jax.numpy as jnp

    from yolo_tpu.data.pipeline import DevicePrefetcher
    from yolo_tpu.data.video import (VideoAnnotator, video_batches,
                                     video_info)

    writer = None
    if args.save_video:
        info = video_info(args.video)
        writer = VideoAnnotator(args.save_video,
                                fps=info["fps"] / max(args.stride, 1),
                                width=info["width"], height=info["height"])
    host_iter = video_batches(args.video, args.batch, stride=args.stride,
                              max_frames=args.max_frames or None)
    try:
        for batch in DevicePrefetcher(host_iter, depth=2):
            out = det(params, jnp.asarray(batch["images"]))
            # one fetch per output array per batch (relay round trips)
            valid_np = np.asarray(out["valid"])
            boxes_np = np.asarray(out["boxes"], np.float64)
            scores_np = np.asarray(out["scores"])
            classes_np = np.asarray(out["classes"])
            for bi, frame_idx in enumerate(batch["frames"]):
                valid = np.nonzero(valid_np[bi])[0]
                dets = [{
                    "class": (names or cfg.class_names)[
                        int(classes_np[bi][i])],
                    "score": round(float(scores_np[bi][i]), 4),
                    "box_xyxy": [round(float(v), 1)
                                 for v in boxes_np[bi][i]],
                } for i in valid]
                print(json.dumps({"frame": int(frame_idx),
                                  "detections": dets}))
                if writer is not None:
                    writer.write(np.asarray(batch["images"][bi]),
                                 boxes_np[bi], scores_np[bi],
                                 classes_np[bi],
                                 names or cfg.class_names, valid_np[bi])
    finally:
        if writer is not None:
            writer.close()
            print(f"wrote {args.save_video}", file=sys.stderr)


def _train_classifier(args, cfg) -> None:
    """Classifier (softmax-head) training: imagefolder data, softmax
    cross-entropy (darknet softmax_x_ent semantics — train/loss.py::
    classifier_loss), sharing the detector trainer's optimizer, LR
    schedules, EMA, DP mesh, checkpointing, and fault injection.
    Completes the darknet pretrain workflow in-framework:
    train classifier -> `partial` -> detector fine-tune."""
    import time as _time

    import jax

    from yolo_tpu.data.imagefolder import (classifier_train_batches,
                                           list_imagefolder)
    from yolo_tpu.data.pipeline import DevicePrefetcher
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.parallel import sharding as shd
    from yolo_tpu.train.loop import TrainConfig, init_state
    from yolo_tpu.utils.metrics import MetricsLogger

    if not args.imagefolder:
        raise SystemExit(f"{cfg.name} is a classifier — training data "
                         "is an imagefolder (--imagefolder DIR with "
                         "<dir>/<class>/<image> layout), not "
                         "--voc-root/--coco-json")
    if args.voc_root or args.coco_json:
        raise SystemExit("classifier training takes --imagefolder, not "
                         "--voc-root/--coco-json")
    for flag, name in ((args.multi_scale, "--multi-scale"),
                       (args.mosaic, "--mosaic"),
                       (args.mixup, "--mixup"),
                       (args.loader == "grain", "--loader grain")):
        if flag:
            raise SystemExit(f"{name} applies to detector training "
                             "only (classifier training augments with "
                             "a seeded flip; --no-augment disables)")
    eval_arrays = None
    if args.eval_every:
        from yolo_tpu.data.imagefolder import list_imagefolder
        from yolo_tpu.models.classify import preprocess_samples

        eval_dir = args.eval_imagefolder or args.imagefolder
        if not args.eval_imagefolder:
            print("--eval-every without --eval-imagefolder scores the "
                  "TRAINING images", file=sys.stderr)
        eval_samples = list_imagefolder(eval_dir, cfg.class_names)
        if args.eval_max_images:
            eval_samples = eval_samples[:args.eval_max_images]
        # decode+resize ONCE — but only while the cache is small (a
        # 50k-image folder would materialize tens of GB); past the cap
        # each eval streams from disk instead (code-review)
        if len(eval_samples) <= 2048:
            eval_arrays = preprocess_samples(eval_samples,
                                             cfg.input_size)
            print(f"cached {len(eval_samples)} preprocessed eval "
                  f"images", file=sys.stderr)
        else:
            print(f"{len(eval_samples)} eval images exceed the 2048 "
                  f"preprocess cache cap — each eval streams from "
                  f"disk (--eval-max-images to cache a subset)",
                  file=sys.stderr)

    net_hp = {}
    if args.cfg:
        from yolo_tpu.configs.darknet_cfg import net_training_params

        net_hp = net_training_params(args.cfg)
    lr = args.lr if args.lr is not None else net_hp.get(
        "learning_rate", 1e-3)
    burn_in = args.burn_in if args.burn_in is not None else net_hp.get(
        "burn_in", 0)
    ema_alpha = (args.ema_alpha if args.ema_alpha is not None
                 else net_hp.get("ema_alpha", 0.0))
    ema_start = (args.ema_start_step
                 if args.ema_start_step is not None
                 else net_hp.get("max_batches", 0) // 2)
    tcfg = TrainConfig(learning_rate=lr, **_optimizer_from(args, net_hp),
                       **_lr_schedule_from(args, net_hp),
                       remat=args.remat, burn_in_steps=burn_in,
                       momentum=net_hp.get("momentum", 0.9),
                       weight_decay=net_hp.get("decay", 5e-4),
                       grad_accum=_batch_accum_from(args, net_hp),
                       ema_alpha=ema_alpha, ema_start_step=ema_start)

    mesh = shd.make_mesh()
    n_dev = mesh.devices.size
    if args.batch % n_dev:
        raise SystemExit(f"--batch {args.batch} not divisible by "
                         f"{n_dev} devices")

    if args.resume:
        template = init_state(
            dw.random_params(cfg.layers, np.random.default_rng(0)), tcfg)
        state = _restore_adapt_ema(args.resume, template)
    elif args.weights:
        # full weights or a darknet partial (fine-tune / resume-from-
        # export); remaining layers randomly initialized
        params, header, n_loaded = dw.load_partial(
            _resolve_weights(args.weights), cfg.layers)
        from yolo_tpu.configs.specs import weighted_specs

        n_total = len(weighted_specs(cfg.layers))
        if n_loaded < n_total:
            fresh = dw.random_params(
                cfg.layers, np.random.default_rng(args.seed), scale=0.03)
            params = params + fresh[n_loaded:]
            print(f"partial init: {n_loaded}/{n_total} weighted layers "
                  f"from {args.weights}, rest randomly initialized",
                  file=sys.stderr)
        state = init_state(params, tcfg,
                           seen=header["seen"] if args.keep_seen else 0)
    else:
        # darknet classifiers train from scratch by default
        params = dw.random_params(cfg.layers,
                                  np.random.default_rng(args.seed),
                                  scale=0.03)
        state = init_state(params, tcfg)
        print("no --weights: training from random initialization "
              f"(seed {args.seed})", file=sys.stderr)

    state = shd.replicate(mesh, state)
    step_fn = shd.make_dp_train_step(
        cfg, tcfg, mesh, compute_dtype=_compute_dtype(args.precision))
    samples = list_imagefolder(args.imagefolder, cfg.class_names)
    print(f"{len(samples)} images, {cfg.num_classes} classes",
          file=sys.stderr)
    flip = not args.no_augment
    aug_cfg = None
    _CLS_AUG_KEYS = ("saturation", "exposure", "hue", "flip",
                     "angle", "aspect", "min_crop", "max_crop")
    if (args.augment or any(k in net_hp for k in _CLS_AUG_KEYS)) \
            and not args.no_augment:
        # darknet classifier training distorts HSV and (when the cfg
        # asks) applies random_augment_image's scale/rotation crops;
        # cfg keys (or --augment for the classic HSV+flip) enable them
        from yolo_tpu.data.augment import config_from_net_params

        aug_cfg = config_from_net_params(
            net_hp,
            force_defaults=not any(k in net_hp for k in _CLS_AUG_KEYS))
        if aug_cfg.mosaic or aug_cfg.mixup:
            raise SystemExit("mosaic/mixup are detection augmentations "
                             "— classifier training supports HSV+flip "
                             "and [net] angle/aspect/min_crop/max_crop")
        geom = (" + scale/rotation crops"
                if aug_cfg.classifier_geometry else "")
        print(f"classifier HSV+flip augmentation enabled{geom}",
              file=sys.stderr)
    resume_step = int(np.asarray(state["step"]))
    if resume_step:
        print(f"data position: resuming the stream at step "
              f"{resume_step} (position-independent shuffle/flip keys)",
              file=sys.stderr)
    host_iter = classifier_train_batches(
        samples, args.batch, cfg.input_size, epochs=args.epochs,
        seed=args.seed, flip=flip, start_step=resume_step,
        augment_cfg=aug_cfg)
    logger = MetricsLogger(path=args.log_file, every=args.log_every)
    sharding = shd.batch_sharding(mesh)
    from yolo_tpu.data.imagefolder import steps_per_epoch as _spe

    steps_per_epoch = _spe(len(samples), args.batch)

    def _save_ckpt(name: str) -> str:
        path = os.path.join(args.checkpoint_dir, name)
        ckpt.save(path, jax.device_get(dict(state)))
        return path

    step = int(np.asarray(state["step"]))
    best_top1 = -1.0
    t_last = _time.perf_counter()
    from yolo_tpu.utils.profiling import maybe_trace

    with maybe_trace(args.profile_dir):
        for batch in DevicePrefetcher(host_iter, depth=2,
                                      sharding=sharding):
            state, metrics = step_fn(state, batch)
            step += 1
            now = _time.perf_counter()
            img_s = args.batch / max(now - t_last, 1e-9)
            t_last = now
            logger.log(step, metrics,
                       epoch=(step - 1) // steps_per_epoch,
                       size=batch["images"].shape[1],
                       img_s=round(img_s, 1))
            if args.eval_every and step % args.eval_every == 0:
                from yolo_tpu.models.classify import (
                    accuracy_from_arrays, imagefolder_accuracy)
                from yolo_tpu.train.loop import ema_params_of

                if eval_arrays is not None:
                    acc = accuracy_from_arrays(
                        cfg, ema_params_of(state), *eval_arrays,
                        batch=min(args.batch, 32),
                        compute_dtype=_compute_dtype(args.precision))
                else:
                    acc = imagefolder_accuracy(
                        cfg, ema_params_of(state), eval_samples,
                        batch=min(args.batch, 32),
                        compute_dtype=_compute_dtype(args.precision))
                logger.log(step, {"val_top1": acc["top1"]}, force=True)
                print(f"step {step}: validation top-1 {acc['top1']:.4f}",
                      file=sys.stderr)
                if args.checkpoint_dir and acc["top1"] > best_top1:
                    best_top1 = acc["top1"]
                    _save_ckpt("best")
                    print(f"new best top-1 {acc['top1']:.4f} -> "
                          f"{args.checkpoint_dir}/best", file=sys.stderr)
                t_last = _time.perf_counter()
            if args.checkpoint_dir and step % args.checkpoint_every == 0:
                _save_ckpt(f"step_{step}")
                t_last = _time.perf_counter()
            if args.fail_after_step and step >= args.fail_after_step:
                raise SystemExit(
                    f"--fail-after-step {args.fail_after_step} reached "
                    f"(fault-injection debug flag, SURVEY.md §5.3)")
    if args.checkpoint_dir:
        _save_ckpt("final")
        print(f"saved final checkpoint to {args.checkpoint_dir}/final",
              file=sys.stderr)
    logger.close()


def _restore_adapt_ema(resume_path: str, template) -> dict:
    """Checkpoint restore shared by BOTH trainers: the EMA track may
    differ between the checkpoint and this run's config (pre-EMA
    checkpoint resumed with --ema-alpha, or the reverse) — adapt
    instead of dying on a pytree-structure mismatch (previously only
    the detector path adapted; the classifier resume raised —
    code-review finding)."""
    import jax

    from yolo_tpu.io import checkpoint as ckpt

    ckpt_has_ema = ckpt.has_top_level_key(resume_path, "ema_params")
    want_ema = "ema_params" in template
    if ckpt_has_ema and not want_ema:
        template["ema_params"] = jax.tree_util.tree_map(
            lambda a: a, template["params"])
        state = ckpt.restore(resume_path, dict(template))
        state.pop("ema_params")
        print("checkpoint carries an EMA track but this run has "
              "ema_alpha=0 — dropping it (pass --ema-alpha to keep "
              "blending)", file=sys.stderr)
    elif want_ema and not ckpt_has_ema:
        tmpl = {k: v for k, v in template.items() if k != "ema_params"}
        state = ckpt.restore(resume_path, tmpl)
        import jax.numpy as _jnp

        state["ema_params"] = jax.tree_util.tree_map(
            _jnp.copy, state["params"])
        print("checkpoint has no EMA track — starting one from the "
              "restored weights", file=sys.stderr)
    else:
        state = ckpt.restore(resume_path, dict(template))
    print(f"resumed from {resume_path} at step {int(state['step'])}",
          file=sys.stderr)
    return state


def _batch_accum_from(args, net_hp) -> int:
    """--batch/--grad-accum resolution shared by both trainers:
    explicit flags win, then the cfg's [net] batch/subdivisions (the
    darknet training config), else 32/1. Mutates args.batch in place
    (downstream code reads it everywhere) and returns the accumulation
    count. darknet requires batch % subdivisions == 0; so do we."""
    if args.batch is None:
        args.batch = int(net_hp.get("batch", 32))
        if "batch" in net_hp:
            print(f"cfg [net] batch={args.batch}", file=sys.stderr)
    accum = (args.grad_accum if args.grad_accum is not None
             else int(net_hp.get("subdivisions", 1)))
    if accum != 1 and args.grad_accum is None:
        print(f"cfg [net] subdivisions={accum}: accumulating "
              f"gradients over {accum} sub-batches of "
              f"{args.batch // max(accum, 1)} (per-sub-batch BN "
              f"stats, darknet semantics); pass --grad-accum 1 for "
              f"one whole-batch pass per step", file=sys.stderr)
    if accum < 1 or args.batch % accum:
        raise SystemExit(
            f"--batch {args.batch} is not divisible by grad-accum "
            f"{accum} (darknet requires batch % subdivisions == 0) — "
            f"adjust --batch or pass --grad-accum 1")
    return accum


def _optimizer_from(args, net_hp) -> dict:
    """Optimizer resolution shared by both trainers: the explicit
    --optimizer flag wins, then the cfg's [net] adam=1 (darknet's
    switch), else SGD; cfg B1/B2/eps become the Adam moments."""
    opt = args.optimizer or ("adam" if net_hp.get("adam") else "sgd")
    kw = {"optimizer": opt}
    if opt == "adam":
        kw.update(adam_b1=net_hp.get("B1", 0.9),
                  adam_b2=net_hp.get("B2", 0.999),
                  adam_eps=net_hp.get("eps", 1e-7))
        if net_hp.get("adam") and not args.optimizer:
            print("cfg [net] adam=1: Adam optimizer "
                  f"(B1={kw['adam_b1']:g}, B2={kw['adam_b2']:g}, "
                  f"eps={kw['adam_eps']:g})", file=sys.stderr)
    return kw


def _lr_schedule_from(args, net_hp):
    """Darknet LR-schedule resolution shared by detector and classifier
    training: explicit --lr-steps/--lr-scales win, then the cfg's [net]
    policy (the full network.c get_current_rate set: steps | poly |
    step | exp | sigmoid | sgdr | constant; the stochastic 'random'
    policy rejects — its per-step rand_uniform draw has no
    deterministic equivalent). Returns TrainConfig schedule kwargs."""
    kw = {"lr_decay_steps": (), "lr_decay_scales": ()}
    policy = net_hp.get("policy", "constant")
    # [net] power feeds both the burn-in ramp and the poly decay
    # (network.c net.power, default 4) whatever the policy — set
    # BEFORE the --lr-steps early return, which previously skipped it
    # and trained the warm-up ramp at the wrong exponent under an
    # explicit steps override (code-review finding; CLAUDE.md pins
    # power-under-ALL-policies)
    kw["lr_poly_power"] = float(net_hp.get("power", 4.0))
    if args.lr_scales and not args.lr_steps:
        raise SystemExit("--lr-scales requires --lr-steps (to override "
                         "a cfg's [net] schedule, give both)")
    if args.lr_steps:
        decay_steps = tuple(int(s) for s in args.lr_steps.split(","))
        if args.lr_scales:
            decay_scales = tuple(float(s) for s in args.lr_scales.split(","))
            if len(decay_steps) != len(decay_scales):
                raise SystemExit("--lr-steps and --lr-scales lengths differ")
        else:
            decay_scales = (0.1,) * len(decay_steps)  # darknet default
        kw.update(lr_decay_steps=decay_steps,
                  lr_decay_scales=decay_scales)
        return kw
    if policy == "steps":
        # darknet hard-errors on policy=steps without steps+scales
        if "steps" not in net_hp or "scales" not in net_hp:
            raise SystemExit("[net] policy=steps needs both steps and "
                             "scales (darknet refuses this cfg too); "
                             "or give --lr-steps/--lr-scales")
        decay_steps = net_hp["steps"]
        decay_scales = net_hp["scales"]
        if len(decay_steps) != len(decay_scales):
            raise SystemExit("[net] steps and scales lengths differ")
        kw.update(lr_decay_steps=decay_steps,
                  lr_decay_scales=decay_scales)
    elif "steps" in net_hp:
        # steps/scales present but the policy doesn't use them
        # (darknet's default policy when the key is absent is constant)
        print(f"note: ignoring [net] steps/scales (policy is "
              f"'{policy}'; steps apply under policy=steps)",
              file=sys.stderr)
    if policy == "poly":
        if not net_hp.get("max_batches"):
            raise SystemExit("[net] policy=poly needs max_batches "
                             "(darknet's decay horizon)")
        kw["lr_poly_max_steps"] = int(net_hp["max_batches"])
        print(f"cfg policy=poly: lr decays as "
              f"(1 - step/{kw['lr_poly_max_steps']})"
              f"^{kw['lr_poly_power']:g}", file=sys.stderr)
    elif policy == "step":
        # darknet STEP: lr * scale^(batch//step) (parser defaults 1/1)
        kw["lr_step_size"] = int(net_hp.get("step", 1))
        kw["lr_step_scale"] = float(net_hp.get("scale", 1.0))
        print(f"cfg policy=step: lr *= {kw['lr_step_scale']:g} every "
              f"{kw['lr_step_size']} steps", file=sys.stderr)
    elif policy == "exp":
        kw["lr_exp_gamma"] = float(net_hp.get("gamma", 1.0))
        if kw["lr_exp_gamma"] <= 0:
            # the schedule gates terms on gamma's truthiness, so a 0
            # would silently become constant-lr here while darknet
            # computes lr*0^batch = 0 — surely a broken cfg; refuse
            raise SystemExit(f"[net] policy=exp gamma="
                             f"{kw['lr_exp_gamma']:g} must be > 0 "
                             f"(darknet would train at lr*gamma^batch "
                             f"= 0)")
        print(f"cfg policy=exp: lr * {kw['lr_exp_gamma']:g}^step",
              file=sys.stderr)
    elif policy == "sigmoid":
        kw["lr_sig_gamma"] = float(net_hp.get("gamma", 1.0))
        if kw["lr_sig_gamma"] <= 0:
            raise SystemExit(f"[net] policy=sigmoid gamma="
                             f"{kw['lr_sig_gamma']:g} must be > 0 "
                             f"(0 would silently train at constant "
                             f"lr here but lr/2 in darknet)")
        kw["lr_sig_step"] = int(net_hp.get("step", 1))
        print(f"cfg policy=sigmoid: lr / (1 + e^({kw['lr_sig_gamma']:g}"
              f"*(step - {kw['lr_sig_step']})))", file=sys.stderr)
    elif policy == "sgdr":
        # AlexeyAB SGDR (cosine warm restarts): sgdr_cycle defaults to
        # max_batches, sgdr_mult to 2, learning_rate_min to 1e-5
        cycle = int(net_hp.get("sgdr_cycle",
                               net_hp.get("max_batches", 0)))
        if not cycle:
            raise SystemExit("[net] policy=sgdr needs sgdr_cycle or "
                             "max_batches (the first cycle length)")
        kw["lr_sgdr_cycle"] = cycle
        kw["lr_sgdr_mult"] = int(net_hp.get("sgdr_mult", 2))
        kw["lr_min"] = float(net_hp.get("learning_rate_min", 1e-5))
        print(f"cfg policy=sgdr: cosine warm restarts, first cycle "
              f"{cycle}, mult {kw['lr_sgdr_mult']}, "
              f"lr_min {kw['lr_min']:g}", file=sys.stderr)
    elif policy == "random":
        raise SystemExit("[net] policy=random draws a fresh "
                         "rand_uniform^power LR every step — "
                         "nondeterministic by design, not supported "
                         "(use any other darknet policy)")
    elif policy not in ("constant", "steps"):
        # darknet get_policy: unknown strings warn and fall back
        print(f"note: unknown [net] policy '{policy}', going with "
              "constant (darknet does the same)", file=sys.stderr)
    return kw


def cmd_train(args) -> None:
    """Fine-tuning with the multi-part loss (BASELINE.json:10-11)."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.data.pipeline import DevicePrefetcher, train_batches
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.parallel import sharding as shd
    from yolo_tpu.train.loop import (TrainConfig, init_state, pick_scale)
    from yolo_tpu.utils.metrics import MetricsLogger

    cfg = _get_cfg(args)
    if args.use_tree_map or args.hier_thresh is not None:
        raise SystemExit("--use-tree-map/--hier-thresh shape the "
                         "detection DECODE — training ignores them "
                         "(the hierarchical loss follows the cfg tree "
                         "automatically)")
    if cfg.head_kind == "softmax":
        _train_classifier(args, cfg)
        return
    if not args.weights and not args.resume:
        # a checkpoint resume carries all weights — demanding a dummy
        # .weights file there was pointless (code-review finding)
        raise SystemExit("--weights is required for detector training "
                         "(a full .weights file or a darknet `partial` "
                         "backbone, e.g. zoo://darknet19-448-conv23) — "
                         "or --resume a checkpoint")
    if args.imagefolder or args.eval_imagefolder:
        raise SystemExit("--imagefolder/--eval-imagefolder are "
                         f"classifier training data — {cfg.name} is a "
                         "detector; use --voc-root or --coco-json")
    if cfg.head_kind == "detection" and (args.multi_scale
                                         or args.multi_scale_sizes):
        raise SystemExit("yolov1 models have a FIXED input size (the "
                         "[local]/[connected] weights are sized by it) "
                         "— drop --multi-scale")
    if args.resize == "stretch":
        # AlexeyAB's letter_box=0 default TRAINING geometry: plain
        # resize, normalized boxes unchanged; validation (quick_map)
        # evaluates with the same geometry
        print("training with stretch (letter_box=0) geometry",
              file=sys.stderr)
    sizes = tuple(int(s) for s in args.multi_scale_sizes.split(",")) \
        if args.multi_scale_sizes else None
    # darknet uses the cfg's [net] section as the training config:
    # explicit flags win, then cfg keys, then built-in defaults
    net_hp = {}
    if args.cfg:
        from yolo_tpu.configs.darknet_cfg import net_training_params

        net_hp = net_training_params(args.cfg)
    if "letter_box" in net_hp:
        # AlexeyAB [net] letter_box picks the training geometry; the
        # explicit --resize flag stays authoritative, but a silent
        # conflict would train different boxes than darknet — say so
        cfg_geom = "letterbox" if net_hp["letter_box"] else "stretch"
        if cfg_geom != args.resize:
            print(f"note: cfg sets letter_box="
                  f"{net_hp['letter_box']} ({cfg_geom} geometry) but "
                  f"--resize {args.resize} is active — pass --resize "
                  f"{cfg_geom} to train like darknet would with this "
                  f"cfg", file=sys.stderr)
    lr = args.lr if args.lr is not None else net_hp.get(
        "learning_rate", 1e-4)
    ema_alpha = (args.ema_alpha if args.ema_alpha is not None
                 else net_hp.get("ema_alpha", 0.0))
    # darknet starts the EMA at max_batches/2 (detector.c
    # ema_start_point); explicit flag wins, else derive from the cfg
    ema_start = (args.ema_start_step
                 if args.ema_start_step is not None
                 else net_hp.get("max_batches", 0) // 2)
    burn_in = args.burn_in if args.burn_in is not None else net_hp.get(
        "burn_in", 0)
    if not args.multi_scale and net_hp.get("random", 0) > 0:
        # darknet head sections' random=1 IS the multi-scale switch
        if args.loader == "grain":
            print("cfg random=1 ignored: --loader grain is "
                  "fixed-net-size (use --loader threads for "
                  "multi-scale)", file=sys.stderr)
        else:
            args.multi_scale = True
            rf = float(net_hp["random"])
            if rf > 1.0 and sizes is None:
                # AlexeyAB fractional random (e.g. 1.3): resize range
                # [net/f, net*f], snapped to multiples of 32
                base = cfg.input_size
                lo = max(32, int(round(base / rf / 32)) * 32)
                hi = int(round(base * rf / 32)) * 32
                sizes = tuple(range(lo, hi + 1, 32))
                print(f"cfg random={rf:g}: multi-scale range "
                      f"{lo}..{hi} (net/{rf:g} .. net*{rf:g}, "
                      f"every 10 batches)", file=sys.stderr)
            else:
                print("cfg random=1: multi-scale training enabled "
                      "(darknet 320..608 every 10 batches)",
                      file=sys.stderr)
    from yolo_tpu.train.loss import (YoloLossConfig,
                                     region_loss_config)

    tcfg = TrainConfig(learning_rate=lr, **_optimizer_from(args, net_hp),
                       **_lr_schedule_from(args, net_hp),
                       multi_scale=args.multi_scale,
                       remat=args.remat,
                       burn_in_steps=burn_in,
                       momentum=net_hp.get("momentum", 0.9),
                       weight_decay=net_hp.get("decay", 5e-4),
                       grad_accum=_batch_accum_from(args, net_hp),
                       ema_alpha=ema_alpha,
                       ema_start_step=ema_start,
                       # [region]/[yolo] training keys flow from the cfg
                       loss=region_loss_config(cfg),
                       yolo_loss=YoloLossConfig(
                           ignore_thresh=cfg.ignore_thresh,
                           iou_loss=cfg.iou_loss,
                           iou_normalizer=cfg.iou_normalizer,
                           cls_normalizer=cfg.cls_normalizer,
                           obj_normalizer=cfg.obj_normalizer,
                           focal_loss=cfg.focal_loss,
                           truth_thresh=cfg.truth_thresh),
                       **({"multi_scale_sizes": sizes} if sizes else {}))
    if args.loader == "grain" and args.multi_scale:
        raise SystemExit("--loader grain is fixed-net-size (multi-scale "
                         "changes batch shapes per step, which grain's "
                         "per-record operations can't express) — drop "
                         "--multi-scale or use --loader threads")
    if args.loader == "grain" and (args.mosaic or args.mixup):
        raise SystemExit("--mosaic/--mixup need cross-record access; "
                         "grain transforms are per-record — use "
                         "--loader threads (--augment alone works "
                         "under grain)")
    if args.eval_split and args.coco_json:
        raise SystemExit("--eval-split is a VOC concept; for COCO use "
                         "--eval-coco-json with a held-out "
                         "instances file")
    mesh = shd.make_mesh()
    n_dev = mesh.devices.size
    if args.batch % n_dev:
        raise SystemExit(f"--batch {args.batch} not divisible by "
                         f"{n_dev} devices")

    if args.resume:
        template = init_state(
            dw.random_params(cfg.layers, np.random.default_rng(0)), tcfg)
        state = _restore_adapt_ema(args.resume, template)
    else:
        # accepts darknet `partial` files (e.g. darknet19_448.conv.23,
        # also as zoo://darknet19-448-conv23): load the backbone
        # prefix, randomly init the remaining layers
        params, header, n_loaded = dw.load_partial(
            _resolve_weights(args.weights), cfg.layers)
        from yolo_tpu.configs.specs import conv_specs

        n_total = len(conv_specs(cfg.layers))
        if n_loaded < n_total:
            rng_init = np.random.default_rng(args.seed)
            fresh = dw.random_params(cfg.layers, rng_init, scale=0.03)
            params = params + fresh[n_loaded:]
            print(f"partial init: {n_loaded}/{n_total} conv layers from "
                  f"{args.weights}, rest randomly initialized "
                  f"(darknet backbone-transfer workflow)",
                  file=sys.stderr)
        state = init_state(params, tcfg, seen=header["seen"] if
                           args.keep_seen else 0)
    state = shd.replicate(mesh, state)
    step_fn = shd.make_dp_train_step(
        cfg, tcfg, mesh, compute_dtype=_compute_dtype(args.precision))

    pairs = _dataset_samples(args, cfg)
    eval_samples = None
    if args.eval_every:
        if args.eval_split or args.eval_coco_json:
            import argparse as _ap

            eargs = _ap.Namespace(
                voc_root=None if args.eval_coco_json else args.voc_root,
                coco_json=args.eval_coco_json or None,
                image_root=args.image_root,
                split=args.eval_split or "val")
            eval_samples = _dataset_samples(eargs, cfg)
        else:
            eval_samples = pairs  # no held-out set given: training mAP
            print("--eval-every without --eval-split/--eval-coco-json "
                  "scores the TRAINING samples", file=sys.stderr)
        if args.eval_max_images:
            eval_samples = eval_samples[:args.eval_max_images]
    rng = np.random.default_rng(args.seed)
    logger = MetricsLogger(path=args.log_file, every=args.log_every)
    sharding = shd.batch_sharding(mesh)

    if args.prewarm and args.multi_scale:
        from yolo_tpu.train.loop import prewarm

        prewarm(step_fn, state, cfg, tcfg.multi_scale_sizes, args.batch,
                batch_sharding=shd.batch_sharding(mesh))
        print(f"prewarmed {len(tcfg.multi_scale_sizes)} size buckets",
              file=sys.stderr)

    from yolo_tpu.utils.profiling import maybe_trace

    step = int(np.asarray(state["step"]))
    start_step = step
    steps_per_epoch = max(len(pairs) // args.batch, 1)
    best_map = -1.0
    import time as _time

    aug_cfg = None
    _AUG_KEYS = ("jitter", "saturation", "exposure", "hue", "flip",
                 "mosaic", "mixup")
    cfg_wants_aug = any(k in net_hp for k in _AUG_KEYS)
    if (args.augment or args.mosaic or args.mixup or cfg_wants_aug) \
            and not args.no_augment:
        # darknet ALWAYS augments during training, driven by the cfg:
        # a cfg that writes any augmentation key
        # (jitter/saturation/exposure/hue/flip/mosaic) enables
        # augmentation here too, with those values (darknet defaults
        # for the rest); --augment forces defaults-on without a cfg,
        # --mosaic forces mosaic on top, --no-augment disables all
        from yolo_tpu.data.augment import config_from_net_params

        aug_cfg = config_from_net_params(
            net_hp, mosaic=args.mosaic, mixup=args.mixup,
            # bare --augment (no cfg aug keys) means the classic
            # defaults-on values; cfg keys mean darknet parse semantics
            force_defaults=not cfg_wants_aug)
        if aug_cfg.mosaic and aug_cfg.mixup:
            raise SystemExit(
                "mosaic and mixup together (darknet's combined "
                "mosaic+mixup modes) are not supported — pick one")
        if cfg_wants_aug and not (args.augment or args.mosaic
                                  or args.mixup):
            print("cfg augmentation keys present: darknet-style "
                  "augmentation enabled (disable with --no-augment)",
                  file=sys.stderr)
        if aug_cfg.mosaic and not args.mosaic:
            if args.loader == "grain":
                raise SystemExit(
                    "the cfg's [net] mosaic=1 needs the thread loader "
                    "(cross-record); use --loader threads, or "
                    "--no-augment to train unaugmented under grain")
            print("cfg [net] mosaic=1: mosaic augmentation enabled",
                  file=sys.stderr)
        if aug_cfg.mixup and not args.mixup:
            if args.loader == "grain":
                raise SystemExit(
                    "the cfg's [net] mixup=1 needs the thread loader "
                    "(cross-record); use --loader threads, or "
                    "--no-augment to train unaugmented under grain")
            print("cfg [net] mixup=1: mixup augmentation enabled",
                  file=sys.stderr)

    grain_iter = None
    if args.loader == "grain":
        # one checkpointable iterator spanning ALL epochs (grain's own
        # num_epochs): its position travels with the model state —
        # every `step_N` orbax save gets a sibling `step_N.grain` file
        # and --resume restores both (SURVEY.md §5.2/§5.4)
        from yolo_tpu.data.grain_pipeline import grain_train_batches

        grain_iter = grain_train_batches(
            pairs, class_names=cfg.class_names,
            anchors=cfg.anchors, num_classes=cfg.num_classes,
            net_size=cfg.input_size, batch_size=args.batch,
            seed=args.seed, num_epochs=args.epochs,
            worker_count=args.loader_workers, model_cfg=cfg,
            augment_cfg=aug_cfg, resize=args.resize)
        if args.resume:
            gpath = args.resume.rstrip("/") + ".grain"
            if os.path.exists(gpath):
                with open(gpath, "rb") as f:
                    grain_iter.set_state(f.read())
                print(f"restored grain data-iterator position from "
                      f"{gpath}", file=sys.stderr)
            else:
                print(f"no {gpath}: grain iterator restarts from the "
                      f"beginning (model state still resumed)",
                      file=sys.stderr)

    def _save_ckpt(name: str) -> str:
        """orbax model/opt state + (grain) the matching data position:
        the state that regenerates the first UNTRAINED batch, even with
        the prefetcher pulled ahead."""
        path = os.path.join(args.checkpoint_dir, name)
        ckpt.save(path, jax.device_get(dict(state)))
        if grain_iter is not None:
            with open(path.rstrip("/") + ".grain", "wb") as f:
                f.write(grain_iter.state_for_pull(step - start_step))
        return path

    t_last = _time.perf_counter()
    with maybe_trace(args.profile_dir):
        if args.loader == "grain":
            # grain spans epochs internally; log epoch from step count
            epoch_iters = [(None, grain_iter)]
        else:
            def _thread_iter(epoch):
                size_fn = (lambda bi: pick_scale(
                    bi, rng, tcfg.multi_scale_every,
                    tcfg.multi_scale_sizes)) if args.multi_scale else None
                return train_batches(
                    pairs, class_names=cfg.class_names,
                    anchors=cfg.anchors, num_classes=cfg.num_classes,
                    net_size=cfg.input_size, batch_size=args.batch,
                    rng=rng, size_for_batch=size_fn,
                    augment_cfg=aug_cfg, model_cfg=cfg,
                    resize=args.resize)

            epoch_iters = ((e, _thread_iter(e))
                           for e in range(args.epochs))
        for epoch, host_iter in epoch_iters:
            for batch in DevicePrefetcher(host_iter, depth=2,
                                          sharding=sharding):
                state, metrics = step_fn(state, batch)
                step += 1
                now = _time.perf_counter()
                img_s = args.batch / max(now - t_last, 1e-9)
                t_last = now
                ep = (epoch if epoch is not None
                      else (step - 1) // steps_per_epoch)
                logger.log(step, metrics, epoch=ep,
                           size=batch["images"].shape[1],
                           img_s=round(img_s, 1))
                if args.eval_every and step % args.eval_every == 0:
                    from yolo_tpu.eval.runner import quick_map

                    from yolo_tpu.train.loop import ema_params_of

                    m = quick_map(cfg, ema_params_of(state), eval_samples,
                                  batch=min(args.batch, 16),
                                  compute_dtype=_compute_dtype(
                                      args.precision),
                                  resize=args.resize)
                    logger.log(step, {"val_map": round(m, 4)},
                               force=True)
                    print(f"step {step}: validation mAP {m:.4f}",
                          file=sys.stderr)
                    if args.checkpoint_dir and m > best_map:
                        best_map = m
                        _save_ckpt("best")
                        print(f"new best mAP {m:.4f} -> "
                              f"{args.checkpoint_dir}/best",
                              file=sys.stderr)
                    t_last = _time.perf_counter()
                if args.checkpoint_dir and step % args.checkpoint_every == 0:
                    _save_ckpt(f"step_{step}")
                    t_last = _time.perf_counter()  # don't bill save to img/s
                if args.fail_after_step and step >= args.fail_after_step:
                    raise SystemExit(
                        f"--fail-after-step {args.fail_after_step} reached "
                        f"(fault-injection debug flag, SURVEY.md §5.3)")
    if args.checkpoint_dir:
        _save_ckpt("final")
        print(f"saved final checkpoint to {args.checkpoint_dir}/final",
              file=sys.stderr)
    logger.close()


def cmd_eval(args) -> None:
    """VOC mAP over a split (SURVEY.md §3.5 — the parity gate).

    --resize stretch evaluates with AlexeyAB's plain-resize geometry
    (its map tool's letter_box=0 default) for mAP parity with that
    tool family."""
    from yolo_tpu.eval.voc_map import evaluate

    cfg = _get_cfg(args)
    _require_detection(cfg, "eval")
    tree_kw = _tree_kw(args, cfg)
    # tree-map eval scores the projected class list (the darknet
    # COCO-on-9k protocol); otherwise the model's own vocabulary
    names = cfg.detection_names(tree_kw["use_tree_map"])
    ncls = len(names)
    if not args.from_detections and not args.weights:
        raise SystemExit("--weights is required (or score a saved "
                         "results file with --from-detections)")
    pairs = _dataset_samples(args, cfg, names=names)

    from yolo_tpu.eval.runner import build_ground_truth, collect_detections

    gt, orig_ids = build_ground_truth(pairs, names)

    if args.from_detections:
        # score a saved results file (pycocotools loadRes schema) with
        # no model run — original image/category ids map back here
        if args.coco_json:
            from yolo_tpu.data.coco import category_ids

            cls_of = {v: k for k, v in category_ids(
                args.coco_json, names).items()}
        else:
            cls_of = {c: c for c in range(ncls)}
        inv = {orig: i for i, orig in orig_ids.items()}
        detections = {i: [] for i in orig_ids}
        with open(args.from_detections) as f:
            for r in json.load(f):
                i = inv.get(r["image_id"])
                c = cls_of.get(r["category_id"])
                if i is None or c is None:
                    continue
                x, y, bw, bh = r["bbox"]
                detections[i].append((c, float(r["score"]),
                                      x, y, x + bw, y + bh))
    else:
        params = _load_params(args, cfg)
        if args.precision == "int8":
            from yolo_tpu.data.pipeline import load_image_rgb

            params = _maybe_quantize(
                args, cfg, params,
                [load_image_rgb(p) for p, _ in pairs[:8]])
        detections = collect_detections(
            cfg, params, pairs, batch=args.batch,
            eval_conf=args.eval_conf,
            compute_dtype=_compute_dtype(args.precision),
            resize=args.resize, **tree_kw)

    if args.save_detections:
        # pycocotools loadRes format: original image/category ids,
        # top-left-xywh pixel boxes
        if args.coco_json:
            from yolo_tpu.data.coco import category_ids

            # only the dataset's own categories are expressible in a
            # COCO results file; detections of other classes are dropped
            cat_of = category_ids(args.coco_json, names)
        else:
            cat_of = {c: c for c in range(ncls)}
        results = [
            {"image_id": orig_ids[img_id], "category_id": cat_of[c],
             "bbox": [round(x1, 2), round(y1, 2),
                      round(x2 - x1, 2), round(y2 - y1, 2)],
             "score": round(s, 5)}
            for img_id, dets in detections.items()
            for (c, s, x1, y1, x2, y2) in dets if c in cat_of]
        with open(args.save_detections, "w") as f:
            json.dump(results, f)
        print(f"wrote {len(results)} detections to "
              f"{args.save_detections}", file=sys.stderr)

    metric = args.metric or ("voc10" if args.use_2010_metric else "voc07")
    if args.save_pr and metric == "coco":
        raise SystemExit("--save-pr exports VOC-protocol PR curves; "
                         "use --metric voc07/voc10 with it")
    if metric == "coco":
        from yolo_tpu.eval.coco_map import evaluate_coco

        result = evaluate_coco(detections, gt, ncls)
        per_class = {names[c]: round(a, 4)
                     for c, a in result["ap"].items()}
        # the full pycocotools 12-cell summary surface
        out = {k: round(result[k], 4) for k in (
            "map", "map50", "map75", "map_small", "map_medium",
            "map_large", "ar1", "ar10", "ar", "ar_small", "ar_medium",
            "ar_large") if k in result}
        out["ap"] = per_class
        print(json.dumps(out))
        return
    result = evaluate(detections, gt, ncls,
                      use_07_metric=metric == "voc07",
                      return_curves=bool(args.save_pr))
    if args.save_pr:
        with open(args.save_pr, "w") as f:
            json.dump({names[c]: v
                       for c, v in result["curves"].items()}, f)
        print(f"wrote PR curves to {args.save_pr}", file=sys.stderr)
    per_class = {names[c]: round(a, 4)
                 for c, a in result["ap"].items() if not np.isnan(a)}
    print(json.dumps({"map": round(result["map"], 4), "ap": per_class}))


def cmd_zoo(args) -> None:
    """Weights-zoo manifest: list entries, verify a file, pin a SHA
    (io/zoo.py)."""
    from yolo_tpu.io import zoo

    manifest = zoo.load_manifest()
    if args.action == "list":
        out = {}
        for name, e in sorted(manifest.items()):
            path = os.path.join(zoo.weights_dir(), e["filename"])
            out[name] = {**e, "local_path": path,
                         "present": os.path.exists(path)}
        print(json.dumps(out, indent=2))
        return

    entry = manifest.get(args.name)
    if not entry:
        raise SystemExit(f"unknown zoo entry '{args.name}'")
    path = args.file or os.path.join(zoo.weights_dir(), entry["filename"])
    if args.action == "verify":
        problems = zoo.verify_file(path, entry)
        print(json.dumps({"path": path, "ok": not problems,
                          "problems": problems}))
        if problems:
            raise SystemExit(1)
    elif args.action == "pin-sha":
        try:
            sha = zoo.record_sha(args.name, path)
        except ValueError as e:
            raise SystemExit(str(e))
        print(json.dumps({"name": args.name, "sha256": sha}))


def cmd_partial(args) -> None:
    """darknet `partial`: write the first N layers' weights (backbone
    extraction for transfer learning, e.g. producing a
    darknet19_448.conv.23-style file)."""
    from yolo_tpu.configs.specs import weighted_specs
    from yolo_tpu.io import darknet_weights as dw

    cfg = _get_cfg(args)
    params, header, n_loaded = dw.load_partial(
        _resolve_weights(args.weights), cfg.layers)
    n_convs = len(weighted_specs(tuple(cfg.layers[:args.layers])))
    if n_convs > n_loaded:
        raise SystemExit(f"cutoff needs {n_convs} weighted layers; the "
                         f"file has {n_loaded}")
    # darknet's partial resets net->seen to 0 before saving
    dw.save(args.output, cfg.layers, params, seen=0,
            cutoff_convs=n_convs)
    print(f"wrote {args.output}: first {args.layers} layers "
          f"({n_convs} convs)", file=sys.stderr)


def cmd_anchors(args) -> None:
    """YOLO9000 dimension-cluster k-means over a dataset's GT boxes
    (darknet `calc_anchors`; data/anchors.py)."""
    from yolo_tpu.data.anchors import collect_wh, kmeans_anchors

    cfg = _get_cfg(args)
    wh = collect_wh(_dataset_samples(args, cfg), cfg.class_names)
    # [region] anchors are in 13x13-cell units; [yolo] anchors are in
    # net-input pixels — emit whichever the model family consumes
    units = (cfg.input_size if cfg.head_kind == "yolo"
             else cfg.input_size // 32)
    res = kmeans_anchors(wh, args.num_anchors, grid=units,
                         seed=args.seed)
    # darknet-style flat anchor line, ready for a config/cfg file
    flat = ", ".join(f"{w:.4f},{h:.4f}" for w, h in res["anchors"])
    print(json.dumps({"anchors": [[round(float(w), 4), round(float(h), 4)]
                                  for w, h in res["anchors"]],
                      "avg_iou": round(res["avg_iou"], 4),
                      "darknet_line": flat,
                      "units": "pixels" if cfg.head_kind == "yolo"
                               else "cells",
                      "num_boxes": int(len(wh))}))


def cmd_export(args) -> None:
    """Orbax checkpoint -> darknet .weights (checkpoint compatibility in
    both directions, SURVEY.md §5.4)."""
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.io import darknet_weights as dw

    cfg = _get_cfg(args)
    state = ckpt.restore(args.checkpoint)
    source = state["params"]
    if "ema_params" in state and not args.live_weights:
        source = state["ema_params"]
        print("exporting the EMA weight track (darknet ema_apply "
              "semantics; --live-weights exports the raw track)",
              file=sys.stderr)
    params = [{k: np.asarray(v) for k, v in p.items()}
              for p in source]
    dw.save(args.output, cfg.layers, params, seen=int(state.get("seen", 0)))
    print(f"wrote {args.output}", file=sys.stderr)
    if args.save_cfg:
        from yolo_tpu.configs.darknet_cfg import cfg_to_string

        with open(args.save_cfg, "w") as f:
            f.write(cfg_to_string(cfg))
        # splitext is path-aware: rsplit('.') mangled extension-less
        # filenames under dotted directories (/out/v2.0/model ->
        # /out/v2.names; code-review finding)
        names_path = os.path.splitext(args.save_cfg)[0] + ".names"
        with open(names_path, "w") as f:
            f.write("\n".join(cfg.class_names) + "\n")
        print(f"wrote {args.save_cfg} + {names_path}", file=sys.stderr)


def cmd_serve(args) -> None:
    """HTTP detection endpoint with micro-batching (yolo_tpu/serve.py)."""
    from yolo_tpu.data.pipeline import load_image_rgb
    from yolo_tpu.serve import DetectionServer

    cfg = _get_cfg(args)
    if cfg.head_kind == "softmax" and (args.use_tree_map
                                       or args.hier_thresh is not None):
        raise SystemExit("--use-tree-map/--hier-thresh shape the "
                         "DETECTION decode; /classify scores leaf-"
                         "masked absolute probs with no threshold")
    tree_kw = ({} if cfg.head_kind == "softmax"
               else _tree_kw(args, cfg))
    params = _load_params(args, cfg)
    if args.precision == "int8":
        if not args.calibration_image:
            raise SystemExit("--precision int8 needs --calibration-image")
        if cfg.head_kind == "softmax":
            # calibration must see the SAME geometry the /classify
            # endpoint applies (resize_min + center crop)
            from yolo_tpu.models.classify import classifier_preprocess

            calib = classifier_preprocess(
                load_image_rgb(args.calibration_image), cfg.input_size)
            params = _quantize_classifier(cfg, params, calib[None])
        else:
            params = _maybe_quantize(
                args, cfg, params,
                [load_image_rgb(args.calibration_image)])
    mesh = None
    if args.dp:
        from yolo_tpu.parallel import sharding as shd

        mesh = shd.make_mesh()
        print(f"DP serving over {mesh.devices.size} devices",
              file=sys.stderr)
    server = DetectionServer(
        cfg, params, compute_dtype=_compute_dtype(args.precision),
        host=args.host, port=args.port, max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
        adaptive_window=not args.no_adaptive_window,
        conf_threshold=args.conf, mesh=mesh,
        resize=args.resize, **tree_kw)
    if args.prewarm_shape:
        h, w = (int(v) for v in args.prewarm_shape.split("x"))
        print(f"prewarming batch buckets for {h}x{w}...", file=sys.stderr)
        server.prewarm(h, w)
    endpoint = "/classify" if cfg.head_kind == "softmax" else "/detect"
    print(f"serving {cfg.name} on http://{args.host}:{args.port} "
          f"(POST {endpoint}, GET /healthz)", file=sys.stderr)
    server.serve_forever()


def cmd_bench(args) -> None:
    import bench

    bench.main(batch=args.batch, iters=args.iters)


def cmd_doctor(args) -> None:
    """One JSON report of everything the framework depends on: jax
    backend + device inventory, the native C++ letterbox (built or
    numpy fallback), optional deps (grain, TF oracle), and the zoo
    cache — the first thing to run on a new host."""
    import importlib.util

    report = {}
    # the WHOLE backend interaction runs bounded in a subprocess: a
    # remote backend (axon relay) can stall at init or at compile, and
    # either must be diagnosed instead of hanging doctor itself
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import json, jax, jax.numpy as jnp\n"
             "info = {'jax': jax.__version__,\n"
             "        'backend': jax.default_backend(),\n"
             "        'devices': [str(d) for d in jax.devices()],\n"
             "        'device_count': jax.device_count()}\n"
             "info['compute_probe'] = ('ok' if float((jnp.ones((8, 8))"
             " @ jnp.ones((8, 8))).sum()) == 512.0 else 'wrong result')\n"
             "print(json.dumps(info))"],
            capture_output=True, text=True, timeout=args.probe_timeout)
        if probe.returncode == 0 and probe.stdout.strip():
            report.update(json.loads(
                probe.stdout.strip().splitlines()[-1]))
        else:
            report["compute_probe"] = (
                f"failed: {probe.stderr.strip()[-200:]}")
    except subprocess.TimeoutExpired:
        report["compute_probe"] = (
            f"STALLED (no backend response in {args.probe_timeout}s — "
            f"remote compile relay down? work CPU-only and re-probe)")
    report.setdefault("device_count", 0)

    from yolo_tpu.native import preproc

    report["native_letterbox"] = ("native" if preproc.available()
                                  else "numpy-fallback")
    for mod in ("grain", "tensorflow", "cv2", "orbax.checkpoint"):
        report[mod.split(".")[0]] = importlib.util.find_spec(
            mod) is not None
    from yolo_tpu.io import zoo

    wdir = zoo.weights_dir()
    present = []
    if os.path.isdir(wdir):
        manifest = zoo.load_manifest()
        present = [n for n, e in manifest.items()
                   if os.path.exists(os.path.join(wdir, e["filename"]))]
    report["weights_dir"] = wdir
    report["zoo_present"] = present
    print(json.dumps(report, indent=2))


def main(argv: Optional[list] = None) -> None:
    ap = argparse.ArgumentParser(prog="yolo_tpu",
                                 description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict", help="single-image detection")
    _add_common(p)
    p.add_argument("--weights", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--output", default=None, help="write annotated image")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("classify",
                       help="classifier top-k prediction (darknet19/53)")
    _add_common(p)
    p.add_argument("--weights", required=True)
    p.add_argument("--image", default=None)
    p.add_argument("--images", default=None,
                   help="imagefolder tree (<dir>/<class>/<image>): "
                        "report top-1/top-5 accuracy (darknet "
                        "`classifier valid` equivalent)")
    p.add_argument("--batch", type=int, default=32,
                   help="--images batch size (one jit bucket)")
    p.add_argument("--top", type=int, default=5,
                   help="print the top-k classes (default 5)")
    p.add_argument("--hierarchy", action="store_true",
                   help="tree classifiers ([softmax] tree=): print the "
                        "greedy root-to-leaf path with conditional and "
                        "absolute probabilities instead of flat top-k")
    p.set_defaults(fn=cmd_classify)

    p = sub.add_parser("detect",
                       help="batched detection over a directory or video")
    _add_common(p)
    p.add_argument("--weights", required=True)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--images", default=None, help="image directory")
    src.add_argument("--video", default=None,
                     help="video file (or webcam index)")
    p.add_argument("--stride", type=int, default=1,
                   help="video: sample every Nth frame")
    p.add_argument("--max-frames", type=int, default=0,
                   help="video: stop after N sampled frames (0 = all)")
    p.add_argument("--save-video", default=None,
                   help="video: write an annotated MJPG copy here")
    p.add_argument("--output-dir", default=None,
                   help="images: write annotated copies here")
    p.add_argument("--recursive", action="store_true",
                   help="images: walk subdirectories too")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--host-preprocess", action="store_true",
                   help="letterbox on host: one compiled program for "
                        "mixed image sizes (device letterbox otherwise)")
    p.set_defaults(fn=cmd_detect)

    def _add_dataset(p, default_split):
        p.add_argument("--voc-root", default=None,
                       help="VOC dataset root (Annotations/, JPEGImages/, "
                            "ImageSets/)")
        p.add_argument("--split", default=default_split,
                       help="VOC ImageSets/Main split (VOC only)")
        p.add_argument("--coco-json", default=None,
                       help="COCO instances JSON (alternative to "
                            "--voc-root)")
        p.add_argument("--image-root", default=None,
                       help="image dir for --coco-json file_names "
                            "(default: the JSON's directory)")

    p = sub.add_parser("train", help="fine-tune on VOC or COCO data")
    _add_common(p)
    p.add_argument("--weights", default=None,
                   help=".weights init (full file or darknet partial; "
                        "required for detectors, optional for "
                        "classifiers — scratch init without it)")
    p.add_argument("--imagefolder", default=None,
                   help="classifier training data: <dir>/<class>/"
                        "<image> imagefolder (softmax-head models)")
    p.add_argument("--eval-imagefolder", default=None,
                   help="held-out imagefolder scored every --eval-every "
                        "steps during classifier training (top-1; best "
                        "checkpoint saved as 'best')")
    _add_dataset(p, "train")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch", type=int, default=None,
                   help="images per optimizer step (default: the "
                        "cfg's [net] batch, else 32)")
    p.add_argument("--grad-accum", type=int, default=None,
                   help="sequential sub-batches per optimizer step "
                        "(darknet [net] subdivisions: gradient "
                        "accumulation with per-sub-batch BN stats; "
                        "default: the cfg's subdivisions, else 1 — "
                        "pass 1 to force one whole-batch pass)")
    p.add_argument("--lr", type=float, default=None,
                   help="learning rate (default: the cfg's [net] "
                        "learning_rate, else 1e-4)")
    p.add_argument("--optimizer", default=None,
                   choices=["sgd", "adam"],
                   help="default: the cfg's [net] adam=1 key, else sgd "
                        "(darknet); cfg B1/B2/eps flow into Adam")
    p.add_argument("--ema-alpha", type=float, default=None,
                   help="per-step weight EMA (darknet [net] ema_alpha, "
                        "scaled-yolov4 cfgs use 0.9998); checkpoints "
                        "keep both tracks and consumers prefer the EMA; "
                        "default from the cfg, else off")
    p.add_argument("--ema-start-step", type=int, default=None,
                   help="step the EMA starts blending at (darknet: "
                        "max_batches/2 — derived from the cfg when "
                        "present; before it the track mirrors the live "
                        "weights)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize conv activations in backward "
                        "(less HBM, more FLOPs; for large batch/608)")
    p.add_argument("--burn-in", type=int, default=None,
                   help="darknet burn-in steps (quartic lr ramp; "
                        "default: the cfg's [net] burn_in, else 0)")
    p.add_argument("--lr-steps", default=None,
                   help="comma-separated steps for lr decay (darknet "
                        "policy=steps)")
    p.add_argument("--lr-scales", default=None,
                   help="comma-separated decay factors matching --lr-steps")
    p.add_argument("--augment", action="store_true",
                   help="darknet-style jitter/flip/HSV augmentation")
    p.add_argument("--no-augment", action="store_true",
                   help="disable ALL augmentation, including "
                        "cfg-driven keys")
    p.add_argument("--mosaic", action="store_true",
                   help="yolov4 mosaic: 4-image composites (implies "
                        "--augment)")
    p.add_argument("--mixup", action="store_true",
                   help="AlexeyAB mixup: 0.5/0.5 two-image blends with "
                        "concatenated truths (implies --augment)")
    p.add_argument("--multi-scale", action="store_true")
    p.add_argument("--multi-scale-sizes", default=None,
                   help="comma-separated sizes (default darknet 320..608)")
    p.add_argument("--prewarm", action="store_true",
                   help="compile all multi-scale buckets before training")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--eval-every", type=int, default=0,
                   help="validation mAP every N steps (logged as "
                        "val_map)")
    p.add_argument("--eval-split", default=None,
                   help="VOC split for --eval-every (default: the "
                        "training samples)")
    p.add_argument("--eval-coco-json", default=None,
                   help="held-out COCO instances file for --eval-every")
    p.add_argument("--eval-max-images", type=int, default=0,
                   help="cap validation set size (0 = all)")
    p.add_argument("--resume", default=None, help="orbax checkpoint path")
    p.add_argument("--keep-seen", action="store_true",
                   help="keep darknet 'seen' counter (affects loss warmup)")
    p.add_argument("--loader", default="threads",
                   choices=["threads", "grain"],
                   help="grain = deterministic multiprocess pipeline "
                        "with checkpointable position (fixed size only)")
    p.add_argument("--loader-workers", type=int, default=0,
                   help="grain worker processes (0 = in-process)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-file", default=None)
    p.add_argument("--log-every", type=int, default=1)
    p.add_argument("--fail-after-step", type=int, default=0,
                   help="debug: abort after N steps to exercise resume")
    p.set_defaults(fn=cmd_train)

    # "test" is the reference's name for the evaluation mode (SURVEY.md
    # §1 L7: train/predict/test); both names map to the same command.
    p = sub.add_parser("eval", aliases=["test"], help="mAP evaluation")
    _add_common(p)
    p.add_argument("--weights", default=None,
                   help="required unless --from-detections")
    _add_dataset(p, "test")
    p.add_argument("--from-detections", default=None,
                   help="score a saved results JSON (--save-detections "
                        "format) instead of running the model")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--eval-conf", type=float, default=0.005,
                   help="low threshold for PR-curve coverage")
    p.add_argument("--metric", default=None,
                   choices=["voc07", "voc10", "coco"],
                   help="voc07 = 11-point (default), voc10 = AUC, "
                        "coco = mAP@[.5:.95] 101-point")
    p.add_argument("--use-2010-metric", action="store_true",
                   help="alias for --metric voc10")
    p.add_argument("--save-detections", default=None,
                   help="write raw detections as a pycocotools-style "
                        "results JSON (original image/category ids)")
    p.add_argument("--save-pr", default=None,
                   help="write per-class PR curves (scores/recall/"
                        "precision) as JSON — VOC metrics only")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("partial",
                       help="extract the first N layers' weights "
                            "(darknet `partial`)")
    _add_common(p)
    p.add_argument("--weights", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--layers", type=int, required=True,
                   help="darknet layer-index cutoff (e.g. 23 -> "
                        ".conv.23)")
    p.set_defaults(fn=cmd_partial)

    p = sub.add_parser("zoo", help="pretrained-weights manifest tools")
    p.add_argument("action", choices=["list", "verify", "pin-sha"])
    p.add_argument("--name", default=None, help="zoo entry name")
    p.add_argument("--file", default=None,
                   help="file to check (default: the entry's path under "
                        "$YOLO_TPU_WEIGHTS_DIR)")
    p.set_defaults(fn=cmd_zoo)

    p = sub.add_parser("anchors",
                       help="k-means anchor clustering over GT boxes")
    _add_common(p)
    _add_dataset(p, "train")
    p.add_argument("--num-anchors", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_anchors)

    p = sub.add_parser("export", help="checkpoint -> darknet .weights")
    p.add_argument("--live-weights", action="store_true",
                   help="export the raw weights even when the "
                        "checkpoint carries an EMA track")
    _add_common(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--save-cfg", default=None,
                   help="also write the darknet .cfg (+.names) for the "
                        "exported weights")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("serve", help="HTTP detection/classification endpoint")
    _add_common(p)
    p.add_argument("--weights", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="micro-batch collection window")
    p.add_argument("--no-adaptive-window", action="store_true",
                   help="always wait the full window (default: skip it "
                        "when recent traffic is single-client)")
    p.add_argument("--dp", action="store_true",
                   help="shard micro-batches over all visible devices")
    p.add_argument("--calibration-image", default=None)
    p.add_argument("--prewarm-shape", default=None, metavar="HxW",
                   help="compile all batch buckets for this input shape "
                        "at startup (e.g. 480x640)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench", help="throughput benchmark")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=15)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("doctor",
                       help="environment diagnostics (backend, devices, "
                            "compute probe, native lib, optional deps)")
    p.add_argument("--probe-timeout", type=float, default=90.0,
                   help="seconds to allow the bounded compute probe "
                        "(first compile on a remote backend is ~40s)")
    p.set_defaults(fn=cmd_doctor)

    args = ap.parse_args(argv)
    if hasattr(args, "decoder"):
        # always set (including the cv2 default) so one invocation's
        # choice never leaks into the next in-process call (tests,
        # library use of cli.main)
        from yolo_tpu.data.pipeline import set_decoder

        try:
            set_decoder(args.decoder)
        except (ValueError, RuntimeError) as e:
            raise SystemExit(str(e))
    args.fn(args)


if __name__ == "__main__":
    main()