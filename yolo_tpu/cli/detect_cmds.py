"""`predict` / `detect` / `classify` commands (single-image, batched
directory/video detection, classifier top-k — SURVEY.md §3.1-3.2)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from yolo_tpu.cli._common import (_compute_dtype, _get_cfg, _load_params,
                                  _maybe_quantize, _quantize_classifier,
                                  _require_detection, _tree_kw)


def cmd_classify(args) -> None:
    """Darknet classifier predict (classifier.c predict_classifier):
    min-side resize + center crop, forward, top-k labels as JSON.
    ``--images DIR`` evaluates an imagefolder tree (each subdirectory
    named after its true class — darknet `classifier valid` equivalent)
    and reports top-1/top-5 accuracy."""
    from yolo_tpu.data.pipeline import load_image
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
        img = load_image(args.image, cfg.in_channels)
        x = classifier_preprocess(img, cfg.input_hw)
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


def _write_label_file(image_path: str, dets_xyxy, src_w: int,
                      src_h: int) -> str:
    """darknet `-save_labels` (detector.c test_detector): write the
    image's detections as a YOLO-format label file at the path
    replace_image_to_label derives (/images/->/labels/ chain, else the
    sibling .txt), one '%d %2.4f %2.4f %2.4f %2.4f' line per detection
    with RELATIVE (cx, cy, w, h) — the auto-labeling/pseudo-labeling
    loop: the file trains directly via --image-list. The file is
    created even with zero detections (darknet fopens uncondtionally).

    dets_xyxy: [(class_id, score, x1, y1, x2, y2) pixel] — coordinates
    arrive clipped to the image by the un-resize path; darknet writes
    unclipped coords but its own trainer clamps them to [0,1] at load
    (fill_truth_detection constrain), so clipped-at-write is
    load-equivalent. One deviation: darknet writes each NMS survivor
    once with its best class; the per-class NMS here can emit one box
    under two classes when both clear the threshold (rare at
    production thresholds) — each becomes its own line."""
    from yolo_tpu.data.darknet_list import label_path_for

    out = label_path_for(image_path)
    d = os.path.dirname(out)
    if d:
        # permissive deviation: darknet fopen()s blind and crashes on a
        # missing labels/ directory — create it instead
        os.makedirs(d, exist_ok=True)
    with open(out, "w") as f:
        for (c, _s, x1, y1, x2, y2) in dets_xyxy:
            cx = (x1 + x2) / 2.0 / src_w
            cy = (y1 + y2) / 2.0 / src_h
            bw = (x2 - x1) / src_w
            bh = (y2 - y1) / src_h
            f.write(f"{int(c)} {cx:2.4f} {cy:2.4f} "
                    f"{bw:2.4f} {bh:2.4f}\n")
    return out


def cmd_predict(args) -> None:
    """Single-image detection (reference 'predict' mode, SURVEY.md §3.1)."""
    import jax.numpy as jnp

    from yolo_tpu.data.pipeline import load_image
    from yolo_tpu.models.predict import make_detector
    from yolo_tpu.utils.profiling import maybe_trace
    from yolo_tpu.utils.viz import draw_detections, save_image

    cfg = _get_cfg(args)
    _require_detection(cfg, "predict")
    tree_kw = _tree_kw(args, cfg)
    names = cfg.detection_names(tree_kw["use_tree_map"])
    params = _load_params(args, cfg)
    img = load_image(args.image, cfg.in_channels)
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
    if args.save_labels:
        src_h, src_w = img.shape[:2]
        out_txt = _write_label_file(
            args.image,
            [(int(classes[i]), float(scores[i]), *boxes[i])
             for i in np.nonzero(valid)[0]], src_w, src_h)
        print(f"wrote {out_txt}", file=sys.stderr)
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
        if args.save_labels:
            raise SystemExit("--save-labels derives per-IMAGE label "
                             "paths — it applies to --images mode only")
        if args.precision == "int8":
            from yolo_tpu.data.video import video_batches

            # calibrate on the stream's own first frames; CLOSE the
            # generator so its VideoCapture releases before
            # _detect_video reopens the same source (a webcam refuses
            # a second open while held — code-review finding)
            gen = video_batches(args.video, 8, stride=args.stride,
                                max_frames=8,
                                channels=cfg.in_channels)
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
        from yolo_tpu.data.pipeline import load_image

        params = _maybe_quantize(args, cfg, params,
                                 [load_image(p, cfg.in_channels)
                                  for p in paths[:8]])

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
                                      net_size=cfg.input_hw,
                                      resize=args.resize,
                                      channels=cfg.in_channels)
    else:
        host_iter = inference_batches(paths, args.batch,
                                      channels=cfg.in_channels)

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    net_h, net_w = cfg.input_hw
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
                        src_h, src_w, (net_h, net_w))
                    xyxy = npr.unletterbox_boxes(boxes_net, scale, px, py,
                                                 net_w, net_h, src_w,
                                                 src_h)
            else:
                xyxy = boxes_all[bi][valid]
            dets = [{
                "class": names[int(classes_np[bi][i])],
                "score": round(float(scores_np[bi][i]), 4),
                "box_xyxy": [round(float(v), 1) for v in xyxy[j]],
            } for j, i in enumerate(valid)]
            print(json.dumps({"image": batch["paths"][bi], "detections": dets}))
            if args.save_labels:
                if args.host_preprocess:
                    src_h, src_w = batch["shapes"][bi]
                else:
                    src_h, src_w = batch["images"][bi].shape[:2]
                _write_label_file(
                    batch["paths"][bi],
                    [(int(classes_np[bi][i]), float(scores_np[bi][i]),
                      *xyxy[j]) for j, i in enumerate(valid)],
                    src_w, src_h)
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
                              max_frames=args.max_frames or None,
                              channels=cfg.in_channels)
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
