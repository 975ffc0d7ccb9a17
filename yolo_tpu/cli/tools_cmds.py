"""Tooling commands: `zoo`, `partial`, `anchors`, `export`, `serve`,
`bench`, `doctor`."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from yolo_tpu.cli._common import (_compute_dtype, _dataset_samples,
                                  _get_cfg, _load_params,
                                  _maybe_quantize, _quantize_classifier,
                                  _resolve_weights, _tree_kw)


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
        _resolve_weights(args.weights), cfg.layers,
        input_channels=cfg.in_channels)
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
    # [region] anchors are in grid-cell units; [yolo] anchors are in
    # net-input pixels — emit whichever the model family consumes
    # (per-axis for rectangular nets: w scales by the width units,
    # h by the height units, darknet calc_anchors' convention)
    units = ((cfg.input_w, cfg.input_h) if cfg.head_kind == "yolo"
             else (cfg.input_w // 32, cfg.input_h // 32))
    res = kmeans_anchors(wh, args.num_anchors, units_wh=units,
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
    from yolo_tpu.data.pipeline import load_image
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
                load_image(args.calibration_image, cfg.in_channels),
                cfg.input_hw)
            params = _quantize_classifier(cfg, params, calib[None])
        else:
            params = _maybe_quantize(
                args, cfg, params,
                [load_image(args.calibration_image, cfg.in_channels)])
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
