"""`train` command: detector fine-tuning with the multi-part loss
(BASELINE.json:10-11); classifier cfgs route to
train_helpers._train_classifier."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from yolo_tpu.cli._common import (_compute_dtype, _dataset_samples,
                                  _get_cfg, _resolve_weights)
from yolo_tpu.cli.train_helpers import (_batch_accum_from,
                                        _lr_schedule_from,
                                        _optimizer_from,
                                        _restore_adapt_ema,
                                        _train_classifier)


def _fmt_sizes(sizes) -> str:
    """Human form of a multi-scale ladder: WxH for rect buckets."""
    return ",".join(f"{s[1]}x{s[0]}" if isinstance(s, tuple) else str(s)
                    for s in sizes)


def _parse_multi_scale_sizes(spec: str, cfg):
    """--multi-scale-sizes tokens: square ints (classic ladder) or
    WIDTHxHEIGHT pairs (darknet cfg key order) for rectangular
    buckets. On a rectangular net, bare ints are rejected — a square
    bucket would silently change the cfg's aspect. Every dimension
    must be a /32 multiple (the families' net stride; an off-grid
    bucket would only explode at jit time mid-training)."""
    out = []
    for tok in spec.split(","):
        tok = tok.strip()
        try:
            if "x" in tok.lower():
                w_s, h_s = tok.lower().split("x", 1)
                hw = (int(h_s), int(w_s))  # internal (net_h, net_w)
            else:
                if cfg.input_w != cfg.input_h:
                    raise SystemExit(
                        f"--multi-scale-sizes entry '{tok}' is a "
                        f"SQUARE bucket but {cfg.name} is rectangular "
                        f"({cfg.input_w}x{cfg.input_h}) — write rect "
                        f"buckets as WIDTHxHEIGHT (e.g. "
                        f"{cfg.input_w}x{cfg.input_h})")
                hw = int(tok)
        except ValueError:
            raise SystemExit(f"--multi-scale-sizes entry '{tok}': "
                             f"expected an int or WIDTHxHEIGHT") \
                from None
        dims = (hw,) if isinstance(hw, int) else hw
        if any(d < 32 or d % 32 for d in dims):
            raise SystemExit(f"--multi-scale-sizes entry '{tok}': "
                             f"sizes must be multiples of 32")
        out.append(hw)
    return tuple(out)


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
    if getattr(cfg, "objectness_smooth", False) and args.allow_deviations:
        # the documented escape hatch for official scaled-yolov4 cfgs:
        # fall back to sharp objectness targets (objectness_smooth=0
        # darknet semantics) instead of hand-editing the cfg; without
        # the flag, train_step rejects loudly (train/loop.py)
        import dataclasses

        print("--allow-deviations: [yolo] objectness_smooth=1 has no "
              "pinnable reference semantics — training with SHARP "
              "objectness targets (objectness_smooth=0) instead",
              file=sys.stderr)
        cfg = dataclasses.replace(cfg, objectness_smooth=False)
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
    if (args.multi_scale_every is not None
            and args.multi_scale_every < 1):
        # 0 would silently fall back to the default interval and a
        # negative value gives the two loaders DIFFERENT ladders
        # (pick_scale's step % every vs pick_scale_indexed's
        # max(every, 1) clamp) — reject loudly (code-review)
        raise SystemExit(f"--multi-scale-every must be >= 1, got "
                         f"{args.multi_scale_every}")
    sizes = (_parse_multi_scale_sizes(args.multi_scale_sizes, cfg)
             if args.multi_scale_sizes else None)
    if (cfg.input_w != cfg.input_h and args.multi_scale
            and sizes is None):
        # rectangular nets: aspect-preserving proportional buckets
        # (AlexeyAB resizes both dims by ONE factor; default coef 1.4),
        # not the square 320..608 ladder
        from yolo_tpu.train.loop import proportional_sizes

        sizes = proportional_sizes(cfg.input_h, cfg.input_w)
        print(f"rectangular net: multi-scale uses aspect-preserving "
              f"buckets {_fmt_sizes(sizes)} (every 10 batches)",
              file=sys.stderr)
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
        # (both loaders: grain rides the bucketed multi-scale iterator)
        if cfg.input_w != cfg.input_h:
            # rect nets: darknet scales BOTH dims by one random factor
            # (aspect preserved); random=1 means the default coef 1.4,
            # a fractional random=f>1 means coef f
            from yolo_tpu.train.loop import proportional_sizes

            args.multi_scale = True
            rf = float(net_hp["random"])
            if sizes is None:
                coef = rf if rf > 1.0 else 1.4
                sizes = proportional_sizes(cfg.input_h, cfg.input_w,
                                           coef)
                print(f"cfg random={rf:g}: aspect-preserving "
                      f"multi-scale buckets {_fmt_sizes(sizes)} "
                      f"(both dims x [1/{coef:g}, {coef:g}], every "
                      f"10 batches)", file=sys.stderr)
        else:
            args.multi_scale = True
            rf = float(net_hp["random"])
            if rf > 1.0 and sizes is None:
                # AlexeyAB fractional random (e.g. 1.3): resize range
                # [net/f, net*f], snapped to multiples of 32
                base = cfg.input_size  # square here (rect skipped above)
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
    if not args.multi_scale and (args.multi_scale_sizes
                                 or args.multi_scale_every is not None):
        # silently storing a validated cadence that nothing uses is
        # worse than refusing (code-review r5)
        raise SystemExit(
            "--multi-scale-sizes/--multi-scale-every have no effect "
            "without --multi-scale (or a cfg with random=1) — add "
            "--multi-scale or drop the flags")
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
                       **({"multi_scale_sizes": sizes} if sizes else {}),
                       **({"multi_scale_every": args.multi_scale_every}
                          if args.multi_scale_every is not None else {}))
    # --loader grain + --multi-scale is supported (round 5): the grain
    # pipeline keeps one DataLoader per size bucket and carries the
    # sampler position across resize boundaries (grain_pipeline.
    # MultiScaleGrainIterator); the ladder uses the random-access
    # pick_scale_indexed draw so resume rebuilds any step's bucket.
    if args.eval_split and (args.coco_json or args.image_list):
        raise SystemExit("--eval-split is a VOC concept; use "
                         "--eval-coco-json (COCO) or --eval-image-list "
                         "(darknet list) for a held-out set")
    mesh = shd.make_mesh()
    n_dev = mesh.devices.size
    if args.batch % n_dev:
        raise SystemExit(f"--batch {args.batch} not divisible by "
                         f"{n_dev} devices")

    if args.resume:
        template = init_state(
            dw.random_params(cfg.layers, np.random.default_rng(0),
                             input_channels=cfg.in_channels), tcfg)
        state = _restore_adapt_ema(args.resume, template)
    else:
        # accepts darknet `partial` files (e.g. darknet19_448.conv.23,
        # also as zoo://darknet19-448-conv23): load the backbone
        # prefix, randomly init the remaining layers
        params, header, n_loaded = dw.load_partial(
            _resolve_weights(args.weights), cfg.layers,
            input_channels=cfg.in_channels)
        from yolo_tpu.configs.specs import weighted_specs

        # count WEIGHTED layers (convs + connected/local/weighted
        # shortcuts), matching load_partial's walk — len(conv_specs)
        # undercounts on topologies with non-conv weighted layers and
        # would silently skip the random tail init (code-review)
        n_total = len(weighted_specs(cfg.layers))
        if n_loaded < n_total:
            rng_init = np.random.default_rng(args.seed)
            fresh = dw.random_params(cfg.layers, rng_init, scale=0.03,
                                     input_channels=cfg.in_channels)
            params = params + fresh[n_loaded:]
            print(f"partial init: {n_loaded}/{n_total} weighted layers "
                  f"from {args.weights}, rest randomly initialized "
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
        if args.eval_split or args.eval_coco_json or args.eval_image_list:
            import argparse as _ap

            held_out = args.eval_coco_json or args.eval_image_list
            eargs = _ap.Namespace(
                voc_root=None if held_out else args.voc_root,
                coco_json=args.eval_coco_json or None,
                image_list=args.eval_image_list or None,
                image_root=args.image_root,
                split=args.eval_split or "val")
            eval_samples = _dataset_samples(eargs, cfg)
        else:
            eval_samples = pairs  # no held-out set given: training mAP
            print("--eval-every without --eval-split/--eval-coco-json/"
                  "--eval-image-list "
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
                 "mosaic", "mixup", "blur", "gaussian_noise")
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
            # grain handles mosaic/mixup too (seeded random-access
            # partner draws) — no loader restriction (code-review:
            # a stale guard here rejected official mosaic=1 cfgs
            # under --loader grain after grain support landed)
            print("cfg [net] mosaic=1: mosaic augmentation enabled",
                  file=sys.stderr)
        if aug_cfg.mixup and not args.mixup:
            print("cfg [net] mixup=1: mixup augmentation enabled",
                  file=sys.stderr)

    grain_iter = None
    if args.loader == "grain":
        # one checkpointable iterator spanning ALL epochs (grain's own
        # num_epochs): its position travels with the model state —
        # every `step_N` orbax save gets a sibling `step_N.grain` file
        # and --resume restores both (SURVEY.md §5.2/§5.4)
        from yolo_tpu.data.grain_pipeline import grain_train_batches

        size_at = None
        if args.multi_scale:
            # random-access ladder: the bucket for ANY absolute step
            # derives from (seed, step//every) — resume-reproducible
            # without replaying draws (pick_scale_indexed docstring)
            from yolo_tpu.train.loop import pick_scale_indexed

            def size_at(bi):
                return pick_scale_indexed(bi, args.seed,
                                          tcfg.multi_scale_every,
                                          tcfg.multi_scale_sizes)

        grain_iter = grain_train_batches(
            pairs, class_names=cfg.class_names,
            anchors=cfg.anchors, num_classes=cfg.num_classes,
            net_size=cfg.input_hw, batch_size=args.batch,
            seed=args.seed, num_epochs=args.epochs,
            worker_count=args.loader_workers, model_cfg=cfg,
            augment_cfg=aug_cfg, resize=args.resize,
            channels=cfg.in_channels, size_for_batch=size_at)
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
            if size_at is not None:
                # pulls after restore are absolute steps start_step,
                # start_step+1, ... — the multi-scale iterator
                # resolves each pull's bucket from base + pull_index.
                # Set the base EVEN when the .grain file is missing:
                # the ladder is keyed on the absolute model step, so
                # every resume (with or without a data position)
                # reproduces the same size-for-step mapping — a
                # base=0 restart here would silently desync the
                # ladder of all LATER resumes (code-review r5)
                grain_iter.base = start_step

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
                    net_size=cfg.input_hw, batch_size=args.batch,
                    rng=rng, size_for_batch=size_fn,
                    augment_cfg=aug_cfg, model_cfg=cfg,
                    resize=args.resize, channels=cfg.in_channels)

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
