"""Trainer plumbing shared by the detector and classifier paths:
classifier training loop, checkpoint-EMA adaptation, and the darknet
[net]-driven batch/optimizer/LR-schedule resolution."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from yolo_tpu.cli._common import _compute_dtype, _resolve_weights


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
                                             cfg.input_hw,
                                             cfg.in_channels)
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
            dw.random_params(cfg.layers, np.random.default_rng(0),
                             input_channels=cfg.in_channels), tcfg)
        state = _restore_adapt_ema(args.resume, template)
    elif args.weights:
        # full weights or a darknet partial (fine-tune / resume-from-
        # export); remaining layers randomly initialized
        params, header, n_loaded = dw.load_partial(
            _resolve_weights(args.weights), cfg.layers,
            input_channels=cfg.in_channels)
        from yolo_tpu.configs.specs import weighted_specs

        n_total = len(weighted_specs(cfg.layers))
        if n_loaded < n_total:
            fresh = dw.random_params(
                cfg.layers, np.random.default_rng(args.seed), scale=0.03,
                input_channels=cfg.in_channels)
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
                                  scale=0.03,
                                  input_channels=cfg.in_channels)
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
        samples, args.batch, cfg.input_hw, epochs=args.epochs,
        seed=args.seed, flip=flip, start_step=resume_step,
        augment_cfg=aug_cfg, channels=cfg.in_channels)
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
        if not getattr(args, "allow_deviations", False):
            raise SystemExit(
                "[net] policy=random draws a fresh rand_uniform^power "
                "LR every batch from the C library's global PRNG — "
                "irreproducible by design. Pass --allow-deviations to "
                "train it with darknet's formula (lr * u^power, "
                "u ~ U[0,1)) under a SEEDED draw keyed on "
                "(--seed, step): deterministic and "
                "resume-reproducible — the deviation is determinism, "
                "not the formula.")
        kw["lr_random"] = True
        kw["lr_random_seed"] = int(getattr(args, "seed", 0) or 0)
        print("--allow-deviations: [net] policy=random trains with a "
              "SEEDED rand_uniform^power LR draw keyed on "
              f"(--seed={kw['lr_random_seed']}, step) — darknet's "
              "formula, deterministic instead of the C rand()",
              file=sys.stderr)
    elif policy not in ("constant", "steps"):
        # darknet get_policy: unknown strings warn and fall back
        print(f"note: unknown [net] policy '{policy}', going with "
              "constant (darknet does the same)", file=sys.stderr)
    return kw
