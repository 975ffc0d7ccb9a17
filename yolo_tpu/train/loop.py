"""Training loop: jitted train step with donated state, optax optimizer,
EMA batch-norm stats, multi-scale input switching (SURVEY.md §2.1
'Trainer', §3.3; BASELINE.json:10-11).

The reference runs per-step feed_dict sess.run (its bottleneck,
SURVEY.md §3.3); here the step is one compiled function whose state
buffers are donated, and data parallelism is plain jax.sharding on the
batch dimension (parallel/sharding.py) — the gradient allreduce is the
psum XLA inserts over ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yolo_tpu.configs.specs import ModelConfig
from yolo_tpu.models import graph
from yolo_tpu.train.loss import (LossConfig, YoloLossConfig,
                                 classifier_loss, detection_loss,
                                 region_loss, yolo_loss)

# Darknet multi-scale training sizes (yolov2.cfg random=1: {320..608}/32).
MULTISCALE_SIZES = tuple(range(320, 609, 32))


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    optimizer: str = "sgd"          # "sgd" (darknet) | "adam"
    # darknet [net] B1/B2/eps (network.c Adam defaults .9/.999/1e-7);
    # used when optimizer == "adam"
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-7
    momentum: float = 0.9
    weight_decay: float = 5e-4      # darknet decay, applied to kernels only
    remat: bool = False             # jax.checkpoint per conv block
    # fp32 batch-stat math (cast per conv in bf16 training); False keeps
    # the stats in the compute dtype — measured A/B in docs/PERF.md
    bn_stats_fp32: bool = True
    # darknet policy=steps: burn-in ramp then step decays
    # (yolov2-voc.cfg: burn_in=1000, steps=40000,60000, scales=.1,.1)
    burn_in_steps: int = 0          # lr * (step/burn_in)^4 ramp when > 0
    lr_decay_steps: tuple = ()      # steps at which lr multiplies by...
    lr_decay_scales: tuple = ()     # ...these factors (darknet 'scales')
    # darknet policy=poly (network.c get_current_rate):
    # lr * (1 - step/max_batches)^power after the burn-in ramp;
    # active when lr_poly_max_steps > 0 (mutually exclusive with steps)
    lr_poly_max_steps: int = 0
    lr_poly_power: float = 4.0
    # darknet policy=step ([net] step/scale): lr * scale^(batch//step)
    # — unbounded repeated decay; active when lr_step_size > 0
    lr_step_size: int = 0
    lr_step_scale: float = 1.0
    # darknet policy=exp ([net] gamma): lr * gamma^batch; active > 0
    lr_exp_gamma: float = 0.0
    # darknet policy=sigmoid ([net] gamma, step):
    # lr / (1 + exp(gamma*(batch - step))); active when gamma > 0
    lr_sig_gamma: float = 0.0
    lr_sig_step: int = 0
    # AlexeyAB policy=sgdr (cosine annealing with warm restarts,
    # Loshchilov & Hutter arXiv:1608.03983; network.c get_current_rate
    # SGDR case): within each cycle of size c,
    # lr_min + 0.5*(lr - lr_min)*(1 + cos(pi*(batch - cycle_start)/c));
    # cycles grow geometrically, c *= sgdr_mult at each restart
    # ([net] sgdr_cycle default max_batches, sgdr_mult default 2,
    # learning_rate_min default 1e-5). Active when lr_sgdr_cycle > 0.
    lr_sgdr_cycle: int = 0
    lr_sgdr_mult: int = 2
    lr_min: float = 1e-5
    # darknet policy=random (network.c get_current_rate RANDOM case):
    # lr * rand_uniform(0,1)^power, a FRESH draw every batch from the C
    # library's global PRNG — irreproducible by design. Here the draw
    # is SEEDED, keyed on (lr_random_seed, batch_num), so runs and
    # resumes reproduce exactly; the documented deviation is
    # determinism, not the formula (CLI gates it behind
    # --allow-deviations). Active when lr_random is True.
    lr_random: bool = False
    lr_random_seed: int = 0
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    yolo_loss: YoloLossConfig = dataclasses.field(
        default_factory=YoloLossConfig)  # used when the model has [yolo] heads
    multi_scale: bool = False
    multi_scale_every: int = 10     # darknet resizes every 10 batches
    multi_scale_sizes: tuple = MULTISCALE_SIZES
    # AlexeyAB [net] ema_alpha (scaled-yolov4 cfgs: 0.9998): per-step
    # exponential moving average of the weights,
    # ema = alpha*ema + (1-alpha)*w after each update (network.c
    # ema_update); 0 disables. The EMA tracks kernel/gamma/beta/bias;
    # BN rolling mean/var are already EMAs and stay shared with the
    # live net (darknet ema_update covers weights/scales/biases only).
    # Checkpoint consumers (export, predict/eval on a checkpoint dir,
    # mid-train validation) prefer the EMA weights when present —
    # darknet's ema_apply-before-save semantics.
    ema_alpha: float = 0.0
    # darknet starts blending at ema_start_point = max_batches/2
    # (detector.c); before this step the EMA track simply mirrors the
    # live weights, which is equivalent to initializing the EMA from
    # the then-current weights at the start point. The CLI derives this
    # from the cfg's max_batches when present (--ema-start-step wins).
    ema_start_step: int = 0
    # darknet [net] subdivisions: one optimizer step processes `batch`
    # images as `subdivisions` sequential forward/backward passes of
    # batch/subdivisions images each, summing gradients (network.c
    # train_network / update path). BN batch statistics are computed
    # per SUB-batch and the rolling stats chain sequentially through
    # the sub-passes — exactly darknet's minibatch-stat semantics
    # (batchnorm_layer.c sees net.batch = batch/subdivisions images
    # per forward). 1 = whole-batch step (the TPU default: HBM fits
    # the full batch, and one big pass is faster).
    grad_accum: int = 1


# Train state is a plain dict pytree: {'params', 'opt_state', 'step',
# 'seen'} — jit/donation/orbax all treat it structurally.
TrainState = Dict[str, Any]


def _kernel_mask(params):
    # darknet decays conv/connected/local kernels AND weighted-shortcut
    # blend weights (update_shortcut_layer axpy's -decay*batch onto
    # l.weight_updates), never biases/BN terms
    return [{k: k in ("kernel", "weights") for k in p} for p in params]


def lr_schedule(cfg: TrainConfig):
    """Darknet LR schedule (network.c get_current_rate): while
    batch_num < burn_in the function RETURNS the ramp
    lr * (batch_num/burn_in)^power alone — the policy term applies
    only after burn-in (the old version compounded them, understating
    the end-of-warm-up LR by orders of magnitude under policy=poly —
    code-review finding). The ramp exponent is net.power (darknet
    default 4, shared with the poly policy). After burn-in, the policy
    term: multiplicative decays at given steps (policy=steps),
    lr * (1 - bn/max_batches)^power (policy=poly, clamped at 0),
    lr * scale^(bn//size) (policy=step), lr * gamma^bn (policy=exp),
    lr / (1 + e^(gamma*(bn - s))) (policy=sigmoid), SGDR cosine
    warm restarts (see TrainConfig.lr_sgdr_cycle), or the RANDOM
    policy's lr * u^power with u a SEEDED per-batch uniform draw
    (see TrainConfig.lr_random — darknet's formula made
    deterministic).

    The optax step counter is the number of COMPLETED updates (0 on
    the first), while darknet increments net.seen before
    update_network, so its batch_num is 1 on the first update —
    batch_num = step + 1 here, making every policy value (burn-in
    ramp, decay boundaries, poly horizon, SGDR phase) line up with the
    reference batch-for-batch (a burn-in first step at LR exactly 0
    was the visible symptom — second-review finding)."""
    base = cfg.learning_rate
    power = cfg.lr_poly_power  # net.power, darknet default 4.0

    def schedule(step):
        lr = jnp.asarray(base, jnp.float32)
        bnum = step + 1                       # darknet batch_num
        fb = bnum.astype(jnp.float32)
        # post-burn-in policy value
        policy_lr = lr
        for at, scale in zip(cfg.lr_decay_steps, cfg.lr_decay_scales):
            # darknet STEPS: 'if (steps[i] > batch_num) return' —
            # the scale applies once batch_num reaches the boundary
            policy_lr = jnp.where(bnum >= at, policy_lr * scale,
                                  policy_lr)
        if cfg.lr_poly_max_steps:
            frac = jnp.maximum(
                1.0 - fb / cfg.lr_poly_max_steps, 0.0)
            policy_lr = policy_lr * frac ** power
        if cfg.lr_step_size:
            # darknet STEP: pow(scale, batch_num/step), int division
            policy_lr = policy_lr * jnp.asarray(
                cfg.lr_step_scale, jnp.float32) ** (
                    bnum // cfg.lr_step_size).astype(jnp.float32)
        if cfg.lr_exp_gamma:
            policy_lr = policy_lr * jnp.asarray(
                cfg.lr_exp_gamma, jnp.float32) ** fb
        if cfg.lr_sig_gamma:
            policy_lr = policy_lr / (
                1.0 + jnp.exp(cfg.lr_sig_gamma
                              * (fb - cfg.lr_sig_step)))
        if cfg.lr_random:
            # darknet RANDOM: lr * rand_uniform(0,1)^power — here the
            # uniform is keyed on (seed, batch_num) so every run and
            # every resume sees the identical LR at a given step
            u = jax.random.uniform(
                jax.random.fold_in(
                    jax.random.PRNGKey(cfg.lr_random_seed),
                    jnp.asarray(bnum, jnp.uint32)),
                (), jnp.float32)
            policy_lr = policy_lr * u ** power
        if cfg.lr_sgdr_cycle:
            # AlexeyAB SGDR: 'while (start + cycle_size < batch_num)
            # advance' — STRICT <, so the boundary batch stays in the
            # OLD cycle at phase 1 (cos(pi) -> lr_min); the old >=
            # advanced a step early and restarted at full LR exactly
            # where darknet bottoms out (code-review finding)
            lo = jnp.asarray(cfg.lr_min, jnp.float32)
            if cfg.lr_sgdr_mult <= 1:
                # equal cycles: closed form of the strict-< walk
                start = ((bnum - 1) // cfg.lr_sgdr_cycle) \
                    * cfg.lr_sgdr_cycle
                size = jnp.asarray(cfg.lr_sgdr_cycle, jnp.float32)
            else:
                # geometric cycles: boundaries are static, so a
                # where-cascade covers any int32 step (sizes at least
                # double — under 64 stages)
                start = jnp.zeros((), bnum.dtype)
                size = jnp.asarray(float(cfg.lr_sgdr_cycle), jnp.float32)
                s0, c = 0, cfg.lr_sgdr_cycle
                while s0 + c < 2 ** 31:
                    nxt_start, nxt_size = s0 + c, c * cfg.lr_sgdr_mult
                    past = bnum > nxt_start
                    start = jnp.where(past, nxt_start, start)
                    size = jnp.where(past, float(nxt_size), size)
                    s0, c = nxt_start, nxt_size
            frac = (fb - start.astype(jnp.float32)) / size
            policy_lr = lo + 0.5 * (policy_lr - lo) * (
                1.0 + jnp.cos(jnp.pi * frac))
        if not cfg.burn_in_steps:
            return policy_lr
        ramp_lr = lr * jnp.minimum(
            (fb / cfg.burn_in_steps) ** power, 1.0)
        return jnp.where(bnum < cfg.burn_in_steps, ramp_lr, policy_lr)

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    lr = (lr_schedule(cfg)
          if (cfg.burn_in_steps or cfg.lr_decay_steps
              or cfg.lr_poly_max_steps or cfg.lr_step_size
              or cfg.lr_exp_gamma or cfg.lr_sig_gamma
              or cfg.lr_sgdr_cycle or cfg.lr_random)
          else cfg.learning_rate)
    if cfg.optimizer == "sgd":
        opt = optax.sgd(lr, momentum=cfg.momentum)
    elif cfg.optimizer == "adam":
        opt = optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2,
                         eps=cfg.adam_eps)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.weight_decay:
        opt = optax.chain(
            optax.masked(optax.add_decayed_weights(cfg.weight_decay),
                         _kernel_mask),
            opt)
    return opt


def init_state(params, tcfg: TrainConfig, seen: int = 0) -> TrainState:
    if not 0.0 <= tcfg.ema_alpha < 1.0:
        # alpha=1.0 would freeze the EMA at the initial weights forever
        # — and every checkpoint consumer silently prefers the EMA track
        raise ValueError(
            f"ema_alpha={tcfg.ema_alpha} out of range [0, 1): 0 "
            f"disables, scaled-yolov4 cfgs use 0.9998; 1.0 would never "
            f"move off the initial weights")
    params = graph.params_to_jax(params)
    tx = make_optimizer(tcfg)
    state = dict(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        seen=jnp.asarray(seen, jnp.int32),
    )
    if tcfg.ema_alpha:
        # darknet ema starts from the initial weights (first
        # ema_update blends against them)
        state["ema_params"] = jax.tree_util.tree_map(jnp.copy, params)
    return state


def ema_params_of(state: TrainState):
    """The weights a checkpoint consumer should use: the EMA track when
    the run maintained one (darknet ema_apply-before-save), else the
    live params."""
    return state.get("ema_params", state["params"])


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], *,
               mcfg: ModelConfig, tcfg: TrainConfig,
               compute_dtype=jnp.float32) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step. batch: {'images' (B,S,S,3) in [0,1]} + the
    target tensors from data.targets.encode_batch. Pure function of
    (state, batch) — jit with donate_argnums=0 via make_train_step."""
    tx = make_optimizer(tcfg)
    batch_size = batch["images"].shape[0]

    # (net_h, net_w) from the actual batch (rect nets supported)
    net_size = (batch["images"].shape[1], batch["images"].shape[2])
    accum = max(1, int(tcfg.grad_accum))
    if batch_size % accum:
        raise ValueError(
            f"batch {batch_size} not divisible by grad_accum {accum} "
            f"(darknet requires batch % subdivisions == 0 too)")

    def loss_fn(params, sub, dropout_rng, seen):
        logits, bn_updates = graph.apply_layers(
            mcfg.layers, params, sub["images"], eps=mcfg.bn_eps,
            train=True, compute_dtype=compute_dtype, remat=tcfg.remat,
            bn_stats_fp32=tcfg.bn_stats_fp32,
            softmax_logits=mcfg.head_kind == "softmax",
            # fresh, deterministic dropout masks each step (darknet
            # dropout_layer trains stochastically; inference stays
            # identity) — keyed on the step (and the sub-batch index
            # under gradient accumulation) so resume reproduces them
            dropout_rng=dropout_rng)
        if mcfg.head_kind == "softmax":
            # the SoftmaxHead layer is the single source of truth for
            # the hierarchy and temperature — inference reads them from
            # the layer, so training must too (a programmatically built
            # SoftmaxHead(tree=...) with ModelConfig.tree=None would
            # otherwise silently train FLAT CE against a hierarchical
            # forward pass — code-review finding). Located by SCAN,
            # the same rule head_kind/softmax_tree use.
            from yolo_tpu.configs.specs import SoftmaxHead

            shead = next(l for l in mcfg.layers
                         if isinstance(l, SoftmaxHead))
            total, parts = classifier_loss(
                logits, sub["labels"], tree=shead.tree,
                temperature=shead.temperature)
            return total, (bn_updates, parts)
        if mcfg.head_kind == "detection":
            total, parts = detection_loss(logits, sub,
                                          mcfg.detection_head)
            return total, (bn_updates, parts)
        if mcfg.head_kind == "yolo":
            heads = mcfg.yolo_heads
            if mcfg.objectness_smooth:
                # AlexeyAB objectness_smooth=1 replaces the sharp
                # objectness target with an IoU-derived one via delta
                # max-merging we have no reference source to pin —
                # fail loudly rather than silently train different
                # gradients (inference ignores the key, like darknet)
                raise NotImplementedError(
                    "[yolo] objectness_smooth=1 training is not "
                    "supported — pass `train --allow-deviations` to "
                    "train this cfg with sharp objectness targets "
                    "(objectness_smooth=0 darknet semantics) after a "
                    "warning, or delete the key from the cfg")
            total, parts = yolo_loss(
                logits, sub, mcfg.anchors,
                [hd.mask for hd in heads], mcfg.num_classes,
                net_size, tcfg.yolo_loss,
                scales=[hd.scale_xy for hd in heads],
                max_deltas=[hd.max_delta for hd in heads],
                smooth_eps=[hd.label_smooth_eps for hd in heads],
                new_coords=[hd.new_coords for hd in heads],
                gaussian=[hd.gaussian for hd in heads])
        else:
            total, parts = region_loss(
                logits, sub, mcfg.anchors, mcfg.num_classes, tcfg.loss,
                seen, tree=mcfg.tree)
        return total, (bn_updates, parts)

    step_key = jax.random.fold_in(jax.random.PRNGKey(0), state["step"])
    if accum == 1:
        (loss, (bn_updates, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], batch, step_key,
                                   state["seen"])
        params_stats = None
    else:
        sub_bs = batch_size // accum
        def split(a):
            if a.shape[0] != batch_size:
                raise ValueError(
                    f"grad_accum: batch entry with leading dim "
                    f"{a.shape[0]} != batch size {batch_size}")
            # interleaved sub-batches (sub i = a[i::accum]): under data
            # parallelism the batch axis is device-sharded, and the
            # strided split keeps every sub-batch spread evenly over
            # all devices (a contiguous split would park whole
            # sub-batches on a subset of the mesh). Membership order
            # differs from darknet's contiguous split, but the loader
            # ordering is arbitrary anyway and the summed gradient is
            # grouping-invariant.
            return jnp.moveaxis(
                a.reshape((sub_bs, accum) + a.shape[1:]), 1, 0)
        subs = {k: split(v) for k, v in batch.items()}
        rngs = jax.vmap(lambda i: jax.random.fold_in(step_key, i))(
            jnp.arange(accum, dtype=jnp.uint32))

        def body(carry, xs):
            p, gsum = carry
            sub, rng, i = xs
            (l, (bn_u, pp)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(p, sub, rng,
                                       state["seen"] + i * sub_bs)
            # rolling BN stats chain sequentially through the
            # sub-passes (darknet updates them on every sub-batch
            # forward); mean/var carry zero gradient, so reusing the
            # stat-updated params for the next sub-pass leaves the
            # weight gradients untouched
            p = graph.apply_bn_updates(p, bn_u)
            gsum = jax.tree_util.tree_map(lambda a, b: a + b, gsum, g)
            return (p, gsum), (l, pp)

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state["params"])
        (params_stats, gsum), (losses, parts_stack) = jax.lax.scan(
            body, (state["params"], zeros),
            (subs, rngs, jnp.arange(accum, dtype=jnp.int32)))
        # each sub-loss is a mean over its own sub-batch, so the mean
        # of per-sub gradients equals the whole-batch gradient
        grads = jax.tree_util.tree_map(lambda a: a / accum, gsum)
        loss = losses.mean()
        parts = jax.tree_util.tree_map(lambda a: a.mean(), parts_stack)
    updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    if accum == 1:
        params = graph.apply_bn_updates(params, bn_updates)
    else:
        # the final chained rolling stats live in the scan carry
        params = [{k: (params_stats[i][k] if k in ("mean", "var")
                       else v) for k, v in pl.items()}
                  for i, pl in enumerate(params)]
    new_state = dict(
        params=params,
        opt_state=opt_state,
        step=state["step"] + 1,
        seen=state["seen"] + batch_size,
    )
    if tcfg.ema_alpha:
        # before ema_start_step (darknet: max_batches/2) the track
        # mirrors the live weights — alpha_eff 0 ==> ema = w, which
        # equals initializing the EMA at the start point
        a = jnp.where(state["step"] >= tcfg.ema_start_step,
                      jnp.float32(tcfg.ema_alpha), jnp.float32(0.0))
        ema = []
        for pe, pl in zip(state["ema_params"], params):
            # rolling mean/var are already EMAs, shared with the live
            # net (darknet ema_update covers weights/scales/biases)
            ema.append({k: (v if k in ("mean", "var")
                            else a * pe[k] + (1.0 - a) * v)
                        for k, v in pl.items()})
        new_state["ema_params"] = ema
    metrics = dict(parts)
    metrics["loss"] = loss
    return new_state, metrics


def make_train_step(mcfg: ModelConfig, tcfg: TrainConfig,
                    compute_dtype=jnp.float32):
    """Jitted step with donated state. One compile per input-size bucket
    (multi-scale recompiles are bucketed, SURVEY.md §7.2)."""
    return jax.jit(
        partial(train_step, mcfg=mcfg, tcfg=tcfg, compute_dtype=compute_dtype),
        donate_argnums=0)


def prewarm(step_fn, state, mcfg: ModelConfig, sizes,
            batch_size: int, batch_sharding=None) -> None:
    """Compile the train step for every multi-scale bucket up front
    (SURVEY.md §7.2 'multi-scale recompiles: pre-warm at startup').

    Runs one real step per size on a throwaway deep copy of the state
    (step_fn donates its state argument, so the caller's buffers must
    not be passed) and discards the result — only the jit cache
    matters. AOT lower().compile() does not populate jit's dispatch
    cache, hence the execute-and-discard approach.

    ``batch_sharding`` must match what the real data pipeline uses
    (jit's executable cache keys on input shardings — an unsharded
    prewarm would compile entries DP training never hits)."""
    from yolo_tpu.data import targets as tgt

    for size in sizes:
        net_h, net_w = (size, size) if isinstance(size, int) else size
        enc = tgt.encode_batch_for(
            mcfg, [np.zeros((0, 4))] * batch_size,
            [np.zeros((0,), np.int32)] * batch_size,
            input_size=(net_h, net_w))
        batch = {k: jnp.asarray(v) for k, v in enc.items()}
        batch["images"] = jnp.zeros(
            (batch_size, net_h, net_w, mcfg.in_channels), jnp.float32)
        if batch_sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, batch_sharding), batch)
        scratch = jax.tree_util.tree_map(jnp.copy, state)
        _, metrics = step_fn(scratch, batch)
        jax.block_until_ready(metrics)


def pick_scale(step: int, rng: np.random.Generator,
               every: int = 10,
               sizes: tuple = MULTISCALE_SIZES):
    """Multi-scale size for this step, changing every `every` steps
    (host-side; the jit cache buckets per size). Entries are square
    ints or (net_h, net_w) tuples (rectangular nets); returns None on
    non-boundary steps."""
    if step % every:
        return None
    s = sizes[int(rng.integers(0, len(sizes)))]
    return s if isinstance(s, tuple) else int(s)


def pick_scale_indexed(step: int, seed: int, every: int = 10,
                       sizes: tuple = MULTISCALE_SIZES):
    """RANDOM-ACCESS form of pick_scale for the grain loader: the
    bucket for ANY step is derivable from (seed, step) alone, without
    replaying prior draws — grain resume restores to an arbitrary step
    and must rebuild that step's size bucket directly. Same ladder
    semantics (one uniform draw per `every`-step interval, constant
    within the interval); the draw keys on the interval index like
    policy=random keys on batch_num."""
    interval = step // max(every, 1)
    u = np.random.default_rng((int(seed), int(interval))).integers(
        0, len(sizes))
    s = sizes[int(u)]
    return s if isinstance(s, tuple) else int(s)


def proportional_sizes(net_h: int, net_w: int,
                       coef: float = 1.4) -> tuple:
    """Aspect-preserving multi-scale ladder for rectangular nets.

    AlexeyAB's detector.c resizes BOTH dims by ONE random factor drawn
    from [1/coef, coef] (rand_scale; random=1 uses the default
    coefficient 1.4, a fractional random=f>1 uses f), each dim snapped
    to a /32 multiple — the aspect ratio is preserved, unlike the
    classic square 320..608 ladder. This builds the discrete bucket
    set: the LONG side steps through its /32 ladder over
    [long/coef, long*coef] and the short side scales proportionally
    (floor 32). Returns (net_h, net_w) tuples; the cfg's own size is
    always a member."""
    if coef <= 1.0:
        raise ValueError(f"multi-scale coefficient must be > 1, "
                         f"got {coef:g}")
    long_is_w = net_w >= net_h
    long, short = (net_w, net_h) if long_is_w else (net_h, net_w)
    lo = max(32, int(round(long / coef / 32)) * 32)
    hi = max(lo, int(round(long * coef / 32)) * 32)
    out = []
    for ell in range(lo, hi + 1, 32):
        s = max(32, int(round(short * (ell / long) / 32)) * 32)
        hw = (s, ell) if long_is_w else (ell, s)
        if hw not in out:
            out.append(hw)
    base = (net_h, net_w)
    if base not in out:  # snapping can step over the cfg's own size
        out.append(base)
        out.sort()
    return tuple(out)
