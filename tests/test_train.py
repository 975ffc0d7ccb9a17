"""Loss/GT-encoder/trainer tests (SURVEY.md §4.2.4) + checkpoint resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tpu.configs.specs import Conv, MaxPool, ModelConfig
from yolo_tpu.data import targets as tgt
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step
from yolo_tpu.train.loss import LossConfig, region_loss

ANCHORS3 = ((1.0, 1.5), (3.0, 3.0), (6.0, 4.0))

MICRO = ModelConfig(
    name="micro",
    layers=(
        Conv(8), MaxPool(2, 2),
        Conv(16), MaxPool(2, 2),
        Conv(16), MaxPool(2, 2),
        Conv(16), MaxPool(2, 2),
        Conv(16), MaxPool(2, 2),
        Conv(3 * (5 + 4), size=1, bn=False, act="linear"),
    ),
    anchors=ANCHORS3,
    class_names=("a", "b", "c", "d"),
    input_size=64,
)


def _random_scene(rng, batch, grid, num_classes):
    boxes, classes = [], []
    for _ in range(batch):
        g = rng.integers(1, 4)
        b = np.stack([
            rng.uniform(0.2, 0.8, g), rng.uniform(0.2, 0.8, g),
            rng.uniform(0.05, 0.5, g), rng.uniform(0.05, 0.5, g),
        ], axis=-1)
        boxes.append(b)
        classes.append(rng.integers(0, num_classes, g))
    return tgt.encode_batch(boxes, classes, grid=grid, anchors=ANCHORS3,
                            num_classes=num_classes)


class TestGTEncoder:
    def test_known_best_anchor(self):
        # 0.23x0.23 box at 13-grid -> wh (2.99, 2.99) cells: wh-IoU is
        # 0.993 vs anchor (3,3), 0.37 vs (6,4), 0.17 vs (1,1.5)
        enc = tgt.encode(np.array([[0.5, 0.5, 0.23, 0.23]]), np.array([2]),
                         grid=13, anchors=ANCHORS3, num_classes=4)
        cj = ci = 6  # floor(0.5*13)
        assert enc["obj_mask"][cj, ci, 1] == 1.0
        assert enc["obj_mask"].sum() == 1.0
        assert enc["tcls"][cj, ci, 1] == 2
        np.testing.assert_allclose(
            enc["tcoord"][cj, ci, 1],
            [0.5 * 13 - 6, 0.5 * 13 - 6,
             np.log(0.23 * 13 / 3.0), np.log(0.23 * 13 / 3.0)], rtol=1e-5)
        assert enc["coord_w"][cj, ci, 1] == pytest.approx(2.0 - 0.23 * 0.23)

    def test_cell_assignment_and_padding(self):
        enc = tgt.encode(np.array([[0.05, 0.95, 0.1, 0.1]]), np.array([0]),
                         grid=4, anchors=ANCHORS3, num_classes=4)
        assert enc["obj_mask"][3, 0].sum() == 1.0   # row=y cell 3, col=x cell 0
        assert enc["gt_mask"].sum() == 1.0
        assert enc["gt_boxes"].shape == (tgt.MAX_GT, 4)

    def test_degenerate_boxes_skipped(self):
        enc = tgt.encode(np.array([[0.5, 0.5, 0.0, 0.1]]), np.array([0]),
                         grid=4, anchors=ANCHORS3, num_classes=4)
        assert enc["obj_mask"].sum() == 0.0
        assert enc["gt_mask"].sum() == 0.0


class TestRegionLoss:
    @pytest.mark.parametrize("seen,rescore", [(0, True), (20000, True), (0, False)])
    def test_matches_oracle(self, seen, rescore):
        from tests.loss_oracle import region_loss_np

        rng = np.random.default_rng(11)
        b, s, c = 2, 4, 4
        cfg = LossConfig(rescore=rescore)
        logits = rng.normal(0, 1, (b, s, s, 3 * (5 + c))).astype(np.float32)
        targets = _random_scene(rng, b, s, c)
        want_total, want_parts = region_loss_np(
            logits, targets, ANCHORS3, c, cfg, seen)
        got_total, got_parts = region_loss(
            jnp.asarray(logits),
            {k: jnp.asarray(v) for k, v in targets.items()},
            ANCHORS3, c, cfg, jnp.asarray(seen))
        for k in want_parts:
            assert float(got_parts[k]) == pytest.approx(want_parts[k], rel=1e-4, abs=1e-6), k
        assert float(got_total) == pytest.approx(want_total, rel=1e-4)


class TestTrainStep:
    def _batch(self, rng, batch=4):
        grid = MICRO.grid_size
        targets = _random_scene(rng, batch, grid, MICRO.num_classes)
        batch_dict = {k: jnp.asarray(v) for k, v in targets.items()}
        batch_dict["images"] = jnp.asarray(
            rng.uniform(0, 1, (batch, 64, 64, 3)).astype(np.float32))
        return batch_dict

    def test_loss_decreases(self):
        rng = np.random.default_rng(0)
        params = dw.random_params(MICRO.layers, rng)
        tcfg = TrainConfig(learning_rate=5e-3, optimizer="adam",
                           weight_decay=0.0)
        state = init_state(params, tcfg)
        step = make_train_step(MICRO, tcfg)
        batch = self._batch(rng)
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.9
        assert int(state["step"]) == 8
        assert int(state["seen"]) == 32

    def test_bn_stats_updated_not_trained(self):
        rng = np.random.default_rng(1)
        params = dw.random_params(MICRO.layers, rng)
        tcfg = TrainConfig(weight_decay=0.0)
        state = init_state(params, tcfg)
        step = make_train_step(MICRO, tcfg)
        before = np.asarray(state["params"][0]["mean"])
        state, _ = step(state, self._batch(rng))
        after = np.asarray(state["params"][0]["mean"])
        assert not np.allclose(before, after)   # EMA moved


class TestEMA:
    """[net] ema_alpha (AlexeyAB network.c ema_update/ema_apply):
    ema = alpha*ema + (1-alpha)*w per step for kernel/gamma/beta/bias;
    BN rolling mean/var stay shared with the live net; checkpoint
    consumers prefer the EMA track."""

    def _batch(self, rng, batch=2):
        grid = MICRO.grid_size
        targets = _random_scene(rng, batch, grid, MICRO.num_classes)
        batch_dict = {k: jnp.asarray(v) for k, v in targets.items()}
        batch_dict["images"] = jnp.asarray(
            rng.uniform(0, 1, (batch, 64, 64, 3)).astype(np.float32))
        return batch_dict

    def test_recurrence_matches_manual(self):
        from yolo_tpu.train.loop import ema_params_of

        rng = np.random.default_rng(3)
        params = dw.random_params(MICRO.layers, rng)
        alpha = 0.5
        tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                           weight_decay=0.0, ema_alpha=alpha)
        state = init_state(params, tcfg)
        step = make_train_step(MICRO, tcfg)
        batch = self._batch(rng)

        # manual EMA over the LIVE param trajectory
        want = np.asarray(state["params"][0]["kernel"])
        for _ in range(5):
            state, _ = step(state, batch)
            live = np.asarray(state["params"][0]["kernel"])
            want = alpha * want + (1 - alpha) * live
        got = np.asarray(state["ema_params"][0]["kernel"])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
        # EMA lags the live weights (they moved)
        assert not np.allclose(got, np.asarray(
            state["params"][0]["kernel"]))
        # rolling stats are shared with the live net, not EMA'd again
        np.testing.assert_array_equal(
            np.asarray(state["ema_params"][0]["mean"]),
            np.asarray(state["params"][0]["mean"]))
        # consumer helper returns the EMA track
        assert ema_params_of(state) is state["ema_params"]

    def test_start_step_mirrors_until_then(self):
        """Before ema_start_step (darknet: max_batches/2) the EMA track
        MIRRORS the live weights; blending starts at the boundary."""
        rng = np.random.default_rng(7)
        tcfg = TrainConfig(learning_rate=3e-3, optimizer="adam",
                           weight_decay=0.0, ema_alpha=0.9,
                           ema_start_step=3)
        state = init_state(dw.random_params(MICRO.layers, rng), tcfg)
        step = make_train_step(MICRO, tcfg)
        batch = self._batch(rng)
        for i in range(3):  # steps 0..2 evaluated with step < 3
            state, _ = step(state, batch)
            np.testing.assert_array_equal(
                np.asarray(state["ema_params"][0]["kernel"]),
                np.asarray(state["params"][0]["kernel"]))
        state, _ = step(state, batch)  # state["step"] was 3: blends now
        assert not np.allclose(
            np.asarray(state["ema_params"][0]["kernel"]),
            np.asarray(state["params"][0]["kernel"]))

    def test_alpha_range_validated(self):
        rng = np.random.default_rng(8)
        params = dw.random_params(MICRO.layers, rng)
        with pytest.raises(ValueError, match="out of range"):
            init_state(params, TrainConfig(ema_alpha=1.0))
        with pytest.raises(ValueError, match="out of range"):
            init_state(params, TrainConfig(ema_alpha=-0.1))

    def test_has_top_level_key(self, tmp_path):
        from yolo_tpu.io import checkpoint as ckpt

        rng = np.random.default_rng(9)
        state = init_state(dw.random_params(MICRO.layers, rng),
                           TrainConfig(ema_alpha=0.9))
        ckpt.save(str(tmp_path / "ck"), jax.device_get(dict(state)))
        assert ckpt.has_top_level_key(str(tmp_path / "ck"), "ema_params")
        assert not ckpt.has_top_level_key(str(tmp_path / "ck"), "nope")

    def test_off_by_default(self):
        from yolo_tpu.train.loop import ema_params_of

        rng = np.random.default_rng(4)
        state = init_state(dw.random_params(MICRO.layers, rng),
                           TrainConfig())
        assert "ema_params" not in state
        assert ema_params_of(state) is state["params"]

    def test_export_prefers_ema(self, tmp_path, capsys):
        """cmd_export writes the EMA track (darknet ema_apply-before-
        save); --live-weights writes the raw track."""
        import io as _io

        from yolo_tpu import cli
        from yolo_tpu.io import checkpoint as ckpt

        from yolo_tpu.configs.darknet_cfg import cfg_to_string

        rng = np.random.default_rng(5)
        tcfg = TrainConfig(learning_rate=5e-3, optimizer="adam",
                           weight_decay=0.0, ema_alpha=0.6)
        state = init_state(dw.random_params(MICRO.layers, rng), tcfg)
        step = make_train_step(MICRO, tcfg)
        for _ in range(3):
            state, _ = step(state, self._batch(rng))
        ckpt.save(str(tmp_path / "ck"), jax.device_get(dict(state)))
        cfg_path = tmp_path / "micro.cfg"
        cfg_path.write_text(cfg_to_string(MICRO))

        out = tmp_path / "ema.weights"
        cli.main(["export", "--cfg", str(cfg_path),
                  "--checkpoint", str(tmp_path / "ck"),
                  "--output", str(out)])
        got, _ = dw.load(str(out), MICRO.layers)
        np.testing.assert_allclose(
            got[0]["kernel"], np.asarray(state["ema_params"][0]["kernel"]),
            rtol=1e-6)

        out2 = tmp_path / "live.weights"
        cli.main(["export", "--cfg", str(cfg_path),
                  "--checkpoint", str(tmp_path / "ck"),
                  "--output", str(out2), "--live-weights"])
        got2, _ = dw.load(str(out2), MICRO.layers)
        np.testing.assert_allclose(
            got2[0]["kernel"], np.asarray(state["params"][0]["kernel"]),
            rtol=1e-6)

    def test_cfg_key_flows(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import net_training_params

        p = tmp_path / "e.cfg"
        p.write_text("[net]\nwidth=64\nheight=64\nema_alpha=0.9998\n"
                     "[convolutional]\nfilters=30\nsize=1\n"
                     "activation=linear\n"
                     "[region]\nanchors = 1,1, 2,2, 3,3, 4,4, 5,5\n"
                     "classes=1\nnum=5\n")
        assert net_training_params(str(p))["ema_alpha"] == \
            pytest.approx(0.9998)


def test_checkpoint_roundtrip(tmp_path):
    from yolo_tpu.io import checkpoint as ckpt

    rng = np.random.default_rng(2)
    params = dw.random_params(MICRO.layers, rng)
    tcfg = TrainConfig()
    state = init_state(params, tcfg, seen=123)
    path = str(tmp_path / "ck1")
    ckpt.save(path, dict(state))
    restored = ckpt.restore(path, dict(state))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        dict(state), restored)
    assert int(restored["seen"]) == 123


def test_async_checkpoint_roundtrip(tmp_path):
    from yolo_tpu.io import checkpoint as ckpt

    rng = np.random.default_rng(6)
    params = dw.random_params(MICRO.layers, rng)
    state = init_state(params, TrainConfig(), seen=9)
    path = str(tmp_path / "ck_async")
    with ckpt.AsyncSaver() as saver:
        saver.save(path, dict(state))
    restored = ckpt.restore(path, dict(state))
    np.testing.assert_array_equal(
        np.asarray(restored["params"][0]["kernel"]),
        np.asarray(state["params"][0]["kernel"]))
    assert int(restored["seen"]) == 9


def test_prewarm_populates_jit_cache():
    from yolo_tpu.train.loop import prewarm

    rng = np.random.default_rng(4)
    tcfg = TrainConfig(weight_decay=0.0)
    state = init_state(dw.random_params(MICRO.layers, rng), tcfg)
    step = make_train_step(MICRO, tcfg)
    misses_before = step._cache_size()
    prewarm(step, state, MICRO, (64, 96), batch_size=2)
    assert step._cache_size() == misses_before + 2
    # state untouched (no donation consumed): a real step still works
    from tests.test_train import TestTrainStep

    batch = TestTrainStep()._batch(np.random.default_rng(5), batch=2)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_lr_schedule_burn_in_and_steps():
    """All values at darknet batch_num = step + 1 (net.seen increments
    BEFORE update_network, so the first update sees batch_num 1 — the
    0-based version ran the first burn-in step at LR exactly 0 and
    lagged every boundary by one batch; second-review finding)."""
    from yolo_tpu.train.loop import lr_schedule

    cfg = TrainConfig(learning_rate=1e-3, burn_in_steps=100,
                      lr_decay_steps=(1000, 2000),
                      lr_decay_scales=(0.1, 0.1))
    sched = lr_schedule(cfg)
    # first update: batch_num 1, ramp (1/100)^4 — NOT zero
    assert float(sched(jnp.asarray(0))) == pytest.approx(1e-3 * 1e-8)
    assert float(sched(jnp.asarray(49))) == pytest.approx(1e-3 * 0.5 ** 4)
    # batch_num 100 == burn_in: the policy value applies (darknet <)
    assert float(sched(jnp.asarray(99))) == pytest.approx(1e-3)
    # darknet STEPS decays when batch_num >= steps[i]
    assert float(sched(jnp.asarray(999))) == pytest.approx(1e-4)
    assert float(sched(jnp.asarray(1500))) == pytest.approx(1e-4)
    assert float(sched(jnp.asarray(2500))) == pytest.approx(1e-5)


def test_lr_schedule_poly():
    """darknet policy=poly: lr * (1 - batch_num/max_batches)^power
    after the burn-in ramp, clamped at 0 past max_batches."""
    from yolo_tpu.train.loop import lr_schedule

    import jax.numpy as jnp

    cfg = TrainConfig(learning_rate=1e-2, lr_poly_max_steps=100,
                      lr_poly_power=4.0)
    s = lr_schedule(cfg)
    assert float(s(jnp.asarray(0))) == pytest.approx(1e-2 * 0.99 ** 4)
    assert float(s(jnp.asarray(49))) == pytest.approx(1e-2 * 0.5 ** 4)
    assert float(s(jnp.asarray(99))) == 0.0
    assert float(s(jnp.asarray(150))) == 0.0  # clamped, not negative
    # darknet get_current_rate: while batch_num < burn_in the RAMP
    # alone applies (exponent = net.power), the policy term only after
    # — the two never compound (code-review fix)
    cfg2 = TrainConfig(learning_rate=1e-2, burn_in_steps=10,
                       lr_poly_max_steps=100, lr_poly_power=2.0)
    s2 = lr_schedule(cfg2)
    assert float(s2(jnp.asarray(4))) == pytest.approx(1e-2 * 0.5 ** 2)
    assert float(s2(jnp.asarray(49))) == pytest.approx(1e-2 * 0.5 ** 2)
    # end of warm-up (batch_num == burn_in): the poly decay alone
    assert float(s2(jnp.asarray(9))) == pytest.approx(1e-2 * 0.9 ** 2)


def test_lr_schedule_step_exp_sigmoid():
    """The remaining deterministic network.c get_current_rate policies
    at batch_num = step + 1: STEP lr*scale^(bn//step),
    EXP lr*gamma^bn, SIG lr/(1+e^(gamma*(bn-step)))."""
    import math

    from yolo_tpu.train.loop import lr_schedule

    s = lr_schedule(TrainConfig(learning_rate=1e-2, lr_step_size=100,
                                lr_step_scale=0.5))
    assert float(s(jnp.asarray(0))) == pytest.approx(1e-2)
    assert float(s(jnp.asarray(98))) == pytest.approx(1e-2)
    assert float(s(jnp.asarray(99))) == pytest.approx(5e-3)   # bn 100
    assert float(s(jnp.asarray(249))) == pytest.approx(2.5e-3)

    s = lr_schedule(TrainConfig(learning_rate=1e-2, lr_exp_gamma=0.99))
    assert float(s(jnp.asarray(0))) == pytest.approx(1e-2 * 0.99)
    assert float(s(jnp.asarray(99))) == pytest.approx(1e-2 * 0.99 ** 100,
                                                      rel=1e-5)

    s = lr_schedule(TrainConfig(learning_rate=1e-2, lr_sig_gamma=0.1,
                                lr_sig_step=50))
    assert float(s(jnp.asarray(49))) == pytest.approx(5e-3)   # bn 50
    assert float(s(jnp.asarray(0))) == pytest.approx(
        1e-2 / (1 + math.exp(-4.9)), rel=1e-5)
    assert float(s(jnp.asarray(1000))) == pytest.approx(0.0, abs=1e-9)


def test_lr_schedule_sgdr():
    """AlexeyAB policy=sgdr: cosine from lr to lr_min within each
    cycle; cycle length multiplies by sgdr_mult at each restart. The
    cycle walk advances while (start + size) < batch_num — STRICT, so
    the boundary batch bottoms out at lr_min in the OLD cycle; the
    next batch starts the new one (code-review finding: the >= walk
    restarted at full LR exactly where darknet reaches lr_min)."""
    import math

    from yolo_tpu.train.loop import lr_schedule

    cfg = TrainConfig(learning_rate=1e-2, lr_sgdr_cycle=100,
                      lr_sgdr_mult=2, lr_min=1e-4)
    s = lr_schedule(cfg)
    mid = 1e-4 + 0.5 * (1e-2 - 1e-4)

    def cosv(frac):
        return 1e-4 + 0.5 * (1e-2 - 1e-4) * (1 + math.cos(math.pi * frac))

    assert float(s(jnp.asarray(0))) == pytest.approx(cosv(0.01), rel=1e-5)
    assert float(s(jnp.asarray(49))) == pytest.approx(mid, rel=1e-5)
    # batch_num 100 == cycle boundary: lr_min, NOT a full-LR restart
    assert float(s(jnp.asarray(99))) == pytest.approx(1e-4, rel=1e-4)
    # the next batch opens cycle 2 ([100, 300), size 200)
    assert float(s(jnp.asarray(100))) == pytest.approx(cosv(1 / 200),
                                                       rel=1e-5)
    assert float(s(jnp.asarray(199))) == pytest.approx(mid, rel=1e-5)
    assert float(s(jnp.asarray(299))) == pytest.approx(1e-4, rel=1e-4)
    # cycle 3 starts at 300 with size 400
    assert float(s(jnp.asarray(399))) == pytest.approx(cosv(0.25),
                                                       rel=1e-5)
    # mult=1: equal cycles via the closed form
    s1 = lr_schedule(TrainConfig(learning_rate=1e-2, lr_sgdr_cycle=100,
                                 lr_sgdr_mult=1, lr_min=1e-4))
    assert float(s1(jnp.asarray(249))) == pytest.approx(mid, rel=1e-5)
    assert float(s1(jnp.asarray(299))) == pytest.approx(1e-4, rel=1e-4)
    assert float(s1(jnp.asarray(300))) == pytest.approx(cosv(0.01),
                                                        rel=1e-5)


def test_lr_schedule_random_seeded():
    """policy=random (--allow-deviations): darknet's lr * u^power with
    a SEEDED uniform keyed on (seed, batch_num) — same seed reproduces
    the exact sequence, different seeds/steps differ, every value lies
    in (0, lr], burn-in still ramps first, and resume at step k sees
    the same LR as a fresh run (the draw depends only on step)."""
    import dataclasses

    from yolo_tpu.train.loop import lr_schedule

    cfg = TrainConfig(learning_rate=1e-2, lr_random=True,
                      lr_random_seed=7, lr_poly_power=4.0)
    s = lr_schedule(cfg)
    vals = [float(s(jnp.asarray(i))) for i in range(8)]
    # reproducible: a second schedule instance gives the identical walk
    vals2 = [float(lr_schedule(cfg)(jnp.asarray(i))) for i in range(8)]
    assert vals == vals2
    # in range and actually random (distinct across steps)
    assert all(0.0 < v <= 1e-2 for v in vals)
    assert len(set(vals)) == len(vals)
    # u^4 skews small: the mean draw sits well below lr
    assert sum(vals) / len(vals) < 0.5e-2
    # a different seed is a different sequence
    other = lr_schedule(dataclasses.replace(cfg, lr_random_seed=8))
    assert float(other(jnp.asarray(3))) != vals[3]
    # burn-in ramp applies first, exactly as for every other policy
    sb = lr_schedule(dataclasses.replace(cfg, burn_in_steps=100))
    assert float(sb(jnp.asarray(9))) == pytest.approx(
        1e-2 * (10 / 100) ** 4, rel=1e-5)


def test_cli_policy_resolution_new_policies(tmp_path):
    """[net] policy step/exp/sigmoid/sgdr resolve into TrainConfig
    kwargs; policy=random rejects; unknown policies warn to constant."""
    import argparse

    from yolo_tpu.cli import _lr_schedule_from

    args = argparse.Namespace(lr_steps=None, lr_scales=None)
    kw = _lr_schedule_from(args, {"policy": "step", "step": 200,
                                  "scale": 0.5})
    assert kw["lr_step_size"] == 200 and kw["lr_step_scale"] == 0.5
    kw = _lr_schedule_from(args, {"policy": "exp", "gamma": 0.998})
    assert kw["lr_exp_gamma"] == pytest.approx(0.998)
    kw = _lr_schedule_from(args, {"policy": "sigmoid", "gamma": 0.2,
                                  "step": 400})
    assert kw["lr_sig_gamma"] == pytest.approx(0.2)
    assert kw["lr_sig_step"] == 400
    kw = _lr_schedule_from(args, {"policy": "sgdr",
                                  "max_batches": 1000})
    assert kw["lr_sgdr_cycle"] == 1000  # sgdr_cycle defaults to it
    assert kw["lr_sgdr_mult"] == 2 and kw["lr_min"] == pytest.approx(1e-5)
    with pytest.raises(SystemExit, match="allow-deviations"):
        _lr_schedule_from(args, {"policy": "random"})
    # ...but --allow-deviations opts into the SEEDED deterministic
    # variant (the deviation is determinism, not the formula)
    args_dev = argparse.Namespace(lr_steps=None, lr_scales=None,
                                  allow_deviations=True, seed=11)
    kw = _lr_schedule_from(args_dev, {"policy": "random"})
    assert kw["lr_random"] is True and kw["lr_random_seed"] == 11
    with pytest.raises(SystemExit, match="sgdr_cycle"):
        _lr_schedule_from(args, {"policy": "sgdr"})
    # [net] power reaches the burn-in ramp exponent under ANY policy
    # (network.c uses net.power for the warm-up ramp unconditionally)
    kw = _lr_schedule_from(args, {"policy": "constant", "power": 2.0})
    assert kw["lr_poly_power"] == 2.0
    # explicit --lr-steps wins over everything
    args2 = argparse.Namespace(lr_steps="10,20", lr_scales=None)
    kw = _lr_schedule_from(args2, {"policy": "sgdr",
                                   "max_batches": 100})
    assert kw["lr_decay_steps"] == (10, 20)
    assert "lr_sgdr_cycle" not in kw


def test_cli_policy_poly_from_cfg(tmp_path, capsys):
    """[net] policy=poly max_batches/power flow into the schedule; a
    poly cfg without max_batches is rejected."""
    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.configs.darknet_cfg import cfg_to_string
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc", input_size=64)
    base = cfg_to_string(cfg)
    (tmp_path / "m.names").write_text("\n".join(cfg.class_names) + "\n")
    w = tmp_path / "w.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))

    (tmp_path / "m.cfg").write_text(base.replace(
        "[net]\n", "[net]\npolicy=poly\nmax_batches=1000\npower=2\n", 1))
    cli.main(["train", "--cfg", str(tmp_path / "m.cfg"),
              "--names", str(tmp_path / "m.names"), "--weights", str(w),
              "--voc-root", root, "--split", "train", "--batch", "8",
              "--epochs", "1", "--precision", "fp32", "--lr", "1e-4"])
    assert "policy=poly" in capsys.readouterr().err

    (tmp_path / "bad.cfg").write_text(base.replace(
        "[net]\n", "[net]\npolicy=poly\n", 1))
    with pytest.raises(SystemExit, match="max_batches"):
        cli.main(["train", "--cfg", str(tmp_path / "bad.cfg"),
                  "--names", str(tmp_path / "m.names"),
                  "--weights", str(w), "--voc-root", root,
                  "--split", "train", "--batch", "8", "--epochs", "1",
                  "--precision", "fp32", "--lr", "1e-4"])


def test_train_step_with_schedule_runs():
    rng = np.random.default_rng(12)
    tcfg = TrainConfig(learning_rate=1e-3, burn_in_steps=5,
                       weight_decay=0.0)
    state = init_state(dw.random_params(MICRO.layers, rng), tcfg)
    step = make_train_step(MICRO, tcfg)
    from tests.test_train import TestTrainStep

    batch = TestTrainStep()._batch(rng, batch=2)
    for _ in range(3):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_remat_matches_no_remat():
    """jax.checkpoint must not change the math — same loss and params
    after a step, only the backward memory/FLOPs trade differs."""
    rng = np.random.default_rng(13)
    batch = TestTrainStep()._batch(rng, batch=2)
    results = []
    for remat in (False, True):
        tcfg = TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                           remat=remat)
        state = init_state(dw.random_params(MICRO.layers,
                                            np.random.default_rng(7)), tcfg)
        state, metrics = make_train_step(MICRO, tcfg)(state, batch)
        results.append((float(metrics["loss"]),
                        np.asarray(state["params"][0]["kernel"])))
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=1e-5, atol=1e-7)


def test_bn_stats_dtype_ab():
    """TrainConfig(bn_stats_fp32=False) is a functioning A/B (measured
    slower on TPU, docs/PERF.md 'Training roofline'): in fp32 compute it
    is bit-identical to the default (the cast is the identity), and in
    bf16 it still trains to a finite decreasing loss."""
    from tests.test_map_integration import _dataset

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(np.repeat(v[None], 4, 0))
             for k, v in tgt.encode(
                 np.array([[0.5, 0.45, 0.4, 0.5]]), np.array([1]),
                 grid=MICRO.grid_size, anchors=MICRO.anchors,
                 num_classes=MICRO.num_classes).items()}
    img = np.zeros((64, 64, 3), np.float32) + 0.2
    batch["images"] = jnp.asarray(np.repeat(img[None], 4, 0))
    params = dw.random_params(MICRO.layers, rng)

    t_on = TrainConfig(learning_rate=1e-3, weight_decay=0.0)
    t_off = TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                        bn_stats_fp32=False)
    s_on, m_on = make_train_step(MICRO, t_on)(
        init_state(params, t_on), batch)
    s_off, m_off = make_train_step(MICRO, t_off)(
        init_state(params, t_off), batch)
    assert float(m_on["loss"]) == pytest.approx(float(m_off["loss"]),
                                                rel=1e-6)

    state = init_state(params, t_off)
    step = make_train_step(MICRO, t_off, compute_dtype=jnp.bfloat16)
    first = None
    for _ in range(20):
        state, metrics = step(state, batch)
        first = first if first is not None else float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first


class TestAdamCfg:
    @pytest.mark.quick
    def test_net_adam_keys_parsed(self, tmp_path):
        from yolo_tpu.configs.darknet_cfg import net_training_params

        p = tmp_path / "a.cfg"
        p.write_text("[net]\nwidth=64\nheight=64\nadam=1\nB1=.95\n"
                     "B2=.99\neps=1e-6\n\n[convolutional]\nfilters=18\n"
                     "size=1\nactivation=linear\npad=1\n"
                     "batch_normalize=0\nstride=1\n\n[region]\n"
                     "anchors=1,1\nclasses=1\nnum=1\n")
        hp = net_training_params(str(p))
        assert hp["adam"] == 1
        assert hp["B1"] == 0.95 and hp["B2"] == 0.99
        assert hp["eps"] == 1e-6

    @pytest.mark.quick
    def test_moments_change_the_update(self):
        """Custom B1/B2/eps must flow into the optax transform: one
        step from identical grads differs from default-Adam."""
        import jax.numpy as jnp

        from yolo_tpu.train.loop import TrainConfig, make_optimizer

        params = [{"kernel": jnp.ones((1, 1, 1, 1))}]
        grads = [{"kernel": jnp.full((1, 1, 1, 1), 0.5)}]

        def one_step(tcfg):
            tx = make_optimizer(tcfg)
            st = tx.init(params)
            upd, _ = tx.update(grads, st, params)
            return float(upd[0]["kernel"].reshape(()))

        a = one_step(TrainConfig(optimizer="adam", weight_decay=0.0))
        b = one_step(TrainConfig(optimizer="adam", weight_decay=0.0,
                                 adam_b1=0.5, adam_b2=0.9,
                                 adam_eps=1e-2))
        assert a != b

    def test_cli_cfg_enables_adam(self, tmp_path, capsys):
        import cv2

        from tests.test_classifier_train import (CLS_CFG,
                                                 _write_cls_cfg)
        from yolo_tpu import cli

        text = CLS_CFG.replace("momentum=0.9",
                               "momentum=0.9\nadam=1\nB1=.95")
        cfg_path, names = _write_cls_cfg(tmp_path, text)
        rng = np.random.default_rng(0)
        data = tmp_path / "data"
        import os as _os

        for ci, cls in enumerate(("red", "green", "blue")):
            _os.makedirs(data / cls)
            for i in range(3):
                img = np.zeros((32, 32, 3), np.uint8)
                img[:, :, 2 - ci] = 200
                cv2.imwrite(str(data / cls / f"{i}.png"), img)
        cli.main(["train", "--cfg", cfg_path, "--names", names,
                  "--imagefolder", str(data), "--epochs", "1",
                  "--batch", "8", "--precision", "fp32"])
        assert "adam=1: Adam optimizer" in capsys.readouterr().err


class TestGradAccum:
    """darknet [net] subdivisions: one optimizer step runs `accum`
    sequential sub-passes (sub i = batch[i::accum]), sums gradients,
    and chains the BN rolling stats through the sub-passes
    (network.c train_network; batchnorm_layer.c sees
    net.batch = batch/subdivisions images per forward)."""

    def _nobn(self):
        import dataclasses

        return dataclasses.replace(MICRO, name="micro-nobn", layers=tuple(
            dataclasses.replace(l, bn=False) if isinstance(l, Conv) else l
            for l in MICRO.layers))

    def _batch(self, rng, model, batch=8):
        grid = model.grid_size
        targets = _random_scene(rng, batch, grid, model.num_classes)
        d = {k: jnp.asarray(v) for k, v in targets.items()}
        d["images"] = jnp.asarray(
            rng.uniform(0, 1, (batch, 64, 64, 3)).astype(np.float32))
        return d

    @pytest.mark.quick
    def test_no_bn_matches_whole_batch(self):
        # without BN (per-sub-batch stats) the mean of per-sub-batch
        # gradients equals the whole-batch gradient, so accum=2 must
        # reproduce the accum=1 step
        model = self._nobn()
        rng = np.random.default_rng(3)
        params = dw.random_params(model.layers, rng)
        batch = self._batch(rng, model)
        states, losses = [], []
        for accum in (1, 2, 4):
            tcfg = TrainConfig(learning_rate=1e-2, weight_decay=0.0,
                               grad_accum=accum)
            s = init_state(params, tcfg)
            s, m = make_train_step(model, tcfg)(s, batch)
            states.append(s)
            losses.append(float(m["loss"]))
        for other in losses[1:]:
            assert other == pytest.approx(losses[0], rel=1e-5)
        for s in states[1:]:
            for p_ref, p in zip(states[0]["params"], s["params"]):
                for k in p_ref:
                    np.testing.assert_allclose(
                        np.asarray(p[k]), np.asarray(p_ref[k]),
                        rtol=2e-5, atol=2e-6)
            assert int(s["step"]) == 1 and int(s["seen"]) == 8

    @pytest.mark.quick
    def test_bn_stats_chain_sequentially(self):
        # rolling mean/var after an accum=2 step equal two manual
        # sequential apply_layers passes over the interleaved
        # sub-batches (EMA chained through the first pass's output)
        from yolo_tpu.models import graph

        rng = np.random.default_rng(4)
        params = dw.random_params(MICRO.layers, rng)
        batch = self._batch(rng, MICRO)
        tcfg = TrainConfig(learning_rate=0.0, momentum=0.0,
                           weight_decay=0.0, grad_accum=2)
        state = init_state(params, tcfg)
        new_state, _ = make_train_step(MICRO, tcfg)(
            jax.tree_util.tree_map(jnp.copy, state), batch)

        p = state["params"]
        for i in range(2):
            _, bn_u = graph.apply_layers(
                MICRO.layers, p, batch["images"][i::2], eps=MICRO.bn_eps,
                train=True, compute_dtype=jnp.float32)
            p = graph.apply_bn_updates(p, bn_u)
        for got, want in zip(new_state["params"], p):
            for k in ("mean", "var"):
                if k in want:
                    np.testing.assert_allclose(
                        np.asarray(got[k]), np.asarray(want[k]),
                        rtol=1e-5, atol=1e-7)

    def test_loss_decreases_with_accum(self):
        rng = np.random.default_rng(5)
        tcfg = TrainConfig(learning_rate=5e-3, optimizer="adam",
                           weight_decay=0.0, grad_accum=2)
        state = init_state(dw.random_params(MICRO.layers, rng), tcfg)
        step = make_train_step(MICRO, tcfg)
        batch = self._batch(rng, MICRO)
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.9
        assert int(state["step"]) == 8 and int(state["seen"]) == 64

    @pytest.mark.quick
    def test_indivisible_batch_rejects(self):
        rng = np.random.default_rng(6)
        tcfg = TrainConfig(grad_accum=3)
        state = init_state(dw.random_params(MICRO.layers, rng), tcfg)
        with pytest.raises(ValueError, match="divisible"):
            make_train_step(MICRO, tcfg)(state, self._batch(rng, MICRO))

    @pytest.mark.quick
    def test_cli_resolution(self):
        import argparse

        from yolo_tpu.cli import _batch_accum_from

        # cfg [net] batch/subdivisions are the defaults
        args = argparse.Namespace(batch=None, grad_accum=None)
        accum = _batch_accum_from(args, {"batch": 64, "subdivisions": 8})
        assert args.batch == 64 and accum == 8
        # explicit flags win
        args = argparse.Namespace(batch=16, grad_accum=1)
        assert _batch_accum_from(
            args, {"batch": 64, "subdivisions": 8}) == 1
        assert args.batch == 16
        # darknet requires batch % subdivisions == 0
        args = argparse.Namespace(batch=10, grad_accum=None)
        with pytest.raises(SystemExit, match="divisible"):
            _batch_accum_from(args, {"subdivisions": 4})
        # no cfg keys: 32/1
        args = argparse.Namespace(batch=None, grad_accum=None)
        assert _batch_accum_from(args, {}) == 1
        assert args.batch == 32


@pytest.mark.quick
def test_bn_batch_variance_is_bessel():
    """darknet variance_cpu normalizes by 1/(batch*spatial - 1)
    (Bessel) — the rolling var EMA must carry that factor, not the
    population 1/n (code-review finding)."""
    from yolo_tpu.models import graph

    rng = np.random.default_rng(8)
    layers = (Conv(4),)
    from yolo_tpu.io import darknet_weights as dw

    params = graph.params_to_jax(dw.random_params(layers, rng))
    x = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32))
    _, bn_u = graph.apply_layers(layers, params, x, train=True)
    # recompute the conv pre-activation independently
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(params[0]["kernel"]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n = y.shape[0] * y.shape[1] * y.shape[2]
    want_var = np.var(np.asarray(y), axis=(0, 1, 2), ddof=1)
    got = np.asarray(bn_u[0]["var"])
    m = graph.BN_MOMENTUM
    expect = m * np.asarray(params[0]["var"]) + (1 - m) * want_var
    np.testing.assert_allclose(got, expect, rtol=1e-4)
    assert abs(want_var.mean() / max(
        np.var(np.asarray(y), axis=(0, 1, 2)).mean(), 1e-9)
        - n / (n - 1)) < 1e-5


@pytest.mark.quick
def test_gt_encoder_clamps_offimage_centers():
    """A box center off-image to the left/top must clamp to cell 0,
    not wrap to the far grid edge via a negative index (darknet
    fill_truth_detection constrains x,y first — code-review
    finding)."""
    enc = tgt.encode(np.array([[-0.2, 0.5, 0.3, 0.3]]),
                     np.array([0]), grid=4, anchors=ANCHORS3,
                     num_classes=2)
    obj = enc["obj_mask"]
    assert obj[:, 0].sum() == 1.0 and obj[:, 1:].sum() == 0.0
    enc1 = tgt.encode_v1(np.array([[0.4, -0.3, 0.2, 0.2]]),
                         np.array([0]), 3)
    # row 0 (top edge), not the bottom row
    assert enc1["v1_obj"].reshape(3, 3)[0].sum() == 1.0
    assert enc1["v1_obj"].reshape(3, 3)[1:].sum() == 0.0
