"""grain-backed training pipeline tests (data/grain_pipeline.py)."""

import numpy as np
import pytest

pytest.importorskip("grain")

from yolo_tpu.data.grain_pipeline import grain_train_batches


def _mk_pairs(tmp_path, n=6):
    import cv2

    rng = np.random.default_rng(0)
    pairs = []
    for i in range(n):
        p = str(tmp_path / f"i{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (60, 80, 3), dtype=np.uint8))
        pairs.append((p, {
            "boxes": np.array([[0.5, 0.5, 0.3, 0.4]], np.float32),
            "classes": np.array([0], np.int32),
            "difficult": np.array([0], np.int32),
            "width": 80, "height": 60, "filename": f"i{i}.jpg"}))
    return pairs


ANCHORS = np.array([[1.0, 1.0], [2.0, 2.0]], np.float32)
KW = dict(class_names=("cat",), anchors=ANCHORS, num_classes=1,
          net_size=64, batch_size=2)


class TestGrainLoader:
    def test_schema_matches_thread_loader(self, tmp_path):
        from yolo_tpu.data.pipeline import train_batches

        pairs = _mk_pairs(tmp_path)
        gb = next(iter(grain_train_batches(pairs, seed=1, **KW)))
        tb = next(train_batches(pairs, rng=np.random.default_rng(1),
                                workers=1, **KW))
        assert set(gb) == set(tb)
        for k in gb:
            assert gb[k].shape == tb[k].shape, k
            assert gb[k].dtype == tb[k].dtype, k

    def test_deterministic_and_complete(self, tmp_path):
        pairs = _mk_pairs(tmp_path)
        a = list(grain_train_batches(pairs, seed=3, **KW))
        b = list(grain_train_batches(pairs, seed=3, **KW))
        assert len(a) == 3  # 6 samples / batch 2, drop_remainder
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["images"], y["images"])
        c = list(grain_train_batches(pairs, seed=4, **KW))
        assert not all(np.array_equal(x["images"], y["images"])
                       for x, y in zip(a, c))  # different shuffle

    def test_train_step_consumes_batches(self, tmp_path):
        import jax.numpy as jnp

        from yolo_tpu.configs import get_variant
        from yolo_tpu.io import darknet_weights as dw
        from yolo_tpu.train.loop import (TrainConfig, init_state,
                                         make_train_step)

        import dataclasses

        cfg = dataclasses.replace(get_variant("tiny-voc"), input_size=64)
        tcfg = TrainConfig(learning_rate=1e-4, optimizer="sgd")
        state = init_state(
            dw.random_params(cfg.layers, np.random.default_rng(0)), tcfg)
        step = make_train_step(cfg, tcfg, compute_dtype=jnp.float32)
        pairs = _mk_pairs(tmp_path)
        kw = dict(KW)
        kw.update(class_names=cfg.class_names, anchors=cfg.anchors,
                  num_classes=cfg.num_classes)
        for batch in grain_train_batches(pairs, seed=0, **kw):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


class TestGrainAugment:
    def test_augment_deterministic_and_distinct(self, tmp_path):
        """--augment under grain: seeded RandomMapTransform makes runs
        reproducible, and augmented batches differ from unaugmented."""
        from yolo_tpu.data.augment import AugmentConfig

        pairs = _mk_pairs(tmp_path)
        aug = AugmentConfig()
        a = list(grain_train_batches(pairs, seed=5, augment_cfg=aug, **KW))
        b = list(grain_train_batches(pairs, seed=5, augment_cfg=aug, **KW))
        assert len(a) == len(b) == 3
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["images"], y["images"])
        plain = list(grain_train_batches(pairs, seed=5, **KW))
        assert not all(np.array_equal(x["images"], y["images"])
                       for x, y in zip(a, plain))

    def test_mosaic_deterministic_composites(self, tmp_path):
        """--mosaic under grain: the seeded transform draws its 3
        partner records from the random-access source — runs are
        reproducible, boxes stay normalized to the canvas, and the
        composites differ from the plain path."""
        from yolo_tpu.data.augment import AugmentConfig

        pairs = _mk_pairs(tmp_path)
        aug = AugmentConfig(mosaic=True)
        a = list(grain_train_batches(pairs, seed=7, augment_cfg=aug,
                                     **KW))
        b = list(grain_train_batches(pairs, seed=7, augment_cfg=aug,
                                     **KW))
        assert len(a) == len(b) == 3
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["images"], y["images"])
            assert x["images"].shape[1:] == (64, 64, 3)
            assert x["images"].min() >= 0.0 and x["images"].max() <= 1.0
        plain = list(grain_train_batches(pairs, seed=7, **KW))
        assert not all(np.array_equal(x["images"], y["images"])
                       for x, y in zip(a, plain))
        # every source image carries one centered GT box, so a 4-image
        # composite keeps at least one assigned anchor per record
        assert any(float(x["obj_mask"].sum()) > 0 for x in a)

    def test_mosaic_resume_reproduces_batches(self, tmp_path):
        """Mosaic's partner draws travel with grain's iterator state:
        restoring mid-stream regenerates the SAME composites."""
        from yolo_tpu.data.augment import AugmentConfig

        pairs = _mk_pairs(tmp_path)
        aug = AugmentConfig(mosaic=True)
        it = grain_train_batches(pairs, seed=8, num_epochs=2,
                                 augment_cfg=aug, **KW)
        first = [next(it) for _ in range(2)]
        state = it.get_state()
        rest = [next(it) for _ in range(2)]
        it2 = grain_train_batches(pairs, seed=8, num_epochs=2,
                                  augment_cfg=aug, **KW)
        it2.set_state(state)
        rest2 = [next(it2) for _ in range(2)]
        for x, y in zip(rest, rest2):
            np.testing.assert_array_equal(x["images"], y["images"])
        del first

    def test_mixup_blends_and_concatenates(self, tmp_path):
        """--mixup under grain: 0.5/0.5 blend with one seeded partner,
        truths concatenated (obj_mask can carry both records' boxes)."""
        from yolo_tpu.data.augment import AugmentConfig

        pairs = _mk_pairs(tmp_path)
        aug = AugmentConfig(mixup=True)
        a = list(grain_train_batches(pairs, seed=9, augment_cfg=aug,
                                     **KW))
        b = list(grain_train_batches(pairs, seed=9, augment_cfg=aug,
                                     **KW))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["images"], y["images"])
        plain = list(grain_train_batches(pairs, seed=9, **KW))
        assert not all(np.array_equal(x["images"], y["images"])
                       for x, y in zip(a, plain))


class TestGrainCheckpoint:
    def test_set_state_resumes_exact_position(self, tmp_path):
        """get/set_state reproduce the stream mid-epoch: consume k
        batches, snapshot, rebuild a fresh loader, restore, and the
        continuation is bit-identical to the original tail."""
        pairs = _mk_pairs(tmp_path)
        it = grain_train_batches(pairs, seed=9, num_epochs=2, **KW)
        consumed = [next(it) for _ in range(2)]
        snap = it.state_for_pull(2)
        tail_want = list(it)
        assert len(consumed) + len(tail_want) == 6  # 2 epochs x 3

        it2 = grain_train_batches(pairs, seed=9, num_epochs=2, **KW)
        it2.set_state(snap)
        tail_got = list(it2)
        assert len(tail_got) == len(tail_want)
        for x, y in zip(tail_got, tail_want):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)

    def test_state_for_pull_behind_prefetch(self, tmp_path):
        """state_for_pull(k) with the iterator pulled ahead (the
        DevicePrefetcher situation) resumes at batch k, not at the
        prefetch frontier."""
        pairs = _mk_pairs(tmp_path)
        it = grain_train_batches(pairs, seed=11, num_epochs=1, **KW)
        all_batches = list(it)          # frontier fully ahead
        snap = it.state_for_pull(1)     # but only 1 batch "trained"

        it2 = grain_train_batches(pairs, seed=11, num_epochs=1, **KW)
        it2.set_state(snap)
        rest = list(it2)
        assert len(rest) == 2
        for x, y in zip(rest, all_batches[1:]):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)


@pytest.mark.slow
def test_cli_grain_fail_resume_restores_data_position(tmp_path, capsys):
    """cli train --loader grain: every checkpoint carries a sibling
    .grain data-position file, and --resume restores model AND data
    together (VERDICT r1 item 5: 'resume-mid-epoch test showing the
    iterator position survives')."""
    import os

    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc")
    w = tmp_path / "init.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=16, size=(80, 90))
    ckdir = str(tmp_path / "ck")
    common = ["train", "--model", "tiny-voc", "--input-size", "96",
              "--weights", str(w), "--voc-root", root, "--loader", "grain",
              "--split", "train", "--batch", "8", "--lr", "1e-4",
              "--precision", "fp32", "--checkpoint-dir", ckdir,
              "--checkpoint-every", "1", "--log-every", "1"]
    with pytest.raises(SystemExit, match="fail-after-step"):
        cli.main(common + ["--fail-after-step", "1", "--epochs", "2"])
    assert os.path.isdir(os.path.join(ckdir, "step_1"))
    assert os.path.exists(os.path.join(ckdir, "step_1.grain"))

    cli.main(common + ["--resume", os.path.join(ckdir, "step_1"),
                       "--epochs", "2"])
    err = capsys.readouterr().err
    assert "restored grain data-iterator position" in err
    final = ckpt.restore(os.path.join(ckdir, "final"))
    # 2 epochs x (16/8) batches = 4 total; 1 before fail + 3 after —
    # the resumed iterator continued mid-stream instead of restarting
    assert int(np.asarray(final["step"])) == 4
    assert os.path.exists(os.path.join(ckdir, "final.grain"))


def test_set_state_resets_pull_counter(tmp_path):
    """After an in-place restore, state_for_pull(k) counts batches
    consumed SINCE the restore (review r2: without resetting _pulls a
    mid-run restore desyncs checkpoint positions)."""
    pairs = _mk_pairs(tmp_path)
    it = grain_train_batches(pairs, seed=13, num_epochs=2, **KW)
    for _ in range(3):
        next(it)
    snap = it.state_for_pull(3)

    # restore IN PLACE on the used iterator, consume 2, checkpoint at 2
    it.set_state(snap)
    consumed = [next(it) for _ in range(2)]
    assert it.pulls == 2
    snap2 = it.state_for_pull(2)

    it2 = grain_train_batches(pairs, seed=13, num_epochs=2, **KW)
    it2.set_state(snap2)
    tail = list(it2)
    want_total = 6  # 2 epochs x 3 batches
    assert 3 + len(consumed) + len(tail) == want_total


def test_cli_grain_cfg_driven_mosaic_trains(tmp_path, capsys):
    """[net] mosaic=1 in the cfg under --loader grain must TRAIN — a
    stale guard (predating grain mosaic support) rejected cfg-driven
    mosaic while accepting the identical --mosaic flag (code-review)."""
    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs.darknet_cfg import config_from_cfg
    from yolo_tpu.io import darknet_weights as dw

    cfg_text = """
[net]
width=64
height=64
saturation=1.5
exposure=1.5
hue=.1
mosaic=1

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=21
activation=linear

[region]
anchors = 1.08,1.19, 3.42,4.41, 6.63,11.38
classes=2
num=3
"""
    cfg_path = tmp_path / "mosaic.cfg"
    cfg_path.write_text(cfg_text)
    names = tmp_path / "m.names"
    names.write_text("cat\ndog\n")
    cfg = config_from_cfg(str(cfg_path))
    w = tmp_path / "init.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0),
                             scale=0.05))
    root = make_voc_root(tmp_path, n_images=8, size=(70, 80))
    cli.main(["train", "--cfg", str(cfg_path), "--names", str(names),
              "--weights", str(w), "--voc-root", root, "--loader",
              "grain", "--split", "train", "--batch", "8",
              "--epochs", "1", "--precision", "fp32"])
    err = capsys.readouterr().err
    assert "cfg [net] mosaic=1: mosaic augmentation enabled" in err


class TestGrainMultiScale:
    """Multi-scale under grain (round 5 — closes the round-4
    fixed-net-size exclusion in docs/MIGRATING.md): one DataLoader per
    size bucket, sampler position carried across resize boundaries via
    grain's own iterator state."""

    @staticmethod
    def _ladder(bi):
        # explicit 2-bucket ladder switching every 2 batches
        return 64 if (bi // 2) % 2 == 0 else 96

    def test_multi_scale_state_transfers(self, tmp_path):
        """Bucket switches follow the ladder AND every batch equals
        the same-index batch of a FIXED-size run at that bucket's size
        (same seed => same sampler sequence): the position transfer
        across re-instantiated loaders loses and duplicates nothing."""
        pairs = _mk_pairs(tmp_path)
        kw2 = dict(KW, num_epochs=2, seed=3)
        ms = list(grain_train_batches(pairs,
                                      size_for_batch=self._ladder,
                                      **kw2))
        assert len(ms) == 6
        assert [b["images"].shape[1] for b in ms] == [64, 64, 96, 96,
                                                      64, 64]
        fixed = {64: list(grain_train_batches(pairs, **kw2)),
                 96: list(grain_train_batches(
                     pairs, **dict(kw2, net_size=96)))}
        for i, b in enumerate(ms):
            want = fixed[self._ladder(i)][i]
            assert set(b) == set(want)
            for k in b:
                np.testing.assert_array_equal(b[k], want[k], err_msg=k)

    def test_multi_scale_resume_mid_ladder(self, tmp_path):
        """state_for_pull + base restore reproduces the interrupted
        run from inside a non-initial bucket (the restore itself must
        cross a bucket boundary: size_at(3)=96 != the fresh iterator's
        initial 64 bucket)."""
        pairs = _mk_pairs(tmp_path)
        kw2 = dict(KW, num_epochs=2, seed=7)
        full = list(grain_train_batches(pairs,
                                        size_for_batch=self._ladder,
                                        **kw2))
        it = grain_train_batches(pairs, size_for_batch=self._ladder,
                                 **kw2)
        for _ in range(3):
            next(it)
        snap = it.state_for_pull(3)

        it2 = grain_train_batches(pairs, size_for_batch=self._ladder,
                                  **kw2)
        it2.set_state(snap)
        it2.base = 3
        tail = list(it2)
        assert len(tail) == len(full) - 3
        for i, b in enumerate(tail):
            want = full[3 + i]
            assert b["images"].shape == want["images"].shape
            for k in b:
                np.testing.assert_array_equal(b[k], want[k], err_msg=k)

    def test_multi_scale_rect_buckets(self, tmp_path):
        """(net_h, net_w) ladder entries flow through (rect nets use
        aspect-preserving buckets — proportional_sizes)."""
        pairs = _mk_pairs(tmp_path)
        sizes = [(64, 96), (96, 128)]
        ms = grain_train_batches(
            pairs, size_for_batch=lambda bi: sizes[bi % 2],
            **dict(KW, num_epochs=1, seed=1, net_size=(64, 96)))
        a = next(ms)
        b = next(ms)
        assert a["images"].shape[1:3] == (64, 96)
        assert b["images"].shape[1:3] == (96, 128)

    def test_pick_scale_indexed_random_access(self):
        from yolo_tpu.train.loop import (MULTISCALE_SIZES,
                                         pick_scale_indexed)

        # deterministic, interval-constant, random-access
        for step in (0, 1, 9, 10, 25, 1000):
            a = pick_scale_indexed(step, seed=5)
            assert a == pick_scale_indexed(step, seed=5)
            assert a == pick_scale_indexed((step // 10) * 10, seed=5)
            assert a in MULTISCALE_SIZES
        # draws vary across intervals (some pair differs)
        draws = {pick_scale_indexed(10 * i, seed=5) for i in range(20)}
        assert len(draws) > 1
        # rect tuples pass through
        rect = ((64, 96), (96, 128))
        r = pick_scale_indexed(0, seed=2, sizes=rect)
        assert r in rect and isinstance(r, tuple)


@pytest.mark.slow
def test_cli_grain_multi_scale_fail_resume(tmp_path, capsys):
    """cli train --loader grain --multi-scale end-to-end with a
    mid-ladder fail->resume: the ladder is resume-reproducible (the
    indexed draw keys on the absolute step) and training completes
    with per-bucket jit shapes."""
    import os

    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc")
    w = tmp_path / "init.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=16, size=(80, 90))
    ckdir = str(tmp_path / "ck")
    os.makedirs(ckdir, exist_ok=True)
    common = ["train", "--model", "tiny-voc", "--input-size", "96",
              "--weights", str(w), "--voc-root", root, "--loader",
              "grain", "--split", "train", "--batch", "8", "--lr",
              "1e-4", "--precision", "fp32", "--checkpoint-dir", ckdir,
              "--checkpoint-every", "1", "--log-every", "1",
              "--log-file", os.path.join(ckdir, "train_log.jsonl"),
              "--multi-scale", "--multi-scale-sizes", "64,96",
              # seed 1's indexed ladder is [64, 96, 96, 64]: the
              # resume at step 1 starts in a NON-initial bucket and
              # crosses back — a genuine mid-ladder restore
              "--multi-scale-every", "1", "--seed", "1"]
    with pytest.raises(SystemExit, match="fail-after-step"):
        cli.main(common + ["--fail-after-step", "1", "--epochs", "2"])
    assert os.path.exists(os.path.join(ckdir, "step_1.grain"))

    cli.main(common + ["--resume", os.path.join(ckdir, "step_1"),
                       "--epochs", "2"])
    err = capsys.readouterr().err
    assert "restored grain data-iterator position" in err
    final = ckpt.restore(os.path.join(ckdir, "final"))
    assert int(np.asarray(final["step"])) == 4

    # the logged sizes follow the indexed ladder for seed 1
    from yolo_tpu.train.loop import pick_scale_indexed

    want = [pick_scale_indexed(bi, 1, 1, (64, 96)) for bi in range(4)]
    assert want == [64, 96, 96, 64]   # really crosses buckets
    logged = []
    with open(os.path.join(ckdir, "train_log.jsonl")) as f:
        import json

        for line in f:
            d = json.loads(line)
            if "size" in d:
                logged.append((d["step"], d["size"]))
    got = {s: v for s, v in logged}
    assert [got[i + 1] for i in range(4)] == want


class TestGrainMultiScaleCache:
    """Code-review r5: buckets build LAZILY (a mid-ladder resume never
    builds the step-0 bucket) and the per-size iterator cache is
    LRU-bounded (worker pools must not accumulate over a long ladder)."""

    def test_lazy_build_and_pending_state(self, tmp_path):
        from yolo_tpu.data.grain_pipeline import grain_train_batches

        pairs = _mk_pairs(tmp_path)
        kw2 = dict(KW, num_epochs=2, seed=7)
        ladder = lambda bi: 64 if (bi // 2) % 2 == 0 else 96

        calls = []
        full_it = grain_train_batches(pairs, size_for_batch=ladder,
                                      **kw2)
        orig_make = full_it._make
        full_it._make = lambda s: (calls.append(s), orig_make(s))[1]
        assert full_it.current_size is None and not calls  # lazy
        full = list(full_it)
        # one build per DISTINCT size (re-entering 64 reuses the
        # cached bucket — only the position transfers)
        assert calls == [64, 96]

        # resume at pull 3 (a 96 bucket): the fresh iterator must build
        # ONLY the 96 bucket — never the step-0 64 one
        it = grain_train_batches(pairs, size_for_batch=ladder, **kw2)
        for _ in range(3):
            next(it)
        snap = it.state_for_pull(3)
        it2 = grain_train_batches(pairs, size_for_batch=ladder, **kw2)
        calls2 = []
        orig2 = it2._make
        it2._make = lambda s: (calls2.append(s), orig2(s))[1]
        it2.set_state(snap)
        it2.base = 3
        first = next(it2)
        assert calls2 == [96]
        np.testing.assert_array_equal(first["images"],
                                      full[3]["images"])

    def test_lru_eviction_keeps_stream_exact(self, tmp_path):
        """A ladder cycling through MORE sizes than the cache bound:
        evicted buckets rebuild on re-entry and the record stream still
        matches the per-index fixed-size runs exactly."""
        from yolo_tpu.data import grain_pipeline as gp_mod
        from yolo_tpu.data.grain_pipeline import grain_train_batches

        pairs = _mk_pairs(tmp_path)
        sizes = [32, 64, 96, 128, 160, 32]     # 5 distinct > bound 4
        kw2 = dict(KW, num_epochs=2, seed=3)
        ms_it = grain_train_batches(
            pairs, size_for_batch=lambda bi: sizes[bi % len(sizes)],
            **kw2)
        assert gp_mod.MultiScaleGrainIterator._MAX_CACHED == 4
        ms = list(ms_it)
        assert [b["images"].shape[1] for b in ms] == sizes
        assert len(ms_it._cache) <= 4
        for i, b in enumerate(ms):
            fixed = list(grain_train_batches(
                pairs, **dict(kw2, net_size=sizes[i])))
            for k in b:
                np.testing.assert_array_equal(b[k], fixed[i][k],
                                              err_msg=f"{i}:{k}")


@pytest.mark.slow
def test_multi_scale_with_worker_processes(tmp_path):
    """worker_count>0: the per-bucket loaders run REAL worker
    processes, and the mid-stream bucket switch (set_state onto a
    worker-backed iterator) still carries the position. Validates the
    LRU-cache design assumption that worker pools are per bucket."""
    pairs = _mk_pairs(tmp_path)
    it = grain_train_batches(
        pairs, **dict(KW, num_epochs=2, seed=1),
        worker_count=1,
        size_for_batch=lambda bi: 64 if bi < 2 else 96)
    got = [next(it) for _ in range(4)]
    assert [b["images"].shape[1] for b in got] == [64, 64, 96, 96]
    # bitwise equality vs the in-process run (workers must not change
    # the stream)
    it0 = grain_train_batches(
        pairs, **dict(KW, num_epochs=2, seed=1),
        size_for_batch=lambda bi: 64 if bi < 2 else 96)
    for g, w in zip(got, it0):
        for k in g:
            np.testing.assert_array_equal(g[k], w[k], err_msg=k)


def test_multi_scale_flags_require_multi_scale(tmp_path):
    """--multi-scale-sizes/--multi-scale-every without --multi-scale
    (or cfg random=1) reject loudly — silently storing a validated
    cadence nothing uses hid the dropped request (code-review r5)."""
    from yolo_tpu import cli

    with pytest.raises(SystemExit, match="have no effect"):
        cli.main(["train", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", "w.weights", "--voc-root",
                  str(tmp_path), "--multi-scale-sizes", "64,96"])
    with pytest.raises(SystemExit, match="have no effect"):
        cli.main(["train", "--model", "tiny-voc", "--input-size", "96",
                  "--weights", "w.weights", "--voc-root",
                  str(tmp_path), "--multi-scale-every", "5"])


@pytest.mark.slow
def test_cli_grain_multi_scale_resume_without_grain_file(tmp_path,
                                                         capsys):
    """Resume WITHOUT the .grain data-position file: the data stream
    restarts, but the size ladder must stay keyed on the ABSOLUTE
    model step — a base=0 restart would silently desync the ladder of
    all later resumes from the run's documented size-for-step mapping
    (code-review r5)."""
    import json
    import os

    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.train.loop import pick_scale_indexed

    cfg = get_variant("tiny-voc")
    w = tmp_path / "init.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=16, size=(80, 90))
    ckdir = str(tmp_path / "ck")
    os.makedirs(ckdir, exist_ok=True)
    common = ["train", "--model", "tiny-voc", "--input-size", "96",
              "--weights", str(w), "--voc-root", root, "--loader",
              "grain", "--split", "train", "--batch", "8", "--lr",
              "1e-4", "--precision", "fp32", "--checkpoint-dir", ckdir,
              "--checkpoint-every", "1", "--log-every", "1",
              "--log-file", os.path.join(ckdir, "train_log.jsonl"),
              "--multi-scale", "--multi-scale-sizes", "64,96",
              "--multi-scale-every", "1", "--seed", "1"]
    with pytest.raises(SystemExit, match="fail-after-step"):
        cli.main(common + ["--fail-after-step", "1", "--epochs", "2"])
    os.remove(os.path.join(ckdir, "step_1.grain"))

    cli.main(common + ["--resume", os.path.join(ckdir, "step_1"),
                       "--epochs", "2"])
    err = capsys.readouterr().err
    assert "grain iterator restarts from the beginning" in err
    # steps 2..4 still follow the ABSOLUTE indexed ladder (bi=1..3),
    # exactly as a .grain-carrying resume would
    want = {s: pick_scale_indexed(s - 1, 1, 1, (64, 96))
            for s in (2, 3, 4)}
    got = {}
    with open(os.path.join(ckdir, "train_log.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if "size" in d:
                got[d["step"]] = d["size"]
    assert {s: got[s] for s in (2, 3, 4)} == want


@pytest.mark.slow
def test_cli_grain_grad_accum_multi_scale_compose(tmp_path):
    """Three features composed through one CLI run: --loader grain +
    --grad-accum (interleaved sub-batches, chained BN stats) +
    --multi-scale (bucketed loaders) — the composition no single
    test exercised. Two epochs complete with per-bucket jit shapes
    and a final checkpoint."""
    import json
    import os

    from tests.test_data_eval import make_voc_root
    from yolo_tpu import cli
    from yolo_tpu.configs import get_variant
    from yolo_tpu.io import checkpoint as ckpt
    from yolo_tpu.io import darknet_weights as dw

    cfg = get_variant("tiny-voc")
    w = tmp_path / "init.weights"
    dw.save(str(w), cfg.layers,
            dw.random_params(cfg.layers, np.random.default_rng(0)))
    root = make_voc_root(tmp_path, n_images=16, size=(80, 90))
    ckdir = str(tmp_path / "ck")
    os.makedirs(ckdir, exist_ok=True)
    cli.main(["train", "--model", "tiny-voc", "--input-size", "96",
              "--weights", str(w), "--voc-root", root, "--loader",
              "grain", "--split", "train", "--batch", "16",
              "--grad-accum", "2", "--lr", "1e-4", "--precision",
              "fp32", "--checkpoint-dir", ckdir, "--log-every", "1",
              "--log-file", os.path.join(ckdir, "log.jsonl"),
              "--multi-scale", "--multi-scale-sizes", "64,96",
              "--multi-scale-every", "1", "--seed", "1",
              "--epochs", "2"])
    final = ckpt.restore(os.path.join(ckdir, "final"))
    assert int(np.asarray(final["step"])) == 2  # 2 epochs x 16/16
    sizes = [json.loads(l)["size"] for l in
             open(os.path.join(ckdir, "log.jsonl")) if "size" in l]
    from yolo_tpu.train.loop import pick_scale_indexed

    assert sizes == [float(pick_scale_indexed(b, 1, 1, (64, 96)))
                     for b in range(2)]
