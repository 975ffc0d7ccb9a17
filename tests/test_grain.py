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
