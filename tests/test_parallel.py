"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §4.2.5):
DP gradient allreduce equals single-device on the concatenated batch;
batch-sharded inference equals unsharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train import MICRO, _random_scene
from yolo_tpu.io import darknet_weights as dw
from yolo_tpu.models.predict import make_detector
from yolo_tpu.models import graph
from yolo_tpu.parallel import sharding as shd
from yolo_tpu.train.loop import TrainConfig, init_state, make_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return shd.make_mesh()


def _batch(rng, batch):
    grid = MICRO.grid_size
    targets = _random_scene(rng, batch, grid, MICRO.num_classes)
    out = {k: jnp.asarray(v) for k, v in targets.items()}
    out["images"] = jnp.asarray(
        rng.uniform(0, 1, (batch, 64, 64, 3)).astype(np.float32))
    return out


def test_dp_step_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    params = dw.random_params(MICRO.layers, rng)
    tcfg = TrainConfig(learning_rate=1e-3, weight_decay=0.0)
    batch = _batch(rng, 16)

    single_state = init_state(params, tcfg)
    single_state, m1 = make_train_step(MICRO, tcfg)(single_state, batch)

    dp_state = shd.replicate(mesh, init_state(params, tcfg))
    dp_batch = shd.shard_batch(mesh, batch)
    dp_step = shd.make_dp_train_step(MICRO, tcfg, mesh)
    dp_state, m2 = dp_step(dp_state, dp_batch)

    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        single_state["params"], dp_state["params"])


def test_sharded_inference_matches_unsharded(mesh):
    rng = np.random.default_rng(1)
    params = graph.params_to_jax(
        graph.fold_params(MICRO.layers, dw.random_params(MICRO.layers, rng)))
    images = rng.integers(0, 256, (8, 96, 128, 3), dtype=np.uint8)

    det = make_detector(MICRO, conf_threshold=0.1)
    want = det(params, jnp.asarray(images))

    dp_det = shd.make_dp_detector(MICRO, mesh, conf_threshold=0.1)
    got = dp_det(shd.replicate(mesh, params),
                 jax.device_put(jnp.asarray(images), shd.batch_sharding(mesh)))

    for key in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(np.asarray(got[key]), np.asarray(want[key]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_inference_matches_unsharded_yolov3(mesh):
    """DP batch-sharded inference is bit-consistent for the multi-head
    family too (per-chip shards, no collectives on the hot path)."""
    from tests.test_yolov3 import MICRO_V3

    rng = np.random.default_rng(2)
    params = graph.params_to_jax(graph.fold_params(
        MICRO_V3.layers, dw.random_params(MICRO_V3.layers, rng)))
    images = rng.integers(0, 256, (8, 96, 128, 3), dtype=np.uint8)

    det = make_detector(MICRO_V3, conf_threshold=0.1)
    want = det(params, jnp.asarray(images))

    dp_det = shd.make_dp_detector(MICRO_V3, mesh, conf_threshold=0.1)
    got = dp_det(shd.replicate(mesh, params),
                 jax.device_put(jnp.asarray(images),
                                shd.batch_sharding(mesh)))

    for key in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(want[key]),
                                   rtol=1e-4, atol=1e-5)


def test_maybe_init_distributed_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert shd.maybe_init_distributed() is False
