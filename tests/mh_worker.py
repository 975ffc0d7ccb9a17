"""Multi-host DP worker (driven by tests/test_parallel.py's 2-process
test): bootstraps jax.distributed via the env hook
(`parallel.sharding.maybe_init_distributed`), builds the global 8-device
mesh across both processes, and runs ONE DP train step on the micro
model with a host-sharded batch. Prints the loss for the parent test to
compare across processes and against the single-process reference.

Usage: python tests/mh_worker.py <process_id> <coordinator_port>
(env isolation is the caller's job: fresh process, no conftest).
"""

import os
import sys


def main() -> None:
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from yolo_tpu.parallel import sharding as shd

    assert shd.maybe_init_distributed() is True
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    import numpy as np

    import jax.experimental.multihost_utils as mhu
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tests.test_train import MICRO, _random_scene
    from yolo_tpu.io import darknet_weights as dw
    from yolo_tpu.train.loop import TrainConfig, init_state

    mesh = shd.make_mesh(8)

    # every process builds the IDENTICAL global batch, then contributes
    # its local rows — the global array must equal the single-process one
    rng = np.random.default_rng(0)
    targets = _random_scene(rng, 8, MICRO.grid_size, MICRO.num_classes)
    full = {k: np.asarray(v) for k, v in targets.items()}
    full["images"] = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    lo, hi = pid * 4, (pid + 1) * 4
    local = {k: v[lo:hi] for k, v in full.items()}
    batch = jax.tree_util.tree_map(
        lambda a: mhu.host_local_array_to_global_array(a, mesh, P("data")),
        local)

    tcfg = TrainConfig(learning_rate=1e-3, weight_decay=0.0)
    state_host = jax.device_get(init_state(
        dw.random_params(MICRO.layers, np.random.default_rng(1)), tcfg))
    state = jax.tree_util.tree_map(
        lambda a: mhu.host_local_array_to_global_array(
            np.asarray(a), mesh, P()), state_host)

    step = shd.make_dp_train_step(MICRO, tcfg, mesh)
    state, metrics = step(state, batch)
    loss = float(jnp.asarray(metrics["loss"]))
    print(f"MH_LOSS {loss:.8f}", flush=True)
    assert np.isfinite(loss)
    print(f"MH_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
