"""Data-parallel sharding over a 1-D device mesh (SURVEY.md §2.3, §5.9).

The reference is single-process/single-device with no communication layer;
the TPU-native story is jax.sharding + jit: batch dimension sharded over
the ('data',) mesh axis, weights replicated. XLA inserts the gradient
allreduce (psum over ICI) for training and needs no collectives at all on
the inference hot path (NMS is per-image). TP/PP/SP/EP are N/A for this
workload by design — see SURVEY.md §2.3 for the rationale.

Used by __graft_entry__.dryrun_multichip and tests/test_parallel.py
(8 fake CPU devices).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Multi-host hook (SURVEY.md §5.9): call jax.distributed.initialize
    when launched under a multi-host coordinator (env-driven). The 8-chip
    target configs are single-host over ICI and never need this; DCN
    enters only on multi-host scale-out.

    Tested as a REAL capability, not just a no-op:
    tests/test_parallel.py::test_multihost_dp_two_processes runs two OS
    processes x 4 fake devices through this hook, forms the global
    8-device mesh, and verifies one cross-process DP train step matches
    the single-process loss (Gloo collectives on CPU stand in for DCN)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        return True
    return False


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D ('data',) mesh over the first n_devices devices.

    Raises immediately (with backend + count + fix) when fewer devices
    exist than requested, instead of silently truncating and letting the
    caller fail later on a cryptic shape/size assert (the round-1 driver
    failure mode, MULTICHIP_r01.json)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}) found only {len(devices)} "
                f"device(s) on the '{jax.default_backend()}' backend. For "
                "a fake multi-device CPU mesh, set XLA_FLAGS+="
                f"' --xla_force_host_platform_device_count={n_devices}' "
                "and jax.config.update('jax_platforms', 'cpu') before "
                "first backend use (tests/conftest.py recipe), or run on "
                "a real slice with enough chips.")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for any rank."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree onto the mesh, batch-sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def make_dp_train_step(mcfg, tcfg, mesh: Mesh, compute_dtype=None):
    """DP training step: state replicated, batch sharded on 'data'.

    jit + output shardings keep the state replicated; the mean over the
    global batch inside the loss makes XLA emit the gradient all-reduce
    over ICI (BASELINE.json:11).
    """
    import jax.numpy as jnp

    from yolo_tpu.train.loop import train_step

    compute_dtype = compute_dtype or jnp.float32
    rep = replicated(mesh)
    return jax.jit(
        partial(train_step, mcfg=mcfg, tcfg=tcfg, compute_dtype=compute_dtype),
        donate_argnums=0,
        out_shardings=(rep, rep),
    )


def make_dp_detector(cfg, mesh: Mesh, compute_dtype=None, **det_kw):
    """Batch-sharded inference: embarrassingly parallel, no collectives
    on the hot path (per-chip batch shards, SURVEY.md §2.3)."""
    import jax.numpy as jnp

    from yolo_tpu.models.predict import detect_raw

    compute_dtype = compute_dtype or jnp.float32

    def fn(params, images_u8):
        return detect_raw(cfg, params, images_u8,
                          compute_dtype=compute_dtype, **det_kw)

    return jax.jit(fn, in_shardings=(replicated(mesh), batch_sharding(mesh)),
                   out_shardings=batch_sharding(mesh))


def make_dp_classifier(cfg, mesh: Mesh, compute_dtype=None):
    """Batch-sharded classifier forward (softmax-head models): like
    make_dp_detector, embarrassingly parallel — replicated params,
    per-chip batch shards, no collectives. Input is the PREPROCESSED
    (B, net, net, 3) [0,1] batch (models/classify.classifier_preprocess
    runs host-side)."""
    import jax.numpy as jnp

    from yolo_tpu.models import graph

    compute_dtype = compute_dtype or jnp.float32
    if cfg.head_kind != "softmax":
        raise ValueError(f"{cfg.name} is not a classifier "
                         f"(head_kind={cfg.head_kind})")

    def fn(params, images):
        return graph.apply_layers(cfg.layers, params,
                                  jnp.asarray(images, jnp.float32),
                                  eps=cfg.bn_eps,
                                  compute_dtype=compute_dtype)

    return jax.jit(fn, in_shardings=(replicated(mesh), batch_sharding(mesh)),
                   out_shardings=batch_sharding(mesh))
