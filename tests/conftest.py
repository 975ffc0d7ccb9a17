"""Test env: run everything on CPU with 8 fake devices so distributed
tests work without a TPU slice (SURVEY.md §4.2.5).

Set YOLO_TPU_TEST_BACKEND=tpu to run the suite against the real chip
instead (slower; exercises the Pallas kernels' real compile path).

Note: this machine's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS to the TPU tunnel, so setting the env var here is too
late — but the backend isn't *initialized* until first use, so
jax.config.update still wins.
"""

import os

if os.environ.get("YOLO_TPU_TEST_BACKEND", "cpu") == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
