"""Test env: run everything on CPU with 8 fake devices so distributed
tests work without a TPU slice (SURVEY.md §4.2.5).

Note: this machine's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS=axon (the TPU tunnel), so setting the env var here is
too late — but the backend isn't *initialized* until first use, so
jax.config.update still wins.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
