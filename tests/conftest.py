"""Test env: force an 8-device virtual CPU mesh before jax backends init.

This lets distributed/sharding tests run without TPU hardware — something the
reference could never do (its DDP tests required a GPU cluster; SURVEY.md §4).

Note: the container's sitecustomize registers a remote-TPU PJRT plugin and
pins JAX_PLATFORMS=axon for every interpreter, so we must override via
jax.config *after* import (env vars alone are not enough).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: XLA compiles are expensive on this 1-CPU image
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
