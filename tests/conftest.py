"""Test env: force an 8-device virtual CPU mesh before jax initializes.

This lets distributed/sharding tests run without TPU hardware — something the
reference could never do (its DDP tests required a GPU cluster; SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
