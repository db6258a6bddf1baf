"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on host CPU with
``--xla_force_host_platform_device_count=8`` (the JAX-idiomatic fake backend
for multi-device tests without a real pod). Benchmarks (`bench.py`) do NOT go
through this file and run on the real TPU chip.

Two layers of forcing are required on this machine:
- the env var, for subprocesses;
- ``jax.config.update``: the image's sitecustomize registers the tunneled
  TPU plugin at interpreter boot and overrides JAX_PLATFORMS, so the env var
  alone is silently ignored (observed: the full suite ran against the remote
  chip). The config update lands before any backend initializes because
  conftest imports before every test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")
