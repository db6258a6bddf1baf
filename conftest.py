"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on host CPU with
``--xla_force_host_platform_device_count=8`` (the JAX-idiomatic fake backend
for multi-device tests without a real pod). Benchmarks (`bench.py`) do NOT go
through this file and run on the real TPU chip.
"""

import os

# FORCE cpu (not setdefault): the shell environment pins JAX_PLATFORMS to the
# tunneled TPU backend, and running the test suite against a remote chip makes
# every tiny jit a multi-second remote compile (observed: >10 min full suite).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
