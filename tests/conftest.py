"""Test configuration: force the XLA CPU backend with 8 virtual devices.

Multi-chip sharding tests (tests/test_sharded.py) run on a virtual 8-device
CPU mesh — the stand-in for a TPU slice per SURVEY.md §4 ("no real cluster"
strategy). Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the unrolled limb-arithmetic graphs are
# large and XLA-CPU compiles ~3ms/op; caching makes test re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
