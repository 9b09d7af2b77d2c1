"""Test configuration: force the XLA CPU backend with 8 virtual devices.

Multi-chip sharding tests (tests/test_sharded.py) run on a virtual 8-device
CPU mesh — the stand-in for a TPU slice per SURVEY.md §4 ("no real cluster"
strategy). Must run before jax is imported anywhere.

Note: with the axon TPU plugin present, the JAX_PLATFORMS *environment
variable* is ignored; only jax.config.update("jax_platforms", ...) takes
effect — hence the explicit config update below.
"""

import os

# XLA's CPU compiler recurses deeply on this suite's unrolled limb graphs;
# the default 8 MB stack segfaults nondeterministically mid-compile
# (observed on test_e2e_bls12_377). Raise the limit to the hard max.
try:
    import resource
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ImportError, ValueError, OSError):
    pass

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the unrolled limb-arithmetic graphs are
# large and XLA compiles slowly on them; caching makes test re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# TPU_MSM_TEST_TPU=1 runs the suite against the real TPU instead of the
# virtual CPU mesh (used by scripts/tpu_verify.py for the pallas battery)
if os.environ.get("TPU_MSM_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
# pytest plugins import jax BEFORE this conftest runs, so the env vars
# above are too late for jax's import-time config reads — set explicitly.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# The "executable.serialize() segfault" that previously forced CPU cache
# writes OFF was the same 8 MB-stack overflow as the compile-time crashes
# — with RLIMIT_STACK raised (top of this file) serialize works on the
# exact program class that used to crash (verified on the tiny-n e2e
# pipeline), so writes are enabled everywhere. If a segfault in
# compilation_cache.py reappears, check the stack limit first.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
