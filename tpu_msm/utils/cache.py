"""Persistent XLA compilation-cache enablement.

In this environment jax is pre-imported by the interpreter startup hook,
so the usual `os.environ[...] = ...` before `import jax` silently does
nothing (the env is read once at import). Every entry point therefore
calls `enable_compile_cache()` which sets the config explicitly — the
analogue of the reference's pipeline-state caching (ShaderManager
prebuilding ComputePipelineStates, shader_manager.rs:100-135), but at the
XLA-executable level and persistent across processes."""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                           ".jax_cache")


def enable_compile_cache(path: str | None = None) -> None:
    import jax
    path = path or os.environ.get("TPU_MSM_CACHE_DIR") or DEFAULT_DIR
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
